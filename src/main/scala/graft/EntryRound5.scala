package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 queries: the crawl-adjacent operators added this round, each
  * with a closed-form DuckDB oracle over the driver parquet tables. */
object EntryRound5 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // real PNG/JPEG decode via the JDK's own javax.imageio readers: every
    // doc becomes a genuinely ENCODED container (even ids → PNG, odd →
    // JPEG) whose raster follows a closed-form synthesis formula; the
    // engine decodes format + dimensions from the header walk, and for the
    // lossless PNG half also the full-decode red-channel sum — so the
    // oracle certifies the decoded raster pixel for pixel, not just the
    // writer/reader pairing (ref: reference raster image handling is a
    // declared non-goal; this is the crawl-pipeline image-meta pass)
    "q137_imageio_meta" -> ((s, dir) => {
      import graft.multimodal.MultimodalOps
      val mkImg = udf((docId: Long, nChars: Long) => {
        val w = (nChars % 64).toInt + 1
        val h = (docId % 48).toInt + 1
        val fmt = if (docId % 2 == 0) "png" else "jpg"
        MultimodalOps.encodeTestImage(fmt, docId, w, h)
      })
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), mkImg(col("doc_id"), col("n_chars")).as("media"))
      MultimodalOps.decodeImageIoFacts(media, "doc_id", "media")
        .orderBy("id")
    })
  )

  def oracles: Map[String, String] = Map(

    "q137_imageio_meta" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(n_chars % 64 + 1 AS INT) AS w,
        |    CAST(doc_id % 48 + 1 AS INT) AS h
        |  FROM documents),
        |px AS (SELECT doc_id, w, h,
        |    unnest(generate_series(0, w * h - 1)) AS i
        |  FROM dims WHERE doc_id % 2 = 0),
        |sums AS (SELECT doc_id,
        |    CAST(sum((doc_id * 31 + 7 * (i % w) + 13 * (i // w)) % 256)
        |         AS BIGINT) AS red_sum
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id AS id,
        |  CASE WHEN d.doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
        |  CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
        |  CAST(coalesce(s.red_sum, -1) AS BIGINT) AS red_sum
        |FROM dims d LEFT JOIN sums s ON d.doc_id = s.doc_id
        |ORDER BY id""".stripMargin
  )
}
