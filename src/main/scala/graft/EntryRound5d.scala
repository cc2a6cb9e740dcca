package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 fourth batch: training-batch assembly and containment dedup. */
object EntryRound5d {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // length-bucketed training batches: bucket by token length, fill
    // 8-doc batches in id order, account the padding waste of the
    // rectangular batch tensor — the packing-efficiency report a trainer
    // runs next to packSequences (q60)
    "q155_length_batching" -> ((s, dir) =>
      graft.text.Batching.lengthBucketedBatches(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          bucketWidth = 16, batchSize = 8)
        .orderBy("bucket", "batch")),

    // asymmetric containment over word trigrams: the clone/subsumption
    // pairs Jaccard misses (quoted-inside-longer-page), via the
    // inverted-index self-join — shared trigram count / |A|'s trigrams
    // in integer milli-units, τ = 0.8
    "q156_containment" -> ((s, dir) =>
      graft.text.Containment.containmentPairs(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          n = 3, tauMilli = 800)
        .orderBy("id_a", "id_b"))
  )

  def oracles: Map[String, String] = Map(

    "q155_length_batching" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n
        |           FROM documents),
        |b AS (SELECT doc_id, n, n // 16 AS bucket FROM t),
        |r AS (SELECT doc_id, n, bucket,
        |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1
        |      AS rn
        |  FROM b),
        |g AS (SELECT bucket, rn // 8 AS batch, count(*) AS n_docs,
        |    max(n) AS max_len, sum(n) AS sum_len
        |  FROM r GROUP BY 1, 2)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(batch AS BIGINT) AS batch, n_docs, max_len,
        |  CAST(max_len * n_docs - sum_len AS BIGINT) AS pad_waste
        |FROM g ORDER BY bucket, batch""".stripMargin,

    "q156_containment" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
        |           FROM documents),
        |s0 AS (SELECT doc_id, generate_subscripts(l, 1) - 1 AS i,
        |         unnest(l) AS w
        |       FROM t),
        |tri AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
        |  FROM s0 a JOIN s0 b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |            JOIN s0 c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
        |shs AS (SELECT DISTINCT doc_id, sh FROM tri),
        |sz AS (SELECT doc_id, count(*) AS sa FROM shs GROUP BY 1),
        |shared AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |    count(*) AS sh
        |  FROM shs x JOIN shs y ON x.sh = y.sh AND x.doc_id <> y.doc_id
        |  GROUP BY 1, 2),
        |c AS (SELECT id_a, id_b, (1000 * sh) // sa AS cont_milli
        |      FROM shared JOIN sz ON shared.id_a = sz.doc_id)
        |SELECT id_a, id_b, CAST(cont_milli AS BIGINT) AS cont_milli
        |FROM c WHERE cont_milli >= 800 ORDER BY id_a, id_b""".stripMargin
  )
}
