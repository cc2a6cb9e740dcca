package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Common-Crawl-style web-page table of the north star:
  * `pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)`
  * synthesized deterministically from the driver's `documents` parquet (no
  * external data). Every derivation has a DuckDB twin so page-pipeline
  * queries verify row-for-row.
  *
  * GEOTAG: pages are geotagged from page METADATA — the numeric page id is
  * parsed back out of the url path and mapped to planar coordinates by
  * closed-form arithmetic (a stand-in for a real geo-IP / metadata lookup
  * that an oracle can reproduce exactly). Both engines parse the SAME url
  * string, so the geotag provably derives from the page row itself.
  */
object Pages {

  /** The page table. url embeds the doc id (last path segment); html wraps
    * the text in deterministic markup; warc_ts is a fixed epoch + id stride. */
  def pages(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        concat(lit("https://host"), (col("doc_id") % 97).cast("string"),
               lit(".example.org/doc/"), col("doc_id").cast("string")).as("url"),
        to_timestamp(lit(1600000000L) + col("doc_id") * 137L).as("warc_ts"),
        encode(concat(lit("<html><body>"), col("text"), lit("</body></html>")),
               "UTF-8").as("html"),
        col("text"),
        col("lang"))

  /** DuckDB twin of pages(). */
  // NB: no line may START with "||" — these strings are re-embedded in
  // outer .stripMargin blocks, which would eat the leading pipes.
  val pagesSql: String =
    """SELECT concat('https://host', CAST(doc_id % 97 AS VARCHAR),
      |  '.example.org/doc/', CAST(doc_id AS VARCHAR)) AS url,
      |  to_timestamp(1600000000 + doc_id * 137) AS warc_ts,
      |  encode(concat('<html><body>', text, '</body></html>')) AS html,
      |  text, lang
      |FROM documents""".stripMargin

  /** Batched geotag stage: parse the page id out of the url (metadata), map
    * to planar (x, y) on the integer lattice. Pure column arithmetic —
    * whole-stage codegen, no UDF. Coordinates on a 500-lattice line (county /
    * cell boundaries) are excluded up front, like TpchGeo.points. */
  def geotag(p: DataFrame): DataFrame =
    p.withColumn("__id", regexp_extract(col("url"), "(\\d+)$", 1).cast("long"))
      .withColumn("xi", expr("(__id * 48271) % 8000"))
      .withColumn("yi", expr("(__id * 16807) % 8000"))
      .where(expr("xi % 500 != 0 AND yi % 500 != 0"))
      .withColumn("x", col("xi").cast("double"))
      .withColumn("y", col("yi").cast("double"))
      .drop("__id", "xi", "yi")

  /** DuckDB twin of geotag() applied to pagesSql. */
  val geotaggedSql: String =
    s"""SELECT url, warc_ts, html, text, lang,
       |  CAST(xi AS DOUBLE) AS x, CAST(yi AS DOUBLE) AS y
       |FROM (
       |  SELECT *, (pid * 48271) % 8000 AS xi, (pid * 16807) % 8000 AS yi
       |  FROM (SELECT *, CAST(regexp_extract(url, '(\\d+)$$', 1) AS BIGINT) AS pid
       |        FROM ($pagesSql)))
       |WHERE xi % 500 <> 0 AND yi % 500 <> 0""".stripMargin
}
