package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.{Pages, TextFixtures}
import graft.text.{Html, PipelineOps, TextOps}

/** Round-4 queries: HTML→text extraction (the byte-identity invariant made
  * checkable), snapshot-table MERGE / change-data-feed, Bloom-prefiltered
  * decontamination, and n-gram LM perplexity bucketing. Same oracle
  * discipline: integer counts, identical expression chains both sides. */
object EntryRound4 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HTML→text extraction over realistic markup: the oracle RE-EXTRACTS
    // with the identical RE2 chain, and roundtrip_ok certifies
    // extract(html) == text byte-for-byte (the north-star invariant)
    "q77_html_extract" -> ((s, dir) => {
      val p = Pages.htmlPages(s, dir)
      val x = Html.extractText(col("html"))
      p.select(col("doc_id"),
          Html.titleOf(col("html")).as("title"),
          md5(x).as("x_md5"),
          (md5(x) === md5(col("text"))).cast("int").as("roundtrip_ok"))
        .orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "q77_html_extract" -> {
      val x = Html.extractTextSql("html")
      s"""WITH p AS (${Pages.htmlPagesSql})
         |SELECT doc_id, ${Html.titleOfSql("html")} AS title,
         |  md5($x) AS x_md5,
         |  CAST(CASE WHEN md5($x) = md5(text) THEN 1 ELSE 0 END AS INT)
         |    AS roundtrip_ok
         |FROM p ORDER BY doc_id""".stripMargin
    }
  )
}
