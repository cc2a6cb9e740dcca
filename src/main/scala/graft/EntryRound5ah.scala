package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 thirty-fourth batch: deterministic heavy hitters through the
  * engine's first native `TypedImperativeAggregate` (Misra–Gries
  * k-bounded mergeable sketch → exact re-count of the bounded candidate
  * sliver). */
object EntryRound5ah {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q242_heavy_hitters" -> ((s, dir) => {
      val toks = s.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
      graft.ml.Frequent.heavyHitters(toks, "w", k = 35)
    })
  )

  def oracles: Map[String, String] = Map(

    // the sketch is a candidate generator; the OUTPUT contract is the
    // exact true-heavy-hitter set: cnt·(k+1) > N with k = 35
    "q242_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |tt AS (SELECT w FROM t WHERE w <> ''),
        |n AS (SELECT count(*) AS n FROM tt),
        |c AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
        |      FROM tt GROUP BY 1)
        |SELECT w, cnt, CAST(n AS BIGINT) AS n_total
        |FROM c, n WHERE cnt * 36 > n""".stripMargin
  )
}
