package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Registrable-domain (eTLD+1) extraction against a public-suffix list —
  * the step every per-domain crawl statistic silently depends on: grouping
  * by raw host splits www./cdn. mirrors, grouping by the naive last label
  * merges every *.co.uk site into one "domain". Longest-suffix-match wins
  * (the publicsuffix.org rule): `site5.co.uk` must match `co.uk`, not `uk`.
  *
  * Scale shape: the suffix list (~10k rows in the real PSL) is a BROADCAST
  * dimension joined to the DISTINCT hosts only — the page table never
  * carries the match predicate; hosts get their mapping once and join back
  * by host. The endsWith theta-join is broadcast-nested-loop over
  * |hosts| × |suffixes| candidate pairs, bounded by the distinct-host
  * count, not the page count.
  */
object PublicSuffix {

  /** df + `etld1` column: the registrable domain of `hostCol`, null when
    * the host IS a public suffix or matches none. */
  def registrable(df: DataFrame, hostCol: String,
                  suffixes: Seq[String]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val sfx = suffixes.toDF("sfx")
    val hosts = df.select(hostCol).distinct()
    val matched = hosts.join(broadcast(sfx),
        col(hostCol) === col("sfx") ||
          col(hostCol).endsWith(concat(lit("."), col("sfx"))), "left")
      .groupBy(hostCol)
      .agg(max_by(col("sfx"), length(col("sfx"))).as("sfx"))
    val mapped = matched.withColumn("etld1",
      when(col("sfx").isNull || col(hostCol) === col("sfx"), lit(null))
        .otherwise(concat(
          regexp_extract(
            expr(s"substring($hostCol, 1, " +
              s"length($hostCol) - length(sfx) - 1)"),
            "([^.]+)$", 1),
          lit("."), col("sfx"))))
      .select(col(hostCol), col("etld1"))
    df.join(mapped, Seq(hostCol), "left")
  }
}
