package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprBridge
import graft.spark.expressions.NfcNormalize

/** Round-5 fiftieth batch: Unicode NFC normalization audit (the encoder-
  * accident screen dedup depends on), homoglyph / mixed-script host
  * detection (IDN-spoofing audit via the byte-vs-char length gap), and
  * histogram-based join cardinality estimation checked against the true
  * join size (the CBO arithmetic, per bucket). */
object EntryRound5ax {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NFC audit: every 4th doc carries a decomposed "e + COMBINING ACUTE"
    // tail; nfc_normalize (codegen over the JDK normalizer) must compose
    // it — report affected docs and the total char shrinkage, oracle via
    // DuckDB's nfc_normalize
    "q288_nfc_audit" -> ((s, dir) => {
      val txt = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          when(col("doc_id") % 4 === 0,
            concat(col("text"), lit(" caf"), lit("e\u0301")))
            .otherwise(col("text")).as("t"))
      val nfc = ExprBridge.column(NfcNormalize(
        ExprBridge.expression(col("t"))))
      txt.select((nfc =!= col("t")).cast("long").as("changed"),
          (length(col("t")) - length(nfc)).as("delta"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("changed")).as("n_changed"),
          sum(col("delta")).as("delta_chars"))
    }),

    // homoglyph screen: hosts where the byte length exceeds the char
    // length contain non-ASCII (here a Cyrillic 'а' planted in every
    // 13th host) — the punycode/mixed-script flag a crawl frontier
    // raises before treating two hosts as the same registrable domain
    "q289_homoglyph_hosts" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(concat(lit("site"), (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 13 === 0, lit("а"))
            .otherwise(lit("a")), lit(".com")).as("host"))
        .distinct()
        .select(
          (octet_length(col("host")) > length(col("host")))
            .cast("int").as("suspicious"))
        .groupBy("suspicious").agg(count(lit(1)).as("n_hosts"))),

    // CBO arithmetic: equi-width custkey histograms on both sides, the
    // classic containment estimate est = na·nb / max(da, db) per bucket,
    // next to the TRUE per-bucket join size — the estimator audit a
    // planner regression suite runs
    "q290_join_card_est" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select(expr("o_custkey div 25").as("bucket"), col("o_custkey"))
      val c = s.read.parquet(s"$dir/customer.parquet")
        .select(expr("c_custkey div 25").as("bucket"), col("c_custkey"))
      val ho = o.groupBy("bucket").agg(count(lit(1)).as("na"),
        countDistinct("o_custkey").as("da"))
      val hc = c.groupBy("bucket").agg(count(lit(1)).as("nb"),
        countDistinct("c_custkey").as("db"))
      val actual = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(o("bucket")).agg(count(lit(1)).as("actual"))
      ho.join(hc, "bucket")
        .withColumn("est", expr("(na * nb) div greatest(da, db)"))
        .join(actual, Seq("bucket"), "left")
        .select(col("bucket"), col("na"), col("nb"), col("est"),
          coalesce(col("actual"), lit(0L)).as("actual"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q288_nfc_audit" ->
      """WITH t AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0
        |         THEN text || ' caf' || 'e' || chr(769)
        |         ELSE text END AS t
        |  FROM documents),
        |x AS (SELECT t, nfc_normalize(t) AS n FROM t)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n <> t THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_changed,
        |  CAST(sum(length(t) - length(n)) AS BIGINT) AS delta_chars
        |FROM x""".stripMargin,

    "q289_homoglyph_hosts" ->
      """WITH h AS (SELECT DISTINCT
        |    'site' || CAST(doc_id % 50 AS VARCHAR)
        |      || (CASE WHEN doc_id % 13 = 0 THEN chr(1072) ELSE 'a' END)
        |      || '.com' AS host
        |  FROM documents)
        |SELECT CAST(CASE WHEN strlen(host) > length(host) THEN 1 ELSE 0
        |    END AS INT) AS suspicious,
        |  CAST(count(*) AS BIGINT) AS n_hosts
        |FROM h GROUP BY 1""".stripMargin,

    "q290_join_card_est" ->
      """WITH ho AS (SELECT o_custkey // 25 AS bucket, count(*) AS na,
        |    count(DISTINCT o_custkey) AS da
        |  FROM orders GROUP BY 1),
        |hc AS (SELECT c_custkey // 25 AS bucket, count(*) AS nb,
        |    count(DISTINCT c_custkey) AS db
        |  FROM customer GROUP BY 1),
        |act AS (SELECT o_custkey // 25 AS bucket, count(*) AS actual
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT ho.bucket, CAST(na AS BIGINT) AS na,
        |  CAST(nb AS BIGINT) AS nb,
        |  CAST((na * nb) // greatest(da, db) AS BIGINT) AS est,
        |  CAST(coalesce(actual, 0) AS BIGINT) AS actual
        |FROM ho JOIN hc ON hc.bucket = ho.bucket
        |LEFT JOIN act ON act.bucket = ho.bucket""".stripMargin
  )
}
