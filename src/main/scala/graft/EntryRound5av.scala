package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 forty-eighth batch: right-to-be-forgotten delete propagation
  * through the snapshot table (copy-on-write, file-granular), frequent
  * consecutive event-type triples (fixed-length sequence mining), and
  * Cohen's kappa agreement between two rule classifiers in exact integer
  * micro-units. */
object EntryRound5av {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // forget user 13: commit the event log, delete the user copy-on-write
    // (only files holding their rows rewrite — require()-gated), then
    // report per-type surviving counts and the CDF-confirmed removals;
    // the oracle recomputes both directly from the raw events
    "q282_forget_user" -> ((s, dir) => {
      val t = new graft.table.SnapshotTable(
        SparkEntry.scratch(s, "forget", dir) + "/" +
          java.util.UUID.randomUUID().toString.take(8))
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .repartitionByRange(8, col("user_id"), col("event_id"))
      val v1 = t.commit(ev, "append", "events")
      val v2 = t.delete(s, col("user_id") === 13L, "forget-13")
      val reused = v2.files.map(_.path).toSet
        .intersect(v1.files.map(_.path).toSet).size
      require(reused >= 1,
        s"copy-on-write delete rewrote every file ($reused reused)")
      val after = t.read(s).groupBy("event_type")
        .agg(count(lit(1)).as("n_after"))
      val removed = t.changes(s, v1.version, v2.version)
        .where(col("_op") === "delete")
        .groupBy("event_type").agg(count(lit(1)).as("n_removed"))
      after.join(removed, Seq("event_type"), "left")
        .select(col("event_type"), col("n_after"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"))
    }),

    // sequence mining, fixed length 3: consecutive event-type triples per
    // user (two leads over one ordered window), support-filtered — the
    // path-pattern table a funnel designer starts from
    "q283_event_triples" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("e1"))
        .withColumn("e2", lead("e1", 1).over(w))
        .withColumn("e3", lead("e1", 2).over(w))
        .where(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
        .where(col("n") >= 3)
    }),

    // label agreement: two deterministic quality rules over documents →
    // confusion counts and Cohen's kappa in exact micro-units
    // (kappa = (N·po − pe) / (N² − pe), all integers; the correlated
    // fixture keeps the numerator positive so div semantics never differ)
    "q284_cohens_kappa" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select((col("n_chars") > 300).as("a"),
          ((col("n_chars") > 280) =!= (col("doc_id") % 20 === 0)).as("b"))
      d.agg(
        count(lit(1)).as("n"),
        sum((col("a") && col("b")).cast("long")).as("n11"),
        sum((col("a") && !col("b")).cast("long")).as("n10"),
        sum((!col("a") && col("b")).cast("long")).as("n01"),
        sum((!col("a") && !col("b")).cast("long")).as("n00"))
        .withColumn("kappa_e6", expr(
          """(1000000 * (n * (n11 + n00)
            |  - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
            |div (n * n
            |  - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))"""
            .stripMargin))
    })
  )

  def oracles: Map[String, String] = Map(

    "q282_forget_user" ->
      """SELECT event_type,
        |  CAST(sum(CASE WHEN user_id <> 13 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_after,
        |  CAST(sum(CASE WHEN user_id = 13 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed
        |FROM events GROUP BY event_type""".stripMargin,

    "q283_event_triples" ->
      """WITH o AS (SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        |FROM o WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3 HAVING count(*) >= 3""".stripMargin,

    "q284_cohens_kappa" ->
      """WITH d AS (SELECT n_chars > 300 AS a,
        |    (n_chars > 280) <> (doc_id % 20 = 0) AS b
        |  FROM documents),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n11,
        |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n10,
        |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n01,
        |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n00
        |  FROM d)
        |SELECT n, n11, n10, n01, n00,
        |  CAST((1000000 * (n * (n11 + n00)
        |      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
        |    // (n * n
        |      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
        |    AS BIGINT) AS kappa_e6
        |FROM c""".stripMargin
  )
}
