package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.fixtures.Pages

/** Round-5 fifty-fourth batch: Jensen–Shannon drift of per-host language
  * mixes between corpus halves (micro-nat quantized, symmetric and
  * bounded unlike raw KL), the dominant-language cell map with win
  * margin, and average neighbor degree (the per-node assortativity
  * signal) over the link graph. */
object EntryRound5bc {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSD(P_host^A || P_host^B): each KL term carries an exact integer
    // ratio inside the ln — P·ln(P/M) = (a/na)·ln(2·a·nb/(a·nb+b·na)) —
    // quantized independently (the cellEntropy construction); zero-count
    // terms contribute exactly 0 and are filtered symmetrically
    "q301_jsd_host_drift" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select((col("doc_id") % 97).as("host"), col("lang"),
          (col("doc_id") % 2).as("half"))
      val c = d.groupBy("host", "lang")
        .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("a"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("b"))
      val w = Window.partitionBy("host")
      val t = c.withColumn("na", sum("a").over(w))
        .withColumn("nb", sum("b").over(w))
      val termP = when(col("a") > 0,
        round(lit(1e6) * (col("a") / col("na")) *
          log((lit(2) * col("a") * col("nb")) /
            (col("a") * col("nb") + col("b") * col("na"))), 0)
          .cast("long")).otherwise(0L)
      val termQ = when(col("b") > 0,
        round(lit(1e6) * (col("b") / col("nb")) *
          log((lit(2) * col("b") * col("na")) /
            (col("a") * col("nb") + col("b") * col("na"))), 0)
          .cast("long")).otherwise(0L)
      t.select(col("host"), col("na"), col("nb"),
          termP.as("tp"), termQ.as("tq"))
        .groupBy("host")
        .agg(max("na").as("n_a"), max("nb").as("n_b"),
          expr("(sum(tp) + sum(tq)) div 2").as("jsd_micro"))
    }),

    // dominant-language map: per 512-cell the winning language, its
    // count, and the margin over the runner-up (0 when monolingual) —
    // two tiny per-cell window functions over the (cell, lang) counts
    "q302_dominant_lang" -> ((s, dir) => {
      val cnt = Pages.geotag(Pages.pages(s, dir))
        .select((col("x") / 512).cast("long").as("ix"),
          (col("y") / 512).cast("long").as("iy"), col("lang"))
        .groupBy("ix", "iy", "lang").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("ix", "iy")
        .orderBy(col("c").desc, col("lang").asc)
      cnt.withColumn("r", row_number().over(w))
        .withColumn("runner", lead("c", 1).over(w))
        .where(col("r") === 1)
        .select(col("ix"), col("iy"), col("lang").as("top_lang"),
          col("c").as("n_top"),
          (col("c") - coalesce(col("runner"), lit(0L))).as("margin"))
    }),

    // average neighbor degree: the per-node form of degree
    // assortativity — hubs attached to hubs vs leaves; one degree join
    // per edge side, exact micro-unit ratio
    "q303_avg_neighbor_degree" -> ((s, dir) => {
      val und = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          explode(array(lit(7919L), lit(15838L), lit(23757L))).as("p"))
        .select((col("doc_id") % 97).as("src"),
          ((col("doc_id") * 31 + col("p")) % 97).as("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a") =!= col("b")).distinct()
        .transform(graft.spark.PersistTracker.persist)
      val deg = und.select(col("a").as("id"))
        .unionAll(und.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .transform(graft.spark.PersistTracker.persist)
      val nbr = und.select(col("a").as("id"), col("b").as("nb"))
        .unionAll(und.select(col("b").as("id"), col("a").as("nb")))
      nbr.join(deg.toDF("nb", "nb_deg"), "nb")
        .groupBy("id").agg(sum("nb_deg").as("sum_nb_deg"))
        .join(deg, "id")
        .select(col("id"), col("deg"), col("sum_nb_deg"),
          expr("(1000000 * sum_nb_deg) div deg").as("and_e6"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q301_jsd_host_drift" ->
      """WITH d AS (SELECT doc_id % 97 AS host, lang, doc_id % 2 AS half
        |  FROM documents),
        |c AS (SELECT host, lang,
        |    sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS b
        |  FROM d GROUP BY 1, 2),
        |t AS (SELECT *, sum(a) OVER (PARTITION BY host) AS na,
        |    sum(b) OVER (PARTITION BY host) AS nb
        |  FROM c),
        |q AS (SELECT host, na, nb,
        |    CASE WHEN a > 0 THEN CAST(round(1e6 * (a / CAST(na AS DOUBLE))
        |      * ln((2 * a * nb) / CAST(a * nb + b * na AS DOUBLE)), 0)
        |      AS BIGINT) ELSE 0 END AS tp,
        |    CASE WHEN b > 0 THEN CAST(round(1e6 * (b / CAST(nb AS DOUBLE))
        |      * ln((2 * b * na) / CAST(a * nb + b * na AS DOUBLE)), 0)
        |      AS BIGINT) ELSE 0 END AS tq
        |  FROM t)
        |SELECT host, CAST(max(na) AS BIGINT) AS n_a,
        |  CAST(max(nb) AS BIGINT) AS n_b,
        |  CAST((sum(tp) + sum(tq)) // 2 AS BIGINT) AS jsd_micro
        |FROM q GROUP BY host""".stripMargin,

    "q302_dominant_lang" ->
      s"""WITH pg AS (${Pages.geotaggedSql}),
         |cnt AS (SELECT CAST(floor(x / 512) AS BIGINT) AS ix,
         |    CAST(floor(y / 512) AS BIGINT) AS iy, lang, count(*) AS c
         |  FROM pg GROUP BY 1, 2, 3),
         |r AS (SELECT *, row_number() OVER w AS r, lead(c) OVER w
         |      AS runner
         |  FROM cnt
         |  WINDOW w AS (PARTITION BY ix, iy ORDER BY c DESC, lang))
         |SELECT ix, iy, lang AS top_lang, CAST(c AS BIGINT) AS n_top,
         |  CAST(c - coalesce(runner, 0) AS BIGINT) AS margin
         |FROM r WHERE r = 1""".stripMargin,

    "q303_avg_neighbor_degree" ->
      """WITH e0 AS (SELECT DISTINCT doc_id % 97 AS a0,
        |    (doc_id * 31 + p) % 97 AS b0
        |  FROM documents, (SELECT unnest([7919, 15838, 23757]) AS p)
        |  WHERE doc_id % 5 <> 0),
        |e AS (SELECT DISTINCT least(a0, b0) AS a, greatest(a0, b0) AS b
        |      FROM e0 WHERE a0 <> b0),
        |deg AS (SELECT id, count(*) AS deg FROM
        |    (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY id),
        |nbr AS (SELECT a AS id, b AS nb FROM e
        |        UNION ALL SELECT b, a FROM e),
        |s AS (SELECT nbr.id, sum(d2.deg) AS sum_nb_deg
        |  FROM nbr JOIN deg d2 ON d2.id = nbr.nb GROUP BY nbr.id)
        |SELECT s.id, CAST(deg.deg AS BIGINT) AS deg,
        |  CAST(sum_nb_deg AS BIGINT) AS sum_nb_deg,
        |  CAST((1000000 * sum_nb_deg) // deg.deg AS BIGINT) AS and_e6
        |FROM s JOIN deg ON deg.id = s.id""".stripMargin
  )
}
