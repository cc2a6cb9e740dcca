package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.fixtures.{Pages, TpchGeo}

/** q300 — the north-star composite: the training-data geography report.
  * One query walks the whole engine: pages → geotag (url metadata) →
  * native cell-encode → cover-cell equi-join + exact PIP verify against
  * the county polygons → per-county corpus health (page volume, exact
  * dup rate via content hash, quality-gate keep rate, language diversity
  * in micro-nats). The oracle re-derives the county assignment in closed
  * form and every metric from the raw tables — the whole pipeline is
  * hash-gated end to end. */
object EntryRound5bb {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q300_geography_report" -> ((s, dir) => {
      import graft.spark.GeoFunctions
      import graft.cells.CellDomain
      val d = CellDomain(0, 0, 8192, 8192)
      val geo = Pages.geotag(Pages.pages(s, dir))
        .withColumn("cell", GeoFunctions.cellEncode(col("x"), col("y"), d, 4))
      val cty = TpchGeo.counties(s)
        .select(col("fips"), col("geom"),
          explode(GeoFunctions.polyCoverCells(col("geom"), d, 4)).as("cell"))
      val pip = org.apache.spark.sql.graft.ExprBridge.column(
        graft.spark.expressions.PointInPolygonStatus(
          org.apache.spark.sql.graft.ExprBridge.expression(
            col("x").cast("double")),
          org.apache.spark.sql.graft.ExprBridge.expression(
            col("y").cast("double")),
          org.apache.spark.sql.graft.ExprBridge.expression(col("geom"))))
      val assigned = geo.join(broadcast(cty), "cell")
        .where(pip === 1)
        .select(col("fips"), col("text"), col("lang"))
        .transform(graft.spark.PersistTracker.persist)
      // exact dup rate: pages whose md5(text) appears > 1x IN THE COUNTY
      val dup = assigned
        .groupBy(col("fips"), md5(col("text")).as("h"))
        .agg(count(lit(1)).as("c"))
        .groupBy("fips")
        .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup"))
      // quality gate: keep docs with >= 60 tokens
      val qual = assigned
        .select(col("fips"),
          (size(split(col("text"), " ")) >= 60).cast("long").as("keep"))
        .groupBy("fips")
        .agg(count(lit(1)).as("n_pages"), sum("keep").as("n_keep"))
      // language diversity: micro-nat entropy per county
      val ent = assigned.groupBy("fips", "lang")
        .agg(count(lit(1)).as("c"))
        .withColumn("n", sum("c").over(Window.partitionBy("fips")))
        .select(col("fips"),
          round(lit(1e6) * (col("c") / col("n")) *
            log(col("n") / col("c")), 0).cast("long").as("term"))
        .groupBy("fips").agg(sum("term").as("ent_micro"),
          count(lit(1)).as("n_langs"))
      qual.join(dup, "fips").join(ent, "fips")
        .select(col("fips"), col("n_pages"),
          expr("(1000000 * n_keep) div n_pages").as("keep_e6"),
          col("n_dup"), col("n_langs"), col("ent_micro"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q300_geography_report" ->
      s"""WITH pg AS (${Pages.geotaggedSql}),
         |a AS (SELECT ${TpchGeo.fipsOfSql("x", "y")} AS fips, text, lang
         |      FROM pg),
         |dup AS (SELECT fips, sum(CASE WHEN c > 1 THEN c ELSE 0 END)
         |      AS n_dup
         |  FROM (SELECT fips, md5(text) AS h, count(*) AS c FROM a
         |        GROUP BY 1, 2) GROUP BY fips),
         |qual AS (SELECT fips, count(*) AS n_pages,
         |    sum(CASE WHEN len(string_split(text, ' ')) >= 60
         |        THEN 1 ELSE 0 END) AS n_keep
         |  FROM a GROUP BY fips),
         |cl AS (SELECT fips, lang, count(*) AS c FROM a GROUP BY 1, 2),
         |ct AS (SELECT fips, lang, c,
         |    sum(c) OVER (PARTITION BY fips) AS n FROM cl),
         |ent AS (SELECT fips,
         |    sum(CAST(round(1e6 * (c / CAST(n AS DOUBLE)) *
         |      ln(n / CAST(c AS DOUBLE)), 0) AS BIGINT)) AS ent_micro,
         |    count(*) AS n_langs
         |  FROM ct GROUP BY fips)
         |SELECT qual.fips, CAST(n_pages AS BIGINT) AS n_pages,
         |  CAST((1000000 * n_keep) // n_pages AS BIGINT) AS keep_e6,
         |  CAST(n_dup AS BIGINT) AS n_dup,
         |  CAST(n_langs AS BIGINT) AS n_langs,
         |  CAST(ent_micro AS BIGINT) AS ent_micro
         |FROM qual JOIN dup ON dup.fips = qual.fips
         |JOIN ent ON ent.fips = qual.fips""".stripMargin
  )
}
