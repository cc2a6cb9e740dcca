package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.{Pages, TpchGeo}
import graft.fixtures.TpchGeo.{grid, domain, zres}
import graft.operators.{Surrogate, SpatialJoin}

/** The north-star page pipeline: Common-Crawl-style `pages(url, warc_ts,
  * html, text, lang)` → batched geotag (cell-encode) → spatial join to
  * county polygons → surrogate ratio table; plus the byte-fidelity
  * invariant (text/html unchanged per url through every shuffle). */
object EntryPages {

  private val streamSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- the flagship surrogate through STRUCTURED STREAMING: pages arrive
    // as an unbounded stream (two micro-batches here), the SAME geotag +
    // spatial join + one-pass (fips, cell) aggregation runs incrementally
    // in complete mode, and the batch ratio tail joins the streamed state —
    // one codepath, driver-gated against the q21 batch oracle.
    "q57_pages_srg_stream" -> ((s, dir) => {
      import s.implicits._
      import graft.spark.GeoFunctions._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val pages = Pages.pages(s, dir)
      val mem = MemoryStream[String](s)
      val qname = s"q57_percell_${streamSeq.incrementAndGet()}"
      val onGrid = inGrid(gridCol(col("x"), grid), gridRow(col("y"), grid), grid)
      val perCell = SpatialJoin.pointInPoly(Pages.geotag(mem.toDF().toDF("url")),
          TpchGeo.counties(s), domain, zres)
        .withColumn("col", when(onGrid, gridCol(col("x"), grid)))
        .withColumn("row", when(onGrid, gridRow(col("y"), grid)))
        .groupBy("fips", "col", "row")
        .agg(count(lit(1)).cast("double").as("numer"))
      val q = perCell.writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      val urls = pages.select("url").collect().map(_.getString(0))
      val (first, second) = urls.splitAt(urls.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      // the memory sink's view pins attribute ids, which breaks the
      // numer⋈denom self-join — materialize the (tiny) streamed aggregate
      // into fresh local relations per side
      def fresh() = s.createDataFrame(
        java.util.Arrays.asList(s.table(qname).collect(): _*),
        s.table(qname).schema)
      val denom = fresh().groupBy("fips").agg(sum("numer").as("denom"))
      val out = Surrogate.ratio(
        fresh().where(col("col").isNotNull && col("row").isNotNull), denom, 300)
      q.stop()
      out
    }),

    // flagship: page-count surrogate (srgcreate count mode over pages)
    "q21_pages_srg" -> ((s, dir) =>
      Surrogate.pointSurrogate(Pages.geotag(Pages.pages(s, dir)),
        TpchGeo.counties(s), grid, domain, zres, srgCode = 300)),

    // byte-identical text/html per url THROUGH a spatial join + forced
    // wide shuffle — the per-row invariant of the north rule, checked
    // against an engine that never shuffled (DuckDB)
    "q22_pages_fidelity" -> ((s, dir) =>
      SpatialJoin.pointInPoly(Pages.geotag(Pages.pages(s, dir)),
          TpchGeo.counties(s), domain, zres)
        .repartition(16, col("fips"))   // explicit exchange on a hot key
        .select(col("url"), col("fips"),
          unix_timestamp(col("warc_ts")).as("warc_epoch"),
          md5(col("text")).as("text_md5"),
          md5(col("html")).as("html_md5"),
          length(col("html")).as("html_bytes"),
          col("lang"))
        .orderBy("url")),

    // per-cell page tiles: the tile-assignment output (geotag → cell id),
    // carrying lang breakdown — a groupBy over the batched cell-encode
    "q23_pages_tiles" -> ((s, dir) => {
      import graft.spark.GeoFunctions._
      Pages.geotag(Pages.pages(s, dir))
        .withColumn("col", gridCol(col("x"), grid))
        .withColumn("row", gridRow(col("y"), grid))
        .groupBy("col", "row", "lang")
        .agg(count(lit(1)).as("n_pages"),
             sum(length(col("html")).cast("bigint")).as("html_bytes"))
        .orderBy("row", "col", "lang")
    })
  )

  private[graft] def srgSelect(code: Int): String =
    s"""SELECT CAST($code AS INT) AS srg_code, fips, col, "row",
       |  numer/denom AS frac, numer, denom,
       |  sum(numer/denom) OVER (PARTITION BY fips ORDER BY "row", col) AS qasum
       |FROM num JOIN den USING (fips)
       |WHERE denom >= 0.00001 AND numer <> 0
       |ORDER BY fips, "row", col""".stripMargin

  private lazy val pagesSrgOracle: String =
    s"""WITH pg AS (${Pages.geotaggedSql}),
       |tagged AS (SELECT ${TpchGeo.fipsOfSql("x", "y")} AS fips,
       |  CAST(floor(x/1000.0) AS INT)+1 AS col,
       |  CAST(floor(y/1000.0) AS INT)+1 AS "row" FROM pg),
       |num AS (SELECT fips, col, "row", CAST(count(*) AS DOUBLE) AS numer
       |        FROM tagged GROUP BY 1, 2, 3),
       |den AS (SELECT fips, CAST(count(*) AS DOUBLE) AS denom
       |        FROM tagged GROUP BY 1)
       |${srgSelect(300)}""".stripMargin

  def oracles: Map[String, String] = Map(
    "q21_pages_srg" -> pagesSrgOracle,

    // the streaming twin must land on the SAME table as the batch oracle
    "q57_pages_srg_stream" -> pagesSrgOracle,

    "q22_pages_fidelity" ->
      s"""WITH pg AS (${Pages.geotaggedSql})
         |SELECT url, ${TpchGeo.fipsOfSql("x", "y")} AS fips,
         |  CAST(epoch(warc_ts) AS BIGINT) AS warc_epoch,
         |  md5(text) AS text_md5,
         |  md5(decode(html)) AS html_md5,
         |  CAST(octet_length(html) AS INT) AS html_bytes,
         |  lang
         |FROM pg ORDER BY url""".stripMargin,

    "q23_pages_tiles" ->
      s"""WITH pg AS (${Pages.geotaggedSql})
         |SELECT CAST(floor(x/1000.0) AS INT)+1 AS col,
         |  CAST(floor(y/1000.0) AS INT)+1 AS "row", lang,
         |  count(*) AS n_pages,
         |  CAST(sum(octet_length(html)) AS BIGINT) AS html_bytes
         |FROM pg GROUP BY 1, 2, 3 ORDER BY "row", col, lang""".stripMargin
  )
}
