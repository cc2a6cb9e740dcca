package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong
import graft.fixtures.TpchGeo
import graft.fixtures.TpchGeo.{domain, zres}

/** Round-5 eighteenth batch: the multi-resolution adaptive cell-cover
  * join under an oracle gate, and snapshot retention GC (expire +
  * reference-counted file deletion) with a read-back certificate. */
object EntryRound5r {

  private[graft] val snapSeq = new AtomicLong(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MIXED-SIZE polygon layer (a domain-wide "state", 2 tiny "cities",
    // the 16 counties) through the ADAPTIVE cover join: the state emits
    // a few COARSE cells instead of 256 fine ones (bounded explode), the
    // cities emit fine cells, points probe their ancestor chain — one
    // equi-join either way. City bounds sit on .5 offsets so no integer
    // point lies on a boundary (vertex/edge semantics stay out of play).
    "q200_adaptive_pip" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.SpatialJoin
      val mixed = TpchGeo.counties(s)
        .select(col("fips").as("pid"), col("geom"))
        .unionByName(Seq(
          ("STATE", Seq(Seq(0.0, 0, 8000, 0, 8000, 8000, 0, 8000))),
          ("CITY1", Seq(Seq(1200.5, 1200.5, 1399.5, 1200.5,
            1399.5, 1399.5, 1200.5, 1399.5))),
          ("CITY2", Seq(Seq(6100.5, 5100.5, 6220.5, 5100.5,
            6220.5, 5220.5, 6100.5, 5220.5)))
        ).toDF("pid", "geom"))
      SpatialJoin.pointInPolyAdaptive(TpchGeo.points(s, dir), mixed,
          domain, maxRes = zres)
        .groupBy("pid").agg(count(lit(1)).as("n_points"))
        .orderBy("pid")
    }),

    // snapshot retention GC: 3 versions (append → merge → compact),
    // expire all but the last 2 — the expired version must raise, both
    // retained versions must read back exactly, and copy-on-write files
    // shared into retained manifests must survive the deletion pass
    // (Iceberg's reachability rule). The emitted rows are the retained
    // versions' aggregates, each predicted from the source table.
    "q201_snapshot_expire" -> ((s, dir) => {
      import graft.table.SnapshotTable
      val root = SparkEntry.scratch(s, s"q201_${snapSeq.incrementAndGet()}", dir)
      val t = new SnapshotTable(root)
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "lang", "n_chars")
      t.append(docs.repartition(8, col("doc_id")), "base")
      val upd = docs.where(col("doc_id") % 11 === 0)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") * 2).as("n_chars"))
      val v2 = t.merge(s, upd, "doc_id").version
      val v3 = t.compact(s, numFiles = 2).version
      val expired = t.expireSnapshots(keepLast = 2)
      require(expired == Seq(1), s"expected to expire v1 only: $expired")
      val gone =
        try { t.readAt(s, 1); false } catch { case _: Throwable => true }
      require(gone, "time travel to the expired v1 must fail loudly")
      def agg(v: Int): DataFrame = t.readAt(s, v)
        .groupBy("lang").agg(count(lit(1)).as("n"),
          sum("n_chars").as("sum_chars"))
        .withColumn("version", lit(v))
      val out = agg(v2).unionByName(agg(v3))
      // v2 (merge) and v3 (compact) hold identical rows — the compact
      // rewrite and the expiry's reference-counting must both preserve them
      out.select("version", "lang", "n", "sum_chars")
        .orderBy("version", "lang")
    })
  )

  def oracles: Map[String, String] = Map(

    "q200_adaptive_pip" ->
      s"""WITH pts AS (${TpchGeo.pointsSql}),
         |cn AS (${TpchGeo.countiesSql}),
         |m AS (
         |  SELECT 'STATE' AS pid, 0.0 AS x0, 0.0 AS y0,
         |         8000.0 AS x1, 8000.0 AS y1
         |  UNION ALL SELECT 'CITY1', 1200.5, 1200.5, 1399.5, 1399.5
         |  UNION ALL SELECT 'CITY2', 6100.5, 5100.5, 6220.5, 5220.5
         |  UNION ALL SELECT fips, cx0, cy0, cx0 + 2000, cy0 + 2000 FROM cn)
         |SELECT pid, count(*) AS n_points
         |FROM pts JOIN m ON x > x0 AND x < x1 AND y > y0 AND y < y1
         |GROUP BY pid ORDER BY pid""".stripMargin,

    "q201_snapshot_expire" ->
      """WITH v2 AS (SELECT doc_id, lang,
        |    CASE WHEN doc_id % 11 = 0 THEN n_chars * 2
        |         ELSE n_chars END AS n_chars
        |  FROM documents),
        |a AS (SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT)
        |        AS sum_chars FROM v2 GROUP BY 1)
        |SELECT CAST(2 AS INT) AS version, lang, n, sum_chars FROM a
        |UNION ALL
        |SELECT CAST(3 AS INT), lang, n, sum_chars FROM a
        |ORDER BY version, lang""".stripMargin
  )
}
