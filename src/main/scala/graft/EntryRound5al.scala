package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.{Pages, TpchGeo}

/** Round-5 thirty-eighth batch: the flagship spatial join driven entirely
  * through the SQL front door (cover-cell prefilter + exact PIP verify as
  * a plain spark.sql statement over the registered native kernels), the
  * base-32 geohash key as a codegen expression, and consistent-hash ring
  * sharding with the node-join movement audit (only ~K/n keys may move —
  * the property the ring exists for, checked key-for-key). */
object EntryRound5al {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the q03 semantics authored as SQL: a user migrating srgcreate
    // scripts writes THIS — explode(graft_cover_cells(geom)) builds the
    // equi-join prefilter, graft_cell_encode keys the point side,
    // graft_pip_status(…) = 1 is the exact verify; Catalyst plans the
    // same hash join + codegen kernels as the DataFrame path
    "q252_sql_spatial_join" -> ((s, dir) => {
      graft.spark.SqlFunctions.register(s)
      TpchGeo.points(s, dir).createOrReplaceTempView("q252_pts")
      TpchGeo.counties(s).createOrReplaceTempView("q252_cty")
      s.sql("""
        SELECT c.fips, count(*) AS n_points
        FROM q252_pts p
        JOIN (SELECT fips, geom, explode(graft_cover_cells(
                geom, 0.0D, 0.0D, 8192.0D, 8192.0D, 4)) AS cell
              FROM q252_cty) c
          ON graft_cell_encode(p.x, p.y, 0.0D, 0.0D, 8192.0D, 8192.0D, 4)
               = c.cell
         AND graft_pip_status(p.x, p.y, c.geom) = 1
        GROUP BY c.fips""")
    }),

    // lon-lat shard keys: geotag coords mapped onto exact dyadic lon/lat
    // (360/2^13 and 180/2^13 per lattice unit — no float ambiguity), then
    // the codegen geohash at precision 5; the oracle re-derives all 25
    // bits with integer morton arithmetic and the base-32 alphabet
    "q253_geohash_keys" -> ((s, dir) => {
      val geo = Pages.geotag(Pages.pages(s, dir))
        .withColumn("lon", (col("x") - 4000d) * lit(0.0439453125))
        .withColumn("lat", (col("y") - 4000d) * lit(0.02197265625))
      geo.select(
          graft.spark.GeoFunctions.geohash(col("lon"), col("lat"), 5)
            .as("gh"))
        .groupBy("gh").agg(count(lit(1)).as("n_pages"))
    }),

    // consistent-hash ring resharding audit: assign the 97 crawl hosts on
    // a 12-node ring (16 vnodes each), add a 13th node, report each
    // host's before/after shard and whether it moved — the broadcast-ring
    // join pattern that scales to 10^9 keys with zero key-side shuffle
    "q254_hashring_reshard" -> ((s, dir) => {
      import graft.operators.HashRing
      val hosts = s.read.parquet(s"$dir/documents.parquet")
        .select((col("doc_id") % 97).as("host")).distinct()
      val before = HashRing.assign(hosts, "host", HashRing.ring(s, 12, 16))
        .withColumnRenamed("node", "node_before")
      val after = HashRing.assign(hosts, "host", HashRing.ring(s, 13, 16))
        .select(col("host"), col("node").as("node_after"))
      before.join(after, "host")
        .select(col("host"), col("khash"), col("node_before"),
          col("node_after"),
          (col("node_before") =!= col("node_after")).cast("int").as("moved"))
    })
  )

  /** 13-bit / 12-bit morton spreads for the geohash oracle. */
  private def morton(col: String, bits: Int): String =
    (0 until bits).map { m =>
      if (m == 0) s"($col & 1)" else s"(($col & ${1L << m}) << $m)"
    }.mkString(" | ")

  def oracles: Map[String, String] = Map(

    "q252_sql_spatial_join" ->
      s"""WITH pts AS (${TpchGeo.pointsSql})
         |SELECT ${TpchGeo.fipsOfSql("x", "y")} AS fips,
         |  CAST(count(*) AS BIGINT) AS n_points
         |FROM pts GROUP BY 1""".stripMargin,

    "q253_geohash_keys" ->
      s"""WITH pg AS (${Pages.geotaggedSql}),
         |i AS (SELECT CAST(floor(x) AS BIGINT) + 96 AS ix,
         |        (CAST(floor(y) AS BIGINT) + 96) // 2 AS iy
         |      FROM pg),
         |m AS (SELECT (${morton("ix", 13)}) AS mx,
         |             (${morton("iy", 12)}) AS my
         |      FROM i),
         |v AS (SELECT mx | (my << 1) AS v FROM m),
         |g AS (SELECT
         |    substr('0123456789bcdefghjkmnpqrstuvwxyz',
         |      CAST(((v >> 20) & 31) + 1 AS INT), 1) ||
         |    substr('0123456789bcdefghjkmnpqrstuvwxyz',
         |      CAST(((v >> 15) & 31) + 1 AS INT), 1) ||
         |    substr('0123456789bcdefghjkmnpqrstuvwxyz',
         |      CAST(((v >> 10) & 31) + 1 AS INT), 1) ||
         |    substr('0123456789bcdefghjkmnpqrstuvwxyz',
         |      CAST(((v >> 5) & 31) + 1 AS INT), 1) ||
         |    substr('0123456789bcdefghjkmnpqrstuvwxyz',
         |      CAST((v & 31) + 1 AS INT), 1) AS gh
         |  FROM v)
         |SELECT gh, CAST(count(*) AS BIGINT) AS n_pages
         |FROM g GROUP BY gh""".stripMargin,

    "q254_hashring_reshard" ->
      """WITH hosts AS (SELECT DISTINCT doc_id % 97 AS host FROM documents),
        |k AS (SELECT host, (host * 2654435761) % 4294967296 AS khash
        |      FROM hosts),
        |r12 AS (SELECT i // 16 AS node,
        |    ((i * 7919 + 13) * 2654435761) % 4294967296 AS vhash
        |  FROM range(192) t(i)),
        |r13 AS (SELECT i // 16 AS node,
        |    ((i * 7919 + 13) * 2654435761) % 4294967296 AS vhash
        |  FROM range(208) t(i)),
        |a12 AS (SELECT k.host, k.khash,
        |    coalesce(
        |      (SELECT arg_min(node, vhash * 65536 + node) FROM r12
        |       WHERE vhash >= k.khash),
        |      (SELECT arg_min(node, vhash * 65536 + node) FROM r12))
        |      AS node_before
        |  FROM k),
        |a13 AS (SELECT k.host,
        |    coalesce(
        |      (SELECT arg_min(node, vhash * 65536 + node) FROM r13
        |       WHERE vhash >= k.khash),
        |      (SELECT arg_min(node, vhash * 65536 + node) FROM r13))
        |      AS node_after
        |  FROM k)
        |SELECT a12.host, CAST(a12.khash AS BIGINT) AS khash,
        |  CAST(node_before AS BIGINT) AS node_before,
        |  CAST(node_after AS BIGINT) AS node_after,
        |  CAST(CASE WHEN node_before <> node_after THEN 1 ELSE 0 END AS INT)
        |    AS moved
        |FROM a12 JOIN a13 ON a13.host = a12.host""".stripMargin
  )
}
