package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.Pages

/** Round-5 twenty-seventh batch: exact distribution statistics over the
  * crawl — global Moran's I spatial autocorrelation of page density on the
  * modeling grid (the grid-side QA the reference's report layer implies,
  * cf. `src/SurrogateTools` QA reports), the Gini coefficient of domain
  * concentration, and the exact two-sample Kolmogorov–Smirnov distance
  * between language slices. All three reduce a data-sized stream to a
  * support-bounded table before any window, and perform their one division
  * in exact integer arithmetic on the final scalar. */
object EntryRound5aa {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q220_morans_i" -> ((s, dir) => {
      val pts = Pages.geotag(Pages.pages(s, dir))
        .select((col("x") / 500).cast("long").as("cx"),
          (col("y") / 500).cast("long").as("cy"))
      graft.cells.Autocorr.moransI(pts, "cx", "cy", 16, 16)
    }),

    "q221_domain_gini" -> ((s, dir) => {
      val hosts = Pages.pages(s, dir)
        .select(regexp_extract(col("url"), "host(\\d+)\\.", 1)
          .cast("long").as("host"))
      graft.text.Inequality.giniByKey(hosts, "host")
    }),

    "q222_ks_drift" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .where(col("lang").isin("en", "de"))
        .select(size(split(col("text"), " ")).cast("long").as("v"),
          when(col("lang") === "en", 0).otherwise(1).as("slice"))
      graft.text.Inequality.ksTwoSample(docs, "v", "slice")
    })
  )

  def oracles: Map[String, String] = Map(

    "q220_morans_i" ->
      s"""WITH pg AS (${Pages.geotaggedSql}),
         |pts AS (SELECT CAST(floor(x / 500) AS BIGINT) AS cx,
         |               CAST(floor(y / 500) AS BIGINT) AS cy FROM pg),
         |lat AS (SELECT a.g AS cx, b.g AS cy
         |        FROM (SELECT unnest(range(16)) AS g) a,
         |             (SELECT unnest(range(16)) AS g) b),
         |cnt AS (SELECT cx, cy, count(*) AS c FROM pts GROUP BY 1, 2),
         |cells AS (SELECT lat.cx, lat.cy,
         |            CAST(coalesce(cnt.c, 0) AS HUGEINT) AS n
         |          FROM lat LEFT JOIN cnt USING (cx, cy)),
         |tot AS (SELECT CAST(sum(n) AS HUGEINT) AS s,
         |               CAST(count(*) AS HUGEINT) AS nc FROM cells),
         |d AS (SELECT cx, cy, nc * n - s AS d FROM cells, tot),
         |off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
         |                              (0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
         |pairs AS (SELECT a.d AS da, b.d AS db
         |          FROM d a, off, d b
         |          WHERE b.cx = a.cx + off.dx AND b.cy = a.cy + off.dy),
         |agg AS (SELECT CAST(count(*) AS HUGEINT) AS w,
         |               CAST(sum(da * db) AS HUGEINT) AS num FROM pairs),
         |den AS (SELECT CAST(sum(d * d) AS HUGEINT) AS den FROM d)
         |SELECT CAST(nc AS BIGINT) AS n_cells, CAST(w AS BIGINT) AS w_pairs,
         |  CAST(s AS BIGINT) AS n_points,
         |  CAST(CASE WHEN den = 0 OR w = 0 THEN 0
         |       ELSE (1000000 * nc * num) // (w * den) END AS BIGINT)
         |    AS morans_e6
         |FROM tot, agg, den""".stripMargin,

    "q221_domain_gini" -> {
      s"""WITH pg AS (${Pages.pagesSql}),
         |h AS (SELECT CAST(regexp_extract(url, 'host(\\d+)\\.', 1) AS BIGINT)
         |        AS host FROM pg),
         |counts AS (SELECT host, count(*) AS c FROM h GROUP BY 1),
         |g AS (SELECT c, count(*) AS m FROM counts GROUP BY 1),
         |r AS (SELECT c, m,
         |        coalesce(sum(m) OVER (ORDER BY c
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
         |      FROM g),
         |sx AS (SELECT CAST(sum(m) AS BIGINT) AS n,
         |         CAST(sum(c * m) AS BIGINT) AS sx,
         |         CAST(sum(c * (m * r + m * (m + 1) // 2)) AS BIGINT) AS si
         |       FROM r)
         |SELECT n AS n_keys, sx AS n_items,
         |  CAST((1000000 * (2 * si - (n + 1) * sx)) // (n * sx) AS BIGINT)
         |    AS gini_e6
         |FROM sx""".stripMargin
    },

    "q222_ks_drift" ->
      """WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
        |    CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS slice
        |  FROM documents WHERE lang IN ('en', 'de')),
        |byv AS (SELECT v,
        |    sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS c2
        |  FROM d GROUP BY 1),
        |cum AS (SELECT v,
        |    CAST(sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS k1,
        |    CAST(sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS k2
        |  FROM byv),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |               CAST(sum(c2) AS BIGINT) AS n2 FROM byv),
        |gaps AS (SELECT v, abs(k1 * n2 - k2 * n1) AS gap FROM cum, tot),
        |mx AS (SELECT max(gap) AS gap FROM gaps),
        |a AS (SELECT min(v) AS ks_at FROM gaps, mx WHERE gaps.gap = mx.gap)
        |SELECT n1, n2,
        |  CAST((1000000 * mx.gap) // (n1 * n2) AS BIGINT) AS ks_e6,
        |  CAST(ks_at AS BIGINT) AS ks_at
        |FROM tot, mx, a""".stripMargin
  )
}
