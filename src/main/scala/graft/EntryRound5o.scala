package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.TpchGeo

/** Round-5 fifteenth batch: coverage topology (shared-edge adjacency),
  * the 2-D Pareto skyline over document signals, and an exact-proportion
  * stratified split — each gated by a closed-form DuckDB oracle. */
object EntryRound5o {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // shared-edge county adjacency: rook neighbors out of the coverage
    // geometry alone (corner contact must NOT pair); the oracle knows
    // the 4×4 layout closed-form, the engine only sees rings
    "q193_county_adjacency" -> ((s, dir) => {
      import graft.operators.Topology
      Topology.edgeAdjacency(TpchGeo.counties(s), "fips", "geom")
        .select(col("id_a").as("fips_a"), col("id_b").as("fips_b"),
          col("n_edges"))
        .orderBy("fips_a", "fips_b")
    }),

    // Pareto frontier over (length, lexical diversity): the documents no
    // other document beats on both axes — salted local skylines, then
    // the exact dominance anti-join on the survivors
    "q194_doc_skyline" -> ((s, dir) => {
      import graft.operators.Skyline
      val d = s.read.parquet(s"$dir/documents.parquet")
      val sig = d.select(col("doc_id"), col("n_chars"),
        size(array_distinct(split(col("text"), " ")))
          .cast("long").as("n_distinct"))
      Skyline.skyline2(sig, "doc_id", "n_chars", "n_distinct")
        .select(col("id").as("doc_id"), col("s1").as("n_chars"),
          col("s2").as("n_distinct"))
        .orderBy("doc_id")
    }),

    // exact-proportion stratified split: per language, EXACTLY
    // floor(70%)/floor(20%)/rest docs into train/val/test, ordered by
    // the portable md5 uniform (q167's character arithmetic) — the
    // contractual-proportions twin of q142's hash-residue gate (which is
    // append-stable but only approximate). Per-stratum window sorts are
    // the price of exactness; q142 is the 10^12-row path.
    "q195_exact_split" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hv = graft.text.WeightedSample.hexValSql("doc_id")
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), expr(hv).as("u"))
      val ranked = d
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("u"), col("doc_id"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      ranked
        .withColumn("split",
          when(col("rn") <= expr("n * 70 div 100"), "train")
            .when(col("rn") <= expr("n * 70 div 100 + n * 20 div 100"),
              "val")
            .otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"))
        .orderBy("lang", "split")
    })
  )

  def oracles: Map[String, String] = Map(

    "q193_county_adjacency" ->
      """WITH cn AS (SELECT i FROM range(16) t(i))
        |SELECT '47' || lpad(CAST(a.i + 1 AS VARCHAR), 3, '0') AS fips_a,
        |  '47' || lpad(CAST(b.i + 1 AS VARCHAR), 3, '0') AS fips_b,
        |  CAST(1 AS BIGINT) AS n_edges
        |FROM cn a JOIN cn b ON a.i < b.i AND
        |  ((abs(a.i % 4 - b.i % 4) = 1 AND a.i // 4 = b.i // 4) OR
        |   (a.i % 4 = b.i % 4 AND abs(a.i // 4 - b.i // 4) = 1))
        |ORDER BY fips_a, fips_b""".stripMargin,

    "q194_doc_skyline" ->
      """WITH tok AS (SELECT doc_id, count(DISTINCT w) AS nd FROM
        |  (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |   FROM documents) GROUP BY doc_id),
        |m AS (SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars,
        |        CAST(t.nd AS BIGINT) AS n_distinct
        |      FROM documents d JOIN tok t USING (doc_id))
        |SELECT a.doc_id, a.n_chars, a.n_distinct FROM m a
        |WHERE NOT EXISTS (SELECT 1 FROM m b
        |  WHERE b.n_chars >= a.n_chars AND b.n_distinct >= a.n_distinct
        |    AND (b.n_chars > a.n_chars OR b.n_distinct > a.n_distinct))
        |ORDER BY a.doc_id""".stripMargin,

    "q195_exact_split" -> {
      val hv = graft.text.WeightedSample.hexValSql("doc_id")
      s"""WITH d AS (SELECT doc_id, lang, $hv AS u FROM documents),
         |r AS (SELECT doc_id, lang,
         |        row_number() OVER (PARTITION BY lang ORDER BY u, doc_id)
         |          AS rn,
         |        count(*) OVER (PARTITION BY lang) AS n FROM d),
         |sp AS (SELECT lang, doc_id,
         |         CASE WHEN rn <= n * 70 // 100 THEN 'train'
         |              WHEN rn <= n * 70 // 100 + n * 20 // 100 THEN 'val'
         |              ELSE 'test' END AS split FROM r)
         |SELECT lang, split, count(*) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM sp GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
    }
  )
}
