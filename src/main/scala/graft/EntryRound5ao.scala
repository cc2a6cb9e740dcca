package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.fixtures.TpchGeo

/** Round-5 forty-first batch: corpus statistics and index layout — the
  * term frequency-of-frequencies spectrum (the Zipf/Good-Turing input),
  * STR sort-tile-recursive packing of the point table into bbox-tight
  * leaves via distributed two-phase ranks, and the vocabulary-growth
  * curve (Heaps'-law audit: new terms per corpus slice, cumulative). */
object EntryRound5ao {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // frequency of frequencies: how many distinct terms occur exactly k
    // times — two keyed aggregations, the smoothing table every LM /
    // Good-Turing estimator starts from
    "q261_term_spectrum" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .groupBy("freq").agg(count(lit(1)).as("n_terms"))),

    // STR bulk-load layout: orders-derived points into 8 x 8 leaves via
    // exact integer rank arithmetic; emits per-leaf counts and bboxes —
    // the leaf extents a file-skipping scan would prune against. Both
    // rank phases are distributed (range repartition + offset join),
    // never a single-partition sort
    "q262_str_packing" -> ((s, dir) => {
      val pts = TpchGeo.points(s, dir)
      graft.operators.StrPack.pack(pts, "x", "y", "o_orderkey", 8, 8)
        .groupBy("leaf")
        .agg(count(lit(1)).as("n_pts"),
          min(col("x").cast("long")).as("xmin"),
          max(col("x").cast("long")).as("xmax"),
          min(col("y").cast("long")).as("ymin"),
          max(col("y").cast("long")).as("ymax"))
    }),

    // Heaps'-law growth over BIGRAM vocabulary (unigrams saturate in the
    // first docs — bigrams keep appearing): per 10-doc corpus slice, the
    // number of bigrams first seen there and the running vocabulary size
    // (first-occurrence min per bigram, then a window over the tiny
    // ~n/10-row aggregate)
    "q263_vocab_growth" -> ((s, dir) => {
      val tok = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val bg = tok.alias("a").join(tok.alias("b"),
          expr("a.doc_id = b.doc_id AND b.pos = a.pos + 1"))
        .select(col("a.doc_id").as("doc_id"),
          concat(col("a.w"), lit(" "), col("b.w")).as("w"))
      val firsts = bg.groupBy("w").agg(min("doc_id").as("fd"))
      firsts.groupBy(expr("fd div 10").as("bucket"))
        .agg(count(lit(1)).as("new_terms"))
        .withColumn("cum_terms", sum("new_terms").over(Window
          .orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    })
  )

  def oracles: Map[String, String] = Map(

    "q261_term_spectrum" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |c AS (SELECT w, count(*) AS freq FROM t GROUP BY w)
        |SELECT CAST(freq AS BIGINT) AS freq,
        |  CAST(count(*) AS BIGINT) AS n_terms
        |FROM c GROUP BY freq""".stripMargin,

    "q262_str_packing" ->
      s"""WITH pts AS (${TpchGeo.pointsSql}),
         |rx AS (SELECT *, row_number() OVER (ORDER BY x, o_orderkey)
         |         AS r, count(*) OVER () AS n
         |       FROM pts),
         |sl AS (SELECT *, ((r - 1) * 8) // n AS slice FROM rx),
         |ry AS (SELECT *, row_number() OVER (PARTITION BY slice
         |         ORDER BY y, o_orderkey) AS r2,
         |         count(*) OVER (PARTITION BY slice) AS m
         |       FROM sl),
         |lf AS (SELECT *, slice * 8 + ((r2 - 1) * 8) // m AS leaf FROM ry)
         |SELECT CAST(leaf AS BIGINT) AS leaf,
         |  CAST(count(*) AS BIGINT) AS n_pts,
         |  CAST(min(x) AS BIGINT) AS xmin, CAST(max(x) AS BIGINT) AS xmax,
         |  CAST(min(y) AS BIGINT) AS ymin, CAST(max(y) AS BIGINT) AS ymax
         |FROM lf GROUP BY leaf""".stripMargin,

    "q263_vocab_growth" ->
      """WITH tok AS (
        |  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS w
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l
        |        FROM documents)),
        |t AS (SELECT a.doc_id, a.w || ' ' || b.w AS w
        |      FROM tok a JOIN tok b
        |        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |f AS (SELECT w, min(doc_id) AS fd FROM t GROUP BY w),
        |b AS (SELECT fd // 10 AS bucket, count(*) AS new_terms
        |      FROM f GROUP BY 1)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(new_terms AS BIGINT) AS new_terms,
        |  CAST(sum(new_terms) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_terms
        |FROM b""".stripMargin
  )
}
