package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 fifth batch: real-pixel image thumbnailing, personalized
  * PageRank, SemDeDup semantic near-dup pairs, audio decimation, and
  * chi-square corpus drift — each with a closed-form DuckDB oracle. */
object EntryRound5e {

  /** The q158 link graph: mod-97 closed form (the q150 generator) with
    * self-loops dropped and parallel edges collapsed into integer
    * weights. */
  private def pprEdges(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        explode(array(lit(7919L), lit(15838L), lit(23757L))).as("p"))
      .select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + col("p")) % 97).as("dst"))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // image thumbnailing through the REAL pixel path: genuine 24bpp BMPs
    // (mixed bottom-up / top-down row order) decoded, nearest-neighbor
    // resized to 8x6, re-encoded, RE-PARSED; the oracle predicts the
    // resized gray sum from the synthesis formula and the floor sample
    // mapping, so decode.resize.encode.decode is certified end to end
    "q157_image_resize" -> ((s, dir) => {
      import graft.multimodal.{Containers, MultimodalOps}
      val mkBmp = udf((docId: Long, nChars: Long) => {
        val w = (nChars % 24).toInt + 9
        val h = (docId % 16).toInt + 8
        val st = Containers.Bmp.stride(w, 24)
        val px = new Array[Byte](st * h)
        val topDown = docId % 5 == 0
        var y = 0
        while (y < h) {
          val row = if (topDown) y else h - 1 - y
          var x = 0
          while (x < w) {
            val g = ((docId * 31 + 7L * x + 13L * y) % 256).toByte
            val o = row * st + x * 3
            px(o) = g; px(o + 1) = g; px(o + 2) = g
            x += 1
          }
          y += 1
        }
        Containers.Bmp.write(w, if (topDown) -h else h, px)
      })
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          mkBmp(col("doc_id"), col("n_chars")).as("media"))
      MultimodalOps.resizeBmpFacts(media, "doc_id", "media", wOut = 8, hOut = 6)
        .select(col("id").as("doc_id"), col("out_w"), col("out_h"),
          col("out_bytes"), col("gray_sum"))
        .orderBy("doc_id")
    }),

    // personalized PageRank from a 3-seed trust set over the weighted link
    // graph, 4 passes of exact integer micro-unit arithmetic — the
    // crawl-frontier prioritizer "rank by closeness to trusted hubs"; the
    // oracle replays all 4 passes as chained CTEs, so every div/damping
    // step must match bit for bit
    "q158_personalized_pagerank" -> ((s, dir) =>
      graft.graph.DomainRank.personalizedPageRank(
          pprEdges(s, dir), seeds = Seq(0L, 1L, 2L), iters = 4)
        .orderBy("id")),

    // SemDeDup: embedding corpus (with planted exact duplicates at
    // vec_id+100000 for every vec_id%7==0) -> int8 quantization -> nearest
    // of 256 centroid partitions -> within-cluster cosine >= 0.9 pairs via
    // the integer cross-product test (no all-pairs product: the join is
    // cluster-keyed)
    "q159_semantic_dedup" -> ((s, dir) => {
      import graft.ml.{Quantize, SemDedup}
      val base = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val dups = base.where(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      // the fixture arrives as one small parquet split, which would pin
      // the (per-row expensive) quantize + 256-centroid assignment onto
      // one core and one checkpoint partition; core-count-derived spread
      val q = Quantize.int8(base.unionByName(dups)
            .repartition(s.sparkContext.defaultParallelism, col("vec_id")),
          "vec_id", "embedding")
        .localCheckpoint(true)
      val cents = q.where(col("id") < 256)
        .select(col("id").as("cid"), col("q8").as("cq8"))
      SemDedup.semanticPairs(q, cents, tauMilli = 900)
        .orderBy("cid", "id_a", "id_b")
    }),

    // audio decimation through the REAL byte path: 8-bit mono PCM decoded
    // (junk LIST chunks force a genuine chunk walk), every 4th sample
    // kept, re-encoded at rate/4, re-parsed; the oracle predicts the
    // decimated energy from the synthesis formula at indices 4j
    "q160_wav_resample" -> ((s, dir) => {
      import graft.multimodal.{Containers, MultimodalOps}
      val mkWav = udf((docId: Long, nChars: Long) => {
        val n = ((nChars % 8).toInt + 1) * 64
        val data = new Array[Byte](n)
        var t = 0
        while (t < n) {
          data(t) = ((docId * 7 + 3L * t * t + t) % 256).toByte
          t += 1
        }
        Containers.Wav.write(8000, 1, 8, data,
          junkChunks = (docId % 3).toInt, junkLen = (docId % 5).toInt)
      })
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), mkWav(col("doc_id"), col("n_chars")).as("media"))
      MultimodalOps.resampleWavFacts(media, "doc_id", "media", factor = 4)
        .select(col("id").as("doc_id"), col("n_out"), col("out_rate"),
          col("energy"))
        .orderBy("doc_id")
    }),

    // corpus drift as a per-term Pearson chi-square between the two
    // doc_id-parity slices, quantized to integer micro-units by ONE double
    // rounding per term (the q151 idf discipline) — the significance-test
    // companion to the q133 trending-terms ratio; thresholds bound the
    // output, so there is NO global rank window
    "q161_chisq_drift" -> ((s, dir) =>
      graft.text.Drift.chiSquareTerms(
          s.read.parquet(s"$dir/documents.parquet")
            .select(col("text"), (col("doc_id") % 2).as("slice")),
          "text", "slice", minTotal = 20L, minChiMicro = 500000L)
        .orderBy("w"))
  )

  /** The q158 oracle's pass i: damped inbound sums over pr(i−1) plus the
    * seed-only teleport, every operation the same integer div as the
    * engine's. */
  private def pprRound(i: Int): String =
    s"""c$i AS MATERIALIZED (SELECT ew.dst AS id,
       |    sum((p.pr * ew.w) // ew.ow) AS c
       |  FROM ew JOIN pr${i - 1} p ON ew.src = p.id GROUP BY 1),
       |pr$i AS MATERIALIZED (SELECT n.id,
       |    (CASE WHEN n.id IN (0, 1, 2) THEN 49999999999 ELSE 0 END)
       |    + (85 * CAST(coalesce(c.c, 0) AS BIGINT)) // 100 AS pr
       |  FROM nodes n LEFT JOIN c$i c ON n.id = c.id)""".stripMargin

  def oracles: Map[String, String] = Map(

    "q157_image_resize" ->
      """WITH d AS (SELECT doc_id, (n_chars % 24) + 9 AS w,
        |             (doc_id % 16) + 8 AS h
        |           FROM documents),
        |px AS (SELECT doc_id,
        |    (doc_id * 31 + 7 * ((x.g * w) // 8) + 13 * ((y.g * h) // 6))
        |      % 256 AS g
        |  FROM d, generate_series(0, 7) AS x(g), generate_series(0, 5) AS y(g))
        |SELECT doc_id, CAST(8 AS BIGINT) AS out_w, CAST(6 AS BIGINT) AS out_h,
        |  CAST(198 AS BIGINT) AS out_bytes, CAST(sum(g) AS BIGINT) AS gray_sum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q158_personalized_pagerank" ->
      s"""WITH raw AS (SELECT doc_id % 97 AS src, (doc_id*31 + p) % 97 AS dst
         |  FROM documents, (SELECT unnest([7919, 15838, 23757]) AS p)
         |  WHERE doc_id % 5 <> 0),
         |e AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
         |  FROM raw WHERE src <> dst GROUP BY 1, 2),
         |ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS ow
         |  FROM e GROUP BY 1),
         |ew AS MATERIALIZED (SELECT e.src, e.dst, e.w, ow.ow
         |  FROM e JOIN ow USING (src)),
         |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |pr0 AS MATERIALIZED (SELECT id, CAST(CASE WHEN id IN (0, 1, 2)
         |    THEN 333333333333 ELSE 0 END AS BIGINT) AS pr FROM nodes),
         |${(1 to 4).map(pprRound).mkString(",\n")}
         |SELECT id, CAST(pr AS BIGINT) AS pr FROM pr4 ORDER BY id""".stripMargin,

    "q159_semantic_dedup" ->
      """WITH src AS (SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings
        |  WHERE vec_id % 7 = 0),
        |e AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 127 / greatest(1e-30,
        |      list_max(list_transform(embedding,
        |        y -> abs(CAST(y AS DOUBLE))))) + 0.5) AS INT)) AS q8
        |  FROM src),
        |c AS (SELECT vec_id AS cid, q8 AS cq8 FROM e WHERE vec_id < 256),
        |d AS (SELECT e.vec_id, c.cid,
        |    CAST(list_sum(list_transform(list_zip(e.q8, c.cq8),
        |      z -> CAST(z[1] - z[2] AS BIGINT) *
        |           CAST(z[1] - z[2] AS BIGINT))) AS BIGINT) AS dist
        |  FROM e, c),
        |a0 AS (SELECT vec_id, cid, row_number() OVER
        |         (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |       FROM d),
        |asg AS MATERIALIZED (SELECT vec_id, cid FROM a0 WHERE rn = 1),
        |nrm AS MATERIALIZED (SELECT vec_id, CAST(list_sum(list_transform(q8,
        |    x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS n2 FROM e),
        |p AS (SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(list_sum(list_transform(list_zip(ea.q8, eb.q8),
        |      z -> CAST(z[1] AS BIGINT) * z[2])) AS BIGINT) AS dot,
        |    na.n2 AS na2, nb.n2 AS nb2
        |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  JOIN e ea ON ea.vec_id = a.vec_id
        |  JOIN e eb ON eb.vec_id = b.vec_id
        |  JOIN nrm na ON na.vec_id = a.vec_id
        |  JOIN nrm nb ON nb.vec_id = b.vec_id)
        |SELECT cid, id_a, id_b, dot FROM p
        |WHERE dot >= 0 AND 1000000 * dot * dot >= 810000 * na2 * nb2
        |ORDER BY cid, id_a, id_b""".stripMargin,

    "q160_wav_resample" ->
      """WITH d AS (SELECT doc_id, ((n_chars % 8) + 1) * 64 AS n
        |           FROM documents),
        |idx AS (SELECT doc_id, n,
        |          unnest(generate_series(0, n // 4 - 1)) AS j
        |        FROM d),
        |v AS (SELECT doc_id, n,
        |        (doc_id * 7 + 3 * (4*j) * (4*j) + 4*j) % 256 AS smp
        |      FROM idx)
        |SELECT doc_id, CAST(max(n) // 4 AS BIGINT) AS n_out,
        |  CAST(2000 AS BIGINT) AS out_rate,
        |  CAST(sum((smp - 128) * (smp - 128)) AS BIGINT) AS energy
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q161_chisq_drift" ->
      """WITH t AS (SELECT doc_id % 2 AS slice,
        |             unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |k AS (SELECT w,
        |    CAST(sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM t WHERE w <> '' GROUP BY w),
        |g AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |             CAST(sum(c2) AS BIGINT) AS n2 FROM k),
        |s AS (SELECT w, c1, c2,
        |    CAST(round((1000000.0 * CAST(n1 + n2 AS DOUBLE)
        |      * CAST(c1 * (n2 - c2) - c2 * (n1 - c1) AS DOUBLE)
        |      * CAST(c1 * (n2 - c2) - c2 * (n1 - c1) AS DOUBLE))
        |      / (CAST(c1 + c2 AS DOUBLE) * CAST(n1 + n2 - c1 - c2 AS DOUBLE)
        |         * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) AS BIGINT)
        |      AS chi2_micro
        |  FROM k, g WHERE c1 + c2 >= 20)
        |SELECT w, c1, c2, chi2_micro FROM s
        |WHERE chi2_micro >= 500000 ORDER BY w""".stripMargin
  )
}
