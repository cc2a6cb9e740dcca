package graft.ml

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.TextHash

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — a broadcast nested-loop the
  * optimizer handles well when the query side is small (the common "probe
  * set vs corpus" shape). Scale path: random-hyperplane LSH bucketing —
  * candidates share ≥1 of `tables` hyperplane-sign prefixes, so the
  * cross-join shrinks from |Q|×|C| to bucket-local joins; recall is tuned
  * by tables × hyperplanes-per-table. An IVF variant (k-means-ish coarse
  * quantizer from seeded centroids) gives cluster-pruned search without
  * any training dependency.
  */
object Similarity {

  /** Unwrap Spark's array<float> runtime value to the raw float[] without
    * per-element boxing (ArraySeq.ofFloat wraps one). */
  @inline private def floats(a: Seq[Float]): Array[Float] = a match {
    case s: scala.collection.immutable.ArraySeq.ofFloat => s.unsafeArray
    case s => s.toArray
  }

  /** Sequential-order cosine (dot/(√na·√nb)) — bit-stable across engines. */
  val cosineUdf = udf((as: Seq[Float], bs: Seq[Float]) => {
    val a = floats(as); val b = floats(bs)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // clamp: identical vectors can give 1+ε; cosine is defined on [-1,1]
    math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
  })

  /** Shared cosine kernel — fixed sequential order, bit-stable. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
  }

  /** Brute-force cosine top-k: queries (qid, qvec) × corpus (cid, cvec).
    * The probe set is small by contract: it ships to executors in the task
    * closure; the corpus streams ONCE through mapPartitions keeping a
    * bounded k-heap per query (≤ |Q|·k rows leave each partition — no
    * |Q|×|C| intermediate exists anywhere), then a final windowed top-k
    * merges the per-partition candidates. Deterministic tie-break
    * (cos desc, cid asc) throughout. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 maxProbes: Int = 1 << 16): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    // the probe set ships in the task closure — guard the contract instead
    // of discovering it as a driver OOM; the limit bounds the collect itself
    val collected = queries
      .select(col("qid").cast("long"), col("qvec"))
      .limit(maxProbes + 1)
      .collect()
    require(collected.length <= maxProbes,
      s"cosineTopK probe set exceeds $maxProbes rows — use annLshTopK/annIvfTopK for large query sides")
    val qs: Array[(Long, Array[Float])] = collected
      .map(r => (r.getLong(0), floats(r.getSeq[Float](1))))
      .sortBy(_._1)

    val partials = corpus
      .select(col("cid").cast("long"), col("cvec"))
      .as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        // per-query heap of the k best; head = WORST under (cos desc, cid
        // asc), i.e. max of (-cos, cid) — O(log k) replace
        implicit val dord: Ordering[Double] = Ordering.Double.TotalOrdering
        val ord = Ordering.by[(Double, Long), (Double, Long)] {
          case (cos, cid) => (-cos, cid)
        }
        val heaps = Array.fill(qs.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
        rows.foreach { case (cid, cvecSeq) =>
          val cvec = floats(cvecSeq)
          var qi = 0
          while (qi < qs.length) {
            val (qid, qvec) = qs(qi)
            if (qid != cid) {
              val cos = cosine(qvec, cvec)
              val h = heaps(qi)
              if (h.size < k) h.enqueue((cos, cid))
              else {
                val (wc, wid) = h.head
                if (cos > wc || (cos == wc && cid < wid)) {
                  h.dequeue(); h.enqueue((cos, cid))
                }
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (cos, cid) => (qs(qi)._1, cid, cos) }
        }
      }
      .toDF("qid", "cid", "cos")

    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    partials.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** Hard-negative mining for contrastive training: per anchor, the k
    * most-cosine-similar corpus vectors whose label DIFFERS from the
    * anchor's — "looks alike, isn't" — the standard negative-sampling
    * recipe for retrieval/embedding training. Same single-corpus-pass
    * bounded-heap shape as [[cosineTopK]] (anchors are a guarded
    * broadcast-sized probe set; the corpus streams once per partition;
    * only k rows per anchor survive to the final tiny rank window); the
    * exclusion predicate moves from `qid != cid` to `qlab != clab`,
    * which also excludes the anchor itself. */
  def hardNegativeTopK(anchors: DataFrame, corpus: DataFrame, k: Int,
                       maxProbes: Int = 1 << 16): DataFrame = {
    val spark = anchors.sparkSession
    import spark.implicits._
    val collected = anchors
      .select(col("qid").cast("long"), col("qlab").cast("int"), col("qvec"))
      .limit(maxProbes + 1)
      .collect()
    require(collected.length <= maxProbes,
      s"hardNegativeTopK anchor set exceeds $maxProbes rows — mine per anchor shard instead")
    val qs: Array[(Long, Int, Array[Float])] = collected
      .map(r => (r.getLong(0), r.getInt(1), floats(r.getSeq[Float](2))))
      .sortBy(_._1)

    val partials = corpus
      .select(col("cid").cast("long"), col("clab").cast("int"), col("cvec"))
      .as[(Long, Int, Seq[Float])]
      .mapPartitions { rows =>
        implicit val dord: Ordering[Double] = Ordering.Double.TotalOrdering
        val ord = Ordering.by[(Double, Long), (Double, Long)] {
          case (cos, cid) => (-cos, cid)
        }
        val heaps = Array.fill(qs.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
        rows.foreach { case (cid, clab, cvecSeq) =>
          val cvec = floats(cvecSeq)
          var qi = 0
          while (qi < qs.length) {
            val (_, qlab, qvec) = qs(qi)
            if (qlab != clab) {
              val cos = cosine(qvec, cvec)
              val h = heaps(qi)
              if (h.size < k) h.enqueue((cos, cid))
              else {
                val (wc, wid) = h.head
                if (cos > wc || (cos == wc && cid < wid)) {
                  h.dequeue(); h.enqueue((cos, cid))
                }
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (cos, cid) => (qs(qi)._1, cid, cos) }
        }
      }
      .toDF("qid", "cid", "cos")

    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    partials.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** Hyperplane component matrices are pure functions of (table, planes,
    * dim) — memoized per executor JVM instead of re-hashed per row. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def planeMatrix(table: Int, planes: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((table, planes, dim), { key =>
      val (t, ps, d) = key
      val m = new Array[Double](ps * d)
      var p = 0
      while (p < ps) {
        var i = 0
        while (i < d) {
          // component ~ signed mix of (table, plane, dim): zero-mean
          val h = TextHash.mix64((t.toLong << 40) ^ (p.toLong << 20) ^ i.toLong)
          m(p * d + i) = (h >> 11).toDouble / (1L << 52).toDouble // ~U(-1,1)
          i += 1
        }
        p += 1
      }
      m
    })

  /** Deterministic random hyperplane: seeded pseudo-gaussian components. */
  private def hyperplaneSigns(vecSeq: Seq[Float], table: Int, planes: Int): Long = {
    val vec = floats(vecSeq)
    val m = planeMatrix(table, planes, vec.length)
    var key = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      val off = p * vec.length
      while (i < vec.length) {
        dot += vec(i) * m(off + i)
        i += 1
      }
      if (dot > 0) key |= (1L << p)
      p += 1
    }
    key | (table.toLong << 56)
  }

  def lshKeysUdf(tables: Int, planes: Int) = udf((v: Seq[Float]) =>
    Array.tabulate(tables)(t => hyperplaneSigns(v, t, planes)))

  /** LSH-bucketed ANN top-k: candidates = corpus vectors sharing at least
    * one hyperplane-sign bucket with the query across `tables` tables;
    * exact cosine + top-k on candidates only. Approximate: recall grows
    * with tables; verified ≥ target recall in tests vs brute force. */
  def annLshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 tables: Int = 8, planes: Int = 12): DataFrame = {
    val keys = lshKeysUdf(tables, planes)
    val qB = queries.withColumn("__key", explode(keys(col("qvec"))))
    val cB = corpus.withColumn("__key", explode(keys(col("cvec"))))
    val cands = qB.join(cB, Seq("__key"))
      .where(col("qid") =!= col("cid"))
      .select("qid", "qvec", "cid", "cvec")
      .dropDuplicates("qid", "cid")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    cands.withColumn("cos", cosineUdf(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** Centroid matrices are pure functions of (nlist, dim) — memoized per
    * executor JVM like planeCache, instead of re-hashing nlist×dim mix64
    * calls per row. */
  private val centCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def centroidMatrix(nlist: Int, dim: Int): Array[Double] =
    centCache.computeIfAbsent((nlist, dim), { key =>
      val (n, d) = key
      val m = new Array[Double](n * d)
      var c = 0
      while (c < n) {
        var i = 0
        while (i < d) {
          val h = TextHash.mix64((c.toLong << 32) ^ i.toLong)
          m(c * d + i) = (h >> 11).toDouble / (1L << 52).toDouble
          i += 1
        }
        c += 1
      }
      m
    })

  /** IVF-style coarse quantization: assign vectors to the nearest of
    * `nlist` seeded pseudo-centroids (deterministic, no training pass);
    * search probes the query's `nprobe` nearest centroids' lists only.
    * (`dim` is ignored — centroid components derive from the vector's own
    * length; kept for call-site compatibility.) */
  def ivfAssignUdf(nlist: Int, dim: Int) = udf((vs: Seq[Float]) => {
    val v = floats(vs)
    val m = centroidMatrix(nlist, v.length)
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < nlist) {
      var d = 0.0
      var i = 0
      val off = c * v.length
      while (i < v.length) {
        val diff = v(i) - m(off + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  })

  /** IVF-style ANN top-k: corpus vectors bucketed by nearest pseudo-centroid
    * (one pass, no training); each query probes its `nprobe` nearest
    * centroids' lists only — the cross-join shrinks |Q|×|C| →
    * |Q|×(nprobe/nlist)·|C| on average. Bucketing is an equi-join on the
    * centroid id, so the probe is a hash join, not a nested loop. */
  def annIvfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val dim = 0 // centroids are derived per-dimension from hashes; dim-free
    val assignC = ivfAssignUdf(nlist, dim)
    val probeUdf = udf((v: Seq[Float]) => ivfProbes(floats(v), nlist, nprobe))
    val cB = corpus.withColumn("__list", assignC(col("cvec")))
    val qB = queries.withColumn("__list", explode(probeUdf(col("qvec"))))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    qB.join(cB, Seq("__list"))
      .where(col("qid") =!= col("cid"))
      .withColumn("cos", cosineUdf(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** Per-query recall of an approximate top-k against the brute-force
    * baseline: (qid, n_exact, n_hit). Both inputs are tiny top-k frames
    * (|Q|·k rows) — a left-semi join over (qid, cid) counts hits; queries
    * the approximate pass missed entirely surface with n_hit = 0. This is
    * the quality gate a production ANN job publishes next to its index
    * build (recall@k vs exact on a probe sample). */
  def annRecall(exact: DataFrame, approx: DataFrame): DataFrame = {
    val ex = exact.select(col("qid").cast("long").as("qid"), col("cid"))
    val nEx = ex.groupBy("qid").agg(count(lit(1)).as("n_exact"))
    val nHit = ex
      .join(approx.select(col("qid").cast("long").as("qid"), col("cid")),
        Seq("qid", "cid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hit"))
    nEx.join(nHit, Seq("qid"), "left")
      .select(col("qid"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
  }

  /** The query's nprobe nearest pseudo-centroids (same centroid derivation
    * as ivfAssignUdf). */
  private def ivfProbes(v: Array[Float], nlist: Int, nprobe: Int): Array[Int] = {
    val m = centroidMatrix(nlist, v.length)
    val d2 = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var d = 0.0
      var i = 0
      val off = c * v.length
      while (i < v.length) {
        val diff = v(i) - m(off + i)
        d += diff * diff
        i += 1
      }
      d2(c) = d
      c += 1
    }
    d2.zipWithIndex.sortBy(_._1).take(nprobe).map(_._2)
  }

  /** Embedding near-duplicate pairs: cos ≥ tau via LSH candidates +
    * exact verification (the embedding-cosine near-dup dedup mode).
    * The candidate dedup shuffle carries (id_a, id_b) ONLY — embeddings
    * re-join for verification afterwards (same shape as minHashLshPairs;
    * at 10^9 × 768-dim the id-only exchange is GBs instead of TBs).
    *
    * Skew hardening (`preDedupExact`, default PreCollapse.Probe;
    * Assume skips the probe, Off disables): EXACT-duplicate
    * vectors (re-crawled pages embed identically) collide in every LSH
    * table, making the bucket self-join quadratic in the duplicate count.
    * Identical embeddings collapse to their min-id representative — ONE
    * linear group-by exchange of the corpus — before banding; candidate
    * pairs expand back over the duplicate groups and then ALL go through
    * the same exact cosine verification, so output values are
    * bit-identical to the naive path (identical vectors ⇒ identical LSH
    * keys ⇒ identical candidate coverage). */
  def embeddingNearDupPairs(df: DataFrame, tau: Double,
                            tables: Int = 8, planes: Int = 10,
                            preDedupExact: graft.text.PreCollapse =
                              graft.text.PreCollapse.Probe): DataFrame = {
    val keys = lshKeysUdf(tables, planes)
    val vecs = df.select(col("vec_id"), col("embedding"))
    // tri-state duplicate probe (cheap hash aggregate): a hash collision
    // can only cause a false POSITIVE (runs the collapse and finds no
    // group — harmless); identical vectors always hash equal, so real
    // duplicates are never missed. Assume skips the probe pass entirely
    // (crawl scale), Off is the pure lazy plan.
    val anyDups = preDedupExact match {
      case graft.text.PreCollapse.Off    => false
      case graft.text.PreCollapse.Assume => true
      case graft.text.PreCollapse.Probe =>
        val r = vecs.agg(count(lit(1)),
          count_distinct(xxhash64(col("embedding")))).collect()(0)
        r.getLong(0) != r.getLong(1)
    }
    val candidates =
      if (!anyDups) {
        val b = vecs.withColumn("__key", explode(keys(col("embedding"))))
          .select("vec_id", "__key")
        b.as("a").join(b.as("b"), Seq("__key"))
          .where(col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
          .dropDuplicates("id_a", "id_b")
      } else {
        // grouping on the array VALUE (not a hash of it) keeps the collapse
        // collision-free; the duplicate id list rides as one array per
        // distinct vector — linear, vs the quadratic bucket join it avoids
        val groups = vecs.groupBy("embedding")
          .agg(min("vec_id").as("rep"), collect_list("vec_id").as("__ms"))
          .transform(graft.spark.PersistTracker.persist)
        val b = groups
          .select(col("rep").as("vec_id"), col("embedding"))
          .withColumn("__key", explode(keys(col("embedding"))))
          .select("vec_id", "__key")
        val repPairs = b.as("a").join(b.as("b"), Seq("__key"))
          .where(col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
          .dropDuplicates("id_a", "id_b")
        val members = groups
          .select(col("rep"), explode(col("__ms")).as("member"))
          .transform(graft.spark.PersistTracker.persist)
        // candidate-only expansion (no payload): every expanded pair goes
        // through the exact cosine verification below
        graft.text.TextOps.expandMemberPairs(repPairs, members,
          payload = Nil, intraPayload = Nil)
      }
    candidates
      .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("va")), "id_a")
      .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("vb")), "id_b")
      .withColumn("cos", cosineUdf(col("va"), col("vb")))
      .where(col("cos") >= tau)
      .select("id_a", "id_b", "cos")
  }
}
