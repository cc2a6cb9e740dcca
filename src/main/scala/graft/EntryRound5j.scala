package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Round-5 tenth batch: the snapshot-lineage audit the north star names
  * explicitly ("per-partition lineage and metrics"), CCNet-style
  * perplexity bucketing over the bigram LM, label-propagation community
  * detection, and the mergeable histogram quantile sketch — each gated by
  * a closed-form DuckDB oracle over the same parquet inputs. */
object EntryRound5j {

  private[graft] val snapSeq = new AtomicLong(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // lineage audit: three staged appends into the snapshot table, read
    // back ENTIRELY from manifests (no data re-scan) — version, stage,
    // operation, per-commit delta and cumulative rows. The require()s are
    // the lineage contract: parent ids chain, and the manifest row count
    // equals the sum of its per-file metrics. The oracle predicts every
    // number from the source table alone, certifying the metrics capture.
    "q176_snapshot_lineage" -> ((s, dir) => {
      import graft.table.SnapshotTable
      val root = SparkEntry.scratch(s, s"q176_${snapSeq.incrementAndGet()}", dir)
      val t = new SnapshotTable(root)
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "lang", "n_chars")
      t.append(d.where(col("lang") === "en"), "ingest_en")
      t.append(d.where(col("lang") =!= "en" && col("doc_id") % 2 === 0),
        "ingest_rest_even")
      t.append(d.where(col("lang") =!= "en" && col("doc_id") % 2 === 1),
        "ingest_rest_odd")
      val snaps = t.snapshots.sortBy(_.version)
      snaps.zipWithIndex.foreach { case (sn, i) =>
        require(sn.rows == sn.files.map(_.rows).sum,
          s"v${sn.version}: manifest rows ${sn.rows} != file metrics sum")
        if (i > 0) require(sn.parentId.contains(snaps(i - 1).id),
          s"v${sn.version}: parent chain broken")
        else require(sn.parentId.isEmpty, "v1 must have no parent")
      }
      val rows = snaps.zipWithIndex.map { case (sn, i) =>
        val prev = if (i == 0) 0L else snaps(i - 1).rows
        (sn.version, sn.stage, sn.operation, sn.rows - prev, sn.rows)
      }
      import s.implicits._
      rows.toDF("version", "stage", "operation", "delta_rows", "cum_rows")
        .orderBy("version")
    }),

    // CCNet-style perplexity filter: score every document under the
    // half-corpus bigram LM (q110's engine-exact integer micro-nats),
    // then bucket head/middle/tail at the exact 33rd/67th percentile of
    // avg_unll — the standard quality gate a pretraining mix applies
    // before sampling. Cuts are a 1-row broadcast; the corpus is scored
    // in one pass. The exact cut is computed over the VALUE HISTOGRAM
    // (exactPercentilesByValue): the only ordered single-partition frame
    // is bounded by the distinct micro-nat values, never the corpus — the
    // round-5 verdict's doc-space global sort is gone while the cut stays
    // EXACT (same ceiling-rank multiset convention, certified value-equal
    // to the row-ranked form by PerplexityCutSpec and by the oracle).
    "q177_perplexity_filter" -> ((s, dir) => {
      import graft.text.{NgramLm, PipelineOps}
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val lm = NgramLm.trainBigram(docs.where(col("doc_id") % 2 === 0), "text")
      val scored = NgramLm.scoreBigram(docs, "doc_id", "text", lm)
        .transform(graft.spark.PersistTracker.persist)
      val cuts = PipelineOps.exactPercentilesByValue(
          scored, "avg_unll", Seq(33, 67))
        .select(col("p33"), col("p67"))
      scored.crossJoin(broadcast(cuts))
        .withColumn("bucket",
          when(col("avg_unll") <= col("p33"), "head")
            .when(col("avg_unll") <= col("p67"), "middle")
            .otherwise("tail"))
        .select(col("id").as("doc_id"), col("n_tokens"), col("avg_unll"),
          col("bucket"))
        .orderBy("doc_id")
    }),

    // label-propagation communities over a closed-form two-block graph
    // (same-parity edges plus a few planted bridges): 4 synchronous
    // deterministic vote rounds, then community sizes — the clustering
    // complement to q47's membership-only connected components
    "q178_label_propagation" -> ((s, dir) => {
      import graft.graph.LabelProp
      val d = s.read.parquet(s"$dir/documents.parquet").select("doc_id")
      val intra = d.select(
        ((col("doc_id") * 13) % 40 * 2 + col("doc_id") % 2).as("src"),
        (((col("doc_id") * 29 + 7) % 40) * 2 + col("doc_id") % 2).as("dst"))
      val bridges = d.where(col("doc_id") % 101 === 0).select(
        ((col("doc_id") * 13) % 40 * 2).as("src"),
        (((col("doc_id") * 29 + 7) % 40) * 2 + 1).as("dst"))
      val labels = LabelProp.propagate(intra.unionByName(bridges), rounds = 4)
      labels
        .join(labels.groupBy("lab").agg(count(lit(1)).as("csize")), "lab")
        .select(col("id"), col("lab"), col("csize"))
        .orderBy("id")
    }),

    // mergeable histogram quantile sketch per language over doc lengths —
    // the bounded-state scale path beside q123's exact percentiles; the
    // oracle replays the identical counter arithmetic, and SketchesSpec
    // property-gates the one-sided < binWidth error vs the exact operator
    "q179_quantile_sketch" -> ((s, dir) => {
      import graft.text.HistQuantile
      val d = s.read.parquet(s"$dir/documents.parquet")
      HistQuantile.quantiles(d, "lang", "n_chars", binWidth = 64L,
          ps = Seq(50, 90, 99))
        .select(col("g").as("lang"), col("n_rows"),
          col("p50_est"), col("p90_est"), col("p99_est"))
        .orderBy("lang")
    })
  )

  def oracles: Map[String, String] = Map(

    "q176_snapshot_lineage" ->
      """WITH c AS (SELECT
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n1,
        |  sum(CASE WHEN lang <> 'en' AND doc_id % 2 = 0 THEN 1 ELSE 0 END)
        |    AS n2,
        |  sum(CASE WHEN lang <> 'en' AND doc_id % 2 = 1 THEN 1 ELSE 0 END)
        |    AS n3
        |FROM documents)
        |SELECT * FROM (
        |  SELECT CAST(1 AS INT) AS version, 'ingest_en' AS stage,
        |    'append' AS operation, CAST(n1 AS BIGINT) AS delta_rows,
        |    CAST(n1 AS BIGINT) AS cum_rows FROM c
        |  UNION ALL
        |  SELECT CAST(2 AS INT), 'ingest_rest_even', 'append',
        |    CAST(n2 AS BIGINT), CAST(n1 + n2 AS BIGINT) FROM c
        |  UNION ALL
        |  SELECT CAST(3 AS INT), 'ingest_rest_odd', 'append',
        |    CAST(n3 AS BIGINT), CAST(n1 + n2 + n3 AS BIGINT) FROM c)
        |ORDER BY version""".stripMargin,

    // q110's engine-exact LM scoring, extended with the ceiling-rank
    // percentile cuts and the head/middle/tail labels
    "q177_perplexity_filter" ->
      """WITH tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
        |ttok AS (SELECT doc_id,
        |           generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS w
        |         FROM (SELECT doc_id, string_split(text, ' ') AS l FROM tr)),
        |uni AS (SELECT w, count(*) AS c FROM ttok GROUP BY 1),
        |nv AS (SELECT (SELECT sum(c) FROM uni) + (SELECT count(*) FROM uni)
        |         AS d),
        |bg AS (SELECT w AS w1,
        |         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |       FROM ttok),
        |pairs AS (SELECT w1, w2, count(*) AS c12 FROM bg
        |          WHERE w2 IS NOT NULL GROUP BY 1, 2),
        |stok AS (SELECT doc_id,
        |           generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS w2
        |         FROM (SELECT doc_id, string_split(text, ' ') AS l
        |               FROM documents)),
        |seq AS (SELECT doc_id, pos, w2,
        |          lag(w2) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
        |        FROM stok),
        |sc AS (SELECT s.doc_id,
        |         CAST(round(-ln(
        |           CASE WHEN s.w1 IS NULL OR u1.c IS NULL
        |                THEN (coalesce(u2.c, 0) + 1) / d
        |                WHEN p.c12 IS NULL
        |                THEN (3 * (coalesce(u2.c, 0) + 1)) / (10 * d)
        |                ELSE (7 * p.c12 * d
        |                      + 3 * u1.c * (coalesce(u2.c, 0) + 1))
        |                     / (10 * u1.c * d)
        |           END) * 1e6, 0) AS BIGINT) AS unll
        |       FROM seq s CROSS JOIN nv
        |       LEFT JOIN uni u1 ON s.w1 = u1.w
        |       LEFT JOIN uni u2 ON s.w2 = u2.w
        |       LEFT JOIN pairs p ON s.w1 = p.w1 AND s.w2 = p.w2),
        |agg AS (SELECT doc_id, count(*) AS n_tokens,
        |          CAST(sum(unll) // count(*) AS BIGINT) AS avg_unll
        |        FROM sc GROUP BY doc_id),
        |r AS (SELECT avg_unll,
        |        row_number() OVER (ORDER BY avg_unll, doc_id) AS rn,
        |        count(*) OVER () AS n FROM agg),
        |cut AS (SELECT
        |    max(CASE WHEN rn = (n * 33 + 99) // 100 THEN avg_unll END)
        |      AS p33,
        |    max(CASE WHEN rn = (n * 67 + 99) // 100 THEN avg_unll END)
        |      AS p67 FROM r)
        |SELECT a.doc_id, a.n_tokens, a.avg_unll,
        |  CASE WHEN a.avg_unll <= c.p33 THEN 'head'
        |       WHEN a.avg_unll <= c.p67 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM agg a CROSS JOIN cut c ORDER BY a.doc_id""".stripMargin,

    // four synchronous vote rounds, (count DESC, label ASC) tie-break —
    // the same total order the engine's min-struct vote encodes
    "q178_label_propagation" ->
      """WITH e0 AS (
        |  SELECT (doc_id * 13) % 40 * 2 + doc_id % 2 AS src,
        |         ((doc_id * 29 + 7) % 40) * 2 + doc_id % 2 AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT (doc_id * 13) % 40 * 2,
        |         ((doc_id * 29 + 7) % 40) * 2 + 1
        |  FROM documents WHERE doc_id % 101 = 0),
        |e1 AS (SELECT src, dst FROM e0 WHERE src <> dst),
        |e AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM e1 UNION ALL SELECT dst, src FROM e1)),
        |l0 AS (SELECT DISTINCT src AS id, src AS lab FROM e),
        |v1 AS (SELECT e.dst AS id, l.lab, count(*) AS c
        |       FROM e JOIN l0 l ON e.src = l.id GROUP BY 1, 2),
        |l1 AS (SELECT id, lab FROM (SELECT id, lab,
        |         row_number() OVER (PARTITION BY id
        |           ORDER BY c DESC, lab ASC) AS rn FROM v1) WHERE rn = 1),
        |v2 AS (SELECT e.dst AS id, l.lab, count(*) AS c
        |       FROM e JOIN l1 l ON e.src = l.id GROUP BY 1, 2),
        |l2 AS (SELECT id, lab FROM (SELECT id, lab,
        |         row_number() OVER (PARTITION BY id
        |           ORDER BY c DESC, lab ASC) AS rn FROM v2) WHERE rn = 1),
        |v3 AS (SELECT e.dst AS id, l.lab, count(*) AS c
        |       FROM e JOIN l2 l ON e.src = l.id GROUP BY 1, 2),
        |l3 AS (SELECT id, lab FROM (SELECT id, lab,
        |         row_number() OVER (PARTITION BY id
        |           ORDER BY c DESC, lab ASC) AS rn FROM v3) WHERE rn = 1),
        |v4 AS (SELECT e.dst AS id, l.lab, count(*) AS c
        |       FROM e JOIN l3 l ON e.src = l.id GROUP BY 1, 2),
        |l4 AS (SELECT id, lab FROM (SELECT id, lab,
        |         row_number() OVER (PARTITION BY id
        |           ORDER BY c DESC, lab ASC) AS rn FROM v4) WHERE rn = 1)
        |SELECT l4.id, CAST(l4.lab AS BIGINT) AS lab,
        |  CAST(cs.csize AS BIGINT) AS csize
        |FROM l4 JOIN (SELECT lab, count(*) AS csize FROM l4 GROUP BY lab) cs
        |  USING (lab)
        |ORDER BY id""".stripMargin,

    "q179_quantile_sketch" ->
      """WITH b AS (SELECT lang AS g, CAST(n_chars AS BIGINT) // 64 AS bin,
        |             count(*) AS c
        |           FROM documents GROUP BY 1, 2),
        |cw AS (SELECT g, bin,
        |         sum(c) OVER (PARTITION BY g ORDER BY bin) AS cum,
        |         sum(c) OVER (PARTITION BY g) AS n FROM b)
        |SELECT g AS lang, CAST(max(n) AS BIGINT) AS n_rows,
        |  CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100
        |    THEN bin * 64 + 63 END) AS BIGINT) AS p50_est,
        |  CAST(min(CASE WHEN cum >= (n * 90 + 99) // 100
        |    THEN bin * 64 + 63 END) AS BIGINT) AS p90_est,
        |  CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100
        |    THEN bin * 64 + 63 END) AS BIGINT) AS p99_est
        |FROM cw GROUP BY g ORDER BY lang""".stripMargin
  )
}
