package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Round-5 twelfth batch: Bloom-filter file skipping for point lookups,
  * content-defined-chunking dedup, and BPE corpus encoding under the
  * q180-trained vocabulary — each gated by a closed-form DuckDB oracle
  * over the same parquet inputs. */
object EntryRound5l {

  private[graft] val snapSeq = new AtomicLong(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // point lookup on a NON-clustering column through a per-file Bloom
    // index: the table is laid out by n_chars (so doc_id min/max stats
    // are useless), the index is one pass + file-count-sized, and the
    // probe reads ONLY the surviving files — the in-query `require` is
    // the pruning certificate; the oracle checks the looked-up rows
    "q184_bloom_lookup" -> ((s, dir) => {
      import graft.table.BloomIndex
      val root = SparkEntry.scratch(s, s"q184_${snapSeq.incrementAndGet()}", dir)
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .repartition(16, pmod(col("n_chars"), lit(16)))
        .write.mode("overwrite").parquet(root)
      val index = BloomIndex.build(s, root, "doc_id", mbits = 4096, k = 3)
        .transform(graft.spark.PersistTracker.persist)
      import s.implicits._
      val keys = Seq(7L, 12L, 23L, 31L, 44L).toDF("key")
      // candidate paths are file-count bounded (manifest scale) — the
      // collect is the same guarded sink contract as the snapshot reads
      val cand = BloomIndex.candidateFiles(index, keys, 4096, 3)
        .collect().map(_.getString(0))
      val total = index.count()
      require(cand.nonEmpty && cand.length <= total / 2,
        s"bloom index failed to prune: ${cand.length} of $total files survive")
      s.read.parquet(cand: _*)
        .join(broadcast(keys), col("doc_id") === col("key"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // content-defined chunking: prefix-edited copies (id+400000) shift
    // every byte, yet the rolling-hash boundaries resynchronize and the
    // copies still share nearly all chunks — recovered as pairs with
    // >= 3 shared rare chunks; fixed-offset chunking would find none
    "q185_cdc_chunks" -> ((s, dir) => {
      import graft.text.Chunking
      val d = s.read.parquet(s"$dir/documents.parquet")
      val corpus = d.select(col("doc_id"), col("text"))
        .unionByName(d.where(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 400000L).as("doc_id"),
            concat(lit("edit: "), col("text")).as("text")))
        // two small fixture splits would serialize the O(len·w) rolling-
        // hash expressions onto two cores; spread by core count (a real
        // input's many splits make this a no-op choice)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val ch = Chunking.chunks(corpus, "doc_id", "text", w = 16, divisor = 32)
      Chunking.sharedPairs(ch, maxDocFreq = 4, minShared = 3)
        .orderBy("doc_a", "doc_b")
    }),

    // encode the corpus under the q180-trained merges: per document,
    // word count and subword token count — dictionary words cost their
    // merged symbol count, everything else one UNK token. The dict join
    // is vocabulary-sized (broadcast here; a shuffle join at a 100 TB
    // vocabulary), and the oracle replays training AND encoding.
    "q186_bpe_encode" -> ((s, dir) => {
      import graft.text.Bpe
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val (dict, _) = Bpe.train(Bpe.wordDict(docs, "text"), rounds = 3)
      val vocab = dict.select(col("w"),
        size(split(col("syms"), " ")).as("n_sub"))
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .join(broadcast(vocab), Seq("w"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(coalesce(col("n_sub"), lit(1))).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(

    "q184_bloom_lookup" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (7, 12, 23, 31, 44) ORDER BY doc_id""".stripMargin,

    "q185_cdc_chunks" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 400000, 'edit: ' || text FROM documents
        |  WHERE doc_id % 9 = 0),
        |cs AS (SELECT doc_id, text,
        |         list_transform(string_split(text, ''), c -> unicode(c))
        |           AS codes
        |       FROM corpus),
        |bnd AS (SELECT doc_id, text,
        |  list_filter(generate_series(16, len(codes)),
        |    i -> list_reduce(list_slice(codes, i - 15, i),
        |           (a, b) -> (a * 31 + b) % 1000003) % 32 = 0) AS bs,
        |  len(codes) AS n FROM cs),
        |cuts AS (SELECT doc_id, text,
        |  list_concat(list_concat([0], bs), [n]) AS cu FROM bnd),
        |pos AS (SELECT doc_id, text, cu,
        |          unnest(generate_series(2, len(cu))) AS k FROM cuts),
        |ch AS (SELECT DISTINCT doc_id,
        |         md5(substring(text, cu[k-1] + 1, cu[k] - cu[k-1]))
        |           AS chunk_md5
        |       FROM pos WHERE cu[k] > cu[k-1]),
        |rare AS (SELECT doc_id, chunk_md5 FROM
        |  (SELECT doc_id, chunk_md5,
        |     count(*) OVER (PARTITION BY chunk_md5) AS df FROM ch)
        |  WHERE df <= 4)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS shared
        |FROM rare a JOIN rare b USING (chunk_md5)
        |WHERE a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q186_bpe_encode" ->
      s"""${EntryRound5k.bpeDictCtes},
         |${(1 to 3).map(EntryRound5k.bpeRoundSql).mkString(",\n")},
         |vocab AS (SELECT w, len(string_split(syms, ' ')) AS n_sub FROM s3),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM documents)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(coalesce(n_sub, 1)) AS BIGINT) AS n_tokens
         |FROM tok LEFT JOIN vocab USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
