package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.TextFixtures
import graft.text.{TextOps, PipelineOps}

/** Corpus-cleaning pipeline queries (round 3): paragraph-level dedup,
  * benchmark decontamination, sequence packing, URL canonicalization, and
  * repetition quality signals — the C4/Gopher/CCNet-style passes between
  * raw crawl and training shards. Same oracle discipline as EntryText:
  * every ratio derives from integer counts, every column aliased
  * identically in Spark and SQL. */
object EntryPipeline {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // paragraph-level exact dedup: per-doc (total, globally-first) counts
    "q58_paragraph_dedup" -> ((s, dir) =>
      PipelineOps.paragraphDedupStats(
          TextFixtures.paraCorpus(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_paras"), col("n_kept"))
        .orderBy("doc_id")),

    // test-set leakage: 8-gram collision vs a broadcast benchmark set
    "q59_decontaminate" -> ((s, dir) =>
      PipelineOps.decontaminate(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          TextFixtures.benchmarkNgrams(s, dir), n = 8)
        .select(col("id").as("doc_id"), col("n_hits"),
          col("contaminated").cast("int").as("contaminated"))
        .orderBy("doc_id")),

    // GPT-style concat-and-chop sequence packing (T = 256 tokens)
    "q60_seq_pack" -> ((s, dir) =>
      PipelineOps.packSequences(
          s.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"),
              TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", seqLen = 256)
        .select("doc_id", "n_tokens", "tok_start", "seq_first", "seq_last", "n_seqs")
        .orderBy("doc_id")),

    // URL canonicalization + per-canonical-form dup counts
    "q61_url_canon" -> ((s, dir) => {
      val u = TextFixtures.urlCorpus(s, dir)
        .select(col("doc_id"),
          PipelineOps.canonicalizeUrl(col("url")).as("canon"),
          PipelineOps.urlDomain(col("url")).as("domain"))
      u.withColumn("canon_dups",
          count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("canon")))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition signals over word bigrams (doc-local)
    "q62_repetition" -> ((s, dir) =>
      PipelineOps.repetitionSignals(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bigrams"),
          col("n_distinct_bigrams"), col("top_bigram_cnt"),
          col("dup_bigram_frac"), col("top_bigram_frac"))
        .orderBy("doc_id")),

    // composite C4-style cleaning with first-fail audit: lang → quality →
    // repetition → exact dedup (among survivors) → decontamination
    "q63_clean_corpus" -> ((s, dir) =>
      PipelineOps.cleanCorpusAudit(
          TextFixtures.dupCorpus(s, dir), "doc_id", "text",
          TextFixtures.benchmarkNgrams(s, dir),
          TextFixtures.langProfiles, TextFixtures.qualityStopwords,
          keepLang = "en", minQuality = 0.48, maxDupFrac = 0.06, n = 8)
        .orderBy("stage")),

    // PII scrub: count + redact emails/phones/IPv4s (narrow codegen map)
    "q64_pii_redact" -> ((s, dir) =>
      PipelineOps.redactPii(TextFixtures.piiCorpus(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_emails"), col("n_phones"),
          col("n_ips"), substring(md5(col("redacted")), 1, 16).as("red_fp"))
        .orderBy("doc_id")),

    // multimodal frame sampling: one row per sampled video frame, batch
    // fan-out via mapPartitions (stub codec, real plumbing)
    "q66_frame_sample" -> ((s, dir) => {
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          encode(repeat(col("text"), 8), "UTF-8").as("media"))
      graft.multimodal.MultimodalOps
        .sampleVideoFrames(media, "doc_id", "media", stride = 2)
        .orderBy("id", "frame_idx")
    }),

    // corpus report card: per-language token/char/doc totals (the summary
    // table every dataset builder publishes) — integer sums only
    "q67_corpus_report" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("sum_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang")),

    // deterministic stratified sampling: per-source mixture rates
    "q65_data_mix" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val rate = (substring(col("source"), 4, 10).cast("long") % 3 + 1) * 10
      PipelineOps.deterministicSample(d, "doc_id", rate)
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
        .orderBy("source")
    }),

    // span-level exact substring dedup (Lee et al. 2022): duplicated
    // 7-token windows cut from every occurrence but the globally-first
    "q69_span_dedup" -> ((s, dir) =>
      PipelineOps.spanDedup(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", k = 7)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_removed"),
          col("text_clean"))
        .orderBy("doc_id")),

    // latest-capture-wins per canonical URL (re-crawl snapshots collapse
    // to the newest fetch; id tiebreak on equal timestamps)
    "q70_latest_capture" -> ((s, dir) => {
      val caps = TextFixtures.urlCorpus(s, dir)
        .withColumn("warc_ts",
          to_timestamp(lit(1600000000L) + (col("doc_id") % 19) * 3600L))
      PipelineOps.latestCapture(caps, "doc_id", "url", "warc_ts")
        .select(col("id").as("doc_id"), col("canon_hash"), col("n_captures"),
          col("kept").cast("int").as("kept"))
        .orderBy("doc_id")
    }),

    // real-bytes image decode: every doc becomes a genuine BMP container
    // (24bpp; doc_id%3==0 → ancient BITMAPCOREHEADER, doc_id%5==0 →
    // top-down negative height) parsed back by the real header walk —
    // every output fact recomputed by the oracle from the synthesis
    // formulas, so the parser is checked against the spec, not the writer
    "q75_bmp_meta" -> ((s, dir) => {
      import graft.multimodal.{Containers, MultimodalOps}
      val mkBmp = udf((docId: Long, nChars: Long, text: String) => {
        val w = (nChars % 64).toInt + 1
        val h = (docId % 48).toInt + 1
        val px = new Array[Byte](Containers.Bmp.stride(w, 24) * h)
        val tb = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
        if (tb.nonEmpty) {
          var i = 0
          while (i < px.length) { px(i) = tb(i % tb.length); i += 1 }
        }
        if (docId % 3 == 0) Containers.Bmp.writeCore(w, h, px)
        else Containers.Bmp.write(w, if (docId % 5 == 0) -h else h, px)
      })
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          mkBmp(col("doc_id"), col("n_chars"), col("text")).as("media"))
      MultimodalOps.decodeBmpFacts(media, "doc_id", "media").orderBy("id")
    }),

    // real-bytes audio decode: PCM RIFF/WAVE with junk LIST chunks (odd
    // lengths → even-padding rule) before "data", parsed by the real
    // chunk walk; all facts oracle-recomputed from the synthesis formulas
    "q76_wav_meta" -> ((s, dir) => {
      import graft.multimodal.{Containers, MultimodalOps}
      val mkWav = udf((docId: Long, nChars: Long) => {
        val rate = 8000 + (docId % 5).toInt * 2000
        val channels = 1 + (nChars % 2).toInt
        val bits = 8 * (1 + (docId % 2).toInt)
        val block = channels * bits / 8
        val nSamples = (nChars % 500).toInt + 1
        Containers.Wav.write(rate, channels, bits,
          new Array[Byte](nSamples * block),
          junkChunks = (docId % 3).toInt, junkLen = (docId % 7).toInt)
      })
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), mkWav(col("doc_id"), col("n_chars")).as("media"))
      MultimodalOps.decodeWavFacts(media, "doc_id", "media").orderBy("id")
    })
  )

  /** SQL twin of PipelineOps.canonicalizeUrl/urlDomain as a CTE chain:
    * expects `u(doc_id, url)`, yields `c(doc_id, canon, domain)`. Shared by
    * the q61 and q70 oracles so the two can never drift apart. */
  private val urlCanonChainSql: String =
    """s AS (SELECT doc_id, url, regexp_replace(url, '#.*', '', 'g') AS nofrag FROM u),
      |e AS (SELECT doc_id, url, nofrag,
      |        regexp_extract(nofrag, '^([a-zA-Z]+://[^/]*)', 1) AS shraw
      |      FROM s),
      |r AS (SELECT doc_id, url, shraw,
      |        substr(nofrag, length(shraw) + 1) AS rest FROM e),
      |p AS (SELECT doc_id, url, shraw, rest,
      |        regexp_extract(rest, '^[^?]*', 0) AS path FROM r),
      |q AS (SELECT doc_id, url, shraw, path,
      |        CASE WHEN length(rest) > length(path)
      |             THEN '&' || substr(rest, length(path) + 2) ELSE '' END AS qnorm
      |      FROM p),
      |qc AS (SELECT doc_id, url, shraw, path,
      |         regexp_replace(qnorm, '&(utm_[a-z]+|ref)=[^&]*', '', 'g') AS qclean
      |       FROM q),
      |c AS (SELECT doc_id,
      |        regexp_replace(lower(shraw), ':(80|443)$', '') || path ||
      |        (CASE WHEN length(qclean) > 1 THEN '?' || substr(qclean, 2) ELSE '' END) AS canon,
      |        regexp_replace(
      |          lower(regexp_extract(url, '^[a-zA-Z]+://([^/:]*)', 1)),
      |          '^www\.', '', 'g') AS domain
      |      FROM qc)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q69_span_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |t AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 5)) AS i FROM w),
        |occ AS (SELECT doc_id, i - 1 AS pos,
        |          array_to_string(ws[i:i+6], ' ') AS g FROM t),
        |r AS (SELECT doc_id, pos,
        |        row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
        |        count(*) OVER (PARTITION BY g) AS c
        |      FROM occ),
        |marks AS (SELECT doc_id, pos FROM r WHERE c >= 2 AND rn > 1),
        |cov AS (SELECT DISTINCT doc_id, pos + j AS idx
        |        FROM marks CROSS JOIN range(7) rr(j)),
        |tok AS (SELECT doc_id, unnest(ws) AS tok,
        |          unnest(range(len(ws))) AS idx FROM w),
        |agg AS (SELECT t.doc_id, count(*) AS n_tokens, count(c.idx) AS n_removed,
        |          coalesce(string_agg(CASE WHEN c.idx IS NULL THEN t.tok END,
        |            ' ' ORDER BY t.idx), '') AS text_clean
        |        FROM tok t LEFT JOIN cov c
        |          ON t.doc_id = c.doc_id AND t.idx = c.idx
        |        GROUP BY 1)
        |SELECT doc_id, n_tokens, n_removed, text_clean
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q58_paragraph_dedup" ->
      s"""WITH corpus AS (${TextFixtures.paraCorpusSql}),
         |p AS (SELECT doc_id,
         |        unnest(string_split(text, chr(10)||chr(10))) AS para,
         |        unnest(range(len(string_split(text, chr(10)||chr(10))))) AS idx
         |      FROM corpus),
         |r AS (SELECT doc_id, idx,
         |        row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, idx) AS rn
         |      FROM p)
         |SELECT doc_id, count(*) AS n_paras,
         |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM r GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q59_decontaminate" ->
      s"""WITH b AS (SELECT DISTINCT ngram AS g FROM (${TextFixtures.benchmarkNgramsSql}) bb),
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([array_to_string(ws[i:i+7], ' ') FOR i IN range(1, len(ws) - 6)]) AS g
         |       FROM w),
         |h AS (SELECT doc_id, count(*) AS c FROM sh JOIN b USING (g) GROUP BY 1)
         |SELECT doc_id, CAST(coalesce(h.c, 0) AS BIGINT) AS n_hits,
         |  CAST(CASE WHEN coalesce(h.c, 0) > 0 THEN 1 ELSE 0 END AS INT) AS contaminated
         |FROM documents d LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q60_seq_pack" ->
      """WITH t AS (SELECT doc_id,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |      FROM t)
        |SELECT doc_id, n_tokens, tok_start,
        |  tok_start // 256 AS seq_first,
        |  CASE WHEN n_tokens = 0 THEN tok_start // 256
        |       ELSE (tok_start + n_tokens - 1) // 256 END AS seq_last,
        |  CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
        |       ELSE (tok_start + n_tokens - 1) // 256 - tok_start // 256 + 1
        |       END AS n_seqs
        |FROM c ORDER BY doc_id""".stripMargin,

    "q61_url_canon" ->
      s"""WITH u AS (${TextFixtures.urlCorpusSql}),
         |$urlCanonChainSql
         |SELECT doc_id, canon, domain,
         |  count(*) OVER (PARTITION BY canon) AS canon_dups
         |FROM c ORDER BY doc_id""".stripMargin,

    "q70_latest_capture" ->
      s"""WITH u AS (${TextFixtures.urlCorpusSql}),
         |$urlCanonChainSql,
         |cap AS (SELECT doc_id, canon,
         |          to_timestamp(1600000000 + (doc_id % 19) * 3600) AS ts
         |        FROM c),
         |g AS (SELECT doc_id, md5(canon) AS canon_hash,
         |        count(*) OVER (PARTITION BY canon) AS n_captures,
         |        row_number() OVER (PARTITION BY canon
         |                           ORDER BY ts DESC, doc_id DESC) AS rn
         |      FROM cap)
         |SELECT doc_id, canon_hash, n_captures,
         |  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS kept
         |FROM g ORDER BY doc_id""".stripMargin,

    // LEFT JOIN from documents: a doc with < 2 tokens has no bigram rows in
    // the group chain but must still emit a (0,0,0,0.0,0.0) row (matching
    // repetitionSignals); fixture docs all have >= 10 tokens, the join is
    // for contract robustness
    "q62_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |b AS (SELECT doc_id, [ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))] AS bl FROM w),
        |u AS (SELECT doc_id, unnest(bl) AS bg FROM b),
        |c AS (SELECT doc_id, bg, count(*) AS c FROM u GROUP BY 1, 2),
        |s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |        CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
        |        CAST(max(c) AS BIGINT) AS top_bigram_cnt
        |      FROM c GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(n_bigrams, 0) AS n_bigrams,
        |  coalesce(n_distinct_bigrams, 0) AS n_distinct_bigrams,
        |  coalesce(top_bigram_cnt, 0) AS top_bigram_cnt,
        |  CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0.0
        |       ELSE CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
        |  END AS dup_bigram_frac,
        |  CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0.0
        |       ELSE CAST(top_bigram_cnt AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
        |  END AS top_bigram_frac
        |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q63_clean_corpus" -> {
      val langScores = TextFixtures.langProfiles.zipWithIndex.map {
        case ((lang, words), pos) =>
          s"SELECT doc_id, '$lang' AS lang, $pos AS pos, " +
            s"len(list_filter(string_split(text, ' '), x -> x IN (${
              words.map(w => s"'$w'").mkString(", ")}))) AS score FROM corpus"
      }.mkString("\nUNION ALL ")
      val sw = TextFixtures.qualityStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH corpus AS (${TextFixtures.dupCorpusSql}),
         |ls AS ($langScores),
         |lr AS (SELECT doc_id, lang,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, pos) AS rn
         |       FROM ls),
         |lang AS (SELECT doc_id, lang AS lp FROM lr WHERE rn = 1),
         |qx AS (SELECT doc_id,
         |        CAST(len(list_filter(string_split(text, ' '), x -> x IN ($sw))) AS DOUBLE) AS swc,
         |        CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
         |        CAST(length(text) AS DOUBLE) AS nc
         |      FROM corpus),
         |q AS (SELECT doc_id,
         |        0.5 * (swc / nt) + 0.5 * (1.0 - abs((nc - (nt - 1)) / nt - 5.0) / 10.0) AS quality
         |      FROM qx),
         |bw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
         |bb AS (SELECT doc_id, [ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))] AS bl FROM bw),
         |rep AS (SELECT doc_id,
         |          CASE WHEN len(bl) = 0 THEN 0.0
         |               ELSE CAST(len(bl) - len(list_distinct(bl)) AS DOUBLE) / CAST(len(bl) AS DOUBLE)
         |          END AS df
         |        FROM bb),
         |f AS (SELECT c.doc_id, c.text,
         |        (lang.lp = 'en') AS lang_ok,
         |        (q.quality >= 0.48) AS q_ok,
         |        (rep.df <= 0.06) AS r_ok
         |      FROM corpus c
         |      JOIN lang USING (doc_id) JOIN q USING (doc_id) JOIN rep USING (doc_id)),
         |reps AS (SELECT md5(text) AS th, min(doc_id) AS rid FROM f
         |         WHERE lang_ok AND q_ok AND r_ok GROUP BY 1),
         |d AS (SELECT f.*, (f.doc_id = r.rid) AS dd_ok
         |      FROM f LEFT JOIN reps r ON md5(f.text) = r.th),
         |b8 AS (SELECT DISTINCT ngram AS g FROM (${TextFixtures.benchmarkNgramsSql}) bn),
         |sh8 AS (SELECT DISTINCT doc_id,
         |          unnest([array_to_string(ws[i:i+7], ' ') FOR i IN range(1, len(ws) - 6)]) AS g
         |        FROM bw),
         |h8 AS (SELECT doc_id, count(*) AS c FROM sh8 JOIN b8 USING (g) GROUP BY 1),
         |lab AS (SELECT d.doc_id,
         |          CASE WHEN NOT lang_ok THEN '1_lang'
         |               WHEN NOT q_ok THEN '2_quality'
         |               WHEN NOT r_ok THEN '3_repetition'
         |               WHEN NOT dd_ok THEN '4_exact_dup'
         |               WHEN coalesce(h8.c, 0) > 0 THEN '5_contaminated'
         |               ELSE '6_kept' END AS stage
         |        FROM d LEFT JOIN h8 USING (doc_id))
         |SELECT stage, count(*) AS n_docs FROM lab GROUP BY 1 ORDER BY stage""".stripMargin
    },

    "q64_pii_redact" ->
      s"""WITH corpus AS (${TextFixtures.piiCorpusSql})
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(text, '([0-9]{1,3}\\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
         |  substr(md5(
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_replace(text,
         |          '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
         |        '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
         |      '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g')), 1, 16) AS red_fp
         |FROM corpus ORDER BY doc_id""".stripMargin,

    "q66_frame_sample" ->
      """WITH m AS (SELECT doc_id, repeat(text, 8) AS mt FROM documents),
        |f AS (SELECT doc_id, mt,
        |        unnest(range((length(mt) + 2047) // 2048)) AS frame_idx
        |      FROM m)
        |SELECT doc_id AS id, CAST(frame_idx AS INT) AS frame_idx,
        |  substr(md5(substr(mt, frame_idx * 2048 + 1, 1024)), 1, 16) AS frame_hash
        |FROM f ORDER BY id, frame_idx""".stripMargin,

    "q67_corpus_report" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    "q65_data_mix" ->
      """WITH r AS (SELECT doc_id, source,
        |        (CAST(substr(source, 4) AS BIGINT) % 3 + 1) * 10 AS rate
        |      FROM documents)
        |SELECT source, count(*) AS n_total,
        |  CAST(sum(CASE WHEN (doc_id * 131 + 7) % 100 < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM r GROUP BY 1 ORDER BY source""".stripMargin,

    // q75/q76: the oracle recomputes every header fact from the synthesis
    // formulas — the BMP/WAV bytes themselves are parsed only Spark-side,
    // so a parser that misreads the spec (stride padding, chunk even-pad,
    // core-vs-info header offsets) hash-mismatches here
    "q75_bmp_meta" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    n_chars % 64 + 1 AS w,
        |    doc_id % 48 + 1 AS h,
        |    (((n_chars % 64 + 1) * 24 + 31) // 32) * 4 AS st,
        |    CASE WHEN doc_id % 3 = 0 THEN 12 ELSE 40 END AS hdr,
        |    CASE WHEN doc_id % 3 = 0 THEN 26 ELSE 54 END AS off,
        |    CASE WHEN doc_id % 3 <> 0 AND doc_id % 5 = 0 THEN 1 ELSE 0 END AS td
        |  FROM documents)
        |SELECT doc_id AS id,
        |  CAST(hdr AS BIGINT) AS header_size,
        |  CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(td AS BIGINT) AS top_down,
        |  CAST(24 AS BIGINT) AS bpp,
        |  CAST(st AS BIGINT) AS row_stride,
        |  CAST(off AS BIGINT) AS data_offset,
        |  CAST(st * h AS BIGINT) AS pixel_bytes,
        |  CAST(off + st * h AS BIGINT) AS file_size
        |FROM f ORDER BY id""".stripMargin,

    "q76_wav_meta" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    8000 + (doc_id % 5) * 2000 AS rate,
        |    1 + (n_chars % 2) AS ch,
        |    8 * (1 + (doc_id % 2)) AS bits,
        |    (n_chars % 500) + 1 AS ns,
        |    doc_id % 3 AS junks,
        |    (doc_id % 7) + ((doc_id % 7) % 2) AS junkpad
        |  FROM documents),
        |f AS (SELECT *, ch * bits // 8 AS block FROM p)
        |SELECT doc_id AS id,
        |  CAST(4 + 24 + junks * (8 + junkpad) + 8 + ns * block AS BIGINT) AS riff_len,
        |  CAST(ch AS BIGINT) AS channels,
        |  CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(rate * block AS BIGINT) AS byte_rate,
        |  CAST(block AS BIGINT) AS block_align,
        |  CAST(bits AS BIGINT) AS bits,
        |  CAST(ns * block AS BIGINT) AS data_len,
        |  CAST(ns AS BIGINT) AS n_samples,
        |  CAST(ns * 1000000 // rate AS BIGINT) AS duration_us
        |FROM f ORDER BY id""".stripMargin
  )
}
