package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 second batch: perceptual image hashing + Hamming near-dup,
  * posting-list compression, audio frame energy, and triangle counting —
  * each with a closed-form DuckDB oracle over the driver parquet tables. */
object EntryRound5b {

  /** The synthetic image table shared by q146/q147: every doc becomes a
    * REAL PNG (lossless — decode is bit-exact) whose raster follows the
    * closed-form gray formula, dims varied so the 9×8 dHash sampling grid
    * genuinely subsamples. */
  private def pngTable(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.MultimodalOps
    val mkImg = udf((docId: Long, nChars: Long) =>
      MultimodalOps.encodeTestImage("png", docId,
        (nChars % 24).toInt + 9, (docId % 16).toInt + 8))
    // spread the compute-bound encode across all cores: the shuffle moves
    // 16 bytes/row of metadata, the heavy media bytes are then produced
    // (and consumed by the decode) in place — guide §8's "move the proxy,
    // not the payload", applied before the payload even exists. Without it
    // a single small parquet split serializes every encode+decode.
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), mkImg(col("doc_id"), col("n_chars")).as("media"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // perceptual image fingerprint: decode the real PNG bytes via the JDK
    // reader, sample the 9×8 gradient grid, emit the 64-bit dHash — the
    // map-side reduction an image near-dup pass runs once per image; the
    // oracle re-derives every bit from the synthesis formula, so the hash
    // certifies the decode + sampling + comparison pipeline end to end
    "q146_image_dhash" -> ((s, dir) => {
      import graft.multimodal.ImageHash
      ImageHash.dHashFacts(pngTable(s, dir), "doc_id", "media")
        .select(col("id").as("doc_id"), col("dhash"))
        .orderBy("doc_id")
    }),

    // image near-dup pairs: Hamming ≤ 3 over the dHashes via the
    // pigeonhole band join (4×16-bit slices — any qualifying pair agrees
    // exactly on ≥ 1 slice), the SimHash discipline applied to pixels:
    // bucket equi-join + exact popcount verify, never an all-pairs product
    "q147_image_neardup" -> ((s, dir) => {
      import graft.multimodal.ImageHash
      val hashes = ImageHash.dHashFacts(pngTable(s, dir), "doc_id", "media")
      ImageHash.nearDupPairs(hashes, "id", "dhash", maxHamming = 3, bands = 4)
        .orderBy("id_a", "id_b")
    }),

    // inverted-index storage: delta+varint posting segments per (term,
    // doc-id shard) with a decode∘encode == id round-trip certificate on
    // the real bytes; the oracle predicts the byte count per segment from
    // the gap arithmetic (LEB128 length ladder), so a single byte of
    // drift in the physical encoding breaks the hash match
    "q148_postings_varint" -> ((s, dir) => {
      import graft.text.Postings
      Postings.compressedSegments(
          s.read.parquet(s"$dir/documents.parquet"),
          "doc_id", "text", segmentSize = 128)
        .orderBy("w", "seg")
    }),

    // audio feature extraction: REAL RIFF/WAVE bytes (chunk-walk forced by
    // junk LIST chunks) → per-frame signal energy in exact integer
    // arithmetic — the silence/loudness profile an audio-crawl pipeline
    // computes before any model sees the waveform
    "q149_audio_energy" -> ((s, dir) => {
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
      MultimodalOps.decodeWavFrameEnergy(media, "doc_id", "media", frameLen = 64)
        .orderBy("id", "frame")
    }),

    // crawl-graph community signal: per-domain triangle membership over
    // the closed-form link graph via the degree-ordered node-iterator
    // (out-degree bounded O(√m) ⇒ the wedge self-join survives power-law
    // hubs); oracle = an independent 3-way self-join enumeration
    "q150_link_triangles" -> ((s, dir) => {
      import graft.graph.Triangles
      val edges = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          explode(array(lit(7919L), lit(15838L), lit(23757L))).as("p"))
        .select((col("doc_id") % 97).as("src"),
          ((col("doc_id") * 31 + col("p")) % 97).as("dst"))
      Triangles.perNode(edges)
        .select(col("id"), col("n_tri"))
        .orderBy("id")
    })
  )

  /** The q146/q147 shared oracle CTE chain: re-derives every dHash bit
    * from the synthesis formula — pixel p(i,j) at sample point
    * (i·w/9, j·h/8), bit j·8+i set iff p(i,j) > p(i+1,j); bit 63 folds in
    * as Long.MinValue so the HUGEINT sum casts exactly to the signed 64-bit
    * hash the engine builds with shifts. */
  private val dhashCteSql: String =
    """dims AS (SELECT doc_id, CAST(n_chars % 24 + 9 AS BIGINT) AS w,
      |    CAST(doc_id % 16 + 8 AS BIGINT) AS h FROM documents),
      |b AS (SELECT doc_id, w, h, unnest(generate_series(0, 63)) AS k
      |      FROM dims),
      |c AS (SELECT doc_id, k,
      |    (doc_id*31 + 7*(((k%8)*w)//9) + 13*(((k//8)*h)//8)) % 256 AS p0,
      |    (doc_id*31 + 7*((((k%8)+1)*w)//9) + 13*(((k//8)*h)//8)) % 256
      |      AS p1
      |  FROM b),
      |hb AS (SELECT doc_id, CAST(sum(CASE WHEN p0 > p1 THEN
      |    CASE WHEN k = 63 THEN CAST(-9223372036854775807 - 1 AS HUGEINT)
      |         ELSE CAST(1::BIGINT << CAST(k AS INT) AS HUGEINT) END
      |    ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS dhash
      |  FROM c GROUP BY doc_id)""".stripMargin

  def oracles: Map[String, String] = Map(

    "q146_image_dhash" ->
      s"""WITH $dhashCteSql
         |SELECT doc_id, dhash FROM hb ORDER BY doc_id""".stripMargin,

    "q147_image_neardup" ->
      s"""WITH $dhashCteSql
         |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
         |  CAST(bit_count(xor(x.dhash, y.dhash)) AS INT) AS hamming
         |FROM hb x JOIN hb y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.dhash, y.dhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    // LEB128 length ladder over the gap sequence: first id absolute, then
    // strictly-positive deltas; byte count per value = 1 + ⌊bits/7⌋
    "q148_postings_varint" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |p AS (SELECT DISTINCT w, doc_id // 128 AS seg, doc_id FROM t
        |      WHERE w <> ''),
        |g AS (SELECT w, seg, doc_id,
        |    doc_id - lag(doc_id) OVER (PARTITION BY w, seg ORDER BY doc_id)
        |      AS gap
        |  FROM p),
        |v AS (SELECT w, seg,
        |    CASE WHEN coalesce(gap, doc_id) < 128 THEN 1
        |         WHEN coalesce(gap, doc_id) < 16384 THEN 2
        |         WHEN coalesce(gap, doc_id) < 2097152 THEN 3
        |         WHEN coalesce(gap, doc_id) < 268435456 THEN 4
        |         ELSE 5 END AS nb, doc_id
        |  FROM g)
        |SELECT w, CAST(seg AS BIGINT) AS seg, count(*) AS df,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id,
        |  CAST(sum(nb) AS BIGINT) AS bytes, TRUE AS roundtrip_ok
        |FROM v GROUP BY w, seg ORDER BY w, seg""".stripMargin,

    "q149_audio_energy" ->
      """WITH d AS (SELECT doc_id, (n_chars % 8 + 1) * 64 AS n
        |           FROM documents),
        |t AS (SELECT doc_id, unnest(generate_series(0, n - 1)) AS t FROM d),
        |s AS (SELECT doc_id, t // 64 AS frame,
        |    ((doc_id*7 + 3*t*t + t) % 256) - 128 AS v FROM t)
        |SELECT doc_id AS id, CAST(frame AS BIGINT) AS frame,
        |  CAST(sum(v*v) AS BIGINT) AS energy
        |FROM s GROUP BY 1, 2 ORDER BY id, frame""".stripMargin,

    "q150_link_triangles" ->
      """WITH e0 AS (SELECT DISTINCT doc_id % 97 AS a, (doc_id*31 + p) % 97
        |      AS b
        |  FROM documents, (SELECT unnest([7919, 15838, 23757]) AS p)
        |  WHERE doc_id % 5 <> 0),
        |e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        |      FROM e0 WHERE a <> b),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |m AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
        |      UNION ALL SELECT z FROM tri)
        |SELECT id, count(*) AS n_tri FROM m GROUP BY id
        |ORDER BY id""".stripMargin
  )
}
