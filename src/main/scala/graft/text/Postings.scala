package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index posting-list storage: delta + varint (LEB128) encoding
  * of sorted doc-id lists — the compression step between the q106-family
  * postings aggregate and a serving index. Classic IR storage recipe
  * (gap encoding): sorted ids → first id absolute, then positive gaps,
  * each gap as a base-128 varint (7 payload bits per byte, high bit =
  * continuation).
  *
  * 100 TB shape: lists are built per (term, segment) — the segment key
  * (doc_id range shard) bounds every collect_list to one shard's worth of
  * ids, so no single reducer ever materializes a stop-word's full
  * corpus-wide posting list; a serving index merges segment lists lazily,
  * exactly as Lucene-style engines do. Only (term, segment, id) longs
  * shuffle; encoding happens after the aggregate, map-side of the output.
  */
object Postings {

  /** LEB128 varint length of a non-negative value — kept in sync with the
    * encoder by PostingsSpec's exhaustive boundary property. */
  def varintLen(v: Long): Int = {
    require(v >= 0, s"varint is for non-negative values, got $v")
    var n = 1
    var x = v >>> 7
    while (x != 0) { n += 1; x >>>= 7 }
    n
  }

  /** Encode a strictly-increasing id list as first-absolute + varint gaps. */
  def encodeDeltas(ids: Seq[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ids.length * 2)
    var prev = -1L
    var first = true
    ids.foreach { id =>
      require(id >= 0 && (first || id > prev),
        s"posting ids must be non-negative strictly increasing, got $id after $prev")
      var v = if (first) id else id - prev
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
      prev = id
      first = false
    }
    out.toByteArray
  }

  /** Decode an encodeDeltas payload back to the id list; fails loud on a
    * truncated continuation byte (corrupt segment). */
  def decodeDeltas(bytes: Array[Byte]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var p = 0
    var prev = 0L
    var first = true
    while (p < bytes.length) {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        require(p < bytes.length, s"truncated varint at byte $p")
        val b = bytes(p); p += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      val id = if (first) v else prev + v
      out += id
      prev = id
      first = false
    }
    out.result()
  }

  private val encodeUdf = udf((ids: Seq[Long]) => encodeDeltas(ids))
  private val roundtripUdf = udf((ids: Seq[Long]) =>
    decodeDeltas(encodeDeltas(ids)) == ids)

  /** Compressed posting segments from (id, text) docs: tokenize, dedup to
    * (term, segment, id), aggregate each segment's sorted id list, encode.
    * Output per (term, segment): df (distinct docs), first/last id, the
    * encoded byte count, and a decode(encode(ids)) == ids round-trip
    * certificate computed on the REAL bytes — so an oracle that predicts
    * `bytes` from the gap arithmetic certifies the physical encoding, not
    * just the aggregation. */
  def compressedSegments(docs: DataFrame, idCol: String, textCol: String,
                         segmentSize: Long = 128): DataFrame = {
    val postings = docs
      .select(col(idCol).cast("long").as("id"),
        explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .select(col("w"), (col("id") / segmentSize).cast("long").as("seg"), col("id"))
      .distinct()
    postings
      .groupBy("w", "seg")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(col("w"), col("seg"),
        size(col("ids")).cast("long").as("df"),
        element_at(col("ids"), 1).as("first_id"),
        element_at(col("ids"), -1).as("last_id"),
        length(encodeUdf(col("ids"))).cast("long").as("bytes"),
        roundtripUdf(col("ids")).as("roundtrip_ok"))
  }
}
