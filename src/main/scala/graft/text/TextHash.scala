package graft.text

import org.apache.spark.sql.functions.udf

/** Deterministic hashing primitives for dedup/fingerprinting — pure Scala,
  * seeded constants, no RNG state. */
object TextHash {

  /** 64-bit avalanche mix (splitmix64 finalizer) — stable across JVMs. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes. */
  def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Distinct hashed word n-gram shingles of a doc (sorted for determinism). */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val ws = text.split(" ", -1) // keep trailing empties: parity with Spark split + DuckDB string_split
    if (ws.length < n) return Array.emptyLongArray
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i <= ws.length - n) {
      val sb = new StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j)); j += 1
      }
      set.add(fnv1a(sb.toString))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  def shingleHashSetUdf(n: Int) = udf((text: String) => shingleHashes(text, n))

  /** MinHash signature: sig(i) = min over shingles of mix64(shingle ^ seed_i).
    * Doc-local, O(shingles × numHashes). */
  def minhashSignature(text: String, n: Int, numHashes: Int): Array[Long] = {
    val shs = shingleHashes(text, n)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < shs.length) {
      var i = 0
      while (i < numHashes) {
        val h = mix64(shs(s) ^ (0x5851f42d4c957f2dL * (i + 1)))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** One key per band: mix of band index + the band's signature rows. */
  def bandKeys(sig: Array[Long], bands: Int, rows: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix64(b.toLong + 0x9e3779b9L)
      var r = 0
      while (r < rows) { h = mix64(h ^ sig(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Exact Jaccard of two sorted distinct hash arrays (merge intersect). */
  val jaccardUdf = udf((a: Seq[Long], b: Seq[Long]) => {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter).toDouble
  })

  /** 64-bit SimHash over hashed shingles. */
  def simhash(text: String, n: Int): Long = {
    val shs = shingleHashes(text, n)
    val acc = new Array[Int](64)
    var s = 0
    while (s < shs.length) {
      val h = shs(s)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      s += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Split a 64-bit hash into `tables` bit-slices that PARTITION all 64
    * bits (first `64 % tables` slices are one bit wider), keyed by slice
    * index (pigeonhole LSH for hamming search): any two hashes with
    * hamming distance ≤ tables-1 share at least one identical slice. */
  def bitSlices(h: Long, tables: Int): Array[Long] = {
    val base = 64 / tables
    val extra = 64 % tables
    val out = new Array[Long](tables)
    var start = 0
    var t = 0
    while (t < tables) {
      val width = if (t < extra) base + 1 else base
      val mask = if (width == 64) -1L else (1L << width) - 1
      // mix the slice index in so equal slice VALUES in different slice
      // POSITIONS never produce the same key
      out(t) = mix64(((h >>> start) & mask) ^ mix64(t.toLong + 0x51ce5L))
      start += width
      t += 1
    }
    out
  }

  /** Winnowing fingerprints (Schleimer et al. MOSS): Karp–Rabin rolling
    * hash over char k-grams, keep the min hash of each sliding window
    * (rightmost-min rule), dedup. */
  def winnow(text: String, k: Int, window: Int): Array[Long] = {
    if (text.length < k) return Array.emptyLongArray
    val n = text.length - k + 1
    val grams = new Array[Long](n)
    // polynomial rolling hash base 257 mod 2^61-1 (Mersenne)
    val M = (1L << 61) - 1
    val B = 257L
    def mulmod(a: Long, b: Long): Long = {
      // 61-bit Mersenne multiply via 128-bit split
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      val r = (lo & M) + ((lo >>> 61) | (hi << 3))
      if (r >= M) r - M else r
    }
    var pw = 1L
    var i = 0
    while (i < k - 1) { pw = mulmod(pw, B); i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (mulmod(h, B) + text.charAt(i)) % M; i += 1 }
    grams(0) = mix64(h)
    i = 1
    while (i < n) {
      h = (h + M - mulmod(text.charAt(i - 1), pw) % M) % M
      h = (mulmod(h, B) + text.charAt(i + k - 1)) % M
      grams(i) = mix64(h)
      i += 1
    }
    if (n <= window) return Array(grams.min)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var w = 0
    while (w <= n - window) {
      var minIdx = w
      var j = w
      while (j < w + window) {
        if (grams(j) <= grams(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      out.add(grams(minIdx))
      w += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator(); var m = 0
    while (it.hasNext) { res(m) = it.next(); m += 1 }
    res
  }
}
