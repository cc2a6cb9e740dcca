package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The span-based shingleHashes must produce EXACTLY the hash values of
  * the string-building form it replaced (fnv1a over the gram string's
  * UTF-8 bytes) — the dedup family's signatures, band keys, and simhash
  * fingerprints all derive from these values. */
class ShingleSpanSpec extends AnyFunSuite {

  /** The original string-building reference implementation. */
  private def reference(text: String, n: Int): Array[Long] = {
    val ws = text.split(" ", -1)
    if (ws.length < n) return Array.emptyLongArray
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i <= ws.length - n) {
      set.add(TextHash.fnv1a(ws.slice(i, i + n).mkString(" ")))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  test("span hashes == string hashes on edge-case and unicode texts") {
    val texts = Seq(
      "", " ", "one", "one two", "a b c d e f g",
      "a  b   c d", " lead", "trail ", "  ",
      "ünïcøde 多字节 mixé bytes here",
      "x " * 500 + "end",
      "repeat repeat repeat repeat repeat")
    for (t <- texts; n <- Seq(1, 2, 3, 5)) {
      assert(TextHash.shingleHashes(t, n).toSeq == reference(t, n).toSeq,
        s"mismatch for text='$t' n=$n")
    }
  }

  test("randomized parity (seeded)") {
    val rnd = new scala.util.Random(0xC0FFEE)
    val vocab = Array("the", "a", "ü", "", "word", "多", "x1", "zz")
    for (_ <- 1 to 300) {
      val t = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val n = 1 + rnd.nextInt(4)
      assert(TextHash.shingleHashes(t, n).toSeq == reference(t, n).toSeq,
        s"mismatch for text='$t' n=$n")
    }
  }
}
