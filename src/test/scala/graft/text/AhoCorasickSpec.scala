package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.expressions.LuhnKernel
import org.apache.spark.unsafe.types.UTF8String

class AhoCorasickSpec extends AnyFunSuite {

  /** Naive overlap-inclusive counting by sliding indexOf. */
  private def naive(text: String, p: String): Long = {
    var c = 0L; var i = text.indexOf(p)
    while (i >= 0) { c += 1; i = text.indexOf(p, i + 1) }
    c
  }

  test("counts include overlaps and nested patterns") {
    val ac = new AhoCorasick(Seq("aa", "aaa", "ab"))
    val got = ac.counts("aaaab")
    assert(got.toSeq === Seq(3L, 2L, 1L)) // aa at 0,1,2; aaa at 0,1; ab at 3
  }

  test("matches naive counting on random texts over a small alphabet") {
    val pats = Seq("ab", "ba", "aab", "bb", "abab", "a")
    val ac = new AhoCorasick(pats)
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 50) {
      val t = (1 to 200).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
      val got = ac.counts(t).toSeq
      val exp = pats.map(naive(t, _))
      assert(got === exp, s"text=$t")
    }
  }

  test("pattern sharing a path with another still reports both") {
    val ac = new AhoCorasick(Seq("she", "he", "hers"))
    assert(ac.counts("ushers").toSeq === Seq(1L, 1L, 1L))
  }

  test("Luhn accepts the standard test PANs and rejects perturbations") {
    def v(s: String) = LuhnKernel.valid(UTF8String.fromString(s))
    assert(v("4111111111111111"))          // classic Visa test number
    assert(!v("79927398713"))              // canonical Luhn example, but
                                           // rejected: below 13 digits
    assert(v("4539148803436467"))
    assert(!v("4539148803436468"))         // last digit off by one
    assert(!v("453914880343646a"))         // non-digit
    assert(!v("41111111"))                 // too short
    assert(!v("41111111111111111111"))     // too long (20)
    assert(v("0000000000000"))             // 13 zeros: sum 0, valid
  }
}
