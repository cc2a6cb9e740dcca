package graft.text

/** Aho–Corasick multi-pattern string matching (Aho & Corasick 1975) —
  * the one-pass blocklist/safety scanner: T patterns over N bytes of
  * corpus costs O(N + matches) instead of T regexp passes. The automaton
  * is built once on the driver from the (small) pattern list and shipped
  * to executors as a reference object inside the generated code — the
  * same embedding Spark's own regexp expressions use for their compiled
  * Pattern.
  *
  * Matching is over UTF-16 chars of the lowercased? no — exact
  * case-sensitive chars; counts INCLUDE overlapping occurrences (every
  * pattern occurrence ends somewhere, and every end is reported via the
  * output links).
  */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  // trie over chars: goto/fail/output built with the classic BFS
  private val maxNodes = patterns.map(_.length).sum + 1
  private val next = Array.fill(maxNodes)(Map.empty[Char, Int])
  private val fail = new Array[Int](maxNodes)
  // out(n) = pattern indices ending at node n (own + via fail links)
  private val out = Array.fill(maxNodes)(List.empty[Int])
  private var nNodes = 1

  patterns.zipWithIndex.foreach { case (p, pi) =>
    var cur = 0
    p.foreach { c =>
      next(cur).get(c) match {
        case Some(n) => cur = n
        case None =>
          next(cur) = next(cur).updated(c, nNodes)
          cur = nNodes
          nNodes += 1
      }
    }
    out(cur) = pi :: out(cur)
  }
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach { n => fail(n) = 0; queue.enqueue(n) }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = if (next(f).contains(c) && next(f)(c) != v) next(f)(c) else 0
        out(v) = out(v) ++ out(fail(v))
        queue.enqueue(v)
      }
    }
  }

  /** Per-pattern occurrence counts in `text` (overlaps included). */
  def counts(text: String): Array[Long] = {
    val c = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i)
      while (state != 0 && !next(state).contains(ch)) state = fail(state)
      state = next(state).getOrElse(ch, 0)
      var os = out(state)
      while (os.nonEmpty) { c(os.head) += 1; os = os.tail }
      i += 1
    }
    c
  }
}
