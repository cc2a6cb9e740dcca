package graft.functions

/** The SurrogateTool merge-function grammar (merge/EquationParser.java,
  * merge/Equation.java:19-25; docs SA_ch05_surrogate.md:356-364,440-450):
  *
  *   weighted merge:   `0.5*Housing Change+0.5*Population`
  *                     (max 2 weighted terms, like MergeCounties.java:55-57)
  *   concatenation:    `Population[USA];Population[MEXICO]`
  *                     (`;`-separated surrogate references)
  *   region suffix:    `Name[REGION]` — parsed and carried; a single-region
  *                     engine run resolves by name only
  *
  * External `file|name` references are out of scope (binary SMOKE files are
  * read through io.Smoke.parse instead). */
object MergeEquation {

  /** One surrogate reference: display name + optional region. */
  final case class Ref(name: String, region: Option[String]) {
    override def toString: String = region.fold(name)(r => s"$name[$r]")
  }

  sealed trait Equation
  /** f1*srg1 + f2*srg2 (1 or 2 terms). */
  final case class Weighted(terms: Seq[(Double, Ref)]) extends Equation
  /** srgA;srgB;… concatenation. */
  final case class Concat(refs: Seq[Ref]) extends Equation

  private def parseRef(s: String): Ref = {
    val t = s.trim
    require(t.nonEmpty, "empty surrogate reference in merge function")
    require(!t.contains("|"),
      s"external file|name merge references not supported: '$t'")
    val b = t.indexOf('[')
    if (b >= 0) {
      require(t.endsWith("]"), s"unbalanced region bracket in '$t'")
      Ref(t.substring(0, b).trim, Some(t.substring(b + 1, t.length - 1).trim))
    } else Ref(t, None)
  }

  /** Parse a MERGE FUNCTION cell. `;` ⇒ concatenation; otherwise 1-2
    * `coefficient*name` terms joined by `+`. */
  def parse(s: String): Equation = {
    val t = s.trim
    require(t.nonEmpty, "empty merge function")
    if (t.contains(";")) {
      Concat(t.split(";").toSeq.map(parseRef))
    } else {
      // split on + at top level (names may contain spaces but not + or *)
      val terms = t.split("\\+").toSeq.map { term =>
        val p = term.split("\\*", 2)
        require(p.length == 2,
          s"merge term must be coefficient*name: '$term' in '$s'")
        val coef = p(0).trim.toDouble
        (coef, parseRef(p(1)))
      }
      require(terms.size <= 2,
        s"merge supports at most 2 weighted surrogates (MergeCounties.java:55-57): '$s'")
      Weighted(terms)
    }
  }
}
