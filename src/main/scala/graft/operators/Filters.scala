package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Attribute filtering — the reference's filter-file semantics
  * (parseWeightAttributes.c:141, parse_include_exclude.c:105-515; docs
  * SA_ch03_vector.md:1004-1055):
  *
  *   - ATTRIBUTE_TYPE=DISCRETE: INCLUDE_VALUES / EXCLUDE_VALUES comma lists
  *     with grep-style globs (`C*`, `[A-K]*`, `25??`)
  *   - ATTRIBUTE_TYPE=CONTINUOUS: numeric ranges `100-200`, relational
  *     `<`, `<=`, `>`, `>=` (bounds ±1E20), one relation per attribute
  *   - include and exclude accumulate with AND across attributes
  *
  * Catalyst handles evaluation (`rlike`, `between`, plain comparisons) —
  * pushdown-friendly, codegen'd, no UDF.
  */
object Filters {

  /** glob → anchored Java regex: `*`→`.*`, `?`→`.`, `[...]` passes through,
    * everything else is quoted (parse_include_exclude.c:352-515 uses POSIX
    * regex compiled from the same translation). */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb.append("\\["); }
          else { sb.append(glob.substring(i, close + 1)); i = close }
        case c if "\\.^$+{}()|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
  }

  /** Discrete include: value matches ANY of the patterns (exact values are
    * globs without metacharacters). */
  def discreteInclude(c: Column, patterns: Seq[String]): Column =
    patterns.map(p => c.rlike(globToRegex(p))).reduce(_ || _)

  def discreteExclude(c: Column, patterns: Seq[String]): Column =
    !discreteInclude(c, patterns)

  /** One continuous range term: "100-200" (inclusive), "<5", "<=5", ">5",
    * ">=5", or a bare number (equality). */
  def continuousTerm(c: Column, term: String): Column = {
    val t = term.trim
    if (t.startsWith("<=")) c <= t.drop(2).trim.toDouble
    else if (t.startsWith(">=")) c >= t.drop(2).trim.toDouble
    else if (t.startsWith("<")) c < t.drop(1).trim.toDouble
    else if (t.startsWith(">")) c > t.drop(1).trim.toDouble
    else {
      // `a-b` range; careful with leading minus of a negative number
      val dash = t.indexOf('-', 1)
      if (dash > 0) {
        val lo = t.substring(0, dash).trim.toDouble
        val hi = t.substring(dash + 1).trim.toDouble
        c.between(lo, hi)
      } else c === t.toDouble
    }
  }

  def continuousInclude(c: Column, terms: Seq[String]): Column =
    terms.map(continuousTerm(c, _)).reduce(_ || _)

  /** A full filter spec: per-attribute include/exclude lists ANDed together
    * (cumulative across attributes, parse_include_exclude semantics). */
  final case class AttrCond(attr: String, discrete: Boolean,
                            include: Seq[String] = Nil, exclude: Seq[String] = Nil)

  def filterSpec(df: DataFrame, conds: Seq[AttrCond]): DataFrame = {
    val pred = conds.flatMap { ac =>
      val c = col(ac.attr)
      val inc =
        if (ac.include.isEmpty) None
        else Some(if (ac.discrete) discreteInclude(c.cast("string"), ac.include)
                  else continuousInclude(c.cast("double"), ac.include))
      val exc =
        if (ac.exclude.isEmpty) None
        else Some(if (ac.discrete) discreteExclude(c.cast("string"), ac.exclude)
                  else !continuousInclude(c.cast("double"), ac.exclude))
      inc.toSeq ++ exc.toSeq
    }
    if (pred.isEmpty) df else df.where(pred.reduce(_ && _))
  }

  /** FILTER FUNCTION cells of the SurrogateTool spec CSV
    * (SA_ch05_surrogate.md:348-356): `;`-separated terms, each
    * `ATTR=values` (include) or `ATTR!=values` (exclude), values a comma
    * list of exact values, globs (`C*`), ranges (`100-200`) or relations
    * (`<=5`). Continuous vs discrete follows the values' shape, like the
    * reference's filter-file ATTRIBUTE_TYPE. */
  def parseFilterFunction(s: String): Seq[AttrCond] = {
    def looksContinuous(vals: Seq[String]): Boolean =
      vals.forall(v => v.matches("[<>]=?\\s*-?[0-9.]+") ||
        v.matches("-?[0-9.]+\\s*-\\s*[0-9.]+"))
    s.split(";").toSeq.map(_.trim).filter(_.nonEmpty).map { term =>
      val (attr, vals, exclude) = term.indexOf("!=") match {
        case i if i > 0 =>
          (term.substring(0, i).trim, term.substring(i + 2), true)
        case _ =>
          val eq = term.indexOf('=')
          require(eq > 0, s"filter term needs ATTR=values or ATTR!=values: '$term'")
          (term.substring(0, eq).trim, term.substring(eq + 1), false)
      }
      val values = vals.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      val cont = looksContinuous(values) &&
        values.exists(v => v.contains("-") || v.startsWith("<") || v.startsWith(">"))
      AttrCond(attr, discrete = !cont,
        include = if (exclude) Nil else values,
        exclude = if (exclude) values else Nil)
    }
  }

  /** FILTER_FILE parser (SA_ch03_vector.md:1004-1046): blocks of
    * `keyword=value` lines — ATTRIBUTE_NAME + ATTRIBUTE_TYPE
    * (DISCRETE|CONTINUOUS) required per block, then INCLUDE_VALUES and/or
    * EXCLUDE_VALUES (comma lists; globs for discrete, one range/relation
    * for continuous). `#` starts a comment. Keywords are case-folded like
    * the reference; attribute names and VALUES keep their case (the C
    * uppercases both sides of every DBF compare — a destructive
    * normalization this engine does not replicate). */
  def parseFilterFile(text: String): Seq[AttrCond] = {
    val kvs = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf('=')
        require(i > 0, s"filter file line is not keyword=value: '$l'")
        (l.substring(0, i).trim.toUpperCase(java.util.Locale.ROOT),
         l.substring(i + 1).trim)
      }.toVector
    val blocks = kvs.foldLeft(Vector.empty[Vector[(String, String)]]) {
      case (acc, kv @ ("ATTRIBUTE_NAME", _)) => acc :+ Vector(kv)
      case (acc, kv) =>
        require(acc.nonEmpty,
          s"filter file: ${kv._1} before any ATTRIBUTE_NAME")
        acc.init :+ (acc.last :+ kv)
    }
    require(blocks.nonEmpty, "filter file declares no ATTRIBUTE_NAME block")
    blocks.map { b =>
      val m = b.toMap
      require(b.size == m.size,
        s"duplicate keyword in filter block for ${m("ATTRIBUTE_NAME")}")
      val discrete = m.getOrElse("ATTRIBUTE_TYPE",
        throw new IllegalArgumentException(
          s"filter block for ${m("ATTRIBUTE_NAME")} lacks ATTRIBUTE_TYPE")) match {
        case "DISCRETE" => true
        case "CONTINUOUS" => false
        case other => throw new IllegalArgumentException(
          s"ATTRIBUTE_TYPE=$other (DISCRETE|CONTINUOUS)")
      }
      // trimmed like parseFilterFunction: an anchored glob built from
      // " Brand#32" would silently match nothing
      val inc = m.get("INCLUDE_VALUES")
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
      val exc = m.get("EXCLUDE_VALUES")
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
      require(inc.nonEmpty || exc.nonEmpty,
        s"filter block for ${m("ATTRIBUTE_NAME")} needs INCLUDE_VALUES " +
          "or EXCLUDE_VALUES")
      AttrCond(m("ATTRIBUTE_NAME"), discrete, inc, exc)
    }
  }

  /** Weight-function expressions (`0.75*urban+0.25*rural`): the reference
    * built an infix→postfix evaluator (postfix.c:24, eval.c:270-480); Spark's
    * SQL parser subsumes it. We validate the reference's operator subset
    * (+ - * / parentheses, numeric literals, identifiers — no pow/unary
    * minus, SA_ch03_vector.md:597-617) then hand the string to expr(). */
  def weightFunction(df: DataFrame, exprStr: String, as: String): DataFrame = {
    // one validator for the reference grammar everywhere: the full token
    // scanner rejects unary minus in ANY position ("a*(-b)" included),
    // which a leading-minus regex guard cannot
    graft.functions.WeightExpr.validate(exprStr)
    df.withColumn(as, expr(exprStr).cast("double"))
  }
}
