package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The srgcreate weight function (USE_FUNCTION, eval.c:74-480;
  * docs SA_ch03_vector.md:597-617): an arithmetic expression over numeric
  * attributes with exactly `+ - * / ( )`, decimal constants, and attribute
  * names — no pow/exp/unary-minus.
  *
  * The reference hand-rolls infix→postfix (postfix.c:24) + a stack
  * evaluator; on Spark the SQL parser and whole-stage codegen subsume both,
  * so this operator is a GRAMMAR VALIDATOR in front of `expr(...)`: we
  * accept exactly the reference's operator subset, then let Catalyst
  * compile it (constant folding etc. for free). */
object WeightExpr {

  private val token = """\s*(?:(\d+(?:\.\d+)?)|([A-Za-z_][A-Za-z0-9_]*)|([-+*/()]))""".r

  /** Validate `e` against the reference grammar; return the attribute names
    * it references. Throws IllegalArgumentException on anything outside the
    * subset (e.g. `**`, unary minus, functions, comparison operators). */
  def validate(e: String): Seq[String] = {
    var pos = 0
    var attrs = Vector.empty[String]
    var depth = 0
    var prev = "" // "", "val", "op", "("
    while (pos < e.length) {
      val m = token.findPrefixMatchOf(e.substring(pos)).getOrElse(
        throw new IllegalArgumentException(
          s"weight function: illegal token at '${e.substring(pos).take(10)}'"))
      pos += m.matched.length
      if (m.group(1) != null || m.group(2) != null) {
        require(prev != "val", s"weight function: two operands in a row in '$e'")
        if (m.group(2) != null) attrs :+= m.group(2)
        prev = "val"
      } else m.group(3) match {
        case "(" => require(prev != "val", s"weight function: missing operator before '(' in '$e'")
                    depth += 1; prev = "("
        case ")" => require(prev == "val", s"weight function: empty/dangling ')' in '$e'")
                    depth -= 1; require(depth >= 0, s"weight function: unbalanced ')' in '$e'")
        case op  => require(prev == "val", // no unary minus, like the reference
                      s"weight function: operator '$op' needs a left operand in '$e'")
                    prev = "op"
      }
      if (pos < e.length && e.substring(pos).trim.isEmpty) pos = e.length
    }
    require(depth == 0, s"weight function: unbalanced '(' in '$e'")
    require(prev == "val", s"weight function: trailing operator in '$e'")
    attrs.distinct
  }

  /** Compile to a Column (appended as the "Weight Function" computed column,
    * AttachDBFAttribute.c:218-241). */
  def compile(e: String): Column = { validate(e); expr(e) }
}
