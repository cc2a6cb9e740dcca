package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Grammar parity with the reference weight-function compiler
  * (eval.c:270-480, postfix.c:24): `+ - * / ( )`, decimal constants,
  * attribute names — nothing else. */
class WeightExprSpec extends AnyFunSuite {

  test("accepts the reference operator subset") {
    assert(WeightExpr.validate("0.75*urban + 0.25*rural") == Seq("urban", "rural"))
    assert(WeightExpr.validate("(3*p_size - p_size/2) + 128") == Seq("p_size"))
    assert(WeightExpr.validate("a/(b+c)*2.5") == Seq("a", "b", "c"))
    assert(WeightExpr.validate("42") == Seq())
  }

  test("rejects what the reference rejects") {
    assert(intercept[IllegalArgumentException](
      WeightExpr.validate("-urban")).getMessage.contains("left operand"))
    Seq("a ** b", "pow(a, 2)", "a > b", "a + + b", "(a", "a)", "a +", "a b")
      .foreach { bad =>
        assertThrows[IllegalArgumentException](WeightExpr.validate(bad))
      }
  }
}
