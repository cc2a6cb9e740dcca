package graft.spark.rules

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.spark.expressions.{PointInPolygonStatus, CellEncodeExpr, CoverCellsExpr}

/** Optimizer rule: a join whose condition is (only) the exact
  * point-in-polygon test would plan as a broadcast-nested-loop / cartesian —
  * O(|points|·|polys|) exact kernels. This rule injects the engine's
  * cell-cover prefilter automatically:
  *
  *   Join(points, polys, pip(x, y, geom) = 1)
  *     ⇒ Project(orig output,
  *         Join(points + cell_encode(x,y) AS __cellL,
  *              Generate(explode(cover_cells(geom)) AS __cellR, polys),
  *              __cellL = __cellR AND pip(x, y, geom) = 1))
  *
  * — the equi key turns the plan into a hash join; the exact test runs per
  * candidate only (the PBSM strategy SpatialJoin builds by hand, now applied
  * to any user-written pip join). Domain/resolution come from
  *   spark.graft.cell.domain = "xmin,ymin,xmax,ymax"  (default 0,0,8192,8192)
  *   spark.graft.cell.res    = <int>                  (default 4)
  *
  * Registered via `SparkSessionExtensions` (GraftExtensions). The rule is
  * idempotent: joins already carrying a cell_encode key are left alone.
  */
case class SpatialJoinRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  private def domain: (Double, Double, Double, Double) = {
    val s = conf.getConfString("spark.graft.cell.domain", "0,0,8192,8192")
    val Array(a, b, c, d) = s.split(",").map(_.trim.toDouble)
    (a, b, c, d)
  }
  private def res: Int = conf.getConfString("spark.graft.cell.res", "4").toInt

  private object PipTest {
    def unapply(e: Expression): Option[PointInPolygonStatus] = e match {
      case EqualTo(p: PointInPolygonStatus, Literal(1, IntegerType)) => Some(p)
      case EqualTo(Literal(1, IntegerType), p: PointInPolygonStatus) => Some(p)
      case _ => None
    }
  }

  /** true when the condition already has a usable equi key (then the join
    * is a hash join already — nothing to fix, and this makes the rewrite
    * idempotent: the injected cell equality IS such a key). */
  private def hasEquiKey(cond: Expression, left: LogicalPlan,
                         right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(l, r) =>
        (l.references.subsetOf(left.outputSet) &&
          r.references.subsetOf(right.outputSet)) ||
        (r.references.subsetOf(left.outputSet) &&
          l.references.subsetOf(right.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !hasEquiKey(cond, left, right) =>
      val pip = splitConjunctivePredicates(cond).collectFirst {
        case PipTest(p) => p
      }
      pip match {
        case Some(p)
            if p.first.references.subsetOf(left.outputSet) &&
               p.second.references.subsetOf(left.outputSet) &&
               p.third.references.subsetOf(right.outputSet) =>
          val (xmin, ymin, xmax, ymax) = domain
          val cellL = CellEncodeExpr(p.first, p.second, xmin, ymin, xmax, ymax, res)
          val cellR = AttributeReference("__cellR", LongType, nullable = false)()
          val rightG = Generate(
            Explode(CoverCellsExpr(p.third, xmin, ymin, xmax, ymax, res)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(cellR), child = right)
          // the encode expression sits directly in the condition: equi-key
          // extraction (ExtractEquiJoinKeys) accepts one-side expressions
          val newCond = And(EqualTo(cellL, cellR), cond)
          Project(j.output, Join(left, rightG, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}

/** spark.sql.extensions entry point: registers the spatial-join rewrite
  * and the native-kernel SQL functions (graft_cell_encode & co). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SpatialJoinRewrite())
    graft.spark.SqlFunctions.descriptions.foreach(e.injectFunction)
  }
}
