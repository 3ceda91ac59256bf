package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}

/** DuckDB allows `unnest` INSIDE select expressions — `unnest(l) + 10`,
  * `upper(unnest(ls))` — evaluating the expression per emitted row
  * (probed; several unnests zip as usual, and aggregates over unnest
  * error in DuckDB too). Spark's analyzer rejects generators nested in
  * expressions before any injected rule can run, so the hoist happens
  * on the PARSED (unresolved) plan at the parser seam:
  *
  *   SELECT unnest(a) + 1 AS v FROM t
  *   → SELECT __unnest0 + 1 AS v FROM (SELECT *, unnest(a) AS __unnest0 FROM t)
  *
  * When any select item needs hoisting, EVERY unnest call in the list
  * hoists (a mix of hoisted and in-place generators would stack
  * Generates across the subquery boundary and cartesian instead of
  * zip). Top-level-only select lists — the common case — are left
  * exactly as written.
  */
object UnnestHoist {

  private def isUnnestCall(e: Expression): Boolean = e match {
    case f: UnresolvedFunction =>
      f.nameParts.lastOption.exists(_.equalsIgnoreCase("unnest"))
    case _ => false
  }

  /** an unnest call somewhere below the item root (Alias-transparent) */
  private def hasNested(item: Expression): Boolean = {
    def strip(e: Expression): Expression = e match {
      case Alias(c, _) => strip(c)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAlias =>
        strip(u.child)
      case other => other
    }
    val root = strip(item)
    if (isUnnestCall(root)) root.children.exists(_.exists(isUnnestCall))
    else item.exists(isUnnestCall)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(items, child)
        if items.exists(i => hasNested(i)) &&
          // a lone UnresolvedStar-only list never needs the hoist
          items.exists(_.exists(isUnnestCall)) =>
      val hoisted = new ArrayBuffer[NamedExpression]()
      def hoist(e: Expression): Expression = e match {
        case f if isUnnestCall(f) =>
          val name = s"__unnest${hoisted.length}"
          hoisted += Alias(f, name)()
          UnresolvedAttribute(name)
        case other => other.mapChildren(hoist)
      }
      val newItems = items.map {
        case a @ Alias(c, n) => Alias(hoist(c), n)(a.exprId)
        case ne: NamedExpression if !ne.exists(isUnnestCall) => ne
        case other => hoist(other) match {
          case n: NamedExpression => n
          case e => UnresolvedAlias(e)
        }
      }
      if (hoisted.isEmpty) p
      else Project(newItems,
        Project(Seq(UnresolvedStar(None)) ++ hoisted, child))
  }

  private def UnresolvedAlias(e: Expression): NamedExpression =
    org.apache.spark.sql.catalyst.analysis.UnresolvedAlias(e)
}
