package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** SQL quantified comparisons — `x op ANY|SOME|ALL (list-or-subquery)`
  * — which DuckDB supports over both LIST values and subqueries
  * (delegated surface, src/duckdb_pgwire_extension.cpp:52) and Spark's
  * parser lacks entirely.
  *
  * [[SqlRewrites]] lowers the textual form onto
  * `x = duck_q_cmp('op', 'any'|'all', operand)`; the parser then hands
  * this rule `EqualTo(x, QuantPredMarker(...))` — crucially WITH the
  * left operand, which no registry-level rewrite can see. The rule
  * expands by operand shape (probed grid 2026-08-14, standard 3VL):
  *
  *  - ARRAY operand → `exists(arr, v -> x op v)` / `forall(...)` —
  *    Spark's higher-order functions follow the same three-valued
  *    logic (empty → FALSE/TRUE, null element and no definite answer
  *    → NULL).
  *  - Subquery operand, `= ANY` / `<> ALL` → IN / NOT IN subquery —
  *    Spark's native, shuffle-based semi-join path (scales; no
  *    materialization).
  *  - Subquery operand, other ops → ONE scalar aggregate subquery
  *    `(count(*), count(c), min(c), max(c))` + a CASE expression
  *    reproducing exact 3VL: `x > ALL(S)` is decided by max(S),
  *    `x > ANY(S)` by min(S), `= ALL` / `<> ANY` by the min=max
  *    collapse; null elements surface as count(c) < count(*) → NULL
  *    when nothing was decisive; empty S → TRUE for ALL, FALSE for
  *    ANY (before any null-x check — `NULL > ALL(empty)` is TRUE).
  *    The aggregate pushes down; nothing data-proportional crosses
  *    the driver.
  */
case class QuantPredMarker(op: String, isAll: Boolean, child: Expression)
    extends UnaryExpression with Unevaluable {
  override def dataType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case dt => dt
  }
  override def nullable: Boolean = true
  override def prettyName: String = "duck_q_cmp"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object QuantPredMarker {
  private def litStr(e: Expression, what: String): String = e match {
    case Literal(s, StringType) if s != null => String.valueOf(s)
    case other => throw new IllegalArgumentException(
      s"duck_q_cmp: $what must be a string literal, got $other")
  }
  /** registry builder for the rewrite-generated call */
  def fromArgs(e: Seq[Expression]): Expression = e match {
    case Seq(op, quant, operand) =>
      QuantPredMarker(litStr(op, "operator"),
        litStr(quant, "quantifier").equalsIgnoreCase("all"), operand)
    case other => throw new IllegalArgumentException(
      s"duck_q_cmp expects (op, quantifier, operand), got ${other.length} args")
  }
}

object QuantPredRewriteRule extends Rule[LogicalPlan] {

  /** the marker, plus any cast chain type coercion wrapped it in —
    * re-applied to each element / aggregate the rewrite compares */
  private def unwrap(e: Expression)
      : Option[(QuantPredMarker, Expression => Expression)] = e match {
    case m: QuantPredMarker => Some((m, identity))
    case c: Cast => unwrap(c.child).map { case (m, f) =>
      (m, (x: Expression) => Cast(f(x), c.dataType, c.timeZoneId, c.evalMode))
    }
    case _ => None
  }

  private def cmp(op: String)(l: Expression, r: Expression): Expression =
    op match {
      case "=" => EqualTo(l, r)
      case "<>" | "!=" => Not(EqualTo(l, r))
      case "<" => LessThan(l, r)
      case "<=" => LessThanOrEqual(l, r)
      case ">" => GreaterThan(l, r)
      case ">=" => GreaterThanOrEqual(l, r)
      case other => throw new IllegalArgumentException(
        s"quantified comparison does not support operator '$other'")
    }

  private var uid = 0
  private def lv(): UnresolvedNamedLambdaVariable = synchronized {
    uid += 1; UnresolvedNamedLambdaVariable(Seq(s"qv$uid"))
  }

  private val nullBool = Literal(null, BooleanType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case EqualTo(l, QuantUnwrapped(m, wrap)) if l.resolved && m.child.resolved =>
        m.child match {
          case ssq: ScalarSubquery => rewriteSubquery(l, m, ssq, wrap)
          case arr if arr.dataType.isInstanceOf[ArrayType] =>
            val v = lv()
            val lam = LambdaFunction(cmp(m.op)(l, wrap(v)), Seq(v))
            if (m.isAll) ArrayForAll(arr, lam) else ArrayExists(arr, lam)
          case other => throw new IllegalArgumentException(
            "ANY/ALL needs a list or a subquery operand, got type " +
              other.dataType.catalogString)
        }
    }

  /** extractor so the guard above stays readable */
  private object QuantUnwrapped {
    def unapply(e: Expression)
        : Option[(QuantPredMarker, Expression => Expression)] = unwrap(e)
  }

  private def rewriteSubquery(l: Expression, m: QuantPredMarker,
      ssq: ScalarSubquery, wrap: Expression => Expression): Expression = {
    val col = ssq.plan.output match {
      case Seq(a) => a
      case other => throw new IllegalArgumentException(
        s"ANY/ALL subquery must return one column, got ${other.length}")
    }
    val cv = wrap(col)
    def agg(f: AggregateFunction) = f.toAggregateExpression()
    val stats = Alias(CreateNamedStruct(Seq(
      Literal("cnt"), agg(Count(Literal(1))),
      Literal("cntnn"), agg(Count(cv)),
      Literal("mn"), agg(Min(cv)),
      Literal("mx"), agg(Max(cv)))), "__q_stats")()
    val sub = ssq.copy(plan = Aggregate(Nil, Seq(stats), ssq.plan))
    val st = StructType(Seq(
      StructField("cnt", LongType, nullable = false),
      StructField("cntnn", LongType, nullable = false),
      StructField("mn", cv.dataType),
      StructField("mx", cv.dataType)))
    def fld(i: Int) = GetStructField(sub, i, Some(st.fields(i).name))
    val (cnt, cntnn, mn, mx) = (fld(0), fld(1), fld(2), fld(3))

    val emptyVal = Literal(m.isAll)
    val someNull = LessThan(cntnn, cnt)
    val opBranches: (Seq[(Expression, Expression)], Expression) = m.op match {
      // membership ops ride Spark's IN semi-join (scales), but wrapped
      // in the null-aware CASE: Spark's bare IN-subquery answers FALSE
      // where the standard (and DuckDB, probed) answer NULL when the
      // subquery holds NULLs and nothing matched
      case "=" if !m.isAll => // = ANY
        (Seq(
          InSubquery(Seq(l), ListQuery(ssq.plan)) -> Literal(true),
          someNull -> nullBool),
          Literal(false))
      case "<>" | "!=" if m.isAll => // <> ALL
        (Seq(
          InSubquery(Seq(l), ListQuery(ssq.plan)) -> Literal(false),
          someNull -> nullBool),
          Literal(true))
      case "=" => // = ALL
        (Seq(
          Or(Not(EqualTo(l, mn)), Not(EqualTo(l, mx))) -> Literal(false),
          someNull -> nullBool),
          Literal(true))
      case "<>" | "!=" => // <> ANY
        (Seq(
          Or(Not(EqualTo(l, mn)), Not(EqualTo(l, mx))) -> Literal(true),
          someNull -> nullBool),
          Literal(false))
      case ordered =>
        val pivot = (m.isAll, ordered) match {
          case (false, ">") | (false, ">=") => mn
          case (false, _) => mx
          case (true, ">") | (true, ">=") => mx
          case (true, _) => mn
        }
        if (m.isAll)
          (Seq(
            Not(cmp(ordered)(l, pivot)) -> Literal(false),
            someNull -> nullBool),
            Literal(true))
        else
          (Seq(
            cmp(ordered)(l, pivot) -> Literal(true),
            someNull -> nullBool),
            Literal(false))
    }
    CaseWhen(
      Seq(
        EqualTo(cnt, Literal(0L)) -> emptyVal,
        IsNull(l) -> nullBool) ++ opBranches._1,
      Some(opBranches._2))
  }
}
