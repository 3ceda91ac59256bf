package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** DuckDB numeric conversion semantics the reference delegates
  * verbatim (src/duckdb_pgwire_extension.cpp:52), probed 2026-08-14:
  *
  *  - `DATE - DATE` is a BIGINT day count (`DATE '2024-03-01' -
  *    DATE '2024-02-01'` = 29, typeof BIGINT); Spark resolves it to a
  *    day-time INTERVAL.
  *  - `CAST(fractional AS integral)` ROUNDS, where Spark truncates —
  *    with the tie mode split by source type (probed):
  *    DECIMAL and VARCHAR sources round half AWAY from zero
  *    (2.5→3, -3.5→-4, '1090.5'→1091); DOUBLE/FLOAT sources round
  *    half to EVEN (2.5::DOUBLE→2, 3.5::DOUBLE→4, 1090.5::DOUBLE
  *    →1090 — C nearbyint). String sources route through
  *    DECIMAL(38,10) so integral strings up to 28 digits keep exact
  *    precision (a double detour would corrupt > 2^53).
  *
  * Applied at post-hoc resolution so user-written casts anywhere in
  * the plan (including subqueries) get DuckDB values. Internal
  * operators narrow only through explicit round()/floor() (audited),
  * which the idempotence guard leaves untouched.
  */
object DuckNumericCastRule extends Rule[LogicalPlan] {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** already integral-valued — rewriting would only churn the plan */
  private def alreadyRounded(e: Expression): Boolean = e match {
    case _: Round | _: Floor | _: Ceil | _: BRound => true
    case c: Cast => alreadyRounded(c.child)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case s: SubtractDates =>
        Cast(DateDiff(s.left, s.right), LongType)
      case c: Cast
          if isIntegral(c.dataType) && c.child.resolved &&
            !alreadyRounded(c.child) &&
            (c.child.dataType == DoubleType || c.child.dataType == FloatType) =>
        c.withNewChildren(Seq(BRound(c.child, Literal(0))))
      case c: Cast
          if isIntegral(c.dataType) && c.child.resolved &&
            !alreadyRounded(c.child) &&
            c.child.dataType.isInstanceOf[DecimalType] =>
        c.withNewChildren(Seq(Round(c.child, Literal(0))))
      case c: Cast
          if isIntegral(c.dataType) && c.child.resolved &&
            c.child.dataType == StringType && !alreadyRounded(c.child) =>
        // same eval mode end to end: ANSI still errors on garbage,
        // TRY still nulls — only the numeric reading changes
        c.withNewChildren(Seq(Round(
          Cast(c.child, DecimalType(38, 10), None, c.evalMode),
          Literal(0))))
    }
}
