package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite an interval-predicate inner join
  * (`l.point BETWEEN r.lo AND r.hi`, which Spark would execute as a
  * broadcast-nested-loop/cartesian) into the binned hash-join
  * formulation (the logical-plan twin of
  * [[ScaleOps.rangeJoinBinned]]): intervals explode into covering
  * bins, points land in one bin, the join becomes an equi-join on the
  * bin id with the original predicate as residual.
  *
  * DuckDB covers this case with IEJoin (SURVEY §4 flags the Spark gap
  * as perf-only); this is the Spark-shaped answer. Opt-in via
  * `spark.graft.rangeJoin.binWidth` (bin width in the point column's
  * units) — bin width is data-dependent, so no default.
  */
case class BinnedRangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = spark.conf.getOption(confKey).map(_.toDouble).getOrElse(0.0)
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner,
          Some(And(GreaterThanOrEqual(p1, lo), LessThanOrEqual(p2, hi))), hint)
          if p1.semanticEquals(p2) &&
            p1.references.subsetOf(left.outputSet) &&
            lo.references.subsetOf(right.outputSet) &&
            hi.references.subsetOf(right.outputSet) &&
            p1.references.nonEmpty && lo.references.nonEmpty =>
        rewrite(j, left, right, p1, lo, hi, width, hint)
      // symmetric shape: point on the right, interval on the left
      case j @ Join(left, right, Inner,
          Some(And(GreaterThanOrEqual(p1, lo), LessThanOrEqual(p2, hi))), hint)
          if p1.semanticEquals(p2) &&
            p1.references.subsetOf(right.outputSet) &&
            lo.references.subsetOf(left.outputSet) &&
            hi.references.subsetOf(left.outputSet) &&
            p1.references.nonEmpty && lo.references.nonEmpty =>
        Project(j.output, rewrite(j, right, left, p1, lo, hi, width, hint))
    }
  }

  private def bin(e: Expression, width: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(width))), LongType)

  private def rewrite(j: Join, pointSide: LogicalPlan, rangeSide: LogicalPlan,
      p: Expression, lo: Expression, hi: Expression, width: Double,
      hint: JoinHint): LogicalPlan = {
    val binL = Alias(bin(p, width), "__bin_point")()
    val pointPlan = Project(pointSide.output :+ binL, pointSide)

    val binR = AttributeReference("__bin_range", LongType, nullable = false)()
    // timeZoneId must be pre-filled: ResolveTimeZone only runs in the
    // analyzer, and an optimizer rule must keep the plan resolved.
    val rangePlan = Generate(
      Explode(new Sequence(bin(lo, width), bin(hi, width), None, Some("UTC"))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binR), child = rangeSide)

    val joined = Join(pointPlan, rangePlan, Inner,
      Some(And(EqualTo(binL.toAttribute, binR), j.condition.get)), hint)
    Project(j.output, joined)
  }

}
