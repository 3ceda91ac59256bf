package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom aggregate via the typed `Aggregator` path (SURVEY §2.2
  * "Custom aggregates"): geometric mean with an (lnSum, n) buffer —
  * partial aggregation (map-side combine) falls out of
  * reduce/merge, exactly like a built-in declarative aggregate.
  * Registered as SQL `geomean` in [[Functions.registerAll]].
  */
case class GeoMeanBuffer(var lnSum: Double, var n: Long)

object GeometricMean
    extends Aggregator[java.lang.Double, GeoMeanBuffer, java.lang.Double] {
  override def zero: GeoMeanBuffer = GeoMeanBuffer(0.0, 0L)
  // boxed input so NULLs reach reduce and SKIP, like any SQL
  // aggregate — a primitive Double input had Spark feeding NULL rows
  // in as 0.0, silently dragging the group's geomean to 0
  override def reduce(b: GeoMeanBuffer, a: java.lang.Double): GeoMeanBuffer = {
    if (a != null) { b.lnSum += math.log(a); b.n += 1 }
    b
  }
  override def merge(b1: GeoMeanBuffer, b2: GeoMeanBuffer): GeoMeanBuffer =
    GeoMeanBuffer(b1.lnSum + b2.lnSum, b1.n + b2.n)
  // empty / all-NULL group -> NULL, matching both the native
  // exp(avg(ln)) rewrite (Average -> NULL -> Exp -> NULL) and DuckDB's
  // geomean (probed on 1.0); a boxed output is what lets an Aggregator
  // return the conventional NULL aggregate result
  override def finish(b: GeoMeanBuffer): java.lang.Double =
    if (b.n == 0) null else java.lang.Double.valueOf(math.exp(b.lnSum / b.n))
  override def bufferEncoder: Encoder[GeoMeanBuffer] = Encoders.product
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
