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

object GeometricMean extends Aggregator[Double, GeoMeanBuffer, Double] {
  override def zero: GeoMeanBuffer = GeoMeanBuffer(0.0, 0L)
  override def reduce(b: GeoMeanBuffer, a: Double): GeoMeanBuffer = {
    b.lnSum += math.log(a); b.n += 1; b
  }
  override def merge(b1: GeoMeanBuffer, b2: GeoMeanBuffer): GeoMeanBuffer =
    GeoMeanBuffer(b1.lnSum + b2.lnSum, b1.n + b2.n)
  override def finish(b: GeoMeanBuffer): Double =
    if (b.n == 0) Double.NaN else math.exp(b.lnSum / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuffer] = Encoders.product
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
