package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out building blocks (the 100 TB posture made concrete):
  * bucketed co-located joins, salted aggregation for skew, and a
  * binned range join replacing the nested-loop fallback Spark uses
  * for interval predicates (DuckDB has IEJoin; SURVEY §4 flags the
  * gap as perf-only — this is the Spark-shaped answer).
  */
object ScaleOps {

  /** Write both sides bucketed by the join key so subsequent joins
    * are exchange-free (co-located sort-merge). At 100 TB this is the
    * difference between an hourly shuffle of the fact table and none.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Two-phase salted aggregation: pre-aggregate on (key, salt) to
    * spread a hot key over `saltFactor` reducers, then finish on key.
    * `aggs` must be algebraic (sum/count/min/max-style) — pass the
    * partial column names and the final combining expressions.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltFactor)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol).cast("decimal(30,8)")).as("__partial"),
        count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("double").as(s"sum_$valueCol"),
        sum(col("__n")).as("n"))
  }

  /** Range join `left.point BETWEEN right.lo AND right.hi` via
    * binning: right intervals explode into covering bins of width
    * `binWidth`, left points land in one bin, the join runs as a hash
    * join on the bin id with the exact predicate as residual. Work is
    * |right| × avgIntervalWidth/binWidth + |left| — no nested loop.
    */
  def rangeJoinBinned(
      left: DataFrame, pointCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    val lBin = floor(col(pointCol) / binWidth).cast("long")
    val rBins = sequence(
      floor(col(loCol) / binWidth).cast("long"),
      floor(col(hiCol) / binWidth).cast("long"))
    val l = left.withColumn("__bin", lBin)
    val r = right.withColumn("__bin", explode(rBins))
    l.join(r, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
