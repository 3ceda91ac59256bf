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

  /** Scale-adaptive CPU spread for heavy map stages (guide §2.5 "input
    * skew": one huge unsplittable file → repartition immediately after
    * the read). The driver's parquet fixtures are single-row-group
    * files, so every scan plans exactly ONE task and a CPU-bound map
    * (shingle hashing, media decode, quality scoring, embedding math)
    * runs on 1 of N cores. On a real cluster the scan already yields
    * ≥ parallelism splits, so this must be conditional: repartition to
    * `defaultParallelism` ONLY when the planned scan parallelism is
    * below it — at scale the condition is false and the plan is
    * untouched (no added exchange).
    *
    * Only consulted for shuffle-free (scan+project) inputs: if the
    * plan already contains an exchange, downstream stages are spread
    * by the shuffle partitioning and `.rdd` here would trigger AQE
    * stage execution — so such frames return unchanged.
    *
    * Partitioning is hash on `keys` when given (deterministic under
    * retry, no sort-before-repartition pass), else round-robin.
    */
  private[graft] def spread(df: DataFrame, keys: Seq[Column] = Nil): DataFrame = {
    if (df.isStreaming) return df
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    // narrow file-scan plans only — project/filter over a file relation.
    // Anything else (joins/aggregates: already spread by their shuffle;
    // cached frames, localCheckpoint RDDs, in-memory test relations:
    // must not be re-planned, and `.rdd` on them can trigger AQE stage
    // execution). Checked on the LOGICAL plan: the physical sparkPlan
    // is pre-EnsureRequirements, so exchanges are not visible there.
    def narrowScan(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
        case pr: org.apache.spark.sql.catalyst.plans.logical.Project => narrowScan(pr.child)
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => narrowScan(f.child)
        case _ => false
      }
    if (!narrowScan(df.queryExecution.optimizedPlan)) df
    else if (df.rdd.getNumPartitions >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }

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

  /** Scalable cumulative sum over a GLOBAL order — the semantics of
    * `sum(v) OVER (ORDER BY k)` without the single-partition
    * WindowExec that window form plans (the one shape that cannot
    * survive a 100× scale-up; see PlanAuditSpec's corpus gate).
    *
    * Two passes over a range-partitioned layout:
    *   1. range-partition by the order key (equal keys stay in one
    *      partition, so RANGE-frame peer semantics hold), pin the
    *      assignment, and aggregate ONE decimal total per partition —
    *      a numPartitions-row collect;
    *   2. turn those totals into exclusive prefix offsets on the
    *      driver, ship them back as a broadcast-small literal map,
    *      and add each partition's offset to its LOCAL running sum
    *      (an ordinary PARTITION BY __pid window).
    * Every shuffle is the range exchange; the only driver traffic is
    * one row per partition. This is the training-order shuffle /
    * pack-by-budget primitive at 100 TB.
    *
    * Exactness: partials and offsets accumulate in decimal(38,6), so
    * partition boundaries cannot perturb low bits vs the one-stream
    * oracle. Ties share the cumulative total (RANGE frame), matching
    * `OVER (ORDER BY …)` default framing in both Spark and DuckDB.
    */
  def runningSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
      outCol: String = "run_sum"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = orderCols.map(col)
    // pin the partition assignment: both the totals pass and the final
    // pass must see identical contents per __pid
    val parts = df.repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val totals = parts.groupBy(col("__pid"))
      .agg(sum(col(valueCol).cast("decimal(38,6)")).as("t"))
      .collect()
      .map(r => r.getInt(0) -> Option(r.getDecimal(1))
        .fold(BigDecimal(0))(BigDecimal(_)))
      .sortBy(_._1)
    // exclusive prefix: partition i's offset is the sum of totals 0..i-1
    val offsets: Map[Int, String] = totals
      .scanLeft(-1 -> BigDecimal(0)) { case ((_, acc), (pid, t)) =>
        pid -> (acc + t)
      }
      .sliding(2).collect { case Array((_, prev), (pid, _)) => pid -> prev }
      .map { case (pid, off) => pid -> off.underlying.toPlainString }
      .toMap
    // .getItem, not element_at: since r8 the registry's element_at
    // carries DuckDB's list-wrapped MAP shape (and Spark 4's
    // functions.element_at resolves by NAME through that registry)
    val off = coalesce(
      typedLit(offsets).getItem(col("__pid")).cast("decimal(38,6)"),
      lit(0).cast("decimal(38,6)"))
    val w = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    parts
      .withColumn(outCol,
        (off + sum(col(valueCol).cast("decimal(38,6)")).over(w))
          .cast("decimal(38,6)"))
      .drop("__pid")
  }
}
