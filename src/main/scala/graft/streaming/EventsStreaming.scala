package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming over the events shape (SURVEY §2.2 Streaming —
  * no reference counterpart; semantics defined here, M6):
  * watermarked tumbling-window aggregation and custom keyed state via
  * mapGroupsWithState. Every transform also works in batch mode
  * (`window()` is mode-agnostic), which is how the driver checks it.
  */
object EventsStreaming {

  /** Tumbling 10-minute counts + exact-decimal value sums per
    * event_type. With `watermarked=true` (streaming), late data
    * beyond 30 minutes is dropped and windows finalize for append
    * output.
    */
  def tumblingCounts(events: DataFrame, watermarked: Boolean = false): DataFrame = {
    val src = if (watermarked) events.withWatermark("ts", "30 minutes") else events
    src
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,8)")).cast("double").as("v_sum"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("v_sum"))
  }

  final case class Ev(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user aggregate across micro-
    * batches (KeyValueGroupedDataset.mapGroupsWithState — SURVEY §2.2
    * UDF/state surface). State survives between batches; timeout off
    * for determinism in specs.
    */
  def runningUserAgg(events: Dataset[Ev]): Dataset[UserAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(user, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          evs.foreach { e => n += 1; total += e.value }
          val next = UserAgg(user, n, total)
          state.update(next)
          next
      }
  }
}
