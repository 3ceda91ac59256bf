package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Hopping (sliding) windows: size 10 min, slide 5 min — every event
    * lands in exactly two overlapping buckets. Same declaration runs
    * batch or watermarked streaming, like [[tumblingCounts]].
    */
  def hoppingCounts(events: DataFrame, watermarked: Boolean = false): DataFrame = {
    val src = if (watermarked) events.withWatermark("ts", "30 minutes") else events
    src
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,8)")).cast("double").as("v_sum"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("v_sum"))
  }

  final case class Ev(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Gap-based sessionization — the batch formulation: a session
    * breaks after `gapMinutes` of inactivity per user. Expressed as
    * the classic lag+cumulative-flag window pattern (one shuffle by
    * user); works identically at any scale and is the semantic spec
    * for the streaming variant below.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        (col("__prev").isNull ||
          col("ts").cast("long") - col("__prev").cast("long") > gapMinutes * 60L)
          .cast("long"))
      .withColumn("__session_id", sum(col("__new_session")).over(byUser))
      .groupBy(col("user_id"), col("__session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("__session_id")
  }

  /** Streaming sessionization: flatMapGroupsWithState with an
    * event-time timeout — the open session lives in keyed state and
    * is emitted when the watermark passes its gap deadline. The batch
    * formulation above is its semantic oracle.
    */
  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            var closed = List.empty[Session]
            var cur = state.getOption
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.session_end.getTime <= gapMs =>
                  cur = Some(s.copy(session_end = e.ts, n_events = s.n_events + 1))
                case Some(s) =>
                  closed ::= s
                  cur = Some(Session(user, e.ts, e.ts, 1))
                case None =>
                  cur = Some(Session(user, e.ts, e.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.session_end.getTime + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Exactly-once dedup of an at-least-once event stream. Streaming:
    * `dropDuplicatesWithinWatermark` keeps seen ids only inside the
    * watermark horizon, so state is bounded by (ingest rate ×
    * watermark) instead of growing with total stream length — the
    * property that keeps this viable on an unbounded 100 TB/day feed.
    * Batch: plain dropDuplicates, the semantic oracle.
    */
  def dedupEvents(events: DataFrame, watermarkMinutes: Int = 30): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", s"$watermarkMinutes minutes")
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Click→purchase attribution: pairs within `windowMinutes`, keyed
    * by user. The SAME declaration runs as a batch interval join or a
    * stream-stream inner join (withWatermark is a no-op in batch);
    * in streaming, the time-range condition + both-side watermarks
    * let Spark prune join state, so the operator holds a bounded
    * window of each side rather than the whole history. One shuffle
    * by user_id on both sides.
    */
  def attributeJoin(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 10): DataFrame = {
    val wm = s"${windowMinutes * 2} minutes"
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", wm)
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", wm)
    c.join(p,
        col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") +
          expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("click_id"), col("purchase_id"),
        col("c_user").as("user_id"), col("click_ts"), col("purchase_ts"))
  }

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
