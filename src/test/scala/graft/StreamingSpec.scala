package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import EventsStreaming.Ev

/** Structured Streaming semantics: stream/batch agreement, watermark
  * late-data dropping, keyed state across micro-batches.
  */
class StreamingSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming tumbling agg (complete mode) equals batch result") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val data = Seq(
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 00:05:00"), 1, "click", 2.0),
      Ev(3, ts("2024-01-01 00:12:00"), 2, "view", 3.0))
    val stream = MemoryStream[Ev]
    stream.addData(data: _*)
    val q = EventsStreaming.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_complete")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = s.table("tumbling_complete")
      .orderBy("bucket_start", "event_type").collect().map(_.toSeq).toSeq
    val batch = EventsStreaming.tumblingCounts(data.toDF())
      .orderBy("bucket_start", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.length == 2) // two 10-minute windows
  }

  test("watermark drops data later than 30 minutes (append mode)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventsStreaming.tumblingCounts(stream.toDF(), watermarked = true)
      .writeStream.format("memory").queryName("tumbling_append")
      .outputMode("append").start()
    // batch 1: two events in window 00:00
    stream.addData(
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 00:02:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: advance watermark to 01:30 → window 00:00 finalizes
    stream.addData(Ev(3, ts("2024-01-01 02:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 3: a very late event for window 00:00 (< watermark) must
    // be DROPPED; plus one more advancing event to flush
    stream.addData(
      Ev(4, ts("2024-01-01 00:03:00"), 1, "click", 99.0),
      Ev(5, ts("2024-01-01 04:00:00"), 1, "click", 1.0))
    q.processAllAvailable(); q.stop()
    val rows = s.table("tumbling_append")
      .filter(col("bucket_start") === ts("2024-01-01 00:00:00")).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n") == 2, "late event must not count")
  }

  test("streaming sessionization emits sessions on event-time timeout") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventsStreaming.sessionizeStream(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // session 1: two events 10 minutes apart
    stream.addData(
      Ev(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
      Ev(2, ts("2024-01-01 00:10:00"), 7, "click", 1.0))
    q.processAllAvailable()
    // event at 02:00 starts session 2 and advances the watermark past
    // session 1's gap deadline (00:40) → session 1 times out and emits
    stream.addData(Ev(3, ts("2024-01-01 02:00:00"), 7, "click", 1.0))
    q.processAllAvailable()
    // advance far again to flush session 2
    stream.addData(Ev(4, ts("2024-01-01 05:00:00"), 7, "click", 1.0))
    q.processAllAvailable(); q.stop()
    val got = s.table("sessions").orderBy("session_start").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Long]("n_events")))
    assert(got.length >= 2)
    assert(got(0) == ((ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2L)))
    assert(got(1) == ((ts("2024-01-01 02:00:00"), ts("2024-01-01 02:00:00"), 1L)))
    // streaming agrees with the batch formulation on the same data
    val batch = EventsStreaming.sessionizeBatch(Seq(
      Ev(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
      Ev(2, ts("2024-01-01 00:10:00"), 7, "click", 1.0),
      Ev(3, ts("2024-01-01 02:00:00"), 7, "click", 1.0),
      Ev(4, ts("2024-01-01 05:00:00"), 7, "click", 1.0)).toDF())
      .orderBy("session_start").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Long]("n_events")))
    assert(batch.take(2).toSeq == got.take(2).toSeq)
  }

  test("mapGroupsWithState keeps per-user state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventsStreaming.runningUserAgg(stream.toDS())
      .writeStream.format("memory").queryName("user_state")
      .outputMode("update").start()
    stream.addData(Ev(1, ts("2024-01-01 00:01:00"), 7, "click", 1.5))
    q.processAllAvailable()
    stream.addData(Ev(2, ts("2024-01-01 00:02:00"), 7, "click", 2.5))
    q.processAllAvailable(); q.stop()
    val last = s.table("user_state").filter(col("user_id") === 7)
      .orderBy(col("n_events").desc).limit(1).collect().head
    assert(last.getAs[Long]("n_events") == 2L)
    assert(math.abs(last.getAs[Double]("total_value") - 4.0) < 1e-9)
  }
}
