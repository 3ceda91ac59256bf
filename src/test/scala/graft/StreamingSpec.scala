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

  test("streaming hopping agg (complete mode) equals batch result") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val data = Seq(
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 00:06:00"), 1, "click", 2.0),
      Ev(3, ts("2024-01-01 00:12:00"), 2, "view", 3.0))
    val stream = MemoryStream[Ev]
    stream.addData(data: _*)
    val q = EventsStreaming.hoppingCounts(stream.toDF())
      .writeStream.format("memory").queryName("hopping_complete")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = s.table("hopping_complete")
      .orderBy("bucket_start", "event_type").collect().map(_.toSeq).toSeq
    val batch = EventsStreaming.hoppingCounts(data.toDF())
      .orderBy("bucket_start", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // every event lands in exactly two 10-min/5-min-slide windows
    assert(streamed.map(_(2).asInstanceOf[Long]).sum == 2 * data.length)
  }

  test("streaming exact dedup keeps one row per content key across batches") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = Dedup.exactStreaming(stream.toDF().toDF("doc_id", "text"),
        Seq("text"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    stream.addData((1L, "aaa"), (2L, "bbb"), (3L, "aaa"))
    q.processAllAvailable()
    stream.addData((4L, "aaa"), (5L, "ccc"), (6L, "bbb")) // dups of batch 1
    q.processAllAvailable(); q.stop()
    val got = s.table("dedup_stream").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // first arrival wins; state persists ACROSS micro-batches
    assert(got == Seq((1L, "aaa"), (2L, "bbb"), (5L, "ccc")))
    val batchCount = Dedup.exactStreaming(
      Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"), (5L, "ccc"),
        (6L, "bbb")).toDF("doc_id", "text"), Seq("text")).count()
    assert(batchCount == got.length)
  }

  test("CorpusOps sampling/split run unchanged on a stream (stateless ops)") {
    // the corpus-management operators are pure map-stage expressions,
    // so the SAME declaration runs as a streaming transform and
    // agrees with its batch twin row-for-row
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val data = (0L until 200L).map(i => (i, s"doc $i", i % 7))
    val stream = MemoryStream[(Long, String, Long)]
    stream.addData(data: _*)
    val streamDf = stream.toDF().toDF("doc_id", "text", "n_chars")
    val q = CorpusOps.hashSplit(
        CorpusOps.stratifiedSample(streamDf, "doc_id", 0.5), "doc_id")
      .writeStream.format("memory").queryName("corpus_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = s.table("corpus_stream")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batchDf = data.toDF("doc_id", "text", "n_chars")
    val batch = CorpusOps.hashSplit(
        CorpusOps.stratifiedSample(batchDf, "doc_id", 0.5), "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("PII redaction + quality model gate a stream, batch-identical") {
    // the round-4 map-only operators (regex redaction, logistic
    // scoring) compose into a streaming ingest filter with zero
    // changes — the declaration is the contract, batch or stream
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val data = (0L until 50L).map(i =>
      (i, s"doc $i contact me me me at user$i@example.com ok"))
    val stream = MemoryStream[(Long, String)]
    stream.addData(data: _*)
    def gate(df: org.apache.spark.sql.DataFrame) = {
      val scored = TextAnalysis.qualityModel(df, "doc_id", "text")
        .select(col("doc_id"), col("model_score"))
      CorpusOps.redactPii(df).join(scored, "doc_id")
        .filter(col("n_emails") > 0)
        .select(col("doc_id"), col("clean_text"), col("model_score"))
    }
    val q = gate(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = s.table("pii_stream")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batch = gate(data.toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed == batch && streamed.size == 50)
    assert(streamed.forall(_(1).asInstanceOf[String].contains("<EMAIL>")))
  }

  test("C4 line cleaning gates a stream, batch-identical") {
    // c4LineClean is a pure expression tree, so the same call is the
    // streaming ingest page filter with zero changes
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val good = "this line carries enough words to stay."
    val data = (0L until 40L).map { i =>
      val junk = if (i % 5 == 0) "\nlorem ipsum dolor sit amet." else ""
      (i, s"$good\n$good\nshort line\n$good$junk")
    }
    val stream = MemoryStream[(Long, String)]
    stream.addData(data: _*)
    def gate(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.c4LineClean(df, "doc_id", "text")
        .filter(col("kept"))
        .select(col("doc_id"), col("n_kept"), col("clean_text"))
    val q = gate(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("c4_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = s.table("c4_stream")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batch = gate(data.toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed == batch && streamed.size == 32,
      s"${streamed.size} survivors") // 8 lorem-ipsum pages dropped
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

  test("dropDuplicatesWithinWatermark dedups an at-least-once stream") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventsStreaming.dedupEvents(stream.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    // batch 1: event 1 delivered twice, event 2 once
    stream.addData(
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 00:02:00"), 1, "view", 2.0))
    q.processAllAvailable()
    // batch 2: event 1 redelivered inside the watermark → still dropped
    stream.addData(
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(3, ts("2024-01-01 00:05:00"), 2, "click", 3.0))
    q.processAllAvailable(); q.stop()
    val ids = s.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"each event exactly once, got $ids")
    // batch formulation agrees
    val batch = EventsStreaming.dedupEvents(Seq(
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 00:02:00"), 1, "view", 2.0),
      Ev(3, ts("2024-01-01 00:05:00"), 2, "click", 3.0)).toDF())
    assert(batch.count() == 3)
  }

  test("stream-stream attribution join equals the batch interval join") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val clicks = Seq(
      Ev(10, ts("2024-01-01 00:00:00"), 1, "click", 0.0),
      Ev(11, ts("2024-01-01 01:00:00"), 1, "click", 0.0),
      Ev(12, ts("2024-01-01 00:00:00"), 2, "click", 0.0))
    val purchases = Seq(
      Ev(20, ts("2024-01-01 00:05:00"), 1, "purchase", 9.0),  // joins 10
      Ev(21, ts("2024-01-01 01:08:00"), 1, "purchase", 5.0),  // joins 11
      Ev(22, ts("2024-01-01 03:00:00"), 2, "purchase", 7.0))  // outside window
    val cs = MemoryStream[Ev]; val ps = MemoryStream[Ev]
    val q = EventsStreaming.attributeJoin(cs.toDF(), ps.toDF(), 10)
      .writeStream.format("memory").queryName("attr_join")
      .outputMode("append").start()
    cs.addData(clicks: _*); ps.addData(purchases: _*)
    q.processAllAvailable()
    // advance both watermarks so all join state flushes
    cs.addData(Ev(99, ts("2024-01-01 09:00:00"), 9, "click", 0.0))
    ps.addData(Ev(98, ts("2024-01-01 09:00:00"), 9, "purchase", 0.0))
    q.processAllAvailable(); q.stop()
    val streamed = s.table("attr_join")
      .filter(col("user_id") < 9)
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val batch = EventsStreaming.attributeJoin(
        clicks.toDF(), purchases.toDF(), 10)
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(batch == Seq((10L, 20L), (11L, 21L)), s"batch: $batch")
    assert(streamed == batch, s"stream $streamed != batch $batch")
  }

  test("parquet sink + checkpoint: exactly-once across query restarts") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val stream = MemoryStream[Ev]
    val deduped = EventsStreaming.dedupEvents(stream.toDF())
    def start() = deduped.writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    val q1 = start()
    stream.addData(
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0), // dup in-batch
      Ev(2, ts("2024-01-01 00:02:00"), 1, "view", 2.0))
    q1.processAllAvailable(); q1.stop()
    // restart from the checkpoint; only the new batch may process
    stream.addData(Ev(3, ts("2024-01-01 00:05:00"), 2, "click", 3.0))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val ids = s.read.parquet(s"$dir/out").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      s"each event exactly once across restarts, got $ids")
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
