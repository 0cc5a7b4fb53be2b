package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventAggregates
import graft.streaming.EventAggregates.{Event, Session}

class EventAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked windowed counts aggregate the events fixture") {
    // batch-mode execution of the same streaming-capable plan
    val events = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val out = EventAggregates.windowedCounts(events, "1 hour", "1 hour")
    val total = out.agg(sum("n_events")).head().getLong(0)
    assert(total == events.count())
    assert(out.filter($"window_end" <= $"window_start").count() == 0)
  }

  test("windowed counts emit append-mode results under a real stream") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventAggregates.windowedCounts(df, "5 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 00:01:00"), "a", 1.0),
        (2L, ts("2024-01-01 00:02:00"), "a", 2.0),
        (3L, ts("2024-01-01 00:03:00"), "b", 3.0))
      q.processAllAvailable()
      // advance event time far past the watermark so the first window closes
      mem.addData((4L, ts("2024-01-01 01:00:00"), "a", 4.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
      assert(rows.length >= 2, s"expected closed windows, got ${rows.toSeq}")
      val aCount = spark.table("wc")
        .filter($"event_type" === "a" && $"n_events" === 2).count()
      assert(aCount == 1)
    } finally q.stop()
  }

  test("stateful sessionization closes sessions at the idle gap") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = EventAggregates.sessionizeStateful(mem.toDS(), gapMillis = 60000L)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7),
        Event(2, ts("2024-01-01 00:00:30"), 7),
        // > 60s gap: first session closes when this arrives
        Event(3, ts("2024-01-01 00:05:00"), 7))
      q.processAllAvailable()
      val rows = spark.table("sess").as[Session].collect()
      assert(rows.length == 1, s"expected one closed session, got ${rows.toSeq}")
      assert(rows.head.n_events == 2)
      assert(rows.head.session_start == ts("2024-01-01 00:00:00"))
      assert(rows.head.session_end == ts("2024-01-01 00:00:30"))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to impressions") {
    implicit val sql = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventAggregates.correlate(
      imps.toDF().toDF("imp_id", "imp_ts", "user_id"),
      clicks.toDF().toDF("click_id", "click_ts", "user_id"),
      "user_id", "imp_ts", "click_ts", window = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts("2024-01-01 00:00:00"), 7L))
      clicks.addData(
        (10L, ts("2024-01-01 00:05:00"), 7L), // inside the window
        (11L, ts("2024-01-01 00:20:00"), 7L), // outside the window
        (12L, ts("2024-01-01 00:05:00"), 8L)) // wrong user
      q.processAllAvailable()
      val got = spark.table("attr").select("imp_id", "click_id")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)), s"only the in-window same-user click: $got")
    } finally q.stop()
  }

  test("stream-stream join state is watermark-bounded (plan declares it)") {
    implicit val sql = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventAggregates.correlate(
      imps.toDF().toDF("imp_id", "imp_ts", "user_id"),
      clicks.toDF().toDF("click_id", "click_ts", "user_id"),
      "user_id", "imp_ts", "click_ts")
    val q = joined.writeStream.format("memory").queryName("attr2")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts("2024-01-01 00:00:00"), 7L))
      clicks.addData((10L, ts("2024-01-01 00:01:00"), 7L))
      q.processAllAvailable()
      // both watermarks present in the executed streaming plan means
      // Spark evicts buffered rows once they can no longer match
      val plan = q.lastProgress.sources.length
      assert(plan == 2, "both streams must feed the join")
      assert(q.lastProgress.stateOperators.nonEmpty,
        "join must run through a state store (bounded by the watermark)")
    } finally q.stop()
  }
}
