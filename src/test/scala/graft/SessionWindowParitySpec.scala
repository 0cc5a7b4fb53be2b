package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventAggregates
import graft.streaming.EventAggregates.{Event, Session}

/** The batch `session_window` query and the stateful streaming
  * sessionizer implement the same operator; this spec replays the
  * sf0.001 events fixture through both and matches sessions
  * one-for-one. (Boundary convention: `session_window` starts a new
  * session at gap == 30 min exactly, the stateful form at gap > 30
  * min; the fixture's nanosecond timestamps never land on the exact
  * boundary, so the two agree on real data.)
  */
class SessionWindowParitySpec extends SparkSpec {
  import spark.implicits._

  test("stateful streaming sessions == batch session_window on the events fixture") {
    val dir = "/root/testdata/sf0.001"
    val gapMs = 30 * 60 * 1000L

    val batch = Queries.sessionWindows(spark, dir)
      .select(col("user_id"), col("session_start"),
        col("session_end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        (r.getTimestamp(2).getTime - gapMs, r.getLong(3)))
      .toMap

    val events = Queries.t(spark, dir, "events")
      .select("event_id", "ts", "user_id")
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventAggregates
      .sessionizeStateful(mem.toDS(), gapMillis = gapMs, watermark = "24 hours")
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    try {
      // time-ordered chunks: watermark (24 h lag) never drops anything
      events.grouped(250).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // two far-future sentinels: the first advances the watermark past
      // every open session's timeout, the second triggers the batch in
      // which those timeouts actually fire
      val flushBase = events.last.ts.getTime + 7L * 24 * 3600 * 1000
      Seq(0, 1).foreach { i =>
        mem.addData(Event(-1L - i, new Timestamp(flushBase + i * gapMs * 3), -1L))
        q.processAllAvailable()
      }

      val streamed = spark.table("sess_parity").as[Session].collect()
        .filter(_.user_id >= 0)
      assert(streamed.length == batch.size,
        s"session count: streaming ${streamed.length} vs batch ${batch.size}")
      streamed.foreach { s =>
        val key = (s.user_id, s.session_start.getTime)
        val exp = batch.get(key)
        assert(exp.isDefined, s"streaming session $s missing from batch output")
        assert(exp.get == ((s.session_end.getTime, s.n_events)),
          s"session $key: streaming (${s.session_end.getTime}, ${s.n_events}) vs batch ${exp.get}")
      }
    } finally q.stop()
  }

  test("native streaming session_window == batch session_window on the events fixture") {
    val dir = "/root/testdata/sf0.001"

    val batch = Queries.sessionWindows(spark, dir)
      .select(col("user_id"), col("session_start"),
        col("session_end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3)))
      .toSet

    val events = Queries.t(spark, dir, "events")
      .select("event_id", "ts", "user_id")
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventAggregates
      .sessionWindowCounts(mem.toDF(), watermark = "24 hours")
      .writeStream.format("memory").queryName("sw_native")
      .outputMode("append").start()
    try {
      events.grouped(250).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val flushBase = events.last.ts.getTime + 7L * 24 * 3600 * 1000
      Seq(0, 1).foreach { i =>
        mem.addData(Event(-1L - i, new Timestamp(flushBase + i * 7200000L), -1L))
        q.processAllAvailable()
      }
      val streamed = spark.table("sw_native").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3)))
        .filter(_._1 >= 0).toSet
      assert(streamed == batch,
        s"native streaming sessions diverge: missing ${(batch -- streamed).take(3)}, " +
          s"extra ${(streamed -- batch).take(3)}")
    } finally q.stop()
  }
}
