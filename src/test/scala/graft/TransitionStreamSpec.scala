package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.EventFlow
import graft.streaming.TransitionStream

/** The streamed transition matrix must EXACTLY equal the batch
  * operator over the union of every delivered batch, boundary pairs
  * included, under the per-user-ordered arrival contract.
  */
class TransitionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // per-user time-ordered slices: slice k covers seconds [k*100, k*100+99]
  private def slice(k: Int, n: Int): DataFrame =
    (0 until n).map { i =>
      val u = i % 5
      (k * 1000L + i, ts(k * 100L + i / 5), u.toLong,
        Seq("view", "click", "buy", "idle")((i * (k + 3) + u) % 4))
    }.toDF("event_id", "ts", "user_id", "event_type")

  private def batchMatrix(union: DataFrame): Seq[(String, String, Long, Double, Double)] =
    EventFlow.transitions(union, "user_id", "ts", "event_type", "event_id")
      .orderBy("prev_type", "next_type")
      .as[(String, String, Long, Double, Double)].collect().toSeq

  private def liveMatrix(pairsDir: String): Seq[(String, String, Long, Double, Double)] =
    TransitionStream.matrix(spark, pairsDir)
      .orderBy("prev_type", "next_type")
      .as[(String, String, Long, Double, Double)].collect().toSeq

  private def writer(dir: String) =
    TransitionStream.transitionBatch(
      "user_id", "ts", "event_type", "event_id",
      s"$dir/pairs", s"$dir/last") _

  test("streamed matrix equals the batch operator on the union, per batch") {
    val dir = Files.createTempDirectory("trans").toString
    val write = writer(dir)
    val batches = Seq(slice(0, 40), slice(1, 25), slice(2, 60))
    batches.zipWithIndex.foreach { case (b, i) =>
      write(b, i.toLong)
      val expect = batchMatrix(batches.take(i + 1).reduce(_ unionAll _))
      assert(liveMatrix(s"$dir/pairs") === expect, s"after batch $i")
    }
  }

  test("boundary pairs across batches are counted (not just within-batch)") {
    val dir = Files.createTempDirectory("trans").toString
    val write = writer(dir)
    // one user, one event per batch: ALL transitions are boundaries
    val b0 = Seq((1L, ts(10), 1L, "view")).toDF("event_id", "ts", "user_id", "event_type")
    val b1 = Seq((2L, ts(20), 1L, "click")).toDF("event_id", "ts", "user_id", "event_type")
    val b2 = Seq((3L, ts(30), 1L, "buy")).toDF("event_id", "ts", "user_id", "event_type")
    write(b0, 0L); write(b1, 1L); write(b2, 2L)
    val got = liveMatrix(s"$dir/pairs").map(t => (t._1, t._2, t._3))
    assert(got === Seq(("click", "buy", 1L), ("view", "click", 1L)))
  }

  test("replaying a middle batch is idempotent") {
    val dir = Files.createTempDirectory("trans").toString
    val write = writer(dir)
    val batches = Seq(slice(0, 40), slice(1, 25), slice(2, 60))
    batches.zipWithIndex.foreach { case (b, i) => write(b, i.toLong) }
    val before = liveMatrix(s"$dir/pairs")
    write(batches(1), 1L) // must see only batch 0's carried state
    assert(liveMatrix(s"$dir/pairs") === before)
  }

  test("compaction preserves the matrix and subsequent batches keep merging") {
    val dir = Files.createTempDirectory("trans").toString
    val write = writer(dir)
    val batches = Seq(slice(0, 40), slice(1, 25), slice(2, 60))
    write(batches(0), 0L); write(batches(1), 1L)
    val before = liveMatrix(s"$dir/pairs")
    TransitionStream.compact(spark, s"$dir/pairs", s"$dir/last")
    assert(liveMatrix(s"$dir/pairs") === before, "compaction is lossless")
    write(batches(2), 2L)
    val expect = batchMatrix(batches.reduce(_ unionAll _))
    assert(liveMatrix(s"$dir/pairs") === expect,
      "post-compaction batches still see carried last-event state")
  }

  test("empty store yields an empty matrix, not a crash") {
    assert(TransitionStream.matrix(
      spark, Files.createTempDirectory("notrans").toString).isEmpty)
  }

  test("a real micro-batch stream through the query matches the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("trans").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val src = mem.toDF().toDF("event_id", "secs", "user_id", "event_type")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_seconds(org.apache.spark.sql.functions.col("secs")))
    val q = TransitionStream.transitionStream(
      src, "user_id", "ts", "event_type", "event_id",
      s"$dir/pairs", s"$dir/last", s"$dir/ckpt").start()
    try {
      mem.addData((1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"))
      q.processAllAvailable()
      mem.addData((3L, 30L, 1L, "buy"), (4L, 15L, 2L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val union = Seq(
      (1L, ts(10), 1L, "view"), (2L, ts(20), 1L, "click"),
      (3L, ts(30), 1L, "buy"), (4L, ts(15), 2L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(liveMatrix(s"$dir/pairs") === batchMatrix(union))
  }
}
