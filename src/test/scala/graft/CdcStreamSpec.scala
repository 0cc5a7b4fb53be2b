package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff
import graft.streaming.CdcStream

class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, Int)*) =
    rows.toDF("id", "name", "score")

  private val s0 = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
  private val s1 = Seq((1L, "a", 10), (2L, "b", 25), (4L, "d", 40))
  private val s2 = Seq((2L, "b", 25), (4L, "d", 41), (5L, "e", 50))

  private def runBatches(dir: String): Unit = {
    val write = CdcStream.snapshotDiffBatch(
      s"$dir/state", s"$dir/changes", Seq("id")) _
    write(snap(s0: _*), 0L)
    write(snap(s1: _*), 1L)
    write(snap(s2: _*), 2L)
  }

  test("per-batch changes equal the batch SnapshotDiff of consecutive snapshots") {
    val dir = Files.createTempDirectory("cdc").toString
    runBatches(dir)
    val log = CdcStream.changeLog(spark, s"$dir/changes")
    val b0 = log.filter($"batch_id" === 0).select("id", "change_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(b0 === Seq((1L, "added"), (2L, "added"), (3L, "added")))
    val expect1 = SnapshotDiff.diff(snap(s0: _*), snap(s1: _*), Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val b1 = log.filter($"batch_id" === 1)
      .select("id", "change_type", "changed_cols")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(b1 === expect1)
    val b2 = log.filter($"batch_id" === 2)
      .select("id", "change_type", "changed_cols")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(b2 === Seq(
      (1L, "removed", ""), (4L, "changed", "score"), (5L, "added", "")))
  }

  test("replaying a middle batch is idempotent (reads only prior state)") {
    val dir = Files.createTempDirectory("cdc").toString
    runBatches(dir)
    val log = CdcStream.changeLog(spark, s"$dir/changes")
    val before = log.filter($"batch_id" === 1)
      .collect().map(_.toString).sorted
    // replay batch 1: must see ONLY batch 0's snapshot even though
    // batch 2's newer state exists
    CdcStream.snapshotDiffBatch(
      s"$dir/state", s"$dir/changes", Seq("id"))(snap(s1: _*), 1L)
    val after = CdcStream.changeLog(spark, s"$dir/changes")
      .filter($"batch_id" === 1).collect().map(_.toString).sorted
    assert(after === before)
    // and the overall log is unchanged
    assert(CdcStream.changeLog(spark, s"$dir/changes").count() === 9L)
  }

  test("the change log replays the full history deterministically") {
    val dirA = Files.createTempDirectory("cdc").toString
    val dirB = Files.createTempDirectory("cdc").toString
    runBatches(dirA); runBatches(dirB)
    val a = CdcStream.changeLog(spark, s"$dirA/changes")
      .collect().map(_.toString).sorted
    val b = CdcStream.changeLog(spark, s"$dirB/changes")
      .collect().map(_.toString).sorted
    assert(a === b)
  }

  test("a real file-source stream captures the same changes") {
    val dir = Files.createTempDirectory("cdcs").toString
    val in = s"$dir/in"
    new java.io.File(in).mkdirs()
    // land snapshot 0, start the stream, then land snapshot 1
    snap(s0: _*).coalesce(1).write.parquet(s"$in/snap0")
    val src = spark.readStream
      .schema(snap(s0: _*).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = CdcStream.changeStream(
      src, s"$dir/state", s"$dir/changes", s"$dir/ckpt", Seq("id")).start()
    try {
      q.processAllAvailable()
      snap(s1: _*).coalesce(1).write.parquet(s"$in/snap1")
      q.processAllAvailable()
    } finally q.stop()
    val log = CdcStream.changeLog(spark, s"$dir/changes")
      .select("batch_id", "id", "change_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(log.count(_._1 == 0L) === 3) // bootstrap adds
    assert(log.filter(_._1 == 1L).map(t => (t._2, t._3)).sorted ===
      Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }
}
