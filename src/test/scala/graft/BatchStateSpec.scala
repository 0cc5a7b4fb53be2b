package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.sources.AtomicDir
import graft.streaming.BatchState

/** Crash-window repair for the per-batch state stores: every read and
  * write entry point must repair an interrupted compaction BEFORE
  * touching the store, or state silently vanishes (a decontamination
  * store reporting a clean corpus over orphaned hashes).
  */
class BatchStateSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def writeBatch(dir: String, id: Long, rows: Seq[Long]): Unit =
    rows.toDF("v").write.mode("overwrite").parquet(s"$dir/batch_id=$id")

  private def values(dir: String): Set[Long] =
    BatchState.read(spark, dir).map(_.select("v").as[Long].collect().toSet)
      .getOrElse(Set.empty)

  test("read repairs a store displaced by an interrupted compaction") {
    val root = Files.createTempDirectory("bstate").toString
    val store = s"$root/store"
    writeBatch(store, 0L, Seq(1L, 2L))
    // simulate a crash between dest->old and tmp->dest: the whole store
    // sits under .__old__, dest is gone
    val dest = new Path(store)
    assert(fs.rename(dest, AtomicDir.oldPath(dest)))
    assert(!fs.exists(dest))
    assert(values(store) == Set(1L, 2L)) // read recovered it
    assert(BatchState.maxBatchId(spark, store).contains(0L))
    assert(!fs.exists(AtomicDir.oldPath(dest))) // leftover cleaned
  }

  test("batchDir repairs before a write can recreate the store") {
    val root = Files.createTempDirectory("bstate").toString
    val store = s"$root/store"
    writeBatch(store, 0L, Seq(1L, 2L))
    val dest = new Path(store)
    assert(fs.rename(dest, AtomicDir.oldPath(dest)))
    // next micro-batch writes through batchDir: the old state must be
    // restored first, not orphaned beside a fresh one-batch store
    Seq(3L).toDF("v").write.mode("overwrite")
      .parquet(BatchState.batchDir(spark, store, 1L))
    assert(values(store) == Set(1L, 2L, 3L))
    assert(BatchState.maxBatchId(spark, store).contains(1L))
  }

  test("recover re-attaches batches streamed during a compaction") {
    val root = Files.createTempDirectory("bstate").toString
    val store = s"$root/store"
    // post-swap dest: the compacted batch (keepBatchId = 5)
    writeBatch(store, 5L, Seq(1L, 2L, 3L))
    // crash before cleanup: .__old__ still holds the pre-compaction
    // batches (3 — already folded into 5) and a LATE batch 6 a live
    // stream wrote mid-compaction
    val dest = new Path(store)
    val old = AtomicDir.oldPath(dest)
    Seq(10L).toDF("v").write.parquet(new Path(old, "batch_id=3").toString)
    Seq(4L).toDF("v").write.parquet(new Path(old, "batch_id=6").toString)
    assert(values(store) == Set(1L, 2L, 3L, 4L)) // 6 re-attached, 3 dropped
    assert(BatchState.maxBatchId(spark, store).contains(6L))
    assert(!fs.exists(old))
  }

  test("swap compacts to one batch keyed by the max id") {
    val root = Files.createTempDirectory("bstate").toString
    val store = s"$root/store"
    writeBatch(store, 0L, Seq(1L))
    writeBatch(store, 1L, Seq(2L))
    writeBatch(store, 2L, Seq(3L))
    BatchState.swap(spark, store,
      BatchState.read(spark, store).get.select("v"), keepBatchId = 2L)
    assert(values(store) == Set(1L, 2L, 3L))
    assert(BatchState.maxBatchId(spark, store).contains(2L))
    val dirs = fs.listStatus(new Path(store))
      .map(_.getPath.getName).filter(_.startsWith("batch_id=")).toSeq
    assert(dirs == Seq("batch_id=2"))
  }
}
