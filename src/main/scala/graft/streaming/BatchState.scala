package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared read guard for the per-batch state stores every streamed
  * operator in this package maintains (`stateDir/batch_id=N` parquet,
  * one directory per micro-batch, overwrite-on-replay).
  *
  * An absent store — or one holding no completed batch yet — has no
  * parquet schema to infer, so readers must distinguish "no state"
  * from "state"; this is that single decision point (it used to be
  * copy-pasted per store).
  *
  * Crash safety: [[swap]] (compaction) stages through
  * [[graft.sources.AtomicDir]], and every read/write entry point calls
  * [[recover]] first, so an interrupted compaction is repaired before
  * the store is read — or, worse, recreated by the next micro-batch
  * write, which would permanently orphan the displaced `.__old__`
  * state and silently reset the store to empty (for a decontamination
  * store that is a safety false-negative: a clean-corpus report over
  * vanished hashes).
  */
private[graft] object BatchState {

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def batchIds(fs: FileSystem, p: Path): Seq[Long] =
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)

  /** Repair an interrupted [[swap]]. Two crash windows exist:
    *
    *   - dest renamed to `.__old__`, tmp not yet renamed in →
    *     [[graft.sources.AtomicDir.recover]] restores the old store;
    *   - tmp renamed in, late-batch re-attach or `.__old__` cleanup not
    *     finished → any `batch_id=N` directory in `.__old__` NEWER than
    *     everything in dest is a micro-batch that a live stream wrote
    *     during the compaction; it is moved back before the leftover is
    *     deleted, so compacting under a running stream loses nothing.
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    import graft.sources.AtomicDir
    val (fs, dest) = fsOf(spark, dir)
    val old = AtomicDir.oldPath(dest)
    if (fs.exists(dest) && fs.exists(old)) {
      val destMax = batchIds(fs, dest).maxOption
      batchIds(fs, old).filter(id => destMax.forall(_ < id)).foreach { id =>
        val from = new Path(old, s"batch_id=$id")
        if (!fs.rename(from, new Path(dest, s"batch_id=$id")))
          throw new java.io.IOException(s"re-attach $from -> $dest failed")
      }
    }
    AtomicDir.recover(fs, dest)
  }

  /** Target directory for one micro-batch's state write. Runs
    * [[recover]] first: a write after an interrupted compaction must
    * repair the store, not recreate it beside the displaced data.
    */
  def batchDir(spark: SparkSession, dir: String, batchId: Long): String = {
    recover(spark, dir)
    s"$dir/batch_id=$batchId"
  }

  /** The store under `dir` as one frame (batch_id surfaces as a
    * partition column), or None when no batch has committed yet.
    */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    recover(spark, dir)
    val (fs, p) = fsOf(spark, dir)
    if (fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id=")))
      Some(spark.read.parquet(dir))
    else None
  }

  /** The highest committed batch id under `dir` (None when batchless). */
  def maxBatchId(spark: SparkSession, dir: String): Option[Long] = {
    recover(spark, dir)
    val (fs, p) = fsOf(spark, dir)
    batchIds(fs, p).maxOption
  }

  /** All committed batch ids under `dir`, ascending ([[recover]]ed
    * first) — what ADDITIVE stores' compactions consult to fold every
    * batch EXCEPT the newest: replaying the newest (the one batch
    * Structured Streaming may redeliver after a crash-before-commit)
    * then overwrites only its own partition; folding it into the
    * compacted dir would let that replay erase the whole merged
    * history.
    */
  def committedBatchIds(spark: SparkSession, dir: String): Seq[Long] = {
    recover(spark, dir)
    val (fs, p) = fsOf(spark, dir)
    batchIds(fs, p).sorted
  }

  /** Compaction for ADDITIVE stores (counts/sums — state that merges
    * by addition, where a replayed batch landing beside an
    * already-folded copy of itself would double-count): fold every
    * batch STRICTLY BELOW the newest into `batch_id = secondMax` via
    * `resolve` (the store's merge aggregation, applied to the
    * sub-store `batch_id < max`); the newest batch keeps its own
    * directory ([[swap]] re-attaches ids above the keep id from the
    * displaced store). A post-crash replay of the newest batch — the
    * one delivery Structured Streaming repeats when it crashed before
    * the checkpoint commit — then overwrites only its own partition;
    * folding it in would let that replay silently erase the whole
    * merged history. No-op with fewer than two committed batches.
    *
    * (The latest-wins and distinct-union stores keep their
    * fold-everything compactions: re-delivered state is idempotent
    * under their merges.)
    */
  def compactExceptNewest(spark: SparkSession, dir: String)(
      resolve: DataFrame => DataFrame): Unit = {
    val ids = committedBatchIds(spark, dir)
    if (ids.size >= 2) {
      val maxId = ids.last
      val keep = ids(ids.size - 2)
      read(spark, dir).foreach { st =>
        swap(spark, dir,
          resolve(st.filter(org.apache.spark.sql.functions.col("batch_id") < maxId)),
          keep)
      }
    }
  }

  /** Replace the ENTIRE store with `resolved` as one batch directory
    * keyed `batch_id=keepBatchId` — compaction for the per-batch
    * stores. Staged through a temp directory and an atomic swap
    * ([[graft.sources.AtomicDir]]), so a crash mid-compact or a
    * concurrent reader never observes a half-written store. Keeping
    * the MAX committed batch id means batches streamed after the
    * compaction still sort later and win any latest-wins resolution.
    *
    * Safe under a live stream: a `batch_id=N` directory written by a
    * concurrent foreachBatch between the caller's read of the store
    * and the swap lands in the displaced `.__old__`; every id above
    * `keepBatchId` is re-attached to the new store before cleanup
    * (and [[recover]] finishes the re-attach after a crash).
    */
  def swap(
      spark: SparkSession,
      dir: String,
      resolved: DataFrame,
      keepBatchId: Long,
      partitionBy: Seq[String] = Nil): Unit = {
    import graft.sources.AtomicDir
    val (fs, dest) = fsOf(spark, dir)
    recover(spark, dir)
    val tmp = AtomicDir.tmpPath(dest)
    fs.delete(tmp, true)
    // materializes `resolved` (which typically reads `dest`) BEFORE any
    // rename touches the store
    val w = resolved.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(new Path(tmp, s"batch_id=$keepBatchId").toString)
    val old = AtomicDir.oldPath(dest)
    fs.delete(old, true)
    if (fs.exists(dest) && !fs.rename(dest, old))
      throw new java.io.IOException(s"rename $dest -> $old failed")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"rename $tmp -> $dest failed")
    if (fs.exists(old)) {
      batchIds(fs, old).filter(_ > keepBatchId).foreach { id =>
        val from = new Path(old, s"batch_id=$id")
        if (!fs.rename(from, new Path(dest, s"batch_id=$id")))
          throw new java.io.IOException(s"re-attach $from -> $dest failed")
      }
    }
    fs.delete(old, true)
    ()
  }
}
