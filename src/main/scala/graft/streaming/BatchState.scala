package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared read guard for the per-batch state stores every streamed
  * operator in this package maintains (`stateDir/batch_id=N` parquet,
  * one directory per micro-batch, overwrite-on-replay).
  *
  * An absent store — or one holding no completed batch yet — has no
  * parquet schema to infer, so readers must distinguish "no state"
  * from "state"; this is that single decision point (it used to be
  * copy-pasted per store).
  */
private[graft] object BatchState {

  /** The store under `dir` as one frame (batch_id surfaces as a
    * partition column), or None when no batch has committed yet.
    */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id=")))
      Some(spark.read.parquet(dir))
    else None
  }

  /** The highest committed batch id under `dir` (None when batchless). */
  def maxBatchId(spark: SparkSession, dir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val ids = fs.listStatus(p)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Replace the ENTIRE store with `resolved` as one batch directory
    * keyed `batch_id=keepBatchId` — compaction for the per-batch
    * stores. Staged through a temp directory and an atomic swap
    * ([[graft.sources.AtomicDir]]), so a crash mid-compact or a
    * concurrent reader never observes a half-written store. Keeping
    * the MAX committed batch id means batches streamed after the
    * compaction still sort later and win any latest-wins resolution.
    */
  def swap(
      spark: SparkSession,
      dir: String,
      resolved: DataFrame,
      keepBatchId: Long,
      partitionBy: Seq[String] = Nil): Unit = {
    import graft.sources.AtomicDir
    val dest = new org.apache.hadoop.fs.Path(dir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = AtomicDir.tmpPath(dest)
    fs.delete(tmp, true)
    val w = resolved.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(new org.apache.hadoop.fs.Path(tmp, s"batch_id=$keepBatchId").toString)
    AtomicDir.commit(fs, dest)
  }
}
