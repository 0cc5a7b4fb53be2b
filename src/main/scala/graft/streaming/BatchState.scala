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
}
