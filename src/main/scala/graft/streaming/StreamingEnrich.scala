package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.sources.AtomicDir

/** Enrich an event stream against a dimension table that a batch SCD
  * job keeps up to date — the standard "attach current customer state
  * to each event" ingest step.
  *
  * A naive stream-static join pins the dimension's file listing at
  * query start: a stream running for weeks keeps joining against the
  * dimension as it looked at launch. This operator instead re-reads
  * the dimension INSIDE `foreachBatch`, so every micro-batch sees the
  * newest atomically-committed version ([[AtomicDir.recover]] first —
  * half-committed swaps from a crashed writer are repaired, never
  * read). The dimension is broadcast per batch: dimension tables are
  * the small side by construction (current view, one row per entity);
  * the unbounded side streams.
  */
object StreamingEnrich {

  /** The foreachBatch body (directly callable for tests/backfill/the
    * driver gate): repair + re-read the freshest dimension, broadcast
    * left-join the batch against it, hand the result to `sink`.
    */
  def enrichBatch(
      dimPath: String,
      keyCols: Seq[String],
      sink: (DataFrame, Long) => Unit)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val p = new Path(dimPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicDir.recover(fs, p)
    val dim = spark.read.parquet(dimPath)
    sink(batch.join(broadcast(dim), keyCols, "left"), batchId)
  }

  /** foreachBatch writer enriching each micro-batch against the
    * freshest dimension at `dimPath`.
    *
    * @param keyCols  equi-join keys (left join: events with no
    *                 dimension row pass through with nulls)
    * @param sink     what to do with each enriched micro-batch
    */
  def enrichedWriter(
      events: DataFrame,
      dimPath: String,
      keyCols: Seq[String],
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    events.writeStream
      .foreachBatch(enrichBatch(dimPath, keyCols, sink) _)
}
