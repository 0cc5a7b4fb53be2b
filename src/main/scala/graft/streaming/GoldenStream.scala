package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Survivorship

/** The LIVE golden record — master data maintained as records arrive:
  * per micro-batch, fold the batch's entity-labelled records into a
  * batch_id-partitioned (entity × attr × value) count store; the
  * served golden record over the summed store EXACTLY equals
  * [[Survivorship.goldenRecord]] on the union of every delivered
  * batch, because value counts are additive and every rule served
  * here (MostFrequent / MaxOf / MinOf) is a function of the counts
  * alone (LatestBy needs per-row order state and stays batch-side).
  *
  * This closes the MDM loop the batch operators open: linkage
  * ([[LinkageStream]]) scores pairs as the dirty feed lands, cluster
  * labels assign entities, and THIS store keeps each entity's
  * canonical attributes current without ever recomputing the corpus —
  * per batch it aggregates only the rows the batch delivered.
  *
  * Replay-safe (a re-run of batch N overwrites only `batch_id=N`),
  * compactable by sum, state bounded by the observed
  * (entity × attr × value) combination space.
  */
object GoldenStream {

  /** Fold one micro-batch of entity-labelled records into the store. */
  def countBatch(
      batch: DataFrame,
      entityCol: String,
      attrCols: Seq[String],
      stateDir: String,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    Survivorship.countRecords(batch, entityCol, attrCols)
      .write.mode(SaveMode.Overwrite)
      .parquet(BatchState.batchDir(batch.sparkSession, stateDir, batchId))
  }

  /** Attach the fold to a streaming source of entity-labelled records. */
  def start(
      stream: Dataset[_],
      entityCol: String,
      attrCols: Seq[String],
      stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[_], batchId: Long) =>
        countBatch(batch.toDF(), entityCol, attrCols, stateDir, batchId)
      }
      .start()

  /** The live golden record off the cumulative store (None before the
    * first batch). Values come back as strings (the store is
    * type-erased so one store serves every attribute) — cast at the
    * read site.
    */
  def goldenRecord(
      spark: SparkSession,
      stateDir: String,
      rules: Seq[Survivorship.Rule]): Option[DataFrame] =
    BatchState.read(spark, stateDir)
      .map(Survivorship.goldenRecordFromCounts(_, rules))

  /** Collapse all but the newest batch partition (counts merge by sum). */
  def compact(spark: SparkSession, stateDir: String): Unit =
    BatchState.compactExceptNewest(spark, stateDir)(
      _.groupBy(col("entity_id"), col("attr"), col("value"))
        .agg(sum("n").as("n")))
}
