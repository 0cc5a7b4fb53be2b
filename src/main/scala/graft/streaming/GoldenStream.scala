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
  * off the count store (MostFrequent / MaxOf / MinOf) is a function
  * of the counts alone; LatestBy rides the companion latest-wins
  * store ([[latestBatch]] / [[latest]] — per-batch argmax winners,
  * re-argmaxed across partitions on read).
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

  // ---- the latest-wins companion store: LatestBy rules live here
  // (argmax by (ord, tie_id) is a semilattice — each batch keeps its
  // per-(entity, attr) winner, the read side re-argmaxes across batch
  // partitions), closing the "LatestBy stays batch-side" caveat the
  // count store alone carries. |entities|·|attrs|-bounded per batch.

  /** Fold one batch's LatestBy winners into the latest-wins store. */
  def latestBatch(
      batch: DataFrame,
      entityCol: String,
      rules: Seq[Survivorship.LatestBy],
      stateDir: String,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    Survivorship.latestRecords(batch, entityCol, rules)
      .write.mode(SaveMode.Overwrite)
      .parquet(BatchState.batchDir(batch.sparkSession, stateDir, batchId))
  }

  /** The live LatestBy values off the merged latest-wins store (one
    * row per entity; values type-erased as strings — cast at the
    * read site, and see [[Survivorship.latestFromState]]'s
    * string-order contract for the order column).
    */
  def latest(
      spark: SparkSession,
      stateDir: String,
      rules: Seq[Survivorship.LatestBy]): Option[DataFrame] =
    BatchState.read(spark, stateDir)
      .map(Survivorship.latestFromState(_, rules))

  /** Compact the latest-wins store (argmax merge — lossless). */
  def compactLatest(spark: SparkSession, stateDir: String): Unit =
    BatchState.compactExceptNewest(spark, stateDir)(
      _.groupBy(col("entity_id"), col("attr"))
        .agg(max(struct(col("ord"), col("tie_id"), col("value"))).as("w"))
        .select(col("entity_id"), col("attr"),
          col("w.ord").as("ord"), col("w.tie_id").as("tie_id"),
          col("w.value").as("value")))
}
