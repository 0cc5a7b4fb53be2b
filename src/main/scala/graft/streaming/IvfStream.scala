package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IvfIndex

/** Streaming IVF index maintenance — embeddings stream in (a live
  * ingestion of freshly embedded documents) and the similarity index
  * stays searchable without re-assigning the corpus. Same
  * per-batch-state + merge-on-read contract as the other streamed
  * stores ([[KmvStream]], [[ReservoirStream]],
  * [[DecontaminationStream]]).
  *
  * The quantizer ([[IvfIndex.Model]]) is FIXED — trained once on a
  * reference sample, exactly how production ANN services version their
  * coarse quantizer separately from the ingested corpus. Cell
  * assignment is a pure function of (model, vector), so the union of
  * per-batch assignments equals the batch [[IvfIndex.assign]] over
  * everything ever streamed; dedup on id makes redelivery and replay
  * harmless (a re-assigned vector lands in the same cell with the same
  * normalized form).
  *
  * Scale shape: each micro-batch pays one map-only assignment over its
  * own rows plus a cell-partitioned write. While multiple batch
  * directories exist, reads resolve latest-per-id first (one exchange
  * over the accumulated state); [[compact]] collapses the store to a
  * single resolved batch, after which reads skip the resolution and
  * the probed cells prune at the cell=N directory level, the same
  * pruning [[IvfIndex.save]] buys for the batch index.
  */
object IvfStream {

  /** Assign one micro-batch under `stateDir/batch_id=N`, partitioned
    * by cell for probe-side pruning. Empty batches write nothing.
    */
  def mergeBatch(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      model: IvfIndex.Model,
      stateDir: String,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    IvfIndex.assign(batch, idCol, vecCol, model)
      .select(col("id"), col("nv"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(BatchState.batchDir(batch.sparkSession, stateDir, batchId))
  }

  /** Attach the per-batch assigner to a streaming embedding feed. */
  def start(
      stream: Dataset[_],
      idCol: String,
      vecCol: String,
      model: IvfIndex.Model,
      stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[_], batchId: Long) =>
        mergeBatch(batch.toDF(), idCol, vecCol, model, stateDir, batchId)
      }
      .start()

  /** The live index: every streamed assignment, resolved to the
    * LATEST batch per id — deterministic under replay (byte-identical
    * rows) AND under re-embedding (a corrected vector in a later batch
    * wins; `dropDuplicates` would keep a partition-order-dependent
    * survivor). Shaped like [[IvfIndex.index]] for
    * [[IvfIndex.searchIndex]]. Empty state yields an empty frame.
    *
    * Cost note: the latest-wins resolution aggregates the whole
    * accumulated state before the search's cell join, which blocks
    * cell-level partition pruning while more than one batch directory
    * exists. [[compact]] collapses the store to a single batch so
    * steady-state reads skip the aggregation entirely.
    */
  def index(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    BatchState.read(spark, stateDir) match {
      case None =>
        Seq.empty[(Long, Seq[Double], Int)].toDF("id", "nv", "cell")
      case Some(state) =>
        val base = state
          .select(col("id"), col("nv"), col("cell").cast("int").as("cell"),
            col("batch_id"))
        // fast-path decision from the frame's OWN file-index snapshot
        // (not a second filesystem listing, which could disagree with
        // the scanned files if a compaction or batch write lands
        // between the two listings)
        val nBatches = state.inputFiles
          .flatMap(_.split('/').find(_.startsWith("batch_id=")))
          .distinct.length
        if (nBatches <= 1) base.drop("batch_id") // already unique per id
        else base
          .withColumn("__rn",
            org.apache.spark.sql.functions.row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("id").orderBy(col("batch_id").desc)))
          .filter(col("__rn") === 1)
          .drop("__rn", "batch_id")
    }
  }

  /** Collapse the accumulated batch directories into ONE resolved
    * batch (keyed max(batch_id), so later streamed batches keep
    * winning), staged through a temp directory and an atomic swap —
    * a crash mid-compact or a concurrent reader never sees a
    * half-written store. After compaction, [[index]] takes its
    * single-batch fast path: no aggregation, and the probed cells
    * prune at the directory level again.
    * Single-writer: run at most ONE compaction against a store at a
    * time — the swap protocol tolerates a live stream writer and
    * crash/recovery, but two concurrent compactors race on the same
    * rename sequence ([[BatchState.swap]]).
    */
  def compact(spark: SparkSession, stateDir: String): Unit =
    BatchState.maxBatchId(spark, stateDir).foreach { maxBatch =>
      BatchState.swap(spark, stateDir, index(spark, stateDir),
        maxBatch, partitionBy = Seq("cell"))
    }

  /** Search the live index — same contract as [[IvfIndex.search]] over
    * everything ever streamed.
    */
  def search(
      queries: DataFrame,
      spark: SparkSession,
      stateDir: String,
      idCol: String,
      vecCol: String,
      model: IvfIndex.Model,
      kNeighbors: Int,
      nprobe: Int): DataFrame =
    IvfIndex.searchIndex(queries, index(spark, stateDir),
      idCol, vecCol, model, kNeighbors, nprobe)
}
