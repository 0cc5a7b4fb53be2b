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
  * own rows plus a cell-partitioned write; search reads only the
  * probed cells (partition pruning over cell=N directories), the same
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
      .parquet(s"$stateDir/batch_id=$batchId")
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

  /** The live index: every streamed assignment, deduped on id (replay
    * and redelivery produce byte-identical rows, so any survivor is
    * THE assignment). Shaped like [[IvfIndex.index]] for
    * [[IvfIndex.searchIndex]]. Empty state yields an empty frame.
    */
  def index(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) ||
      !fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id=")))
      return Seq.empty[(Long, Seq[Double], Int)].toDF("id", "nv", "cell")
    spark.read.parquet(stateDir)
      .select(col("id"), col("nv"), col("cell").cast("int").as("cell"))
      .dropDuplicates("id")
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
