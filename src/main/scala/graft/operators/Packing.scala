package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence packing: assign documents to fixed token-budget packs for
  * LLM pre-training batches (many short documents concatenated up to a
  * context length).
  *
  * True greedy bin packing is inherently sequential; at 100 TB the
  * scalable form shards first and packs within shards:
  *
  *   1. shard by a portable hash of the id — pack assignment is
  *      embarrassingly parallel across shards and INDEPENDENT of
  *      cluster layout (a re-run reproduces every pack exactly);
  *   2. within a shard, order by id and take a running token total
  *      (one window per shard key — state is a single long);
  *   3. a document joins the pack its FIRST token falls into:
  *      `pack = floor((cumsum - tokens) / budget)` — start-fit packing,
  *      where a pack may overflow by less than one document (callers
  *      that hard-cap the context length truncate the tail document at
  *      materialization; the assignment stays deterministic).
  *
  * Everything is windows + arithmetic over a portable hash, so an
  * external SQL engine replays pack ids bit-for-bit (q_doc_packing).
  */
object Packing {

  /** @param extraKeyCols additional pack-boundary columns prepended to
    *        the shard key — e.g. a train/val/test split tag, so packs
    *        never span splits, in the SAME single pass (the window key
    *        becomes (extra..., shard); no per-split re-execution)
    */
  def packDocuments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokenBudget: Long,
      shards: Int,
      extraKeyCols: Seq[String] = Nil): DataFrame = {
    require(tokenBudget > 0 && shards > 0,
      s"need positive budget/shards, got $tokenBudget/$shards")
    val packKey = extraKeyCols :+ "shard"
    val w = Window.partitionBy(packKey.map(col): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("shard",
        pmod(TextFunctions.portableHash32(col(idCol).cast("string")), lit(shards))
          .cast("int"))
      .withColumn("__cum", sum("n_tokens").over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col("n_tokens")) / tokenBudget).cast("long"))
      .withColumn("pack_pos",
        row_number().over(
          Window.partitionBy((packKey :+ "pack_id").map(col): _*).orderBy(col(idCol)))
          .cast("long"))
      .drop("__cum")
  }
}
