package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic document chunking with overlap — long documents into
  * model-window-sized pieces, the step between curation and
  * tokenization for context-bounded training.
  *
  * Chunk starts are `1, 1+step, 1+2*step, …` over the normalized word
  * array (`step = maxTokens - overlap`), so consecutive chunks share
  * `overlap` words of context. A trailing start whose chunk would add
  * no new words beyond the previous chunk's reach is dropped
  * (`start + overlap > n` with start > 1): coverage stays complete —
  * the previous chunk provably reaches the last word — without a
  * redundant fully-contained tail chunk.
  *
  * Scale shape: split + sequence + posexplode + slice, all inside
  * whole-stage codegen; per-row work only, no shuffle, layout
  * independent. Chunk ids are a pure function of (doc, position), so
  * reruns and external engines reproduce them exactly.
  */
object Chunking {

  def chunkDocuments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    val step = maxTokens - overlap
    docs
      .withColumn("__w", split(TextFunctions.normalizeText(col(textCol)), " "))
      .withColumn("__n", size(col("__w")))
      .select(col(idCol), col("__w"), col("__n"),
        posexplode(sequence(lit(1), greatest(col("__n"), lit(1)), lit(step)))
          .as(Seq("chunk_id", "__s")))
      .filter(col("__s") === 1 || col("__s") + overlap <= col("__n"))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        least(lit(maxTokens), col("__n") - col("__s") + 1).cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("__w"), col("__s"), lit(maxTokens))).as("chunk_text"))
  }
}
