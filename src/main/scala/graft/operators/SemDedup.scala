package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.NativeVector

/** Semantic deduplication: drop documents whose embedding is
  * near-identical to an earlier document's, restricting the pairwise
  * search to k-means cells (the SemDeDup recipe: cluster with a coarse
  * quantizer, then prune within each cluster — cross-cluster pairs are
  * by construction far apart and never compared).
  *
  * The keep rule is deterministic and engine-portable: a document is
  * dropped iff some LOWER-id document in the same cell has cosine
  * similarity >= tau with it, and `dup_of` records the smallest such
  * id. No iteration, no randomness — the same corpus always prunes to
  * the same survivor set, and the DuckDB oracle replays the whole
  * decision (assignment, pairing, threshold) from the raw vectors.
  *
  * Scale shape: one shuffle to co-locate each cell, then a
  * cell-partitioned self-join — the work is sum(|cell|^2), bounded by
  * `maxCell` (checked against the at-most-k-row cell histogram, the
  * same bounded-driver-state contract as [[IvfIndex.train]]'s centroid
  * collect). At 100 TB the knob is k: more cells, smaller quadratic
  * terms; the embedding-LSH path ([[SimilaritySearch]]) covers corpora
  * where no quantizer keeps cells small. The assigned corpus is
  * materialized ([[IvfIndex.index]]) so the k-way scoring expression is
  * evaluated once per row, not once per joined pair.
  */
object SemDedup {

  /** Per-document prune report: (id, cell, dup_of, kept) — `dup_of` is
    * the smallest same-cell id with cosine >= tau, or -1 when the
    * document is kept.
    */
  def prune(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: IvfIndex.Model,
      tau: Double,
      maxCell: Long = 1L << 20): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau out of (0, 1]: $tau")
    NativeVector.register(df.sparkSession)
    val idx = IvfIndex.index(df, idCol, vecCol, model)
    // <= k rows: the cell histogram, not the data
    val sizes = idx.groupBy("cell").count().collect()
    val biggest = if (sizes.isEmpty) 0L else sizes.map(_.getLong(1)).max
    require(biggest <= maxCell,
      s"largest cell holds $biggest vectors (> maxCell=$maxCell) — " +
        "retrain with larger k or route through the LSH near-dup path")
    val a = idx.select(col("cell"), col("id").as("a_id"), col("nv").as("a_nv"))
    val b = idx.select(col("cell"), col("id").as("b_id"), col("nv").as("b_nv"))
    val dups = a.join(b, "cell")
      .filter(col("b_id") < col("a_id") &&
        round(NativeVector.dot(col("a_nv"), col("b_nv")), 6) >= tau)
      .groupBy(col("a_id").as("id"))
      .agg(min("b_id").as("dup_of"))
    idx.select(col("id"), col("cell").cast("long").as("cell"))
      .join(dups, Seq("id"), "left")
      .withColumn("kept", col("dup_of").isNull)
      .withColumn("dup_of", coalesce(col("dup_of"), lit(-1L)))
      .select("id", "cell", "dup_of", "kept")
  }
}
