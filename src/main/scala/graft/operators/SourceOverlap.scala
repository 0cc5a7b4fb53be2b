package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.NativeText

/** Cross-source content-overlap matrix: for every pair of corpus
  * sources, the number of distinct token n-gram shingles they share
  * and the shingle-set Jaccard — the corpus-level contamination /
  * provenance audit ("how much of source A is already inside source
  * B") that decides which crawls to drop before document-level dedup
  * runs. Exact-document fingerprints miss partial copies; shingle
  * overlap catches them.
  *
  * Scale shape: shingles are hashed in one native pass
  * ([[graft.plans.NativeText.shingleHash32]] — no n-word strings are
  * materialized or shuffled), then ONE wide exchange on the hash —
  * `collect_set` absorbs the within-source distinct for free (the set
  * is bounded by #sources, and partial aggregation collapses repeats
  * map-side), so there is no separate dedup pass — then the pair
  * expansion inside each (tiny) source set and a groupBy on the
  * O(sources²) pair space. Never a document-pair or source-pair scan
  * of the data. Per-source distinct-shingle totals are one row per
  * source: they reduce in a bounded job at query construction (the
  * same bounded-driver-state pattern as the heavy-hitter sketch and
  * IVF centroids) and enter the pair table as a literal map lookup —
  * joining them back instead would inline the shingle aggregation
  * subtree once per join side. A 32-bit hash collision can merge two
  * distinct shingles (deterministically — the oracle replays the same
  * hash), shifting counts by at most the corpus-wide collision budget
  * |shingles|²/2³³; a 100 TB run would widen the kernel to 64-bit.
  */
object SourceOverlap {

  /** Pairwise shared-shingle counts and Jaccard between sources.
    * Output: (src_a, src_b, shared_shingles, n_a, n_b, jaccard),
    * one row per unordered pair with at least one shared shingle,
    * src_a < src_b.
    */
  def matrix(docs: DataFrame, sourceCol: String, textCol: String, n: Int = 8): DataFrame = {
    NativeText.register(docs.sparkSession)
    val grouped = docs
      .select(col(sourceCol).as("src"),
        explode(NativeText.shingleHash32(
          split(TextFunctions.normalizeText(col(textCol)), " "), n)).as("gram"))
      .groupBy("gram")
      .agg(sort_array(collect_set(col("src"))).as("srcs"))
    val perSource: Map[String, Long] = grouped
      .select(explode(col("srcs")).as("src"))
      .groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = typedLit(perSource)
    val pairs = grouped
      .filter(size(col("srcs")) >= 2)
      .select(graft.operators.Dedup.orderedPairs(col("srcs")).as("p"))
      .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
      .agg(count(lit(1)).as("shared_shingles"))
    pairs
      .withColumn("n_a", element_at(totals, col("src_a")))
      .withColumn("n_b", element_at(totals, col("src_b")))
      .select(col("src_a"), col("src_b"), col("shared_shingles"),
        col("n_a"), col("n_b"),
        round(col("shared_shingles").cast("double") /
          (col("n_a") + col("n_b") - col("shared_shingles")), 6).as("jaccard"))
  }
}
