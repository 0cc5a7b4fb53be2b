package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.normalizeText
import graft.plans.NativeText

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, MOSS):
  * hash every word k-gram, then keep only the minimum hash of each
  * w-length sliding window. The selected set is a position-robust
  * fingerprint with density ~1/w of the full shingle set, and any
  * shared run of at least w + k - 1 words between two documents is
  * GUARANTEED to contribute at least one common fingerprint — the
  * partial-overlap detector that whole-document minhash misses (a
  * paragraph lifted into an otherwise different document barely moves
  * a global signature, but its winnowed fingerprints survive verbatim).
  *
  * Scale shape mirrors [[Dedup.minHashCandidates]]: fingerprinting is
  * one codegen'd per-row pass (shingle hashes -> winnow selection, no
  * shuffle); overlap detection groups by fingerprint VALUE — one
  * shuffle whose key cardinality grows with the corpus, never
  * all-pairs. Ubiquitous fingerprints (boilerplate shared by thousands
  * of documents) are dropped by a document-frequency cap before
  * pairing, exactly the `maxBucket` bound of the LSH path: a
  * fingerprint every document shares identifies nothing and would
  * alone produce a quadratic bucket.
  */
object Winnowing {

  /** Per-document winnowed fingerprints, exploded to (id, fp) rows —
    * the join-ready inverted-index shape (and what a 100 TB pipeline
    * would persist, bucketed by fp, to amortize re-fingerprinting).
    *
    * @param k word-shingle size (k-gram granularity of matching)
    * @param w winnow window: one fingerprint guaranteed per w
    *          consecutive shingles; density ~1/w
    */
  def fingerprints(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 2,
      w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    NativeText.register(df.sparkSession)
    df.select(
      col(idCol).as("id"),
      explode(NativeText.winnowMin(
        NativeText.shingleHash32(
          split(normalizeText(col(textCol)), " "), k), w)).as("fp"))
  }

  /** Candidate near/partial-duplicate pairs: documents sharing at
    * least `minShared` winnowed fingerprints, with the shared count as
    * match strength. One groupBy-fingerprint shuffle + one aggregate
    * over bucket-local pairs; `maxDf` drops boilerplate fingerprints
    * (df > maxDf documents) before any pair is formed.
    */
  def overlapCandidates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 2,
      w: Int = 4,
      minShared: Int = 2,
      maxDf: Int = 100): DataFrame = {
    val fps = fingerprints(df, textCol, idCol, k, w)
    val buckets = fps
      .groupBy("fp")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
    buckets
      .select(graft.operators.Dedup.orderedPairs(col("ids")).as("p"))
      .groupBy(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }
}
