package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969, "A theory for
  * record linkage"): match rows of two tables that describe the same
  * real-world entity but disagree on bytes — the cross-SOURCE sibling
  * of near-dup detection, and the step that merges a re-crawl, a
  * vendor feed, or an OCR re-extract into an existing dimension
  * without a shared key.
  *
  * Each candidate pair draws a log-likelihood-ratio weight per
  * compared field: `ln(m/u)` when the field agrees, `ln((1−m)/(1−u))`
  * when it doesn't, where `m` = P(agree | same entity) and `u` =
  * P(agree | different entities). The summed weight classifies the
  * pair against two thresholds into `match` / `possible` (clerical
  * review) / `non_match`.
  *
  * Scale shape: candidates come ONLY from an equi-join on caller-
  * chosen blocking keys (Christen 2012's indexing step) — never
  * all-pairs; the field comparators and weight sum are a codegen'd
  * projection on the joined rows. Candidate volume is
  * Σ_blocks |L_b|·|R_b| — the blocking key's selectivity is the
  * user's scale lever, and `maxBlock` hard-bounds degenerate keys the
  * same way the LSH dedup bounds degenerate buckets (dropped blocks
  * are returned, not swallowed: a dropped block is lost recall).
  * Weights are driver-computed literal doubles (6 dp), so scoring
  * replays bit-identically in any engine — no runtime `ln` anywhere.
  */
object RecordLinkage {

  /** One compared field: `left`/`right` column names, the F-S m/u
    * probabilities, and `maxDist` — 0 for exact agreement, otherwise
    * the Levenshtein tolerance (typo-robust string agreement).
    */
  final case class LinkField(
      left: String, right: String, m: Double, u: Double, maxDist: Int = 0) {
    require(m > 0.0 && m < 1.0, s"m must be in (0, 1), got $m")
    require(u > 0.0 && u < 1.0, s"u must be in (0, 1), got $u")
    require(m > u, s"m must exceed u (agreement must be evidence), got m=$m u=$u")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** `ln(m/u)` rounded to 6 dp — the literal the plan carries. */
  def agreeWeight(f: LinkField): Double = round6(math.log(f.m / f.u))

  /** `ln((1−m)/(1−u))` rounded to 6 dp. */
  def disagreeWeight(f: LinkField): Double =
    round6(math.log((1.0 - f.m) / (1.0 - f.u)))

  /** Blocked candidate generation + F-S scoring + classification.
    *
    * @param blockOn  (leftCol, rightCol) blocking-key pairs; candidates
    *                 are rows agreeing on EVERY pair (equi-join)
    * @param keep     columns (from either side) carried into the output
    * @param upper    weight ≥ upper ⇒ `match`
    * @param lower    weight ≤ lower ⇒ `non_match`; between ⇒ `possible`
    * @param maxBlock 0 = unbounded; otherwise blocks where
    *                 |L_b| · |R_b| would exceed it are EXCLUDED from
    *                 the candidate join and returned in the second
    *                 frame — surface it, a dropped block is lost recall
    * @return (scored candidates: keep ++ agree_<leftCol> flags ++
    *         weight ++ verdict, dropped blocks: block cols + l_n + r_n)
    */
  def link(
      left: DataFrame,
      right: DataFrame,
      blockOn: Seq[(String, String)],
      fields: Seq[LinkField],
      keep: Seq[String],
      upper: Double,
      lower: Double,
      maxBlock: Long = 0L): (DataFrame, DataFrame) = {
    require(blockOn.nonEmpty, "need at least one blocking-key pair")
    require(fields.nonEmpty, "need at least one compared field")
    require(upper >= lower, s"upper ($upper) must be >= lower ($lower)")
    require(maxBlock >= 0L, s"maxBlock must be >= 0, got $maxBlock")

    val joinCond = blockOn
      .map { case (l, r) => left(l) === right(r) }
      .reduce(_ && _)

    // oversized-block guard: per-block counts on each side are two
    // map-side-combined aggregates over the blocking keys; the join of
    // the two bounded count tables is the |blocks|-sized drop list
    val (candL, candR, droppedBlocks) =
      if (maxBlock == 0L) {
        (left, right, left.select(blockOn.map(b => col(b._1)): _*).limit(0)
          .withColumn("l_n", lit(0L)).withColumn("r_n", lit(0L)))
      } else {
        val lCounts = left.groupBy(blockOn.map(b => col(b._1)): _*)
          .agg(count(lit(1)).as("l_n"))
        val rCounts = right.groupBy(blockOn.map(b => col(b._2)): _*)
          .agg(count(lit(1)).as("r_n"))
        val joined = lCounts.join(rCounts,
          blockOn.map { case (l, r) => lCounts(l) === rCounts(r) }.reduce(_ && _))
        val dropped = joined
          .filter(col("l_n") * col("r_n") > maxBlock)
          .select(blockOn.map(b => lCounts(b._1)) :+ col("l_n") :+ col("r_n"): _*)
          .localCheckpoint(true) // |oversized blocks|-bounded
        val dropKeys = dropped.select(blockOn.map(b => col(b._1)): _*)
        val lOk = left.join(broadcast(dropKeys),
          blockOn.map(b => left(b._1) === dropKeys(b._1)).reduce(_ && _),
          "left_anti")
        val rOk = right.join(broadcast(dropKeys),
          blockOn.map(b => right(b._2) === dropKeys(b._1)).reduce(_ && _),
          "left_anti")
        (lOk, rOk, dropped)
      }

    val agreeCols = fields.map { f =>
      val a =
        if (f.maxDist == 0) candL(f.left) === candR(f.right)
        else levenshtein(candL(f.left), candR(f.right)) <= f.maxDist
      coalesce(a, lit(false)).as(s"agree_${f.left}")
    }
    // literal-weight CASE sum in field order — left-associative adds
    // of 6-dp literals, engine-exact by construction
    val weight = round(
      fields.map { f =>
        when(col(s"agree_${f.left}"), lit(agreeWeight(f)))
          .otherwise(lit(disagreeWeight(f)))
      }.reduce(_ + _), 6).as("weight")

    val scored = candL.join(candR, joinCond)
      .select(keep.map(col) ++ agreeCols: _*)
      .withColumn("weight", weight)
      .withColumn("verdict",
        when(col("weight") >= upper, lit("match"))
          .when(col("weight") <= lower, lit("non_match"))
          .otherwise(lit("possible")))
    (scored, droppedBlocks)
  }
}
