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
        // renamed key columns: dropped descends from `left`, so joining
        // on same-named attributes would resolve trivially-true
        val dropKeys = dropped.select(
          blockOn.map(b => col(b._1).as(s"__drop_${b._1}")): _*)
        val lOk = left.join(broadcast(dropKeys),
          blockOn.map(b => left(b._1) === dropKeys(s"__drop_${b._1}"))
            .reduce(_ && _),
          "left_anti")
        val rOk = right.join(broadcast(dropKeys),
          blockOn.map(b => right(b._2) === dropKeys(s"__drop_${b._1}"))
            .reduce(_ && _),
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

  /** Unsupervised m/u estimation over UNLABELED candidate pairs —
    * the EM fit of the two-class mixture over agreement patterns
    * (Winkler 1988, "Using the EM algorithm for weight computation in
    * the Fellegi-Sunter model"): nobody hand-labels a 100 TB feed, so
    * the weights [[link]] needs are learned from the candidates
    * themselves.
    *
    * @param pairs     candidate pairs carrying one BOOLEAN agreement
    *                  column per compared field (the `agree_*` columns
    *                  [[link]] emits, or any caller-built comparator)
    * @param agreeCols the agreement columns, one per field
    * @param iters     EM iterations (fixed count — deterministic)
    * @return (matchShare p, per-field (col, m, u)); feed the m/u pairs
    *         back into [[LinkField]]s for the scoring pass
    *
    * Scale shape: ONE map-side-combined aggregate collapses the
    * candidates to agreement-PATTERN counts — at most 2^k rows for k
    * fields (k ≤ 16 enforced), data-volume-independent — and EM runs
    * on the driver over that bounded table. Null agreements count as
    * disagreement, matching [[link]]'s comparator contract. Estimates
    * are clamped to (1e-6, 1−1e-6) so a degenerate corpus can't push
    * a weight to ±∞.
    *
    * Identifiability: the two-class mixture needs k ≥ 3 comparators
    * (2^k − 1 pattern degrees of freedom must cover the 2k + 1
    * parameters — the textbook F-S EM minimum); with k ≤ 2 EM
    * converges to SOME valid mixture, not necessarily the planted
    * one.
    */
  def estimateMU(
      pairs: DataFrame,
      agreeCols: Seq[String],
      iters: Int = 50,
      initP: Double = 0.1,
      initM: Double = 0.9,
      initU: Double = 0.1): (Double, Seq[(String, Double, Double)]) = {
    require(agreeCols.nonEmpty, "need at least one agreement column")
    require(agreeCols.size <= 16,
      s"pattern space is 2^k — k=${agreeCols.size} exceeds the k<=16 bound")
    require(iters > 0, s"iters must be positive, got $iters")
    require(initP > 0.0 && initP < 1.0, s"initP must be in (0, 1), got $initP")
    val eps = 1e-6
    def clamp(x: Double): Double = math.min(1.0 - eps, math.max(eps, x))

    val patterns = pairs
      .groupBy(agreeCols.map(c => coalesce(col(c), lit(false)).as(c)): _*)
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (agreeCols.indices.map(r.getBoolean).toArray, r.getAs[Long]("__n")))
    val total = patterns.map(_._2).sum.toDouble
    require(total > 0, "no candidate pairs to fit")

    val k = agreeCols.size
    var p = initP
    var m = Array.fill(k)(clamp(initM))
    var u = Array.fill(k)(clamp(initU))
    for (_ <- 0 until iters) {
      // E-step: posterior match probability per pattern
      val w = patterns.map { case (g, _) =>
        var pm = p; var pu = 1.0 - p
        var i = 0
        while (i < k) {
          pm *= (if (g(i)) m(i) else 1.0 - m(i))
          pu *= (if (g(i)) u(i) else 1.0 - u(i))
          i += 1
        }
        if (pm + pu == 0.0) 0.5 else pm / (pm + pu)
      }
      // M-step
      val nw = patterns.zip(w).map { case ((_, n), wi) => n * wi }
      val sumW = nw.sum
      val sumNotW = total - sumW
      p = clamp(sumW / total)
      m = Array.tabulate(k) { i =>
        val agreeW = patterns.zip(nw)
          .collect { case ((g, _), x) if g(i) => x }.sum
        clamp(if (sumW == 0.0) initM else agreeW / sumW)
      }
      u = Array.tabulate(k) { i =>
        val agreeNotW = patterns.zip(w).collect {
          case ((g, n), wi) if g(i) => n * (1.0 - wi)
        }.sum
        clamp(if (sumNotW == 0.0) initU else agreeNotW / sumNotW)
      }
    }
    (p, agreeCols.indices.map(i => (agreeCols(i), m(i), u(i))))
  }
}
