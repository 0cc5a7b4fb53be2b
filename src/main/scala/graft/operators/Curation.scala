package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source/domain quota enforcement: keep at most `cap` rows per
  * source, best-first — the web-curation step that stops a handful of
  * over-crawled domains from dominating a training mix.
  *
  * Two formulations with identical output (total order: score desc,
  * id asc):
  *
  *   - [[sourceCapsWindow]] — `row_number` over a per-source window.
  *     Exact, but a hot domain's every row shuffles to one task and
  *     sorts there; it is the oracle truth, not the 100 TB path.
  *   - [[sourceCaps]] — the k-bounded [[TopK.TopKAggregator]] combines
  *     map-side (partial + final ObjectHashAggregate), so the shuffle
  *     carries at most `cap` rows per (source, input partition) no
  *     matter how skewed the crawl is. The kept ids rejoin the input
  *     for payload columns — a shuffle join on the id, broadcast-able
  *     when `#sources × cap` is small.
  */
object Curation {

  /** Exact window formulation (per-source full sort). */
  def sourceCapsWindow(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      scoreCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(sourceCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("src_rank", row_number().over(w).cast("long"))
      .filter(col("src_rank") <= cap)
  }

  /** Bounded-state formulation: map-side top-`cap` per source. Output
    * columns and values match [[sourceCapsWindow]] exactly.
    */
  def sourceCaps(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      scoreCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val spark = df.sparkSession
    import spark.implicits._
    val kept: Dataset[(String, Long, Long)] = df
      .select(col(sourceCol).cast("string"), col(idCol).cast("long"),
        col(scoreCol).cast("double"))
      .as[(String, Long, Double)]
      .map { case (src, id, score) => (src, TopK.Scored(id, score)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopK.TopKAggregator(cap).toColumn)
      .flatMap { case (src, top) =>
        top.iterator.zipWithIndex.map { case (n, i) => (src, n.id, (i + 1).toLong) }
      }
    df.join(
      kept.toDF(sourceCol, idCol, "src_rank")
        .drop(sourceCol), // id is unique; rejoin on it alone
      Seq(idCol))
  }

  /** Temperature-scaled mixture plan: per-source sampling weights
    * `w_i = m_i^(1/T) / Σ m_j^(1/T)` over the source token masses, and
    * integer document quotas for a total budget that sum EXACTLY to it
    * via largest-remainder apportionment — the standard multilingual /
    * multi-source rebalancing step (T = 1 keeps natural proportions,
    * T → ∞ approaches uniform; XLM-style pipelines use T ≈ 2–5 to lift
    * low-resource sources without flattening the mix).
    *
    * Determinism: the scaled mass rounds to 6 dp into DECIMAL before
    * the total, so the weight divides bit-identical operands on both
    * engines; apportionment ranks (remainder desc, source asc) — a
    * total order. Scale shape: one map-side-combined aggregate over
    * the corpus; everything after runs on the |sources|-row table
    * (the global windows sort dozens of rows, not data).
    *
    * Output: (source, n_docs, mass, weight, quota), Σ quota = budget.
    */
  def mixturePlan(
      docs: DataFrame,
      sourceCol: String,
      massCol: String,
      temperature: Double,
      totalQuota: Long): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    require(totalQuota >= 0, s"totalQuota must be >= 0, got $totalQuota")
    val agg = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(massCol).cast("long")).as("mass"))
    val all = Window.partitionBy(lit(1))
    val scaled = agg.withColumn("__s",
      round(pow(col("mass").cast("double"), lit(1.0 / temperature)), 6)
        .cast("decimal(27,6)"))
      .withColumn("__tot", sum(col("__s")).over(all))
    val w = col("__s").cast("double") / col("__tot").cast("double")
    val exact = lit(totalQuota.toDouble) * w
    scaled
      .withColumn("__exact", exact)
      .withColumn("__base", floor(col("__exact")).cast("long"))
      .withColumn("__rem", col("__exact") - col("__base").cast("double"))
      .withColumn("__left", lit(totalQuota) - sum(col("__base")).over(all))
      .withColumn("__rk", row_number().over(
        all.orderBy(col("__rem").desc, col("source"))))
      .select(col("source"), col("n_docs"), col("mass"),
        round(w, 6).as("weight"),
        (col("__base") +
          when(col("__rk") <= col("__left"), 1L).otherwise(0L)).as("quota"))
  }

  /** Per-source quality calibration: each document's percent-rank of
    * `scoreCol` WITHIN its source — so a single global threshold
    * compares like with like (a raw-score cut keeps only the
    * "easiest" sources; the calibrated cut keeps each source's best
    * half). Standard practice before a corpus-wide quality gate.
    *
    * Output: (id, source, score, pct_rank, keep) with `keep` true for
    * each source's best `ceil(n · keepFraction)` documents (rank-based,
    * so a single-document source keeps its one document — a
    * percent-rank threshold would drop it, pct_rank of a 1-row
    * partition being 0). The rank order is (6-dp score, id) — a total
    * order, so ranks (hence keep flags) replay on any engine.
    *
    * Scale shape: ONE source-keyed window over the corpus (the same
    * exchange any per-source top-k pays); no joins, no driver state.
    */
  def calibrateQuality(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      scoreCol: Column,
      keepFraction: Double = 0.5): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction must be in (0, 1], got $keepFraction")
    val score = round(scoreCol, 6)
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("score").asc, col(idCol).asc)
    // keep decision is RANK-based (best ceil(n·keepFraction) rows), not
    // a percent_rank threshold: percent_rank of a 1-row partition is 0,
    // so a threshold test would silently eliminate every single-document
    // source — the opposite of "keep each source's best half"
    docs
      .select(col(idCol), col(sourceCol), score.as("score"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("__rk_desc",
        row_number().over(Window.partitionBy(col(sourceCol))
          .orderBy(col("score").desc, col(idCol).desc)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(sourceCol))))
      .withColumn("keep", col("__rk_desc") <=
        ceil(col("__n").cast("double") * lit(keepFraction)).cast("long"))
      .drop("__rk_desc", "__n")
  }

  /** Data-constrained epoch allocation: given per-source unique token
    * mass and a total token budget, decide how many EPOCHS (full
    * passes) of each source to train on, under geometrically decaying
    * value for repeated data — the published data-constrained-scaling
    * result that repeating a good source beats ingesting a worse one,
    * up to a few epochs (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models"; decay modeled as
    * `value(source, epoch) = mass · delta^(epoch−1)`).
    *
    * Greedy by marginal value, expressed as ONE ranking — no loop:
    * order all (source, epoch ≤ maxEpochs) pairs by (value desc,
    * source, epoch) and keep the longest prefix whose token cost fits
    * the budget. Because value decays in the epoch for a fixed
    * source, any kept prefix allocates CONTIGUOUS epochs 1..k per
    * source, so the greedy optimum is exactly "count kept pairs per
    * source".
    *
    * Output: (source, unique_tokens, epochs, tokens_allocated,
    * effective_value) — epochs ≥ 0, tokens_allocated = epochs ·
    * unique_tokens, effective_value = mass·(1−delta^epochs)/(1−delta)
    * rounded to 6 dp. Σ tokens_allocated ≤ budget always.
    *
    * Scale shape: one map-side-combined corpus aggregate to the
    * |sources|-row table; the pair ranking and running sum windows
    * sort |sources|·maxEpochs rows, never data.
    */
  def epochAllocation(
      docs: DataFrame,
      sourceCol: String,
      tokenCol: Column,
      budget: Long,
      maxEpochs: Int = 8,
      delta: Double = 0.5): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    require(delta > 0 && delta < 1, s"delta must be in (0, 1), got $delta")
    val mass = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(tokenCol.cast("long")).as("unique_tokens"))
      .filter(col("unique_tokens") > 0)
    val pairs = mass.select(col("source"), col("unique_tokens"),
      explode(sequence(lit(1), lit(maxEpochs))).as("epoch"))
      .withColumn("__value",
        round(col("unique_tokens").cast("double") *
          pow(lit(delta), col("epoch") - lit(1)), 6))
    val greedy = Window // |sources| × maxEpochs rows — not data
      .partitionBy(lit(1))
      .orderBy(col("__value").desc, col("source"), col("epoch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pairs
      .withColumn("__spent", sum("unique_tokens").over(greedy))
      .groupBy("source", "unique_tokens")
      .agg(sum(when(col("__spent") <= budget, 1L).otherwise(0L)).as("epochs"))
      .select(col("source"), col("unique_tokens"), col("epochs"),
        (col("epochs") * col("unique_tokens")).as("tokens_allocated"),
        round(col("unique_tokens").cast("double") *
          (lit(1.0) - pow(lit(delta), col("epochs").cast("double"))) /
          lit(1.0 - delta), 6).as("effective_value"))
  }
}
