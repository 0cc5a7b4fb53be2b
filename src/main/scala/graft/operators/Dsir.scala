package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.normalizeText
import graft.plans.NativeText

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * score every raw document by how much more likely its hashed n-gram
  * features are under a TARGET distribution (the high-quality slice
  * you want more of) than under the raw corpus, then resample
  * proportionally. The classic "make 100 TB of crawl look like
  * Wikipedia" selector.
  *
  * Features are unigram + bigram word hashes folded into `numBuckets`
  * buckets (the paper's hashed n-gram generative model). Both bucket
  * distributions are estimated with +0.5 smoothing; a document's
  * importance weight is
  *
  *   log w(x) = Σ_f count_x(f) · [ln p̂_target(f) − ln p̂_raw(f)]
  *
  * Scale shape: training is ONE aggregation bounded by `numBuckets`
  * groups after map-side combine (target membership rides as a flag,
  * so target and raw counts come out of the same pass) and a
  * `numBuckets`-row collect; scoring is a ZERO-SHUFFLE map-only pass —
  * the per-bucket log-ratio table is a literal array in the plan, and
  * each row folds its own feature hashes through it. Exactly the
  * [[NgramLm.scoreMapOnly]] contract: model state in the plan, data
  * state on the executors, 100 TB scored without a single exchange.
  *
  * Determinism / oracle parity: the per-bucket log-ratio is computed
  * IN SPARK expressions from exact long counts; division and the ×10⁷
  * rounding are IEEE-exact cross-engine, and `ln` is within 1 ulp on
  * both (JVM `Math.log`, libm `log` — transcendentals are NOT
  * correctly-rounded by IEEE, so bit equality is not guaranteed). A
  * cross-engine flip therefore needs a bucket's pre-rounding value
  * within ~1 ulp of a 0.5e-7 boundary — probability ≈ 1e-9 per
  * bucket, ~2.6e-7 per 256-bucket model; the log-ratios are folded as
  * fixed-point longs, so away from that boundary per-document sums
  * are exact, order-independent, and replayed by the DuckDB oracle to
  * the last digit. (Same accepted-risk class as [[NgramLm]]'s ln.)
  */
object Dsir {

  /** The trained selector: bucket f's fixed-point log-ratio
    * (round(ln p̂_t(f) − ln p̂_r(f), 7) × 10⁷) at index f.
    */
  final case class Model(logRatios: Array[Long]) {
    def numBuckets: Int = logRatios.length
  }

  /** Unigram + bigram hashed features of a text column (native
    * sha-256-derived 32-bit hashes; shared by train and score).
    */
  def features(text: Column): Column = {
    val words = split(normalizeText(text), " ")
    concat(
      NativeText.shingleHash32(words, 1),
      NativeText.shingleHash32(words, 2))
  }

  /** Estimate the per-bucket log-ratio table from ONE pass over the
    * raw corpus: rows satisfying `isTarget` define the target
    * distribution (target and raw counts come out of the same
    * aggregate — the flag rides the explode). A `numBuckets`-row range
    * left-join fills buckets no feature hashed into (count 0, so the
    * smoothed ratio is still defined); the collect is `numBuckets`
    * rows and the whole thing is a single job.
    */
  def train(
      raw: DataFrame,
      textCol: String,
      isTarget: Column,
      numBuckets: Int = 256): Model = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    NativeText.register(raw.sparkSession)
    val counts = raw
      .select(explode(features(col(textCol))).as("__h"),
        isTarget.cast("long").as("__t"))
      .groupBy(pmod(col("__h"), lit(numBuckets.toLong)).as("__f"))
      .agg(count(lit(1)).as("__cr"), sum(col("__t")).as("__ct"))
    val full = raw.sparkSession.range(numBuckets)
      .select(col("id").as("__f"))
      .join(counts, Seq("__f"), "left")
      .na.fill(0L, Seq("__cr", "__ct"))
    // totals + per-bucket ratios stay Spark expressions so every float
    // op (division, ln, ×10⁷ rounding) uses engine semantics the
    // oracle mirrors exactly
    val w = Window.partitionBy()
    val lam = full
      .select(col("__f"),
        round(
          (log((col("__ct") + lit(0.5)) /
            (sum(col("__ct")).over(w) + lit(0.5 * numBuckets))) -
           log((col("__cr") + lit(0.5)) /
            (sum(col("__cr")).over(w) + lit(0.5 * numBuckets)))) * lit(1e7))
          .cast("long").as("__lam"))
      .collect()
    val lut = new Array[Long](numBuckets)
    lam.foreach(r => lut(r.getLong(0).toInt) = r.getLong(1))
    Model(lut)
  }

  /** Importance weight of every document: map-only literal-LUT fold.
    * Output: (id, n_feats, dsir_weight_e7) — the weight in ×10⁻⁷
    * fixed point (an exact long; dividing back to a double would
    * reintroduce the tie-rounding ambiguity the fold just avoided).
    * Null-text rows are dropped, matching the oracle's unnest (which
    * yields no feature rows for a null), and [[train]]'s explode
    * (which never counts them) — a null document has no features to
    * weight.
    */
  def score(
      model: Model,
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    NativeText.register(df.sparkSession)
    val lut = lit(model.logRatios)
    val b = lit(model.numBuckets.toLong)
    val feats = features(col(textCol))
    val sumFp = aggregate(feats, lit(0L),
      (acc, h) => acc + element_at(lut, (pmod(h, b) + lit(1)).cast("int")))
    df.filter(col(textCol).isNotNull)
      .select(
        col(idCol).as("id"),
        size(feats).cast("long").as("n_feats"),
        sumFp.as("dsir_weight_e7"))
  }
}
