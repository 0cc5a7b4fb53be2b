package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.classic.GraftPlanApi
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.normalizeText
import graft.plans.{HashWeightSum, NativeText}

/** Hashing-trick linear text classifier — the in-engine form of the
  * fastText-style quality filter every large pretraining pipeline runs
  * over its corpus (CCNet / GPT-3-style quality scoring): features are
  * word hashes folded into F buckets, the model is ONE dense weight
  * vector, inference is a codegen'd per-row loop
  * ([[graft.plans.HashWeightSum]]) — no UDF, no model server, no
  * shuffle; scoring 100 TB is a map-only pass.
  *
  * Training is batch logistic regression by full-batch gradient
  * descent ON the cluster: each iteration computes per-document
  * `sigmoid(w·x) - y` once (native logit kernel), explodes word
  * hashes, and reduces per-feature gradient sums through ONE shuffle
  * of at most F groups. The driver only ever holds the F-double weight
  * vector — the exact contract of [[IvfIndex.train]] / [[PqIndex]]:
  * model state on the driver, data state on the executors.
  *
  * Determinism: [[initWeights]] derives dyadic-rational weights
  * (k/1024) from the portable sha-based hash, so every partial sum of
  * the untrained logit is EXACT in IEEE arithmetic — the driver oracle
  * replays untrained scoring order-independently; trained behavior
  * (loss decreasing, accuracy beating the prior) is spec-gated.
  */
object TextClassifier {

  final case class Model(weights: Array[Double]) {
    def numFeatures: Int = weights.length
  }

  /** Deterministic dyadic init: weight i = (hash32("f<i>") mod 1025
    * - 512) / 1024 in [-0.5, 0.5]. Exact in binary — sums of these
    * never round, so scoring with the initial model is engine-portable
    * without an epsilon.
    */
  def initWeights(numFeatures: Int): Array[Double] = {
    require(numFeatures >= 1, s"numFeatures must be >= 1, got $numFeatures")
    Array.tabulate(numFeatures) { i =>
      val h = NativeText.hash32(
        s"f$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((h % 1025L) - 512L).toDouble / 1024.0
    }
  }

  /** Word-hash feature array of a text column (native kernel; the
    * shared first stage of inference and training).
    */
  def features(text: Column): Column =
    NativeText.shingleHash32(split(normalizeText(text), " "), 1)

  /** Linear score of a text column under `model`. The weights-closing
    * [[HashWeightSum]] is built straight into the Column (weights ride
    * the plan as a reference object, not literals — 4 KB of doubles
    * would otherwise bloat every generated class). No registry slot:
    * a Column from `logit(modelA)` keeps A's weights no matter how many
    * other models are scored before it is analyzed.
    */
  def logit(df: DataFrame, text: Column, model: Model): Column = {
    NativeText.register(df.sparkSession) // features() resolves on analysis
    GraftPlanApi.column(
      HashWeightSum(GraftPlanApi.expression(features(text)), model.weights))
  }

  /** (id, logit, predicted) for every document. Map-only. */
  def classify(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame = {
    val z = logit(df, col(textCol), model)
    df.select(col(idCol).as("id"),
      round(z, 6).as("logit"),
      (z > 0.0).as("predicted"))
  }

  /** Full-batch logistic-regression GD. `labelCol` is boolean/0-1.
    * One shuffle (<= F groups) + one F-row collect per iteration.
    */
  def train(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      numFeatures: Int = 512,
      iters: Int = 5,
      learningRate: Double = 0.5): Model = {
    require(iters >= 0 && learningRate > 0,
      s"need iters >= 0 and positive rate, got $iters, $learningRate")
    NativeText.register(df.sparkSession) // features() resolves eagerly below
    val prepared = df
      .select(features(col(textCol)).as("__feats"),
        col(labelCol).cast("double").as("__y"))
      .localCheckpoint(true) // hash once; iterations re-scan hashes, not text
    val nDocs = prepared.count().toDouble.max(1.0)
    var w = initWeights(numFeatures)
    for (_ <- 0 until iters) {
      val model = Model(w)
      val z = GraftPlanApi.column(
        HashWeightSum(GraftPlanApi.expression(col("__feats")), model.weights))
      val grad = prepared
        .select(col("__feats"),
          (lit(1.0) / (lit(1.0) + exp(-z)) - col("__y")).as("__err"))
        .select(explode(col("__feats")).as("__h"), col("__err"))
        .groupBy((col("__h") % numFeatures).as("__f"))
        .agg(sum("__err").as("__g"))
        .collect()
      val next = w.clone()
      grad.foreach { r =>
        val f = r.getLong(0).toInt
        next(f) = next(f) - learningRate * r.getDouble(1) / nDocs
      }
      w = next
    }
    Model(w)
  }
}
