package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("target-like documents score higher than off-target ones") {
    // target distribution: 'alpha beta' language; off-target: 'zig zag'
    val corpus = docs(
      (1L, "alpha beta alpha beta alpha", "en"),
      (2L, "beta alpha beta alpha beta", "en"),
      (3L, "zig zag zig zag zig", "xx"),
      (4L, "zag zig zag zig zag", "xx"),
      (5L, "alpha beta alpha zig zag", "xx")) // mixed
    val model = Dsir.train(corpus, "text", col("lang") === "en", numBuckets = 64)
    val w = Dsir.score(model, corpus, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("dsir_weight_e7"))
      .toMap
    assert(w(1L) > w(5L) && w(2L) > w(5L), "pure target beats mixed")
    assert(w(5L) > w(3L) && w(5L) > w(4L), "mixed beats pure off-target")
  }

  test("n_feats is unigrams + bigrams and weights are deterministic") {
    val corpus = docs((1L, "a b c d", "en"), (2L, "a b c d", "xx"))
    val model = Dsir.train(corpus, "text", col("lang") === "en", numBuckets = 32)
    val rows = Dsir.score(model, corpus, "doc_id", "text").collect()
    assert(rows.forall(_.getAs[Long]("n_feats") === 7L)) // 4 + 3
    // identical text -> identical weight, twice over
    val again = Dsir.score(model, corpus, "doc_id", "text").collect()
    assert(rows.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
    assert(rows.map(_.getAs[Long]("dsir_weight_e7")).distinct.length === 1)
  }

  test("model covers unseen buckets (smoothed, never a lookup miss)") {
    val corpus = docs((1L, "one two", "en"), (2L, "three four", "xx"))
    // far more buckets than features: most buckets are unseen
    val model = Dsir.train(corpus, "text", col("lang") === "en", numBuckets = 256)
    assert(model.logRatios.length === 256)
    // scoring any text, including words never hashed during training,
    // is total
    val probe = docs((9L, "five six seven eight nine ten", "xx"))
    val r = Dsir.score(model, probe, "doc_id", "text").head()
    assert(r.getAs[Long]("n_feats") === 11L)
  }

  test("scoring is a zero-shuffle map-only plan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Dsir.train(df, "text", col("lang") === "en", numBuckets = 256)
    val plan = Dsir.score(model, df, "doc_id", "text")
      .queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e
    }.isEmpty, "DSIR scoring must not exchange")
  }

  test("null-text rows are dropped by score, matching train and the oracle") {
    val corpus = docs(
      (1L, "alpha beta alpha", "en"),
      (2L, null, "en"),
      (3L, "zig zag", "xx"))
    val model = Dsir.train(corpus, "text", col("lang") === "en", numBuckets = 16)
    val ids = Dsir.score(model, corpus, "doc_id", "text")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 3L))
  }
}
