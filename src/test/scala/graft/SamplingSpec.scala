package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("membership is deterministic across runs and partitionings") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3, seed = 7)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs.repartition(13), "doc_id", 0.3, seed = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "sample membership must not depend on layout")
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("different seeds give different (independent-ish) samples") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3, seed = 7)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs, "doc_id", 0.3, seed = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(a != b)
  }

  test("fraction is honored in expectation") {
    val n = docs.count().toDouble
    val kept = Sampling.deterministicSample(docs, "doc_id", 0.5, seed = 1).count()
    // 500 Bernoulli(0.5) draws: 4-sigma band
    assert(math.abs(kept - 0.5 * n) < 4 * math.sqrt(n * 0.25),
      s"kept $kept of $n at fraction 0.5")
  }

  test("nested samples compose like the product of fractions") {
    val outer = Sampling.deterministicSample(docs, "doc_id", 0.5, seed = 1)
    val inner = Sampling.deterministicSample(outer, "doc_id", 0.5, seed = 2)
    val n = docs.count().toDouble
    assert(math.abs(inner.count() - 0.25 * n) < 4 * math.sqrt(n * 0.25))
  }

  test("stratified sampling applies per-stratum fractions") {
    val out = Sampling.stratifiedSample(
      docs, "lang", "doc_id", Map("en" -> 0.0), seed = 3, defaultFraction = 1.0)
    assert(out.filter($"lang" === "en").count() == 0)
    val nonEn = docs.filter($"lang" =!= "en").count()
    assert(out.count() == nonEn, "non-en strata keep every row at fraction 1.0")
  }

  test("weightedMix tags provenance and respects weights") {
    val mix = Sampling.weightedMix(
      Seq(
        ("all", docs, 1.0),
        ("none", docs, 0.0)),
      "doc_id", seed = 4)
    assert(mix.filter($"mix_source" === "none").count() == 0)
    assert(mix.filter($"mix_source" === "all").count() == docs.count())
  }
}
