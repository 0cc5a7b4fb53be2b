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

  test("exactSample: exactly n per stratum (or the whole stratum when smaller)") {
    val out = Sampling.exactSample(docs, "lang", "doc_id", n = 10, seed = 5).cache()
    try {
      val sizes = out.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val full = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      full.foreach { case (lang, n) =>
        assert(sizes(lang) == math.min(10L, n), s"$lang: ${sizes(lang)}")
      }
      // layout-independent membership
      val again = Sampling.exactSample(docs.repartition(7), "lang", "doc_id", 10, 5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
    } finally out.unpersist()
  }

  test("split: every row tagged exactly once, fractions honored, no cross-split drift") {
    val fr = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val out = Sampling.split(docs, "doc_id", seed = 11, fractions = fr).cache()
    try {
      assert(out.count() == docs.count())
      val byTag = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byTag.keySet == Set("train", "val", "test"))
      val n = docs.count().toDouble
      assert(math.abs(byTag("train") / n - 0.75) < 0.1)
      // a different-seed resplit moves rows; same seed moves none
      val same = Sampling.split(docs, "doc_id", 11, fr)
        .select("doc_id", "split").except(out.select("doc_id", "split"))
      assert(same.count() == 0)
    } finally out.unpersist()
  }

  test("weightedSample: exactly k, deterministic, layout-independent") {
    val a = Sampling.weightedSample(docs, "doc_id", "n_chars", k = 50, seed = 3)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.weightedSample(
      docs.repartition(13), "doc_id", "n_chars", k = 50, seed = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "selection must not depend on layout")
    assert(a.size == 50)
  }

  test("weightedSample: inclusion tracks weight") {
    // one row carries essentially all the weight: it must always win
    val skew = (0L until 1000L)
      .map(i => (i, if (i == 42L) 1e9 else 1.0)).toDF("id", "w")
    val out = Sampling.weightedSample(skew, "id", "w", k = 10, seed = 5)
      .select("id").as[Long].collect().toSet
    assert(out.contains(42L), "the dominant-weight row must be sampled")
    // across seeds, heavy rows (w=100) appear far more often than light
    // (w=1) — Efraimidis–Spirakis inclusion is weight-proportional
    val mixed = (0L until 200L)
      .map(i => (i, if (i < 100L) 100.0 else 1.0)).toDF("id", "w")
    val heavyHits = (1 to 10).map { seed =>
      Sampling.weightedSample(mixed, "id", "w", k = 20, seed = seed)
        .filter($"id" < 100).count()
    }.sum
    assert(heavyHits > 150, s"heavy rows should dominate 10x20 draws, got $heavyHits")
  }

  test("weightedSample: non-positive weights are excluded, not inverted") {
    // a negative weight flips the ES key's sign; it must never win
    // a negative weight flips the key's sign, and NaN passes `> 0`
    // under Spark's NaN-greatest ordering then sorts FIRST desc —
    // either would deterministically steal a top-k slot
    val rows = ((0L until 50L).map(i => (i, 1.0)) ++
      Seq((97L, -5.0), (98L, 0.0), (99L, Double.NaN))).toDF("id", "w")
    val out = Sampling.weightedSample(rows, "id", "w", k = 53, seed = 1)
      .select("id").as[Long].collect().toSet
    assert(!out.contains(97L) && !out.contains(98L) && !out.contains(99L))
    assert(out.size == 50)
  }

  test("weightedSample plans as a global top-k — no shuffle, no sort of the corpus") {
    val df = Sampling.weightedSample(docs, "doc_id", "n_chars", k = 50, seed = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("ShuffleExchange"),
      s"global top-k must not exchange:\n$plan")
  }

  test("cluster-keyed split is leakage-safe: one split per cluster") {
    import spark.implicits._
    // 3 clusters of 4 docs; keying the split on the cluster must put
    // every member of a cluster in the same split
    val docs = (0L until 12L).map(i => (i, i % 3)).toDF("doc_id", "cluster")
    val out = graft.operators.Sampling.split(docs, "cluster", seed = 13L,
      fractions = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    val perCluster = out.groupBy("cluster")
      .agg(countDistinct("split").as("n")).select("n").as[Long].collect()
    assert(perCluster.forall(_ == 1L), "a cluster straddled two splits")
  }
}
