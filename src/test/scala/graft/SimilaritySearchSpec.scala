package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch
import graft.functions.VectorFunctions

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("bruteForceTopK returns k ranked neighbors per query, self excluded") {
    val out = SimilaritySearch.bruteForceTopK(
      emb.filter($"vec_id" < 5), emb, "vec_id", "embedding", k = 3)
    val perQuery = out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(perQuery.size == 5 && perQuery.values.forall(_ == 3))
    assert(out.filter($"query_id" === $"neighbor_id").count() == 0)
    // ranks are 1..k and ordered by descending similarity
    val rows = out.filter($"query_id" === 0).orderBy("rank")
      .select("rank", "cos_sim").as[(Int, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.reverse.toSeq)
  }

  test("aggregation top-k equals the window formulation exactly") {
    val agg = SimilaritySearch.bruteForceTopK(
      emb.filter($"vec_id" < 8), emb, "vec_id", "embedding", k = 7)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val win = SimilaritySearch.bruteForceTopKWindow(
      emb.filter($"vec_id" < 8), emb, "vec_id", "embedding", k = 7)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(agg == win)
  }

  test("native hyperplane signature matches the HOF reference formulation") {
    graft.plans.NativeVector.register(spark)
    val v = emb.limit(200).select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val hof = v.select($"vec_id",
      VectorFunctions.hyperplaneSignature($"v", 12, seed = 7L).as("s"))
    val native = v.select($"vec_id",
      graft.plans.NativeVector.hyperplaneSig($"v", 12, seed = 7L).as("s"))
    val a = hof.orderBy("vec_id").as[(Long, Long)].collect().toSeq
    val b = native.orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("cosine agrees with a locally computed dot product") {
    val row = emb.filter($"vec_id" === 0)
      .select(VectorFunctions.cosine($"embedding", $"embedding").as("c"))
      .as[Double].head()
    assert(math.abs(row - 1.0) < 1e-12)
  }

  test("lshTopK candidates are biased toward genuinely similar vectors") {
    // The fixture embeddings are near-random (no strong near-dup
    // structure), so absolute precision is meaningless; the property an
    // SRP-LSH must satisfy is that same-bucket pairs have systematically
    // higher cosine than random pairs (collision prob rises with cosine).
    val approx = SimilaritySearch.lshTopK(
      emb.filter($"vec_id" < 10), emb, "vec_id", "embedding", k = 5,
      numBits = 8, numTables = 4)
    val got = approx.select("cos_sim").as[Double].collect()
    assert(got.nonEmpty, "LSH returned no candidates at 8 bits / 4 tables")
    val all = SimilaritySearch.bruteForceTopK(
      emb.filter($"vec_id" < 10), emb, "vec_id", "embedding", k = 499)
      .select("cos_sim").as[Double].collect()
    val lshMean = got.sum / got.length
    val allMean = all.sum / all.length
    assert(lshMean > allMean,
      s"LSH candidates not similarity-biased: lsh=$lshMean vs all=$allMean")
  }

  test("multi-probe LSH recall dominates single-probe against brute-force truth") {
    val queries = emb.filter($"vec_id" < 20)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = hits(SimilaritySearch.bruteForceTopK(
      queries, emb, "vec_id", "embedding", k = 5))
    val single = hits(SimilaritySearch.lshTopK(
      queries, emb, "vec_id", "embedding", k = 5))
    val multi = hits(SimilaritySearch.lshTopKMultiProbe(
      queries, emb, "vec_id", "embedding", k = 5))
    val rs = (single & truth).size
    val rm = (multi & truth).size
    assert(rm >= rs,
      s"Hamming-1 probing cannot lower recall: multi $rm vs single $rs of ${truth.size}")
    assert(rm > rs,
      s"on near-random fixtures the extra 12x probes must surface new truth pairs ($rm vs $rs)")
  }

  test("cosineNearDupCounts is symmetric and self-free") {
    val out = SimilaritySearch.cosineNearDupCounts(
      emb.limit(100), "vec_id", "embedding", threshold = 0.8)
    assert(out.count() == 100)
    assert(out.agg(min("n_near_dups")).head().getLong(0) >= 0)
  }

  test("lshNearDupCounts never overcounts and recovers >=95% of planted dups") {
    // Plant near-dups the same way q_embedding_neardup does: shifted
    // copies whose cosine to the original is ~0.92-0.99. Bucketed
    // counting can only MISS pairs (a pair not sharing any bucket),
    // never invent them, so per-id bucketed <= exact; at 8 bits x 12
    // tables the per-pair collision probability at that cosine is
    // >=0.99, so overall recall must be high (199/200 on this fixture).
    val corpus = emb.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
      .union(emb.filter($"vec_id" % 5 === 0)
        .select(($"vec_id" + 1000000L).as("vec_id"),
          transform($"embedding".cast("array<double>"), x => x + lit(0.05)).as("embedding")))
    val exact = SimilaritySearch.cosineNearDupCounts(
      corpus, "vec_id", "embedding", threshold = 0.8)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val bucketed = SimilaritySearch.lshNearDupCounts(
      corpus, "vec_id", "embedding", threshold = 0.8)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val exactTotal = exact.map(_._2).sum
    val bucketedTotal = bucketed.map(_._2).sum
    assert(exactTotal > 0, "fixture planted no near-dups")
    assert(bucketed.map(_._1) == exact.map(_._1), "id sets differ")
    assert(bucketed.zip(exact).forall { case ((_, b), (_, e)) => b <= e },
      "bucketed counting invented a pair the exact count lacks")
    assert(bucketedTotal.toDouble / exactTotal >= 0.95,
      s"recall too low: $bucketedTotal/$exactTotal")
  }

  test("hardNegatives never returns a same-label neighbor and matches label-filtered topK") {
    val out = SimilaritySearch.hardNegatives(
      emb.filter($"vec_id" < 5), emb, "vec_id", "embedding", "label", k = 4)
    val labels = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val rows = out.as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, n, _, _) => labels(q) != labels(n) },
      "a same-label neighbor slipped through")
    // equivalent formulation: score everything, drop same-label, re-rank
    val wide = SimilaritySearch.bruteForceTopK(
      emb.filter($"vec_id" < 5), emb, "vec_id", "embedding", k = emb.count().toInt)
      .as[(Long, Long, Double, Int)].collect()
      .filter { case (q, n, _, _) => labels(q) != labels(n) }
      .groupBy(_._1).toSeq
      .flatMap { case (_, g) =>
        g.sortBy(t => (-t._3, t._2)).take(4).zipWithIndex
          .map { case ((q, n, s, _), i) => (q, n, s, i + 1) }
      }.toSet
    assert(rows.toSet === wide)
  }

  test("mineBitext pairs identical vectors mutually and downweights hubs") {
    // X side: x0 has an exact translation (y10); x1 only hub-matches.
    // y12 is a HUB: moderately close to BOTH x0 and x1 — the margin
    // criterion must not hand it to two queries (mutual-best dedup)
    // and must prefer the exact pair for x0.
    val xs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f))).toDF("vec_id", "embedding")
    val ys = Seq(
      (10L, Array(1f, 0f, 0f)), // exact match of x0
      (11L, Array(0f, 0.9f, 0.1f)), // near match of x1
      (12L, Array(0.7f, 0.7f, 0.14f))) // hub
      .toDF("vec_id", "embedding")
    // numBits = 1 / 4 tables: near-exhaustive buckets, so this tiny
    // fixture exercises the margin logic, not LSH recall
    val mined = SimilaritySearch.mineBitext(xs, ys, "vec_id", "embedding",
      k = 2, numBits = 1, numTables = 4)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // every x and y appears at most once (mutual-best)
    assert(mined.map(_._1).distinct.length === mined.length)
    assert(mined.map(_._2).distinct.length === mined.length)
    val byX = mined.map(t => t._1 -> t).toMap
    assert(byX(0L)._2 === 10L, s"x0 must mine its exact pair, got $mined")
    assert(byX(0L)._3 === 1.0)
    assert(byX(1L)._2 === 11L, s"x1 must mine y11, not the hub, got $mined")
    // identical vectors score above their neighborhood: margin > 1
    assert(byX(0L)._4 > 1.0)
    // minMargin filters below-threshold pairs
    val strict = SimilaritySearch.mineBitext(xs, ys, "vec_id", "embedding",
      k = 2, minMargin = byX(1L)._4 + 0.001, numBits = 1, numTables = 4)
      .as[(Long, Long, Double, Double)].collect()
    assert(!strict.exists(_._1 == 1L))
  }

  test("lshNearDupCounts plan has no nested-loop join") {
    val corpus = emb.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val plan = SimilaritySearch.lshNearDupCounts(
      corpus, "vec_id", "embedding", threshold = 0.8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs stage leaked into the bucketed plan:\n$plan")
  }
}
