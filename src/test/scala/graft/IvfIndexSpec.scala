package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, SimilaritySearch}

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val model = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 3)

  private lazy val truth: Map[Long, Set[Long]] =
    SimilaritySearch.bruteForceTopK(
      emb.filter($"vec_id" < 10), emb, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }

  private def recallAt(nprobe: Int): Double = {
    val got = IvfIndex.search(
      emb.filter($"vec_id" < 10), emb, "vec_id", "embedding", model,
      kNeighbors = 5, nprobe = nprobe)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val hits = truth.map { case (q, t) => (t intersect got.getOrElse(q, Set.empty)).size }.sum
    hits.toDouble / truth.values.map(_.size).sum
  }

  test("train produces k unit-norm centroids and assigns every vector") {
    assert(model.k == 8 && model.dim == emb.head().getSeq[Float](1).length)
    assert(model.centroids.forall { c =>
      math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9
    })
    val cells = IvfIndex.assign(emb, "vec_id", "embedding", model)
    assert(cells.count() == emb.count())
    assert(cells.agg(min("cell"), max("cell")).as[(Int, Int)].head() match {
      case (lo, hi) => lo >= 0 && hi < 8
    })
  }

  test("probing all cells reproduces brute force exactly") {
    val ivf = IvfIndex.search(
      emb.filter($"vec_id" < 10), emb, "vec_id", "embedding", model,
      kNeighbors = 5, nprobe = 8)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val bf = SimilaritySearch.bruteForceTopK(
      emb.filter($"vec_id" < 10), emb, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(ivf == bf)
  }

  test("recall rises with nprobe and is perfect at nprobe = k") {
    val r = Seq(1, 2, 4, 8).map(recallAt)
    assert(r.zip(r.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in nprobe: $r")
    assert(r.last == 1.0, s"full probe must be exact, got ${r.last}")
    assert(r.head > 0.0, "probing the nearest cell found nothing")
  }

  test("search plan has no all-pairs stage") {
    val plan = IvfIndex.search(
      emb.filter($"vec_id" < 10), emb, "vec_id", "embedding", model,
      kNeighbors = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs stage leaked into the IVF plan:\n$plan")
  }

  test("a saved index round-trips: loaded search matches in-memory search") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-rt").toString + "/idx"
    val queries = emb.filter($"vec_id" < 10)
    def results(idx: org.apache.spark.sql.DataFrame, m: IvfIndex.Model) =
      IvfIndex.searchIndex(queries, idx, "vec_id", "embedding", m,
          kNeighbors = 5, nprobe = 4)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Double, Int)].collect().toSeq

    val built = IvfIndex.index(emb, "vec_id", "embedding", model)
    val fresh = results(built, model)
    IvfIndex.save(built, model, dir)

    val (loaded, loadedModel) = IvfIndex.load(spark, dir)
    assert(loadedModel.centroids.map(_.toSeq).toSeq ==
      model.centroids.map(_.toSeq).toSeq, "model changed across save/load")
    assert(results(loaded, loadedModel) == fresh,
      "loaded-index search diverged from the freshly built index")

    // the on-disk layout is cell-partitioned: probing must not read
    // every partition's files
    assert(new java.io.File(s"$dir/index").listFiles()
      .count(f => f.getName.startsWith("cell=")) == model.k)

    // a second save over the same path is a clean atomic replace
    IvfIndex.save(built, model, dir)
    assert(results(IvfIndex.load(spark, dir)._1, loadedModel) == fresh)
  }
}
