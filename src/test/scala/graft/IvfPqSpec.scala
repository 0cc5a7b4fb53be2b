package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfPq, SimilaritySearch}

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def embeddings = spark.read.parquet(s"$dir/embeddings.parquet")

  test("index stores one cell and m codes per vector") {
    val model = IvfPq.train(embeddings, "vec_id", "embedding",
      kCells = 8, m = 4, ksub = 16, itersIvf = 2, itersPq = 1)
    val idx = IvfPq.index(embeddings, "vec_id", "embedding", model)
    val n = embeddings.count()
    assert(idx.count() == n)
    val bad = idx.filter(col("cell") < 0 || col("cell") >= 8 ||
      size(col("codes")) =!= 4 ||
      exists(col("codes"), c => c < 0 || c >= 16))
    assert(bad.isEmpty)
  }

  test("residual PQ beats raw PQ at equal code budget") {
    // the reason IVF-PQ encodes residuals: same bits, tighter coverage.
    // Compare recall of IVF-PQ (residual codes + cell term) against
    // plain PQ with the identical m x ksub code budget.
    val k = 10
    val queries = embeddings.filter(col("vec_id") < 20)
    val exact = SimilaritySearch.bruteForceTopK(
      queries, embeddings, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet

    def recallOf(pairs: Set[(Long, Long)]): Double =
      (pairs & exact).size.toDouble / exact.size

    val model = IvfPq.train(embeddings, "vec_id", "embedding",
      kCells = 16, m = 4, ksub = 16, itersIvf = 3, itersPq = 3)
    val idx = IvfPq.index(embeddings, "vec_id", "embedding", model)
    val ivfpq = recallOf(IvfPq.search(
      queries, idx, "vec_id", "embedding", model, k * 2, nprobe = 16)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet)

    val rawPq = graft.operators.PqIndex.train(
      embeddings, "vec_id", "embedding", m = 4, ksub = 16, iters = 3)
    val rawCodes = graft.operators.PqIndex.encode(
      embeddings, "vec_id", "embedding", rawPq)
    val raw = recallOf(graft.operators.PqIndex.search(
      queries, rawCodes, "vec_id", "embedding", rawPq, k * 2)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet)

    // nprobe = kCells isolates the encoding comparison (no cell misses)
    assert(ivfpq > raw,
      f"residual coding should beat raw PQ at the same bits: ivfpq=$ivfpq%.2f raw=$raw%.2f")
    assert(ivfpq >= 0.5, f"IVF-PQ oversampled recall@$k $ivfpq%.2f below floor")
  }

  test("cell pruning bounds the scored candidates") {
    val model = IvfPq.train(embeddings, "vec_id", "embedding",
      kCells = 16, m = 4, ksub = 16, itersIvf = 2, itersPq = 1)
    val idx = IvfPq.index(embeddings, "vec_id", "embedding", model)
    val queries = embeddings.filter(col("vec_id") < 5)
    // with nprobe=2 of 16 cells, each query may only ever score the
    // candidates living in its two probed cells
    val probed = IvfPq.search(queries, idx, "vec_id", "embedding", model,
      kNeighbors = 1000000, nprobe = 2)
      .groupBy("query_id").agg(count(lit(1)).as("n"))
    val total = idx.count()
    val maxScored = probed.agg(max("n")).as[Long].head()
    assert(maxScored < total,
      s"nprobe=2/16 must not score the whole corpus ($maxScored of $total)")
  }

  test("search is deterministic across runs") {
    val model = IvfPq.train(embeddings, "vec_id", "embedding",
      kCells = 8, m = 4, ksub = 16, itersIvf = 2, itersPq = 2)
    val idx = IvfPq.index(embeddings, "vec_id", "embedding", model)
    def run() = IvfPq.search(
      embeddings.filter(col("vec_id") < 5), idx,
      "vec_id", "embedding", model, 5, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(run() == run())
  }

  test("a saved IVF-PQ index round-trips: loaded search matches in-memory") {
    val rtDir = java.nio.file.Files.createTempDirectory("ivfpq-rt").toString + "/idx"
    val model = IvfPq.train(embeddings, "vec_id", "embedding",
      kCells = 8, m = 4, ksub = 16, itersIvf = 2, itersPq = 1)
    val built = IvfPq.index(embeddings, "vec_id", "embedding", model)
    val queries = embeddings.filter(col("vec_id") < 10)
    def results(idx: org.apache.spark.sql.DataFrame, m: IvfPq.Model) =
      IvfPq.search(queries, idx, "vec_id", "embedding", m,
          kNeighbors = 5, nprobe = 4)
        .orderBy("query_id", "rank")
        .collect().map(_.toSeq).toSeq

    val fresh = results(built, model)
    IvfPq.save(built, model, rtDir)
    val (loaded, loadedModel) = IvfPq.load(spark, rtDir)
    assert(loadedModel.ivf.centroids.map(_.toSeq).toSeq ==
      model.ivf.centroids.map(_.toSeq).toSeq, "IVF model changed across save/load")
    assert(loadedModel.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      model.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "PQ codebooks changed across save/load")
    assert(results(loaded, loadedModel) == fresh,
      "loaded-index search diverged from the freshly built index")

    // cell-partitioned layout on disk: probing prunes files
    assert(new java.io.File(s"$rtDir/index").listFiles()
      .count(_.getName.startsWith("cell=")) > 1)

    // a second save over the same path is a clean atomic replace
    IvfPq.save(built, model, rtDir)
    assert(results(IvfPq.load(spark, rtDir)._1, loadedModel) == fresh)
  }
}
