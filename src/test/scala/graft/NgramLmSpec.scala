package graft

import graft.operators.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def model = NgramLm.train(
    Seq("a b a b", "a c").toDF("text"), "text")

  private def r(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("train counts bigrams, prefixes, and vocabulary") {
    val m = model
    assert(m.vocabSize === 3) // a, b, c
    val bi = m.bigrams.as[(String, String, Long)].collect().toSet
    assert(bi === Set(("a", "b", 2L), ("b", "a", 1L), ("a", "c", 1L)))
    val pre = m.prefixes.as[(String, Long)].collect().toSet
    assert(pre === Set(("a", 3L), ("b", 1L)))
  }

  test("score reproduces hand-computed smoothed cross-entropy") {
    val docs = Seq(
      (1L, "a b"),   // seen bigram: p = (2+0.5)/(3+1.5) = 5/9
      (2L, "a z"),   // unseen continuation: p = 0.5/4.5 = 1/9
      (3L, "z a"),   // unseen prefix: p = 0.5/1.5 = 1/3
      (4L, "a")      // too short: dropped
    ).toDF("id", "text")
    val out = NgramLm.score(model, docs, "id", "text")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    // one bigram per doc: sum = round(ln p, 7); avg_neg = round(-sum, 6);
    // ppl = round(exp(-sum), 6) — exp runs on the 7dp sum, not the 6dp avg
    def expect(p: Double, oov: Long): (Long, Long, Double, Double) = {
      val lnp7 = r(math.log(p), 7)
      (1L, oov, r(-lnp7, 6), r(math.exp(-lnp7), 6))
    }
    assert(out(1L) === expect(5.0 / 9, 0L))
    assert(out(2L) === expect(1.0 / 9, 1L))
    assert(out(3L) === expect(1.0 / 3, 1L))
  }

  test("fluent text scores lower than out-of-domain text") {
    val docs = Seq((1L, "a b a b a b"), (2L, "x y z x y z")).toDF("id", "text")
    val s = NgramLm.score(model, docs, "id", "text")
      .select("id", "avg_neg_logp").as[(Long, Double)].collect().toMap
    assert(s(1L) < s(2L))
  }

  test("map-only scoring equals the join-based scorer bit-for-bit") {
    val docsPath = "/root/testdata/sf0.001/documents.parquet"
    val docs = spark.read.parquet(docsPath)
    val m = NgramLm.train(docs.filter($"lang" === "en"), "text")
    val joined = NgramLm.score(m, docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val mapOnly = NgramLm.scoreMapOnly(NgramLm.collect(m), docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(joined.nonEmpty)
    assert(mapOnly === joined)
  }

  test("map-only scoring runs on an unbounded stream with no state store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = NgramLm.collect(model)
    val mem = MemoryStream[(Long, String)]
    val q = NgramLm.scoreMapOnly(m, mem.toDF().toDF("id", "text"), "id", "text")
      .writeStream.format("memory").queryName("lm_stream").outputMode("append")
      .start()
    try {
      mem.addData((1L, "a b"), (2L, "a z"))
      q.processAllAvailable()
      mem.addData((3L, "z a"), (4L, "a"))
      q.processAllAvailable()
      val streamed = spark.table("lm_stream")
        .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      val batch = NgramLm.scoreMapOnly(m,
        Seq((1L, "a b"), (2L, "a z"), (3L, "z a"), (4L, "a")).toDF("id", "text"),
        "id", "text")
        .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      assert(streamed === batch)
      assert(streamed.map(_._1) === Seq(1L, 2L, 3L)) // 1-token doc dropped
    } finally q.stop()
  }

  test("minCount prunes rare bigrams but keeps exact prefix mass") {
    val m = NgramLm.train(Seq("a b a b", "a c").toDF("text"), "text", minCount = 2L)
    val bi = m.bigrams.as[(String, String, Long)].collect().toSet
    assert(bi === Set(("a", "b", 2L))) // (b,a) and (a,c) pruned
    // prefixes stay exact so pruned mass still normalizes the denominator
    val pre = m.prefixes.as[(String, Long)].collect().toSet
    assert(pre === Set(("a", 3L), ("b", 1L)))
  }
}
