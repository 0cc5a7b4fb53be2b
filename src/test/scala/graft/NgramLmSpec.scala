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

  test("Kneser-Ney: hand-computed interpolated probability") {
    // ref "a b a c a b": c12 = {ab:2, ba:1, ac:1, ca:1}, B = 4 types,
    // V = 3; c(a) = 3, N1+(a·) = 2, N1+(·b) = 1
    // Pc(b) = (1 + 0.5)/(4 + 0.5·3) = 1.5/5.5
    // P(b|a) = (2 − 0.75)/3 + (0.75·2/3)·Pc(b) = 0.4166667 + 0.1363636
    val m = NgramLm.trainKn(Seq("a b a c a b").toDF("text"), "text")
    assert(m.bigramTypes == 4L && m.vocabSize == 3L)
    val out = NgramLm.scoreKn(m, Seq((1L, "a b")).toDF("id", "text"), "id", "text")
      .select("avg_neg_logp").as[Double].head()
    val expected = -math.log(1.25 / 3.0 + (0.75 * 2.0 / 3.0) * (1.5 / 5.5))
    assert(math.abs(out - expected) < 1e-6, s"got $out, want $expected")
  }

  test("Kneser-Ney: probabilities over the vocabulary sum to 1 for a seen context") {
    // Σ_w P(w|v) = 1 exactly: the discounted mass D·N1+(v·)/c(v) is
    // redistributed by Pc, and Σ_w Pc(w) = (B + 0.5·V)/(B + 0.5·V) = 1
    val m = NgramLm.trainKn(Seq("a b a c a b").toDF("text"), "text")
    val probs = Seq((1L, "a a"), (2L, "a b"), (3L, "a c"))
      .toDF("id", "text")
    val nlps = NgramLm.scoreKn(m, probs, "id", "text")
      .select("avg_neg_logp").as[Double].collect()
    val total = nlps.map(nlp => math.exp(-nlp)).sum
    assert(math.abs(total - 1.0) < 1e-5, s"P(a|a)+P(b|a)+P(c|a) = $total")
  }

  test("Kneser-Ney: unseen context backs off to the continuation distribution") {
    val m = NgramLm.trainKn(Seq("a b a c a b").toDF("text"), "text")
    // "z a": context z unseen -> P = Pc(a) = (2 + 0.5)/5.5
    val out = NgramLm.scoreKn(m, Seq((1L, "z a")).toDF("id", "text"), "id", "text")
      .select("oov_bigrams", "avg_neg_logp").as[(Long, Double)].head()
    assert(out._1 == 1L)
    assert(math.abs(out._2 - -math.log(2.5 / 5.5)) < 1e-6)
  }

  test("Kneser-Ney: continuation weighting demotes single-context words") {
    // "only" follows exactly one context in the reference even though
    // it is frequent; a word with many left contexts must get a higher
    // continuation probability than the equally frequent one-context word
    val ref = Seq("x only x only x only y z w z u z").toDF("text")
    val m = NgramLm.trainKn(ref, "text")
    val nb = m.contBefore.as[(String, Long)].collect().toMap
    assert(nb("only") == 1L, "frequent but single-context")
    assert(nb("z") == 3L, "appears after y, w, u")
    // under an UNSEEN context, z must be more probable than only
    val out = NgramLm.scoreKn(m,
      Seq((1L, "qq only"), (2L, "qq z")).toDF("id", "text"), "id", "text")
      .select("id", "perplexity").as[(Long, Double)].collect().toMap
    assert(out(2L) < out(1L),
      s"many-context word must score better: ${out(2L)} vs ${out(1L)}")
  }

  test("Kneser-Ney: map-only scoring equals the join-based scorer bit-for-bit") {
    val docs = Seq((1L, "a b c"), (2L, "a z b"), (3L, "c a b a"), (4L, "z q"))
      .toDF("id", "text")
    val m = NgramLm.trainKn(Seq("a b a c a b", "b c").toDF("text"), "text")
    val joined = NgramLm.scoreKn(m, docs, "id", "text")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val mapOnly = NgramLm.scoreKnMapOnly(NgramLm.collectKn(m), docs, "id", "text")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(mapOnly === joined)
    // genuinely map-only: no exchange anywhere in the plan
    val plan = NgramLm.scoreKnMapOnly(NgramLm.collectKn(m), docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"map-only KN plan must not shuffle:\n$plan")
  }

  test("Kneser-Ney: shuffle-join scoring equals the broadcast path") {
    val docs = Seq((1L, "a b c"), (2L, "a z b"), (3L, "c a b a")).toDF("id", "text")
    val m = NgramLm.trainKn(Seq("a b a c a b", "b c").toDF("text"), "text")
    val bc = NgramLm.scoreKn(m, docs, "id", "text", broadcastModel = true)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val sh = NgramLm.scoreKn(m, docs, "id", "text", broadcastModel = false)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(bc === sh)
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
