package graft

import org.apache.spark.sql.functions.col

import graft.operators.{CorpusGrowth, Curation}

/** Corpus-growth diagnostics — hand-computed oracles. */
class CorpusGrowthSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ ngramNovelty

  test("novelty attributes each trigram to its smallest doc_id") {
    val docs = Seq(
      (1L, "a b c d"),   // trigrams {a b c, b c d} — both first here
      (2L, "a b c x"),   // {a b c (seen), b c x (new)} -> 0.5
      (3L, "zz"))        // too short: no trigrams, no row
      .toDF("doc_id", "text")
    val r = CorpusGrowth.ngramNovelty(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5)))
  }

  test("novelty counts distinct trigrams once per document") {
    val docs = Seq((7L, "a b c a b c a b c")).toDF("doc_id", "text")
    // 7 positional trigrams but only 3 distinct: {a b c, b c a, c a b}
    val r = CorpusGrowth.ngramNovelty(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().head
    assert(r == ((7L, 3L, 3L, 1.0)))
  }

  test("novelty is partitioning-independent") {
    val docs = (1L to 30L).map(i => (i, s"tok${i % 5} tok${i % 7} tok${i % 3} tok${i % 11}"))
      .toDF("doc_id", "text")
    val one = CorpusGrowth.ngramNovelty(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val many = CorpusGrowth.ngramNovelty(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(one == many)
  }

  test("novelty conservation: novel counts sum to the corpus' distinct grams") {
    val docs = (1L to 40L)
      .map(i => (i, s"w${i % 6} w${(i / 2) % 5} w${i % 4} w${(i / 3) % 7}"))
      .toDF("doc_id", "text")
    val r = CorpusGrowth.ngramNovelty(docs, "doc_id", "text")
    val totalNovel = r.agg(org.apache.spark.sql.functions.sum("n_novel"))
      .as[Long].collect().head
    val distinctGrams = graft.operators.CorpusGrowth
      .docShingleHashes(docs, "doc_id", "text", 3)
      .select(org.apache.spark.sql.functions.explode($"gs").as("h"))
      .distinct().count()
    assert(totalNovel === distinctGrams,
      "every distinct gram is novel for exactly one document")
  }

  // ------------------------------------------------------- vocabGrowth

  test("vocab growth: cumulative curve and the local Heaps exponent") {
    val docs = ((0L to 4L).map((_, "w1 w2")) ++ (5L to 9L).map((_, "w1 w3")))
      .toDF("doc_id", "text")
    val r = CorpusGrowth.vocabGrowth(docs, "doc_id", "text", buckets = 2)
      .orderBy("bucket").collect().toSeq
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))) ==
      Seq((1L, 10L, 2L), (2L, 20L, 3L)))
    assert(r.head.isNullAt(3), "first bucket has no growth exponent")
    val beta = r(1).getDouble(3)
    val expect = (math.log(3) - math.log(2)) / (math.log(20) - math.log(10))
    assert(math.abs(beta - expect) < 1e-6, s"$beta vs $expect")
  }

  test("vocab growth buckets by id range, not by sort position") {
    // ids 0 and 99: two occupied buckets out of 10 — rows only for
    // occupied ranges, cumulative values still correct
    val docs = Seq((0L, "a b"), (99L, "c")).toDF("doc_id", "text")
    val r = CorpusGrowth.vocabGrowth(docs, "doc_id", "text", buckets = 10)
      .orderBy("bucket").collect().toSeq
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))) ==
      Seq((1L, 2L, 2L), (10L, 3L, 3L)))
  }

  test("vocab growth totals: final bucket carries the whole corpus") {
    val docs = (0L to 29L)
      .map(i => (i, s"w${i % 9} w${(i / 4) % 6} w${i % 5}"))
      .toDF("doc_id", "text")
    val last = CorpusGrowth.vocabGrowth(docs, "doc_id", "text", buckets = 5)
      .orderBy($"bucket".desc).limit(1).collect().head
    val totalTokens = 30L * 3L
    val totalVocab = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("w"))
      .distinct().count()
    assert(last.getLong(1) === totalTokens)
    assert(last.getLong(2) === totalVocab)
  }

  // --------------------------------------------------- epochAllocation

  test("epoch allocation: greedy marginal value under the budget") {
    val docs = Seq(("a", 100L), ("b", 30L)).toDF("source", "ntok")
    // values: a(100, 50, 25), b(30, 15, 7.5); greedy order a1, a2, b1…
    // cumulative cost 100, 200, 230 — budget 200 keeps exactly a1, a2
    val r = Curation.epochAllocation(
      docs, "source", col("ntok"), budget = 200L, maxEpochs = 3, delta = 0.5)
      .orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      ("a", 100L, 2L, 200L, 150.0),
      ("b", 30L, 0L, 0L, 0.0)))
  }

  test("epoch allocation caps at maxEpochs when the budget is ample") {
    val docs = Seq(("a", 10L), ("b", 20L)).toDF("source", "ntok")
    val r = Curation.epochAllocation(
      docs, "source", col("ntok"), budget = 1000000L, maxEpochs = 4, delta = 0.5)
      .orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(r.map(x => (x._1, x._3)) == Seq(("a", 4L), ("b", 4L)))
    // effective value: u * (1 - 0.5^4) / 0.5 = u * 1.875
    assert(r.map(_._5) == Seq(18.75, 37.5))
  }

  test("epoch allocation matches a driver-side greedy reference") {
    // brute-force the greedy on the driver for several budgets: take
    // (source, epoch) pairs in (value desc, source, epoch) order while
    // the running token cost fits
    val masses = Seq("a" -> 97L, "b" -> 41L, "c" -> 150L, "d" -> 7L)
    val docs = masses.toDF("source", "ntok")
    val maxE = 5
    val delta = 0.5
    for (budget <- Seq(0L, 50L, 300L, 700L, 2000L, 100000L)) {
      val pairs = masses.flatMap { case (s, u) =>
        (1 to maxE).map(e => (s, u, e,
          BigDecimal(u.toDouble * math.pow(delta, e - 1))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.sortBy { case (s, _, e, v) => (-v, s, e) }
      var spent = 0L
      val want = collection.mutable.Map[String, Long]().withDefaultValue(0L)
      pairs.foreach { case (s, u, _, _) =>
        if (spent + u <= budget) { spent += u; want(s) += 1 }
        else spent += u // past the prefix: running sum keeps growing
      }
      val got = Curation.epochAllocation(
        docs, "source", col("ntok"), budget, maxE, delta)
        .select("source", "epochs").as[(String, Long)].collect().toMap
      masses.foreach { case (s, _) =>
        assert(got(s) === want(s), s"budget $budget, source $s")
      }
    }
  }

  test("epoch allocation never exceeds the budget and is deterministic") {
    val docs = (1 to 17).map(i => (s"s${i % 5}", (i * 13 % 97).toLong))
      .toDF("source", "ntok")
    val run = Curation.epochAllocation(
      docs, "source", col("ntok"), budget = 500L, maxEpochs = 8)
    val a = run.orderBy("source").collect().toSeq
    val b = Curation.epochAllocation(
      docs.repartition(5), "source", col("ntok"), budget = 500L, maxEpochs = 8)
      .orderBy("source").collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(3)).sum <= 500L)
  }
}
