package graft

import org.apache.spark.sql.functions._

import graft.operators.Lexicon

/** Hand-computed oracles for the vocabulary-level lexical signals. */
class LexiconSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------- vocabCoverage

  test("tokens outside the top-K vocabulary count as OOV") {
    // corpus counts: x:4 y:3 z:2 w:1 — vocab of 2 is {x, y}
    val docs = Seq(
      (1L, "x x y z"), (2L, "x y w"), (3L, "x y z")).toDF("doc_id", "text")
    val r = Lexicon.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      (1L, 4L, 1L, 0.25), (2L, 3L, 1L, 0.333333), (3L, 3L, 1L, 0.333333)))
  }

  test("the vocabulary boundary tie-breaks on the term") {
    // y and z both appear twice; K=2 keeps {x, y} (count desc, term asc)
    val docs = Seq((1L, "x x x y y z z")).toDF("doc_id", "text")
    val r = Lexicon.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .collect().head
    assert(r.getLong(1) == 7L && r.getLong(2) == 2L) // z's two hits are OOV
  }

  test("full-vocabulary coverage has zero OOV") {
    val docs = Seq((1L, "a b c"), (2L, "a")).toDF("doc_id", "text")
    val r = Lexicon.vocabCoverage(docs, "doc_id", "text", vocabSize = 100)
      .agg(sum("n_oov")).first().getLong(0)
    assert(r == 0L)
  }

  // ----------------------------------------------- distinctiveTerms

  test("a term concentrated in one source gets the top keyness there") {
    val docs = Seq(
      ("a", "shared shared spark spark spark spark"),
      ("b", "shared shared other other other other")).toDF("source", "text")
    val r = Lexicon.distinctiveTerms(docs, "source", "text", topK = 1)
      .orderBy("source")
      .collect().map(x => (x.getString(0), x.getString(2)))
    assert(r.toSeq == Seq(("a", "spark"), ("b", "other")))
  }

  test("keyness is symmetric for a mirrored corpus") {
    val docs = Seq(
      ("a", "x x x y"), ("b", "y y y x")).toDF("source", "text")
    val r = Lexicon.distinctiveTerms(docs, "source", "text", topK = 2)
      .collect().map(x => (x.getString(0), x.getString(2), x.getDouble(5)))
    val ax = r.find(t => t._1 == "a" && t._2 == "x").get._3
    val by = r.find(t => t._1 == "b" && t._2 == "y").get._3
    assert(math.abs(ax - by) < 1e-9, s"$ax vs $by")
    assert(ax > 0, s"distinctive term must have positive keyness, got $ax")
  }

  test("counts in the output are exact source/rest splits") {
    val docs = Seq(
      ("a", "x x y"), ("b", "x z")).toDF("source", "text")
    val r = Lexicon.distinctiveTerms(docs, "source", "text", topK = 10)
      .filter($"source" === "a" && $"term" === "x").collect().head
    assert(r.getLong(3) == 2L && r.getLong(4) == 1L) // c_source=2, c_rest=1
  }

  test("a one-term corpus yields finite keyness, not NaN/inf") {
    // degenerate case: one term carries the whole corpus count, so the
    // smoothed denominator ns + alpha0 - csw - aw hits exactly 0 —
    // without the clamp, log(+inf) keyness poisons the rank window
    val docs = Seq(("a", "x x x"), ("b", "x")).toDF("source", "text")
    val r = Lexicon.distinctiveTerms(docs, "source", "text", topK = 1)
      .collect().map(_.getDouble(5))
    assert(r.length == 2)
    assert(r.forall(k => !k.isNaN && !k.isInfinite), r.toSeq)
  }

  test("keyness is partitioning-independent") {
    val docs = Seq(
      ("a", "x x y z"), ("b", "y y z w"), ("c", "z w w x"))
      .toDF("source", "text")
    val one = Lexicon.distinctiveTerms(docs, "source", "text")
      .orderBy("source", "rank").collect().toSeq
    val many = Lexicon.distinctiveTerms(docs.repartition(5), "source", "text")
      .orderBy("source", "rank").collect().toSeq
    assert(one == many)
  }

  // --------------------------------------------------- tokenEntropy

  test("uniform token distribution reaches ln(n_types)") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val r = Lexicon.tokenEntropy(docs, "doc_id", "text").collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 1.0)
    assert(math.abs(r.getDouble(4) - math.log(4.0)) < 1e-5)
  }

  test("a single repeated token has zero entropy") {
    val docs = Seq((1L, "spam spam spam spam")).toDF("doc_id", "text")
    val r = Lexicon.tokenEntropy(docs, "doc_id", "text").collect().head
    assert(r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.25)
    assert(math.abs(r.getDouble(4)) < 1e-9)
  }

  test("entropy matches the closed form on a skewed document") {
    // counts {x:3, y:1}: H = ln 4 − (3 ln 3 + 0)/4
    val docs = Seq((1L, "x x x y")).toDF("doc_id", "text")
    val r = Lexicon.tokenEntropy(docs, "doc_id", "text").collect().head
    val want = math.log(4.0) - 3.0 * math.log(3.0) / 4.0
    assert(math.abs(r.getDouble(4) - want) < 1e-5, s"${r.getDouble(4)} vs $want")
  }

  // ------------------------------------------------- termBurstiness

  test("a uniformly-spread term has VMR 0 at one occurrence per doc") {
    val docs = Seq((1L, "the cat"), (2L, "the dog"), (3L, "the owl"))
      .toDF("doc_id", "text")
    val r = Lexicon.termBurstiness(docs, "doc_id", "text")
      .filter($"term" === "the").collect().head
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 1.0) // one per containing doc
    assert(r.getDouble(5) == 0.0) // zero dispersion
  }

  test("a hammered term is burstier than a spread term at equal cf") {
    // both terms occur 6 times; "spam" in 1 doc, "the" across 6
    val docs = (1L to 6L).map(i => (i, "the")).toDF("doc_id", "text")
      .union(Seq((7L, "spam spam spam spam spam spam")).toDF("doc_id", "text"))
    val r = Lexicon.termBurstiness(docs, "doc_id", "text")
      .collect().map(x => x.getString(1) -> (x.getDouble(4), x.getDouble(5))).toMap
    assert(r("spam")._1 == 6.0 && r("the")._1 == 1.0)
    assert(r("spam")._1 > r("the")._1)
  }

  test("burstiness matches the closed form on a mixed case") {
    // "x" counts per containing doc: {1, 3} -> mean 2, var 1, vmr 0.5
    val docs = Seq((1L, "x y"), (2L, "x x x")).toDF("doc_id", "text")
    val r = Lexicon.termBurstiness(docs, "doc_id", "text")
      .filter($"term" === "x").collect().head
    assert(r.getDouble(4) == 2.0)
    assert(r.getDouble(5) == 0.5)
  }

  test("ranks follow (cf desc, term) and are partitioning-independent") {
    val docs = (1 to 50).map(i =>
      (i.toLong, Seq.fill(1 + i % 5)(s"w${i % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    val one = Lexicon.termBurstiness(docs, "doc_id", "text").collect().toSeq
    val many = Lexicon.termBurstiness(docs.repartition(9), "doc_id", "text")
      .collect().toSeq
    assert(one == many)
    assert(one.map(_.getLong(0)) == (1L to one.length.toLong))
    val cfs = one.map(_.getLong(2))
    assert(cfs == cfs.sorted.reverse)
  }

  // ------------------------------------------------------- fixture

  test("registered queries produce sane rows on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val cov = Queries.all("q_vocab_coverage")(spark, dir)
    val rates = cov.select("oov_rate").as[Double].collect()
    assert(rates.nonEmpty && rates.forall(r => r >= 0.0 && r <= 1.0))
    val keys = Queries.all("q_distinctive_terms")(spark, dir)
    val bySource = keys.groupBy("source").count().select("count").as[Long].collect()
    assert(bySource.nonEmpty && bySource.forall(_ <= 10L))
    val ent = Queries.all("q_token_entropy")(spark, dir)
    val hs = ent.select("entropy").as[Double].collect()
    assert(hs.nonEmpty && hs.forall(h => h >= 0.0 && h < 12.0))
  }
}
