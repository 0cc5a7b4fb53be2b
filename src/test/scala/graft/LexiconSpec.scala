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
