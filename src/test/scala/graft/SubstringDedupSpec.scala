package graft

import org.apache.spark.sql.functions._

import graft.operators.SubstringDedup

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val run = (1 to 10).map(i => s"c$i").mkString(" ") // 10 shared tokens

  test("a shared 10-token run merges into one span covering 10 tokens") {
    // 10-token run => 3 duplicated 8-grams at positions p, p+1, p+2 —
    // overlapping, so they merge into ONE span of exactly 10 tokens.
    val docs = Seq(
      (1L, run + " u1 u2 u3 u4 u5 u6"),
      (2L, "v1 v2 " + run)
    ).toDF("id", "text")
    val out = SubstringDedup.spans(docs, "id", "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    assert(out(1L) === ((16L, 3L, 1L, 10L, 0.625)))
    assert(out(2L) === ((12L, 3L, 1L, 10L, r6(10.0 / 12))))
  }

  test("two disjoint shared runs stay two spans") {
    val runB = (1 to 8).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, run + " x1 x2 x3 " + runB),
      (2L, run + " y1 y2 y3 " + runB)
    ).toDF("id", "text")
    val out = SubstringDedup.spans(docs, "id", "text")
      .select("id", "n_spans", "dup_tokens").as[(Long, Long, Long)].collect().toMap2
    assert(out(1L) === ((2L, 18L)))
    assert(out(2L) === ((2L, 18L)))
  }

  test("within-document repetition alone is not a duplicated span") {
    val docs = Seq(
      (1L, run + " " + run), // repeats only inside doc 1
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")
    ).toDF("id", "text")
    assert(SubstringDedup.spans(docs, "id", "text").count() === 0)
  }

  test("hashed scale path matches the string-truth path") {
    val runB = (1 to 8).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, run + " u1 u2 u3 " + runB),
      (2L, "v1 v2 " + run),
      (3L, runB + " w1 w2 w3 w4 w5"),
      (4L, "x1 x2 x3 x4 x5 x6 x7 x8 x9")
    ).toDF("id", "text")
    val hashed = SubstringDedup.spans(docs, "id", "text").collect().toSet
    val exact = SubstringDedup.spansExact(docs, "id", "text").collect().toSet
    assert(hashed === exact)
  }

  test("documents shorter than n produce no grams (no descending-sequence trap)") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("id", "text")
    assert(SubstringDedup.spans(docs, "id", "text").count() === 0)
    val grams = docs.select(explode(SubstringDedup.tokenGrams(col("text"), 8)))
    assert(grams.count() === 0)
  }

  // ------------------------------------------------------------- scrub

  test("scrub keeps the first owner's copy and removes every other") {
    val docs = Seq(
      (1L, run + " u1 u2 u3 u4 u5 u6"), // owner: smallest id with the run
      (2L, "v1 v2 " + run),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")
    ).toDF("id", "text")
    val out = SubstringDedup.scrub(docs, "id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out(1L) === ((16L, 0L, run + " u1 u2 u3 u4 u5 u6")),
      "the owner keeps its text verbatim")
    assert(out(2L) === ((12L, 10L, "v1 v2")),
      "the non-owner loses exactly the shared run")
    assert(out(3L) === ((9L, 0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")),
      "an unrelated doc rides through untouched")
  }

  test("scrub removes disjoint spans independently and counts add up") {
    val runB = (1 to 8).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, run + " x1 x2 x3 " + runB),
      (2L, run + " y1 y2 y3 " + runB)
    ).toDF("id", "text")
    val out = SubstringDedup.scrub(docs, "id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._3, t._4))).toMap
    assert(out(1L) === ((0L, run + " x1 x2 x3 " + runB)))
    assert(out(2L) === ((18L, "y1 y2 y3")))
  }

  test("a fully duplicated non-owner document scrubs to empty") {
    val docs = Seq((1L, run), (2L, run)).toDF("id", "text")
    val out = SubstringDedup.scrub(docs, "id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._3, t._4))).toMap
    assert(out(1L) === ((0L, run)))
    assert(out(2L) === ((10L, "")))
  }

  test("hashed scrub matches the string-truth scrub") {
    val rnd = new scala.util.Random(9)
    val docs = (1L to 20L).map { i =>
      (i, (0 until 15).map(_ => s"t${rnd.nextInt(5)}").mkString(" "))
    }.toDF("id", "text")
    val hashed = SubstringDedup.scrub(docs, "id", "text", n = 4).collect().toSet
    val exact = SubstringDedup.scrubExact(docs, "id", "text", n = 4).collect().toSet
    assert(hashed === exact)
  }

  test("scrub token conservation: kept + removed = n_tokens, per doc") {
    val rnd = new scala.util.Random(3)
    val docs = (1L to 25L).map { i =>
      (i, (0 until 20).map(_ => s"t${rnd.nextInt(6)}").mkString(" "))
    }.toDF("id", "text")
    SubstringDedup.scrub(docs, "id", "text", n = 4)
      .as[(Long, Long, Long, String)].collect().foreach { case (id, n, rem, txt) =>
        val kept = if (txt.isEmpty) 0 else txt.split(" ").length
        assert(kept + rem === n, s"doc $id")
      }
  }

  // --------------------------------------------------- scrubToFixedPoint

  // n=3; removing doc 2's "x y z" span makes "a b" adjacent to "c",
  // minting the new gram "a b c" that doc 1 also contains — the
  // one-generation-per-pass caveat made concrete.
  private val twoPassDocs = Seq(
    (1L, "x y z a b c"),
    (2L, "a b x y z c d")
  )

  test("a span removal that mints a new duplicated gram needs a second pass") {
    val docs = twoPassDocs.toDF("id", "text")
    val once = SubstringDedup.scrub(docs, "id", "text", n = 3)
      .select("id", "clean_text").as[(Long, String)].collect().toMap
    assert(once(2L) === "a b c d") // generation 1 only
    val (fixed, passes) = SubstringDedup.scrubToFixedPoint(docs, "id", "text", n = 3)
    val out = fixed.select("id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(passes === 3) // removes, removes again, verifies nothing left
    assert(out(1L) === ((1L, 6L, 0L, "x y z a b c"))) // owner untouched
    assert(out(2L) === ((2L, 7L, 6L, "d")))
  }

  test("the fixed point is idempotent: another scrub removes nothing") {
    val docs = twoPassDocs.toDF("id", "text")
    val (fixed, _) = SubstringDedup.scrubToFixedPoint(docs, "id", "text", n = 3)
    val again = SubstringDedup.scrub(
      fixed.select(col("id"), col("clean_text").as("text")), "id", "text", n = 3)
    assert(again.agg(sum("n_removed")).collect().head.getLong(0) === 0L)
  }

  test("an already-clean corpus converges in one pass") {
    val docs = Seq((1L, "p q r s"), (2L, "t u v w")).toDF("id", "text")
    val (fixed, passes) = SubstringDedup.scrubToFixedPoint(docs, "id", "text", n = 3)
    assert(passes === 1)
    assert(fixed.agg(sum("n_removed")).collect().head.getLong(0) === 0L)
  }

  test("a doc scrubbed to empty reports full removal, not a phantom token") {
    val docs = Seq(
      (1L, "e1 e2 e3 e4 e5 q r"),
      (2L, "e1 e2 e3 e4 e5") // fully owned by doc 1 -> scrubs to ""
    ).toDF("id", "text")
    val (fixed, _) = SubstringDedup.scrubToFixedPoint(docs, "id", "text", n = 3)
    val out = fixed.select("id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(out(2L) === ((2L, 5L, 5L, "")))
  }

  test("randomized corpora: the fixed point is always idempotent and conserves tokens") {
    // deterministic pseudo-random corpora over a tiny vocabulary (high
    // collision pressure -> multi-pass scrubs are common); property:
    // (1) one more scrub removes nothing, (2) kept + removed = original
    // tokens per doc, (3) owners (min doc id per surviving gram) keep
    // their text verbatim on the first pass' owned grams
    val vocab = Array("a", "b", "c", "d", "e")
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 8L).map { id =>
        val n = 4 + rnd.nextInt(10)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }.toDF("id", "text")
      val (fixed, passes) = SubstringDedup.scrubToFixedPoint(docs, "id", "text", n = 3)
      val rows = fixed.select("id", "n_tokens", "n_removed", "clean_text")
        .as[(Long, Long, Long, String)].collect()
      assert(passes >= 1 && passes <= 10, s"seed $seed: $passes passes")
      rows.foreach { case (id, nTok, nRem, clean) =>
        val kept = if (clean.isEmpty) 0 else clean.split(" ").length
        assert(kept + nRem === nTok, s"seed $seed doc $id: $kept + $nRem != $nTok")
      }
      val again = SubstringDedup.scrub(
        fixed.select(col("id"), col("clean_text").as("text")), "id", "text", n = 3)
      assert(again.agg(sum("n_removed")).collect().head.getLong(0) === 0L,
        s"seed $seed: fixed point not idempotent")
    }
  }

  test("overrunning maxPasses throws instead of returning unconverged text") {
    val docs = twoPassDocs.toDF("id", "text")
    assertThrows[IllegalStateException] {
      SubstringDedup.scrubToFixedPoint(docs, "id", "text", n = 3, maxPasses = 1)
    }
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private implicit class MapOps(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = rows.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
