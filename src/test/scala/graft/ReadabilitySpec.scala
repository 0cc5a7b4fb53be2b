package graft

import org.apache.spark.sql.functions.col

import graft.functions.TextFunctions

/** Hand-computed Flesch oracles for the readability kernel. */
class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def score(text: String) =
    Seq(text).toDF("t")
      .select(TextFunctions.readability(col("t")).as("r"))
      .select("r.n_words", "r.n_sentences", "r.n_syllables",
        "r.flesch", "r.fk_grade")
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head

  test("counts and formulas match a hand computation") {
    // 6 words, 2 sentence runs, 6 single-vowel-group syllables:
    // flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    // fk     = 0.39*(6/2) + 11.8*(6/6) - 15.59   = -2.62
    val (w, s, sy, f, g) = score("The cat sat. The dog ran!")
    assert((w, s, sy) === ((6L, 2L, 6L)))
    assert(math.abs(f.get - 119.19) < 1e-9, f)
    assert(math.abs(g.get - -2.62) < 1e-9, g)
  }

  test("a vowel-less word still counts one syllable") {
    // "rhythms tsk" -> 2 words, both vowel-group-less except the y?
    // [aeiouy]+ matches the 'y' in rhythms (1 group); tsk has none
    // and is floored at 1 => 2 syllables total
    val (w, _, sy, _, _) = score("rhythms tsk")
    assert((w, sy) === ((2L, 2L)))
  }

  test("no sentence punctuation floors the sentence count at 1") {
    val (_, s, _, _, _) = score("just a fragment with no ending")
    assert(s === 1L)
  }

  test("a wordless document yields null scores, not division errors") {
    val (w, _, _, f, g) = score("   ")
    assert(w === 0L && f.isEmpty && g.isEmpty)
  }

  test("multi-punctuation runs count as ONE sentence boundary") {
    val (_, s, _, _, _) = score("Wait... really?! Yes.")
    assert(s === 3L, "'...', '?!' and '.' are three runs")
  }
}
