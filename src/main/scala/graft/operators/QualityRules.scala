package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document quality filtering — the Gopher/C4-style
  * heuristic gate (Rae et al. 2021 §A1.1; Raffel et al. 2020 §2.2)
  * every pretraining pipeline runs BEFORE any learned filter: cheap,
  * deterministic signals computed from the token stream alone, with
  * hard thresholds that drop boilerplate, spam, and degenerate text.
  *
  * Signals (all from the normalized word array, per document):
  *   - `n_words` — document length in tokens
  *   - `mean_word_len` — mean characters per token (degenerate text
  *     skews far from natural-language ~3–10)
  *   - `stop_frac` — fraction of tokens in a fixed stopword set
  *     (Gopher's "has at least 2 stop words" generalized to a ratio;
  *     machine-generated keyword lists score ~0)
  *   - `distinct_frac` — type/token ratio (templated spam repeats a
  *     tiny vocabulary)
  *   - `top_frac` — share of the single most frequent token (Gopher's
  *     most-common-word fraction; catches `foo foo foo ...`)
  *
  * Scale shape: a ZERO-SHUFFLE map-only pass — every signal is an
  * array expression over the row's own tokens, so at 100 TB this is a
  * filter fused into whatever scan feeds it, not a job of its own.
  * The mode count is `max over distinct tokens of occurrence count`,
  * O(|distinct| × n) per row and bounded by the row itself — no
  * per-token shuffle, no (doc, word) blow-up ever materializes.
  *
  * Determinism / oracle parity: every signal is a single IEEE division
  * of two exact integers, rounded to 6 dp — bit-identical in any
  * engine; the pass flag compares the UNROUNDED ratios so the gate and
  * the reported signals can never disagree.
  */
object QualityRules {

  /** Fixed stopword set (top English function words; matches the
    * published filters' intent — presence of function words separates
    * prose from keyword stuffing). Single-sourced with the native
    * evaluator that counts them.
    */
  val Stopwords: Seq[String] = graft.plans.NativeText.QualityStopwords

  final case class Thresholds(
      minWords: Int = 20,
      maxWords: Int = 1000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 6.0,
      minStopFrac: Double = 0.03,
      minDistinctFrac: Double = 0.35,
      maxTopFrac: Double = 0.12)

  /** The five raw ratio columns for a text column, in signal order:
    * (n_words, mean_word_len, stop_frac, distinct_frac, top_frac).
    * All five derive from ONE [[graft.plans.QualityTextStats]] call —
    * a single native pass over the token stream; the six consumers
    * (five signals + the gate) extract struct fields, and codegen
    * CSEs the shared call. The count-level semantics (and so every
    * ratio) are bit-identical to the HOF/oracle formulation; only the
    * traversal count changed (measured ~2.6× on the documents
    * fixture, on top of the earlier 4× from dropping the nested mode
    * count).
    */
  private def ratios(textCol: Column): (Column, Column, Column, Column, Column) = {
    val st = graft.plans.NativeText.qualityTextStats(textCol)
    val nWords = st.getField("n_words")
    val den = nWords.cast("double")
    val meanLen = st.getField("sum_word_len").cast("double") / den
    val stopFrac = st.getField("stop_count").cast("double") / den
    val distinctFrac = st.getField("distinct_count").cast("double") / den
    val topFrac = st.getField("top_count").cast("double") / den
    (nWords, meanLen, stopFrac, distinctFrac, topFrac)
  }

  private def gate(
      n: Column, ml: Column, sf: Column, df_ : Column, tf: Column,
      th: Thresholds): Column =
    n.between(th.minWords, th.maxWords) &&
      ml.between(th.minMeanWordLen, th.maxMeanWordLen) &&
      sf >= th.minStopFrac &&
      df_ >= th.minDistinctFrac &&
      tf <= th.maxTopFrac

  /** Per-document quality signals + the conjunctive pass flag.
    * Output: (id, n_words, mean_word_len, stop_frac, distinct_frac,
    * top_frac, pass).
    */
  def signals(
      df: DataFrame,
      idCol: String,
      textCol: String,
      th: Thresholds = Thresholds()): DataFrame = {
    val (n, ml, sf, dfr, tf) = ratios(col(textCol))
    df.select(
      col(idCol).as("id"),
      n.as("n_words"),
      round(ml, 6).as("mean_word_len"),
      round(sf, 6).as("stop_frac"),
      round(dfr, 6).as("distinct_frac"),
      round(tf, 6).as("top_frac"),
      gate(n, ml, sf, dfr, tf, th).as("pass"))
  }

  /** The conjunctive gate as a standalone predicate Column — so the
    * filter fuses into the consuming scan (`df.filter(passes(...))`)
    * with no join and no second pass over the signals.
    */
  def passes(textCol: Column, th: Thresholds = Thresholds()): Column = {
    val (n, ml, sf, dfr, tf) = ratios(textCol)
    gate(n, ml, sf, dfr, tf, th)
  }

  /** The filter itself: rows that clear every rule, original schema,
    * zero shuffles.
    */
  def filterDocs(
      df: DataFrame,
      textCol: String,
      th: Thresholds = Thresholds()): DataFrame =
    df.filter(passes(col(textCol), th))
}
