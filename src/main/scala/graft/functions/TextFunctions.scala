package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale document pipelines:
  * normalization, fingerprinting, token statistics, shingling, a
  * portable 32-bit hash, and an n-gram/marker-word language heuristic.
  *
  * Everything here is built-in Catalyst expressions (no UDFs) so it
  * stays inside whole-stage codegen and is embarrassingly parallel —
  * per-row work only, no shuffle. The portable hash is defined via
  * sha2 so an external SQL engine (the DuckDB oracle) can reproduce it
  * bit-for-bit; hot paths that don't need cross-engine parity should
  * prefer `xxhash64` (cheaper).
  */
object TextFunctions {

  /** Lowercase, collapse runs of whitespace, trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Stable document fingerprint: sha2-256 of the normalized text. */
  def fingerprint(c: Column): Column = sha2(normalizeText(c), 256)

  /** Whitespace token count (codegen'd regexp, no split allocation). */
  def tokenCount(c: Column): Column = regexp_count(c, lit("\\S+"))

  /** PII-bearing patterns for [[redactPii]]. Kept RE2-compatible (no
    * backreferences/lookaround) so the DuckDB oracle replays redaction
    * exactly; ordering matters — emails redact before the generic URL
    * pattern can eat an address embedded in a link.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "\\+?[0-9][0-9() .-]{7,}[0-9]" -> "<PHONE>")

  /** Redact emails, URLs and phone-shaped numbers with typed
    * placeholders — the standard scrub pass before training text
    * leaves the pipeline. Pure per-row regexp chain: codegen'd, no
    * shuffle, embarrassingly parallel.
    */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** Portable 32-bit non-negative hash: first 8 hex chars of sha2-256,
    * as a long in [0, 2^32). Reproducible in any engine with sha256 +
    * hex parsing; used for minhash/simhash so the oracle can verify.
    */
  def portableHash32(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 8), 16, 10).cast("long")

  /** Word n-gram shingles of the normalized text, as an array column.
    * Pure higher-order functions — per-row, no explode, no shuffle.
    * Texts shorter than n words yield an empty array (guarded: Spark's
    * `sequence(1, 0)` would count DOWN, not produce an empty sequence).
    */
  def wordShingles(c: Column, n: Int): Column = {
    val words = split(normalizeText(c), " ")
    val cnt = size(words) - (n - 1)
    // n−1 zip_withs over LITERAL-offset slices, not
    // transform(sequence, i -> slice(words, i, n)): a slice whose
    // start is a per-element expression re-copies O(doc) per shingle
    // (quadratic per document — measured 5–8× slower at sf0.1);
    // literal-start slices are n cheap array views zipped linearly.
    // Identical output: shingle i = words[i..i+n-1] joined by ' ',
    // in positional order.
    val joined = (2 to n).foldLeft(slice(words, lit(1), cnt)) { (acc, k) =>
      zip_with(acc, slice(words, lit(k), cnt), (a, b) => concat_ws(" ", a, b))
    }
    when(cnt >= 1, joined).otherwise(array().cast("array<string>"))
  }

  /** Fraction of word n-grams that are repeats of an earlier
    * occurrence — the repetition family of quality signals (degenerate
    * machine-generated or boilerplate text repeats itself long before
    * it trips length/stopword heuristics). n = 1 is the duplicate-word
    * fraction; larger n catches repeated phrases. Pure per-row HOFs
    * (split + distinct on the shingle array): codegen'd, no shuffle,
    * and the DuckDB oracle replays it with list_distinct.
    */
  def dupNgramFraction(c: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val grams = if (n == 1) split(normalizeText(c), " ") else wordShingles(c, n)
    when(size(grams) > 0,
      (size(grams) - size(array_distinct(grams))).cast("double") / size(grams))
      .otherwise(lit(0.0))
  }

  /** Marker words per language for the language-ID heuristic. A real
    * deployment would plug a trained n-gram model in behind the same
    * column signature; the heuristic keeps the whole thing inside
    * codegen'd expressions.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "es" -> Seq("el", "de", "la"),
    "fr" -> Seq("le", "et", "les"),
    "zh" -> Seq("shi", "de", "zhong"))

  /** Count of whole-word occurrences of `word` in the text. */
  def markerCount(c: Column, word: String): Column =
    regexp_count(lower(c), lit("\\b" + word + "\\b"))

  /** Total marker hits for one language. */
  def langScore(c: Column, lang: String): Column =
    langMarkers.toMap.apply(lang)
      .map(markerCount(c, _))
      .reduce(_ + _)

  /** Predicted language: argmax of [[langScore]] over [[langMarkers]],
    * first-listed language winning ties ('und' if no marker hits at all).
    */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (lang, _) => lang -> langScore(c, lang) }
    val best = scores
      .map { case (lang, s) => struct(s.as("score"), lit(lang).as("lang")) }
      .reduce((a, b) => when(b.getField("score") > a.getField("score"), b).otherwise(a))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Readability counts + Flesch scores with a fully deterministic
    * syllable heuristic: a syllable is one `[aeiouy]+` group, and a
    * word with no vowel group still counts one ("rhythm"-class words,
    * acronyms) — the published Flesch/Flesch–Kincaid formulas over
    * engine-portable integer counts (sentence count = `[.!?]+` runs,
    * floored at 1; a dictionary syllabifier would be more accurate
    * but not replayable by an oracle). All map-only regexp counts —
    * zero shuffles; each ratio divides exact integers, rounded to
    * 6 dp. Returns a struct
    * `(n_words, n_sentences, n_syllables, flesch, fk_grade)`;
    * `flesch`/`fk_grade` are null for wordless documents.
    */
  def readability(c: Column): Column = {
    val words = tokenCount(c)
    val sentences = greatest(regexp_count(c, lit("[.!?]+")), lit(1))
    // vowel groups corpus-wide, plus one per vowel-less word
    val novowel = size(filter(split(normalizeText(c), " "),
      w => w =!= "" && !w.rlike("[aeiouy]")))
    val syllables = regexp_count(lower(c), lit("[aeiouy]+")) + novowel
    val w = words.cast("double")
    val s = sentences.cast("double")
    val sy = syllables.cast("double")
    val flesch = round(lit(206.835) - lit(1.015) * (w / s) -
      lit(84.6) * (sy / w), 6)
    val fk = round(lit(0.39) * (w / s) + lit(11.8) * (sy / w) -
      lit(15.59), 6)
    struct(
      words.cast("long").as("n_words"),
      sentences.cast("long").as("n_sentences"),
      syllables.cast("long").as("n_syllables"),
      when(words > 0, flesch).as("flesch"),
      when(words > 0, fk).as("fk_grade"))
  }

  /** Heuristic quality score in [0,1]: penalizes very short / very long
    * documents, rewards moderate average word length. All-integer inputs
    * and fixed-order arithmetic → bit-stable across engines.
    */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast("double")
    val nTokens = tokenCount(c).cast("double")
    val avgWordLen = when(nTokens > 0, nChars / nTokens).otherwise(lit(0.0))
    val lengthScore = least(nChars / lit(200.0), lit(1.0))
    val wordLenScore = when(avgWordLen >= 3 && avgWordLen <= 10, lit(1.0))
      .when(avgWordLen > 0, lit(0.5))
      .otherwise(lit(0.0))
    round(lengthScore * lit(0.5) + wordLenScore * lit(0.5), 6)
  }
}
