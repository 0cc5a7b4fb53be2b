package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Vocabulary-level corpus analysis — the lexical audits a
  * training-data pipeline runs between dedup and mixture design:
  * how much of each document a fixed tokenizer vocabulary would
  * cover (OOV rate), which terms are statistically DISTINCTIVE of
  * each source (Monroe–Colaresi–Quinn log-odds with an informative
  * Dirichlet prior — the "fightin' words" keyness statistic), and
  * how lexically diverse each document is (unigram Shannon entropy
  * and type–token ratio — the repetition/diversity quality signal
  * that per-character stats miss).
  *
  * Scale shape: every signal reduces the corpus to a vocabulary- or
  * document-bounded table in ONE explode + map-side-combined groupBy
  * pass, then works on that. The top-K vocabulary is a
  * TakeOrdered(K) — K rows on the driver side of the plan, broadcast
  * back for the coverage join, never a shuffle of the corpus against
  * itself. Keyness joins two vocab-bounded tables on the term.
  * Entropy groups (doc, term) then doc — both keyed shuffles with
  * partial aggregation, no windows over the corpus.
  *
  * Determinism (oracle parity): float contributions are rounded
  * (7 dp) and folded through DECIMAL(27,7) sums — order-independent —
  * and every ranking happens on a rounded value with a total-order
  * tie-break, the same discipline as [[Divergence]].
  */
object Lexicon {

  private def words(textCol: Column): Column =
    split(TextFunctions.normalizeText(textCol), " ")

  /** Exploded (id, w) token stream, empties dropped. */
  private def tokens(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("__id"), explode(words(col(textCol))).as("w"))
      .filter(col("w") =!= "")

  /** Per-document coverage of the corpus' own top-`vocabSize`
    * unigram vocabulary: `(id, n_tokens, n_oov, oov_rate)` for every
    * document with at least one token. The stand-in for "how well
    * would a K-entry tokenizer/embedding table cover this document" —
    * high-OOV documents are boilerplate, code, or the wrong language.
    *
    * Vocabulary membership is a total order (count desc, term asc),
    * so the K-th entry is engine-portable. The vocab is K rows —
    * `orderBy.limit(K)` plans as TakeOrderedAndProject (no full
    * sort), and the membership join broadcasts it.
    */
  def vocabCoverage(
      docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0, s"need vocabSize > 0, got $vocabSize")
    val tok = tokens(docs, idCol, textCol)
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(vocabSize)
      .select(col("w"), lit(1).as("__in"))
    tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("__id").as(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"),
        col("n_oov").cast("long").as("n_oov"),
        round(col("n_oov").cast("double") /
          col("n_tokens").cast("double"), 6).as("oov_rate"))
  }

  /** Per-source distinctive terms: the Monroe–Colaresi–Quinn
    * log-odds-ratio z-score with an informative Dirichlet prior
    * ("Fightin' Words", Political Analysis 16(4), 2008) of each term
    * in a source versus the rest of the corpus, top `topK` per source
    * by z — what a mixture designer reads to see WHAT a source
    * actually contributes.
    *
    * For term w in source s: prior `a_w = alpha0 · c_w / N` (scaled
    * global frequency); delta is the difference of the two smoothed
    * log-odds; variance `≈ 1/(c_sw+a_w) + 1/(c_rw+a_w)`;
    * `z = delta/sqrt(var)`. Ranking uses z rounded to 6 dp with a
    * term tie-break — a total order both engines replay.
    *
    * Everything happens on the vocab-bounded (source, w, c) table:
    * global term counts join back on the term, per-source totals
    * (|sources| rows) broadcast, and the top-K is a rank window over
    * vocab rows, not corpus rows.
    */
  def distinctiveTerms(
      docs: DataFrame, sourceCol: String, textCol: String,
      alpha0: Double = 100.0, topK: Int = 10): DataFrame =
    distinctiveTermsFromCounts(
      docs
        .select(col(sourceCol).as("source"), explode(words(col(textCol))).as("w"))
        .filter(col("w") =!= "")
        .groupBy("source", "w")
        .agg(count(lit(1)).as("c")),
      alpha0, topK)

  /** [[distinctiveTerms]] over a pre-aggregated (source, w, c) count
    * table — the mergeable representation
    * ([[graft.streaming.LexiconStream]] persists these; any sum of
    * such tables feeds this identically).
    */
  def distinctiveTermsFromCounts(
      counts0: DataFrame, alpha0: Double = 100.0, topK: Int = 10): DataFrame = {
    require(topK > 0, s"need topK > 0, got $topK")
    val counts = counts0
      .localCheckpoint() // global/source totals and the join both read it
    val global = counts.groupBy("w")
      .agg(sum("c").as("cw")) // vocab-bounded
    val srcTot = counts.groupBy("source").agg(sum("c").as("ns"))
    val totalN = counts.agg(sum("c").as("nn")) // one row, broadcast below
    val joined = counts
      .join(global, Seq("w"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(totalN))
    val n = col("nn").cast("double")
    val aw = lit(alpha0) * col("cw").cast("double") / n
    val csw = col("c").cast("double")
    val crw = col("cw").cast("double") - csw
    val ns = col("ns").cast("double")
    val nr = n - ns
    // the denominators reach exactly 0 when ONE term carries the whole
    // corpus count (csw == ns and aw == alpha0): log(+inf) would emit
    // NaN/inf keyness and poison the rank window, so clamp — inert for
    // any real vocabulary (denominators are otherwise O(alpha0))
    val eps = lit(1e-12)
    val delta =
      log((csw + aw) / greatest(ns + lit(alpha0) - csw - aw, eps)) -
        log((crw + aw) / greatest(nr + lit(alpha0) - crw - aw, eps))
    val variance = lit(1.0) / (csw + aw) + lit(1.0) / (crw + aw)
    val z = round(delta / sqrt(variance), 6)
    joined
      .select(col("source"), col("w").as("term"), col("c").as("c_source"),
        (col("cw") - col("c")).cast("long").as("c_rest"), z.as("keyness"))
      .withColumn("__rk", row_number().over(Window.partitionBy("source")
        .orderBy(col("keyness").desc, col("term"))))
      .filter(col("__rk") <= topK)
      .select(col("source"), col("__rk").cast("long").as("rank"),
        col("term"), col("c_source"), col("c_rest"), col("keyness"))
  }

  /** Term burstiness (Church & Gale): for the corpus' top-`topK`
    * terms, how the term's occurrences DISPERSE across the documents
    * that contain it — `burstiness = cf/df` (mean occurrences per
    * containing document) and the variance-to-mean ratio over those
    * documents. Function words sit near VMR ≈ 1 (Poisson-like);
    * topical and spam terms are bursty (VMR ≫ 1). The signal that
    * separates "frequent because it is everywhere" from "frequent
    * because a few documents hammer it" — which keyness (a
    * between-source contrast) cannot see.
    *
    * Output: `(rank, term, cf, df, burstiness, vmr)`, rank by
    * (cf desc, term) — a total order. One explode + (doc, term)
    * count, one per-term fold over exact longs (Σc and Σc² as
    * DECIMAL(38,0) — order-independent), TakeOrdered for the top-K.
    */
  def termBurstiness(
      docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 30): DataFrame = {
    require(topK > 0, s"need topK > 0, got $topK")
    val perDoc = tokens(docs, idCol, textCol)
      .groupBy("__id", "w")
      .agg(count(lit(1)).as("c"))
    val perTerm = perDoc
      .groupBy("w")
      .agg(sum(col("c").cast("decimal(38,0)")).as("__cf"),
        count(lit(1)).as("df"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("__c2"))
    val cf = col("__cf").cast("double")
    val dfD = col("df").cast("double")
    val mean = cf / dfD
    val variance = (col("__c2").cast("double") - cf * cf / dfD) / dfD
    perTerm
      .select(col("w").as("term"),
        col("__cf").cast("long").as("cf"), col("df"),
        round(mean, 6).as("burstiness"),
        round(when(mean > 0, variance / mean).otherwise(lit(0.0)), 6)
          .as("vmr"))
      .orderBy(col("cf").desc, col("term"))
      .limit(topK)
      // TakeOrderedAndProject already delivers ONE partition in rank
      // order, so the row id IS the (cf desc, term) rank — no second
      // global window (and its single-partition exchange) over rows
      // the take just sorted; the coalesce pins the single-partition
      // assumption if a future plan change splits the take's output
      .coalesce(1)
      .withColumn("rank", (monotonically_increasing_id() + 1L).cast("long"))
      .select("rank", "term", "cf", "df", "burstiness", "vmr")
  }

  /** Per-document lexical diversity: unigram Shannon entropy (nats)
    * and type–token ratio — `(id, n_tokens, n_types, ttr, entropy)`.
    * Low entropy at high length flags template/spam text that
    * character-level repetition scores miss.
    *
    * `H = ln n − (Σ c·ln c)/n` over the document's term counts; the
    * per-term `c·ln c` rounds to 7 dp and folds through
    * DECIMAL(27,7), so partition order never shows. Two keyed
    * shuffles — (doc, term) counts, then per-doc fold — both with
    * partial aggregation.
    */
  def tokenEntropy(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val termCounts = tokens(docs, idCol, textCol)
      .groupBy("__id", "w")
      .agg(count(lit(1)).as("c"))
    val clnc = col("c").cast("double") * log(col("c").cast("double"))
    val perDoc = termCounts
      .select(col("__id"),
        col("c"),
        round(clnc, 7).cast("decimal(27,7)").as("__clnc"))
      .groupBy(col("__id").as(idCol))
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum("__clnc").as("__s"))
    val nTok = col("n_tokens").cast("double")
    perDoc.select(col(idCol), col("n_tokens"), col("n_types"),
      round(col("n_types").cast("double") / nTok, 6).as("ttr"),
      round(log(nTok) - col("__s").cast("double") / nTok, 6).as("entropy"))
  }
}
