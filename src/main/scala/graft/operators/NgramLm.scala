package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** In-engine bigram language model: train token-bigram counts on a
  * reference corpus, score every document's perplexity against it —
  * the CCNet-style quality filter ("keep documents whose perplexity
  * under a clean-corpus LM is low") that large-scale training-data
  * pipelines run before anything model-based.
  *
  * Model: additive-smoothed conditional probability
  * `p(w2|w1) = (c(w1,w2) + a) / (c(w1) + a*V)` where `c(w1)` is the
  * bigram-prefix count (sum over continuations, so probabilities
  * normalize), `V` the training vocabulary size, and an unseen prefix
  * degrades to the uniform `1/V`. Document score is the mean negative
  * log-probability over its bigrams (= cross-entropy in nats);
  * `exp` of it is the perplexity.
  *
  * Scale shape: training is one explode + two groupBy passes over the
  * REFERENCE corpus — which is the small, curated side (a Wikipedia
  * sample, not the 100 TB crawl), so the resulting count tables are
  * bounded by reference vocabulary, not corpus size; prune with
  * `minCount` to keep them broadcastable and Zipf-bounded. Scoring the
  * big corpus is explode + two joins against the model (broadcast when
  * the model fits, shuffle otherwise — both linear) + one per-doc
  * reaggregation.
  *
  * Determinism: the per-bigram `ln p` is rounded to 7 dp and summed
  * through DECIMAL(27,7) — exact and order-independent — so the DuckDB
  * oracle replays the fold bit-for-bit regardless of row order; the
  * single float division and `ln`/`exp` calls operate on bit-identical
  * inputs on both engines.
  */
object NgramLm {

  /** Trained model: bigram counts, prefix counts, vocabulary size. */
  final case class Model(bigrams: DataFrame, prefixes: DataFrame, vocabSize: Long)

  /** The model as driver-held maps — the broadcastable form for
    * map-only scoring. Bounded by the (minCount-pruned) reference
    * vocabulary, NOT the corpus; collect only models trained with a
    * prune that fits the driver.
    */
  final case class LiteModel(
      bigrams: Map[String, Long], prefixes: Map[String, Long], vocabSize: Long)

  // a space can never appear inside a token (tokens come from
  // splitting on single spaces), so "w1 w2" keys are unambiguous
  private val KeySep = " "

  /** Collect a trained model into broadcastable maps. */
  def collect(model: Model): LiteModel = LiteModel(
    bigrams = model.bigrams.collect()
      .map(r => s"${r.getString(0)}$KeySep${r.getString(1)}" -> r.getLong(2)).toMap,
    prefixes = model.prefixes.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap,
    vocabSize = model.vocabSize)

  private def words(textCol: Column): Column =
    split(TextFunctions.normalizeText(textCol), " ")

  /** (w1, w2) rows, one per adjacent token pair per document. */
  private[operators] def docBigrams(
      df: DataFrame, textCol: String, extra: Seq[Column]): DataFrame = {
    val w = words(col(textCol))
    df.select(extra :+ w.as("__w"): _*)
      .filter(size(col("__w")) >= 2)
      .select(extra :+ explode(transform(sequence(lit(1), size(col("__w")) - 1), i =>
        struct(element_at(col("__w"), i).as("w1"),
          element_at(col("__w"), i + 1).as("w2")))).as("__b"): _*)
      .select(extra :+ col("__b.w1") :+ col("__b.w2"): _*)
  }

  /** Tokenized reference corpus, eagerly checkpointed: the
    * normalize+split pass (regex-heavy, the expensive part of
    * training) runs ONCE, and every count table — bigrams AND the
    * vocabulary distinct — derives from the materialized arrays
    * instead of re-tokenizing the corpus per aggregate.
    */
  private def tokensOf(ref: DataFrame, textCol: String): DataFrame =
    ref.select(words(col(textCol)).as("__w")).localCheckpoint()

  /** (w1, w2, c12) over pre-tokenized arrays, eagerly checkpointed —
    * bounded by bigram vocabulary, so the derived tables (prefix sums,
    * continuation counts) re-read KBs, not the corpus.
    */
  private def bigramCounts(toks: DataFrame): DataFrame =
    toks.filter(size(col("__w")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__w")) - 1), i =>
        struct(element_at(col("__w"), i).as("w1"),
          element_at(col("__w"), i + 1).as("w2")))).as("__b"))
      .select(col("__b.w1"), col("__b.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint()

  private def vocabOf(toks: DataFrame): Long =
    toks.select(explode(col("__w")).as("w"))
      .agg(count_distinct(col("w"))).head().getLong(0)

  /** Train on `ref`: bigram counts with `count >= minCount` kept (the
    * broadcastability knob), prefix counts kept exact (they are the
    * normalizing denominators and must include pruned mass — derived
    * as `sum(c12)` over the unpruned count table). The corpus is
    * tokenized exactly once ([[tokensOf]]); both the count tables and
    * the vocabulary distinct read the checkpointed token arrays.
    */
  def train(ref: DataFrame, textCol: String, minCount: Long = 1L): Model = {
    val toks = tokensOf(ref, textCol)
    val counts = bigramCounts(toks)
    val bigrams = counts.filter(col("c12") >= minCount)
    val prefixes = counts.groupBy("w1").agg(sum(col("c12")).as("c1"))
    Model(bigrams, prefixes, vocabOf(toks))
  }

  /** Per-document cross-entropy and perplexity under `model`.
    * Output: (idCol, n_bigrams, oov_bigrams, avg_neg_logp, perplexity).
    * Documents with fewer than two tokens are dropped (no bigrams to
    * score). `alpha` is the additive-smoothing mass.
    */
  def score(
      model: Model,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.5,
      broadcastModel: Boolean = true): DataFrame = {
    val bi = docBigrams(docs, textCol, Seq(col(idCol)))
    val b = if (broadcastModel) broadcast(model.bigrams) else model.bigrams
    val p = if (broadcastModel) broadcast(model.prefixes) else model.prefixes
    val prob = (coalesce(col("c12"), lit(0L)) + lit(alpha)) /
      (coalesce(col("c1"), lit(0L)) + lit(alpha * model.vocabSize))
    bi.join(b, Seq("w1", "w2"), "left")
      .join(p, Seq("w1"), "left")
      .select(col(idCol),
        when(col("c12").isNull, 1L).otherwise(0L).as("__oov"),
        round(log(prob), 7).cast("decimal(27,7)").as("__nlp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__oov")).as("oov_bigrams"),
        sum(col("__nlp")).as("__lp_sum"))
      .select(col(idCol), col("n_bigrams"), col("oov_bigrams"),
        round(-(col("__lp_sum").cast("double") / col("n_bigrams")), 6)
          .as("avg_neg_logp"),
        round(exp(-(col("__lp_sum").cast("double") / col("n_bigrams"))), 6)
          .as("perplexity"))
  }

  /** Kneser–Ney model: the additive model's count tables plus the
    * continuation counts interpolated KN needs. All four tables are
    * bounded by reference-bigram vocabulary (derived from the same
    * eagerly checkpointed count table, so training still explodes the
    * reference corpus exactly once).
    */
  final case class KnModel(
      bigrams: DataFrame,    // (w1, w2, c12)
      prefixes: DataFrame,   // (w1, c1)       — Σ c12 over continuations
      contAfter: DataFrame,  // (w1, n_after)  — N1+(w1 ·), distinct continuations
      contBefore: DataFrame, // (w2, n_before) — N1+(· w2), distinct left contexts
      bigramTypes: Long,     // N1+(· ·), total distinct bigram types
      vocabSize: Long)

  /** Train the interpolated Kneser–Ney tables on `ref` — one tokenize
    * pass ([[tokensOf]]), one bigram-count aggregation; all four count
    * tables and both scalars derive from the two checkpoints.
    */
  def trainKn(ref: DataFrame, textCol: String): KnModel = {
    val toks = tokensOf(ref, textCol)
    val counts = bigramCounts(toks)
    KnModel(
      bigrams = counts,
      prefixes = counts.groupBy("w1").agg(sum(col("c12")).as("c1")),
      contAfter = counts.groupBy("w1").agg(count(lit(1)).as("n_after")),
      contBefore = counts.groupBy("w2").agg(count(lit(1)).as("n_before")),
      bigramTypes = counts.count(),
      vocabSize = vocabOf(toks))
  }

  /** Interpolated Kneser–Ney scoring — the smoothing KenLM-style
    * perplexity filters actually use, vs [[score]]'s additive baseline:
    * seen bigrams keep their discounted evidence, and the backoff mass
    * goes to words by how many CONTEXTS they follow (continuation
    * probability), not raw frequency — so boilerplate tokens that are
    * frequent in one context stop looking universally probable.
    *
    *   P(w|v) = (max(c(vw) − D, 0) / c(v)) + ((D · N1+(v·)) / c(v)) · Pc(w)
    *   Pc(w)  = (N1+(·w) + a) / (B + a·V)      (a > 0 keeps OOV finite)
    *   unseen context v:  P(w|v) = Pc(w)
    *
    * Same fold discipline as [[score]] (per-bigram `ln p` rounded to
    * 7 dp, summed through DECIMAL(27,7)), so the DuckDB oracle replays
    * the result exactly; the float expression trees are parenthesized
    * identically on both engines. Output schema matches [[score]].
    */
  def scoreKn(
      model: KnModel,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75,
      alpha: Double = 0.5,
      broadcastModel: Boolean = true): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val bi = docBigrams(docs, textCol, Seq(col(idCol)))
    def side(df: DataFrame) = if (broadcastModel) broadcast(df) else df
    val pcont = (coalesce(col("n_before"), lit(0L)) + lit(alpha)) /
      lit(model.bigramTypes + alpha * model.vocabSize)
    // explicit coalesce: the two engines disagree on greatest(NULL, x)
    val seen = (greatest(coalesce(col("c12"), lit(0L)) - lit(discount), lit(0.0)) / col("c1")) +
      (((lit(discount) * col("n_after")) / col("c1")) * pcont)
    val prob = when(col("c1").isNull, pcont).otherwise(seen)
    bi.join(side(model.bigrams), Seq("w1", "w2"), "left")
      .join(side(model.prefixes), Seq("w1"), "left")
      .join(side(model.contAfter), Seq("w1"), "left")
      .join(side(model.contBefore), Seq("w2"), "left")
      .select(col(idCol),
        when(col("c12").isNull, 1L).otherwise(0L).as("__oov"),
        round(log(prob), 7).cast("decimal(27,7)").as("__nlp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__oov")).as("oov_bigrams"),
        sum(col("__nlp")).as("__lp_sum"))
      .select(col(idCol), col("n_bigrams"), col("oov_bigrams"),
        round(-(col("__lp_sum").cast("double") / col("n_bigrams")), 6)
          .as("avg_neg_logp"),
        round(exp(-(col("__lp_sum").cast("double") / col("n_bigrams"))), 6)
          .as("perplexity"))
  }

  /** [[KnModel]] as driver-held maps — the broadcastable form for
    * map-only KN scoring. Bounded by reference-bigram vocabulary.
    */
  final case class KnLiteModel(
      bigrams: Map[String, Long],
      prefixes: Map[String, Long],
      contAfter: Map[String, Long],
      contBefore: Map[String, Long],
      bigramTypes: Long,
      vocabSize: Long)

  /** Collect a trained KN model into broadcastable maps. */
  def collectKn(model: KnModel): KnLiteModel = KnLiteModel(
    bigrams = model.bigrams.collect()
      .map(r => s"${r.getString(0)}$KeySep${r.getString(1)}" -> r.getLong(2)).toMap,
    prefixes = model.prefixes.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap,
    contAfter = model.contAfter.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap,
    contBefore = model.contBefore.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap,
    bigramTypes = model.bigramTypes,
    vocabSize = model.vocabSize)

  /** Map-only Kneser–Ney scoring — [[scoreKn]]'s literal-map twin,
    * zero joins and zero shuffles, so the identical projection scores
    * an unbounded STREAM (append mode, no state store) or a 100 TB
    * batch as pure map tasks. Same scaled-integer `ln p` fold as
    * [[scoreMapOnly]], so the result equals [[scoreKn]] bit-for-bit.
    * Same output schema and row set.
    */
  def scoreKnMapOnly(
      model: KnLiteModel,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75,
      alpha: Double = 0.5): DataFrame = {
    require(model.bigrams.nonEmpty && model.prefixes.nonEmpty,
      "empty model: trainKn() saw no bigrams")
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val bmap = typedLit(model.bigrams)
    val pmap = typedLit(model.prefixes)
    val amap = typedLit(model.contAfter)
    val nbmap = typedLit(model.contBefore)
    def bcount(p: Column): Column =
      element_at(bmap, concat(p.getField("w1"), lit(KeySep), p.getField("w2")))
    def prob(p: Column): Column = {
      val c1 = element_at(pmap, p.getField("w1"))
      val pcont = (coalesce(element_at(nbmap, p.getField("w2")), lit(0L)) +
        lit(alpha)) / lit(model.bigramTypes + alpha * model.vocabSize)
      val seen = (greatest(coalesce(bcount(p), lit(0L)) - lit(discount),
        lit(0.0)) / c1) +
        (((lit(discount) * element_at(amap, p.getField("w1"))) / c1) * pcont)
      when(c1.isNull, pcont).otherwise(seen)
    }
    docs
      .select(col(idCol), words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col(idCol),
        transform(sequence(lit(1), size(col("__w")) - 1), i =>
          struct(element_at(col("__w"), i).as("w1"),
            element_at(col("__w"), i + 1).as("w2"))).as("__p"))
      .select(col(idCol),
        size(col("__p")).cast("long").as("n_bigrams"),
        size(filter(col("__p"), p => bcount(p).isNull))
          .cast("long").as("oov_bigrams"),
        aggregate(col("__p"), lit(0L), (acc, p) =>
          acc + round(round(log(prob(p)), 7) * lit(1e7)).cast("long"))
          .as("__k"))
      .select(col(idCol), col("n_bigrams"), col("oov_bigrams"),
        round(-((col("__k").cast("double") / lit(1e7)) / col("n_bigrams")), 6)
          .as("avg_neg_logp"),
        round(exp(-((col("__k").cast("double") / lit(1e7)) / col("n_bigrams"))), 6)
          .as("perplexity"))
  }

  /** Map-only scoring: the model rides as literal maps inside per-row
    * expressions — zero joins, zero shuffles, no aggregation state, so
    * the identical projection scores an unbounded STREAM (append mode,
    * no state store) or a 100 TB batch as pure map tasks. The `ln p`
    * fold runs in document order over scaled-integer units
    * (k = round(ln p, 7 dp) × 10⁷, exact in a long), so the result
    * equals [[score]] bit-for-bit: both reduce to double(Σk × 10⁻⁷),
    * one as a decimal sum, one as double(Σk)/10⁷ — the same correctly
    * rounded value. Same output schema and row set as [[score]].
    */
  def scoreMapOnly(
      model: LiteModel,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(model.bigrams.nonEmpty && model.prefixes.nonEmpty,
      "empty model: train() saw no bigrams")
    val bmap = typedLit(model.bigrams)
    val pmap = typedLit(model.prefixes)
    def bcount(p: Column): Column =
      element_at(bmap, concat(p.getField("w1"), lit(KeySep), p.getField("w2")))
    def prob(p: Column): Column =
      (coalesce(bcount(p), lit(0L)) + lit(alpha)) /
        (coalesce(element_at(pmap, p.getField("w1")), lit(0L)) +
          lit(alpha * model.vocabSize))
    docs
      .select(col(idCol), words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col(idCol),
        transform(sequence(lit(1), size(col("__w")) - 1), i =>
          struct(element_at(col("__w"), i).as("w1"),
            element_at(col("__w"), i + 1).as("w2"))).as("__p"))
      .select(col(idCol),
        size(col("__p")).cast("long").as("n_bigrams"),
        size(filter(col("__p"), p => bcount(p).isNull))
          .cast("long").as("oov_bigrams"),
        aggregate(col("__p"), lit(0L), (acc, p) =>
          acc + round(round(log(prob(p)), 7) * lit(1e7)).cast("long"))
          .as("__k"))
      .select(col(idCol), col("n_bigrams"), col("oov_bigrams"),
        round(-((col("__k").cast("double") / lit(1e7)) / col("n_bigrams")), 6)
          .as("avg_neg_logp"),
        round(exp(-((col("__k").cast("double") / lit(1e7)) / col("n_bigrams"))), 6)
          .as("perplexity"))
  }
}
