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

  private def words(textCol: Column): Column =
    split(TextFunctions.normalizeText(textCol), " ")

  /** (w1, w2) rows, one per adjacent token pair per document. */
  private def docBigrams(df: DataFrame, textCol: String, extra: Seq[Column]): DataFrame = {
    val w = words(col(textCol))
    df.select(extra :+ w.as("__w"): _*)
      .filter(size(col("__w")) >= 2)
      .select(extra :+ explode(transform(sequence(lit(1), size(col("__w")) - 1), i =>
        struct(element_at(col("__w"), i).as("w1"),
          element_at(col("__w"), i + 1).as("w2")))).as("__b"): _*)
      .select(extra :+ col("__b.w1") :+ col("__b.w2"): _*)
  }

  /** Train on `ref`: bigram counts with `count >= minCount` kept (the
    * broadcastability knob), prefix counts kept exact (they are the
    * normalizing denominators and must include pruned mass).
    */
  def train(ref: DataFrame, textCol: String, minCount: Long = 1L): Model = {
    val bi = docBigrams(ref, textCol, Seq.empty)
    val bigrams = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val prefixes = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = ref.select(explode(words(col(textCol))).as("w"))
      .agg(count_distinct(col("w"))).head().getLong(0)
    Model(bigrams, prefixes, vocab)
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
}
