package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PMI-style collocation (phrase) mining: token pairs that co-occur
  * far more often than their parts predict — the phrase-vocabulary /
  * tokenizer-merge-candidate pass of corpus analysis ("new york",
  * "machine learning" score high; "of the" does not, because both
  * parts are everywhere).
  *
  * Determinism: scores are the association LIFT
  * `p(w1,w2) / (p(w1) p(w2))` over bigram events — PMI without the
  * logarithm (PMI = ln lift is monotone in it, so thresholds and
  * rankings are unchanged), the same no-`ln` trade as BM25's odds idf:
  * every arithmetic step is a count ratio the DuckDB oracle replays
  * bit-for-bit.
  *
  * Scale shape: ONE bigram explode over the corpus feeding one count
  * aggregation, eagerly localCheckpoint'ed (the count table is bounded
  * by bigram VOCABULARY, not corpus size — Zipf keeps it orders of
  * magnitude smaller than the data, so materializing it is cheap and
  * saves three corpus re-explosions: the derived branches are NOT
  * exchange-reusable because join pushdown specializes each one). The
  * marginal (prefix/suffix) counts and the grand total are then
  * re-aggregations of that materialized table, and the marginals join
  * back onto the `minCount`-pruned support set, which AQE broadcasts.
  */
object Collocations {

  /** Collocation pairs with support and lift. Output:
    * (w1, w2, pair_count, c1, c2, lift), filtered to
    * `pair_count >= minCount && lift >= minLift`.
    */
  def mine(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      minLift: Double = 1.0): DataFrame = {
    val pairCounts = NgramLm.docBigrams(docs, textCol, Seq.empty)
      .groupBy("w1", "w2").agg(count(lit(1)).as("pair_count"))
      .localCheckpoint()
    val prefix = pairCounts.groupBy("w1").agg(sum(col("pair_count")).as("c1"))
    val suffix = pairCounts.groupBy("w2").agg(sum(col("pair_count")).as("c2"))
    val total = pairCounts.agg(sum(col("pair_count")).as("n_bigrams"))
    pairCounts
      .filter(col("pair_count") >= minCount)
      .join(prefix, "w1")
      .join(suffix, "w2")
      .crossJoin(broadcast(total))
      .withColumn("lift",
        round((col("pair_count").cast("double") * col("n_bigrams")) /
          (col("c1").cast("double") * col("c2")), 6))
      .filter(col("lift") >= minLift)
      .select("w1", "w2", "pair_count", "c1", "c2", "lift")
  }
}
