package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 relevance scoring of a corpus against a fixed term list — the
  * seed-corpus similarity filter of training-data curation ("keep
  * documents that look like the reference set") and the standard
  * keyword-retrieval ranking.
  *
  * Scale shape: term frequencies and document length are per-row
  * expression work over the split words (no explode, no shuffle); the
  * corpus statistics (N, per-term document frequency, average length)
  * reduce to ONE row via conditional aggregation and broadcast back.
  * Total: one grand-aggregate exchange, one scoring projection.
  *
  * Determinism: the classic `ln`-based idf differs across engines in
  * the last ulp, so this uses the "odds" idf — the same
  * `(N - df + 0.5) / (df + 0.5)` ratio WITHOUT the logarithm —
  * computed in a fixed per-term order. Rankings for a fixed term list
  * are preserved for non-negative tf (each term's contribution stays
  * monotone in tf); absolute scores are NOT comparable to log-idf
  * implementations, which is irrelevant for filtering/ranking by
  * threshold. Every arithmetic step is replayable bit-for-bit by the
  * DuckDB oracle.
  */
object Bm25 {

  /** Per-document BM25 (odds-idf) scores: (idCol, dl, score). */
  def score(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct, "need distinct terms")
    val words = split(TextFunctions.normalizeText(col(textCol)), " ")
    def tfCol(t: String): Column =
      size(filter(words, w => w === t)).cast("double")

    val perDoc = corpus.select(
      (col(idCol) +: size(words).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) => tfCol(t).as(s"tf_$i") }): _*)

    val statAggs = count(lit(1)).cast("double").as("n_docs") +:
      sum(col("dl")).as("sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).cast("double").as(s"df_$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)

    val contributions = terms.indices.map { i =>
      val tf = col(s"tf_$i")
      val idf = (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5))
      val norm = tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))
      idf * (tf * lit(k1 + 1.0)) / norm
    }

    perDoc
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl") / col("n_docs"))
      .withColumn("score", round(contributions.reduce(_ + _), 6))
      .select(col(idCol), col("dl").cast("long").as("dl"), col("score"))
  }
}
