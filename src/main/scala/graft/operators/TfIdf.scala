package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.normalizeText

/** TF-IDF keyword extraction: the top-k most characteristic terms per
  * document — the lightweight topic signal used for corpus slicing,
  * domain balancing and near-dup triage where BM25's query-side scoring
  * ([[Bm25]]) doesn't apply (no query; the corpus itself is the prior).
  *
  * Composed entirely from built-in operators so Catalyst keeps the
  * whole plan in codegen: tokenize → one (doc, term) hash-agg for tf
  * → df as a per-term count aggregate joined back on term → a
  * corpus-size scalar broadcast → top-k window per document.
  *
  * df is deliberately an aggregate-and-join, NOT a `count over
  * (partition by term)` window: WindowExec buffers the entire term
  * partition in a (spillable) row array even for an unbounded count,
  * so a stop-word term at corpus scale would materialize all its
  * (doc, term) rows in one task. The hash-agg df side is bounded by
  * distinct terms (map-side combined), and the join back streams hot
  * terms through the probe side — skew costs a lookup, not a buffer.
  * Scale shape: three shuffles that grow with |corpus| (tf agg, df
  * agg, the term join; the per-doc top-k rides the doc key) and one
  * broadcast of a 1-row grand count.
  * Ranking ties break on the ROUNDED score then term text, so the
  * result is deterministic and engine-portable down to the last rank.
  */
object TfIdf {

  def topTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = df
      .select(col(idCol).as("id"),
        explode(split(normalizeText(col(textCol)), " ")).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfCounts = tf.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
    val withDf = tf.join(dfCounts, "term")
    val nDocs = df.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = withDf
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("id").orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("tfidf"), col("rank"))
  }
}
