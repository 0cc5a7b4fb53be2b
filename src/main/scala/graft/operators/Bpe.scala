package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.normalizeText

/** Byte-pair-encoding vocabulary training (Sennrich et al. 2016) —
  * the full iterative trainer, not just one pair-count step
  * (`q_bpe_merges` pins that single step to the DuckDB oracle; this
  * operator loops it to a vocabulary).
  *
  * Scale shape — the classic BPE trick IS the scale story: the corpus
  * is touched ONCE, to build the (word, count) frequency table, which
  * is VOCABULARY-bounded (Zipf: ~10⁵–10⁶ rows at any corpus size, vs
  * 10¹¹ documents). Every merge round then runs on that bounded
  * table: one weighted pair-count aggregate (map-side combined), one
  * single-row `TakeOrdered` for the winning pair (1 row to the
  * driver per round — the merge table itself is the model), one
  * map-only merge fold — so 1000 merges cost 1000 small jobs over
  * vocab rows and the 100 TB corpus is never re-read. Applying a
  * trained vocabulary to the corpus ([[applyMerges]]) is a
  * zero-shuffle projection.
  *
  * Determinism: the winning pair is (count DESC, left ASC, right ASC)
  * — a total order, engine-portable; merge application is greedy
  * left-to-right (the published convention), expressed as an array
  * fold so re-runs and partial re-computations agree token for token.
  */
object Bpe {

  /** An ordered merge table: rank r merges `(left, right) -> left+right`. */
  final case class Model(merges: Seq[(String, String)])

  /** End-of-word sentinel token (the published `</w>` convention);
    * survives into output subwords, e.g. `low</w>`.
    */
  val EndOfWord = "</w>"

  /** One greedy left-to-right merge pass of `(a, b) -> ab` over a
    * token-array column: fold each token against the accumulator's
    * tail. A token merged in this pass participates in later matches
    * of the SAME pass only as its combined form (`aaaa` + merge (a,a)
    * -> `aa aa`, not `aa a a`). CaseWhen branches keep the
    * `element_at(acc, -1)` probe off the empty accumulator — ANSI
    * mode faults out-of-bounds array access.
    */
  private def mergePass(tokens: Column, a: String, b: String): Column =
    aggregate(tokens,
      array().cast("array<string>"),
      (acc, t) => when(size(acc) === 0, concat(acc, array(t)))
        .when(element_at(acc, -1) === lit(a) && t === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(t))))

  /** Split a word into its initial character tokens, end sentinel
    * last (the empty-string filter guards the regex-split's trailing
    * empty under Spark's default limit = -1).
    */
  private def charTokens(word: Column): Column =
    concat(filter(split(word, ""), t => length(t) > 0),
      array(lit(EndOfWord)))

  /** The vocabulary-bounded (word, cnt, tokens) table — the ONE
    * corpus pass.
    */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(normalizeText(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("tokens", charTokens(col("word")))

  /** Adjacent (a, b) pairs of a token array as structs — index-built;
    * callers filter to size ≥ 2 first (a fully-merged single-token
    * word has no pairs, and `sequence(1, 0)` would DESCEND, faulting
    * `element_at` past the end).
    */
  private val adjacentPairs: Column =
    explode(expr(
      """transform(sequence(1, size(tokens) - 1),
        |  i -> struct(element_at(tokens, CAST(i AS INT)) AS a,
        |              element_at(tokens, CAST(i + 1 AS INT)) AS b))""".stripMargin))

  /** Train `numMerges` merges. Per round the candidate pairs come from
    * an index explode of the token arrays (vocab-bounded, weighted by
    * word count); the winner is fetched with a 1-row limit
    * (TakeOrdered — never a global sort), and the token arrays advance
    * by one [[mergePass]]. Stops early when no pair reaches
    * `minCount`.
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words = wordTable(df, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val top = words
        .filter(size(col("tokens")) >= 2)
        .select(col("cnt"), adjacentPairs.as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("pc"))
        .filter(col("pc") >= minCount)
        .orderBy(col("pc").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val prev = words
        words = words
          .withColumn("tokens", mergePass(col("tokens"), a, b))
          .localCheckpoint(true)
        // only the newest word table is ever read again; at the
        // advertised 1000-merge scale, leaving every round's
        // checkpoint pinned would grow executor storage linearly
        prev.unpersist()
      }
    }
    Model(merges.toSeq)
  }

  /** Tokenize a text column with a trained model: map-only — ONE
    * native pass applies the whole merge table per row
    * ([[graft.plans.BpeEncodeExpr]]; the per-merge expression-fold
    * alternative nests one lambda per merge and breaks codegen at
    * real vocabulary sizes). Appends `tokens`: the subword sequence
    * with the published sentinel rendering (`low</w>`, or a bare
    * `</w>` when the sentinel never merged).
    */
  def applyMerges(model: Model, df: DataFrame, textCol: String): DataFrame =
    df.withColumn("tokens",
      graft.plans.NativeText.bpeEncode(
        filter(split(normalizeText(col(textCol)), " "), w => length(w) > 0),
        model.merges))

  /** Subword token count per document — the budget number a tokenizer
    * feeds into packing ([[Packing]]): size of the same native
    * encode, map-only.
    */
  def tokenCount(model: Model, text: Column): Column =
    size(graft.plans.NativeText.bpeEncode(
      filter(split(normalizeText(text), " "), w => length(w) > 0),
      model.merges))
}
