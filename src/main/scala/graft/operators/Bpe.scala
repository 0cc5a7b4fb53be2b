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

  /** Driver-side twin of [[mergePass]] — the same greedy
    * left-to-right fold, token for token.
    */
  private def mergePassLocal(tokens: Array[String], a: String,
      b: String): Array[String] = {
    val acc = new scala.collection.mutable.ArrayBuffer[String](tokens.length)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (acc.nonEmpty && acc.last == a && t == b) acc(acc.length - 1) = a + b
      else acc += t
      i += 1
    }
    acc.toArray
  }

  /** The classic in-memory trainer over a COLLECTED word table — the
    * path every realistic corpus takes, because the table is
    * vocabulary-bounded (Zipf) no matter the corpus size. Incremental:
    * pair counts live in a hash map, only the words CONTAINING the
    * winning pair are touched per merge (via an inverted pair→words
    * index), and the winner pops off a lazily-validated priority
    * queue — so a 50k-merge vocabulary costs ZERO Spark jobs after
    * the single corpus pass, instead of 50k driver-sequenced rounds.
    * Identical merge sequence to the distributed loop (same
    * count-desc/left-asc/right-asc total order, same greedy pass;
    * BpeSpec pins the parity).
    */
  private def trainLocal(rows: Array[(Long, Array[String])],
      numMerges: Int, minCount: Long): Seq[(String, String)] = {
    import scala.collection.mutable
    val cnt = rows.map(_._1)
    val toks = rows.map(_._2.clone())
    def pairsOf(ts: Array[String]): Iterator[(String, String)] =
      if (ts.length < 2) Iterator.empty
      else (0 until ts.length - 1).iterator.map(i => (ts(i), ts(i + 1)))
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occurs = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    for (w <- rows.indices; p <- pairsOf(toks(w))) {
      counts(p) = counts.getOrElse(p, 0L) + cnt(w)
      occurs.getOrElseUpdate(p, mutable.Set.empty) += w
    }
    // max-heap by (count desc, a asc, b asc) with lazy invalidation:
    // an entry is live only while its recorded count is current.
    // String ties compare as UTF-8 BYTES — Spark's UTF8String binary
    // order, which differs from String.compareTo (UTF-16 code units)
    // for supplementary-plane characters; the parity contract with
    // the distributed path demands the byte order.
    def bytesLt(x: String, y: String): Int =
      java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    implicit val ord: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String),
            y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c
          else {
            val a = bytesLt(y._2, x._2) // smaller string wins the tie
            if (a != 0) a else bytesLt(y._3, x._3)
          }
        }
      }
    val pq = mutable.PriorityQueue.empty[(Long, String, String)]
    counts.foreach { case ((a, b), c) => pq.enqueue((c, a, b)) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    while (merges.length < numMerges && pq.nonEmpty) {
      val (c, a, b) = pq.dequeue()
      if (counts.get((a, b)).contains(c)) {
        if (c < minCount) return merges.toSeq // heap max below the bar
        merges += ((a, b))
        val touched = occurs.getOrElse((a, b), mutable.Set.empty).toArray
        val changed = mutable.Set.empty[(String, String)]
        touched.foreach { w =>
          val before = pairsOf(toks(w)).toSeq
          toks(w) = mergePassLocal(toks(w), a, b)
          val after = pairsOf(toks(w)).toSeq
          val delta = mutable.HashMap.empty[(String, String), Long]
          before.foreach(p => delta(p) = delta.getOrElse(p, 0L) - cnt(w))
          after.foreach(p => delta(p) = delta.getOrElse(p, 0L) + cnt(w))
          val afterSet = after.toSet
          delta.foreach { case (p, d) =>
            if (d != 0L) {
              val nc = counts.getOrElse(p, 0L) + d
              if (nc <= 0L) counts.remove(p) else counts(p) = nc
              changed += p
            }
            if (!afterSet.contains(p)) occurs.get(p).foreach(_ -= w)
            else occurs.getOrElseUpdate(p, mutable.Set.empty) += w
          }
        }
        changed.foreach(p =>
          counts.get(p).foreach(nc => pq.enqueue((nc, p._1, p._2))))
      }
    }
    merges.toSeq
  }

  /** Train `numMerges` merges.
    *
    * The word table (the ONE corpus pass) is vocabulary-bounded, so
    * when it fits `collectThreshold` rows — which real corpora always
    * do; Zipf caps it around 10⁵–10⁶ regardless of corpus bytes — it
    * collects once and the merge loop runs in [[trainLocal]] with
    * incremental pair counts: total Spark jobs = 2, independent of
    * `numMerges` (BpeJobCountSpec gates the sublinearity).
    *
    * Above the threshold (or with `collectThreshold = 0`, which the
    * parity spec uses) each merge round runs distributed: one weighted
    * pair-count aggregate over the vocab table, one single-row
    * `TakeOrdered` for the winner, one map-only [[mergePass]] — the
    * corpus is still never re-read, but each merge is a driver-
    * sequenced round trip. Both paths follow the same total order
    * (count DESC, left ASC, right ASC) and produce IDENTICAL merge
    * sequences. Stops early when no pair reaches `minCount`.
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L,
      collectThreshold: Long = 1000000L): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words = wordTable(df, textCol).localCheckpoint(true)
    if (collectThreshold > 0L && words.count() <= collectThreshold) {
      val rows = words.select(col("cnt"), col("tokens")).collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
      words.unpersist()
      return Model(trainLocal(rows, numMerges, minCount))
    }
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
