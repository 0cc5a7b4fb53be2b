package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-growth diagnostics for training-data curation: how much NEW
  * material each document adds, and how the vocabulary grows as the
  * corpus accretes — the signals behind "is more of this source still
  * worth ingesting?" decisions (diminishing-novelty curves) and
  * tokenizer/vocab sizing (Heaps' law, a published empirical law of
  * vocabulary growth).
  *
  * Everything here is exact and engine-portable: first-occurrence
  * attribution is a min over document ids (a total order), bucket
  * assignment is pure integer arithmetic on ids (no global sort, no
  * percentile interpolation to disagree over), and every reported
  * ratio rounds to 6 dp.
  */
object CorpusGrowth {

  /** `(doc_id, gs)` — each document's DISTINCT 32-bit shingle hashes
    * as an array column, documents with fewer than `n` tokens
    * dropped. The shared front half of [[ngramNovelty]] and
    * [[graft.streaming.NoveltyStream]].
    */
  /** The per-document shingle-hash expression [[docShingleHashes]]
    * selects — exposed so a caller that already pays a text pass
    * (e.g. the scorecard's fingerprint checkpoint) can compute `gs`
    * in the SAME pass instead of a second one. One definition, every
    * consumer.
    */
  private[graft] def shingleHashCol(textCol: Column, n: Int): Column =
    array_distinct(graft.plans.NativeText.shingleHash32(
      split(TextFunctions.normalizeText(textCol), " "), n))

  private[graft] def docShingleHashes(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    graft.plans.NativeText.register(docs.sparkSession)
    // "has at least one n-gram" ⟺ "has at least n tokens": filter on
    // the CHEAP token count, not on size(shingle array) — a predicate
    // over the shingle expression gets pushed into the scan and
    // recomputes the whole construction per row just to filter it
    docs
      .filter(TextFunctions.tokenCount(
        TextFunctions.normalizeText(col(textCol))) >= n)
      .select(col(idCol).cast("long").as("doc_id"),
        shingleHashCol(col(textCol), n).as("gs"))
  }

  /** Per-document n-gram novelty: the fraction of the document's
    * DISTINCT word n-grams whose first occurrence in the corpus (by
    * smallest document id) is this document. A corpus built of fresh
    * prose scores near 1; boilerplate, mirrors, and quote-heavy pages
    * score near 0 — the document-level novelty curve from published
    * memorization/dedup analyses, and a sharper curation signal than
    * within-document repetition (which cannot see cross-document
    * staleness).
    *
    * Output: (doc_id, n_ngrams, n_novel, novelty), one row per
    * document with at least one n-gram; novelty = n_novel / n_ngrams
    * rounded to 6 dp.
    *
    * N-grams travel as 32-bit shingle hashes (the repo's
    * hashed-shingle convention, [[Dedup.shingleHashes]] /
    * [[graft.plans.NativeText.shingleHash32]]'s codegen'd form): the
    * attribution shuffle carries ints, not ~30-byte gram strings —
    * roughly 8× less shuffle volume, which IS the cost at corpus
    * scale. A 32-bit collision merges two grams (the colliding gram
    * inherits the earlier doc's claim); at novelty's
    * fraction-of-a-document granularity that bias is far below the
    * 6-dp rounding, and both engines hash identically so parity is
    * exact.
    *
    * Scale shape: per-doc totals are MAP-ONLY (`size` of the distinct
    * hash array — the gram stream never shuffles for counting); only
    * first-occurrence attribution explodes, through a
    * map-side-combined min keyed by gram hash (never a per-gram
    * window, which a hot boilerplate trigram would skew onto one
    * task) and a count keyed by doc. The per-gram table is
    * vocabulary-bounded and never joins back to the corpus text. No
    * windows over data, no driver state.
    */
  def ngramNovelty(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val pre = docShingleHashes(docs, idCol, textCol, n)
    val perDoc = pre
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_ngrams"))
    val novel = pre.select(col("doc_id"), explode(col("gs")).as("g"))
      .groupBy("g").agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    perDoc
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_ngrams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_ngrams").cast("double"), 6).as("novelty"))
  }

  /** Heaps'-law vocabulary growth curve: split the corpus into
    * `buckets` equal doc-id ranges (integer arithmetic over the
    * id span — deterministic and shuffle-free, unlike an ntile over a
    * global sort), then report the CUMULATIVE token count, cumulative
    * distinct-word vocabulary, and the local Heaps exponent
    * `beta = Δln(vocab) / Δln(tokens)` between consecutive buckets
    * (null for the first and wherever the token count did not grow).
    * Natural prose tracks beta ≈ 0.4–0.6; a flattening curve says the
    * source has stopped contributing new vocabulary.
    *
    * Cumulative vocabulary WITHOUT rescanning per bucket: each word
    * contributes to every bucket at or after its FIRST occurrence, so
    * one min-id per word + a running sum over the `buckets`-row table
    * replaces `buckets` distinct-counts over the corpus.
    *
    * Output: (bucket, cum_tokens, cum_vocab, heaps_beta), bucket
    * 1..`buckets` (empty id ranges yield no row but the cumulative
    * curve stays correct).
    */
  def vocabGrowth(
      docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    val ids = docs.agg(
      min(col(idCol).cast("long")), max(col(idCol).cast("long")))
      .collect().head
    if (ids.isNullAt(0))
      return docs.sparkSession.emptyDataFrame
        .select(lit(0L).as("bucket"), lit(0L).as("cum_tokens"),
          lit(0L).as("cum_vocab"), lit(0.0).as("heaps_beta"))
        .limit(0)
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val span = hi - lo + 1L
    // the bucket formula multiplies before dividing; a pathological id
    // span (ids scattered across the full Long range) would overflow
    // under ANSI mid-job — refuse up front with the remedy instead
    require(span > 0 && span <= Long.MaxValue / buckets,
      s"vocabGrowth: doc-id span $span too wide for $buckets buckets — " +
        "densify ids (e.g. zipWithIndex) before bucketing by range")
    // pure integer bucket: (id - lo) * buckets DIV span + 1 — integer
    // DIV (IntegralDivide), NOT `/`: Spark's slash is double division
    // even on longs, and at spans near Long.MaxValue/buckets the
    // product exceeds 2^53 where double rounding can misbucket
    // boundary ids (the DuckDB oracle uses exact `//`)
    def bucketOf(id: org.apache.spark.sql.Column) =
      call_function("div",
        (id - lit(lo)) * lit(buckets.toLong), lit(span)) + lit(1L)
    val docTok = docs.select(
      bucketOf(col(idCol).cast("long")).as("bucket"),
      TextFunctions.tokenCount(
        TextFunctions.normalizeText(col(textCol))).cast("long").as("tok"))
      .groupBy("bucket").agg(sum("tok").as("toks"))
    val firstWord = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(TextFunctions.normalizeText(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(min("doc_id").as("first_id"))
      .groupBy(bucketOf(col("first_id")).as("bucket"))
      .agg(count(lit(1)).as("new_words"))
    // `buckets` rows — not data
    val curve = Window.partitionBy(lit(1)).orderBy("bucket")
    docTok
      .join(firstWord, Seq("bucket"), "left")
      .withColumn("cum_tokens", sum("toks").over(curve))
      .withColumn("cum_vocab",
        sum(coalesce(col("new_words"), lit(0L))).over(curve))
      .withColumn("__pt", lag("cum_tokens", 1).over(curve))
      .withColumn("__pv", lag("cum_vocab", 1).over(curve))
      .select(col("bucket"), col("cum_tokens"), col("cum_vocab"),
        round(when(col("__pt").isNotNull && col("cum_tokens") > col("__pt") &&
            col("__pv") > 0,
          (log(col("cum_vocab").cast("double")) - log(col("__pv").cast("double"))) /
            (log(col("cum_tokens").cast("double")) - log(col("__pt").cast("double"))))
          .otherwise(lit(null)), 6).as("heaps_beta"))
  }
}
