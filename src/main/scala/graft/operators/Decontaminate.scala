package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.GraftPlanApi
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents whose word
  * n-gram overlap with an evaluation set exceeds a threshold, so test
  * data can be excluded from the training corpus (leakage makes eval
  * numbers meaningless).
  *
  * Scale shape: the benchmark side is small by construction (eval sets
  * are MBs against a 100 TB corpus), so its distinct shingle-hash set
  * broadcasts and the corpus-side probe is a broadcast hash join on
  * the hash — the corpus explodes its (distinct) shingles once, joins
  * map-side, and aggregates hit counts per document with one shuffle
  * on doc id. No corpus-vs-corpus stage anywhere.
  *
  * Shingle hashing reuses the portable sha-256 machinery, so the
  * DuckDB oracle replays the overlap counts exactly.
  */
object Decontaminate {

  /** Per-document overlap report against the benchmark.
    *
    * @return (doc_id, n_shingles, n_overlap, overlap_ratio,
    *         contaminated) — one row per corpus document; documents
    *         shorter than the shingle size carry zero shingles and are
    *         never flagged
    */
  def overlapReport(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold out of (0,1]: $threshold")
    // native single-pass shingle hashing — the interpreted HOF
    // formulation (Dedup.shingleHashes) measured ~20x slower here, and
    // this subtree is evaluated twice (shingle counts + the probe
    // explode). Registered on BOTH frames' sessions: inside a
    // foreachBatch the corpus rides the stream's cloned session while
    // the benchmark usually comes from the driver session, and select()
    // analyzes eagerly against whichever session owns the frame.
    val (cs, bench) = shinglePrep(corpus, benchmark, idCol, textCol, shingleSize)
    val hits = cs.select(col("doc_id"), explode(col("sh")).as("h"))
      .join(broadcast(bench), "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    report(cs, hits, threshold)
  }

  /** [[overlapReport]] against an already-hashed benchmark shingle set
    * (one `h: long` column, distinct) — the entry point for callers
    * that maintain the benchmark store themselves, e.g. the live
    * eval-set stream ([[graft.streaming.DecontaminationStream]]).
    * Identical output to [[overlapReport]] when `benchHashes` equals
    * the benchmark's distinct shingle hashes.
    */
  def overlapReportHashes(
      corpus: DataFrame,
      benchHashes: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold out of (0,1]: $threshold")
    val cs = corpusShingles(corpus, idCol, textCol, shingleSize)
    val bench = benchHashes.select(col("h")).distinct()
    val hits = cs.select(col("doc_id"), explode(col("sh")).as("h"))
      .join(broadcast(bench), "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    report(cs, hits, threshold)
  }

  /** The benchmark side of [[shinglePrep]] alone: the distinct shingle
    * hashes of a document set — what a benchmark store persists.
    */
  def benchmarkHashes(
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3): DataFrame = {
    graft.plans.NativeText.register(benchmark.sparkSession)
    corpusShingles(benchmark, idCol, textCol, shingleSize)
      .select(explode(col("sh")).as("h")).distinct()
  }

  /** [[overlapReport]] for benchmark sets too big to broadcast (a
    * union of every eval suite, or decontaminating against another
    * corpus shard): identical output, different join strategy.
    *
    * The benchmark's distinct shingle hashes reduce into ONE Bloom
    * filter (native [[BloomFilterAggregate]] — the sketch merges
    * map-side, the driver never touches it) that reaches the corpus
    * probe as a scalar subquery, exactly how Spark's own runtime
    * row-level filtering ships join pruning. The corpus side drops
    * non-member shingles in a codegen'd `might_contain` BEFORE the
    * shuffle, so the exact confirm join — now a plain shuffle hash
    * join — only moves probable hits (false-positive rate `fpp`); no
    * false negatives, so the confirm join restores exact counts and
    * the output hash-matches [[overlapReport]] on any input.
    */
  def overlapReportBloom(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      expectedShingles: Long = 1L << 21,
      fpp: Double = 0.01): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold out of (0,1]: $threshold")
    require(expectedShingles > 0 && fpp > 0 && fpp < 1,
      s"bad sketch params: expectedShingles=$expectedShingles fpp=$fpp")
    val (cs, bench) = shinglePrep(corpus, benchmark, idCol, textCol, shingleSize)
    // optimal bits for the target false-positive rate: -n ln(p) / ln(2)^2
    val numBits = math.ceil(
      -expectedShingles * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bloom = bench.select(
      GraftPlanApi.column(
        new BloomFilterAggregate(GraftPlanApi.expression(col("h")),
          Literal(expectedShingles), Literal(numBits)).toAggregateExpression())
        .as("bf"))
    val mightContain = GraftPlanApi.column(BloomFilterMightContain(
      ScalarSubquery(bloom.queryExecution.analyzed),
      GraftPlanApi.expression(col("h"))))
    val hits = cs.select(col("doc_id"), explode(col("sh")).as("h"))
      .filter(mightContain)
      .join(bench, "h") // exact confirm: false positives die here
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    report(cs, hits, threshold)
  }

  /** Shared shingle prep: (corpus doc shingle sets + counts, distinct
    * benchmark shingle hashes). Native single-pass shingle hashing —
    * the interpreted HOF formulation (Dedup.shingleHashes) measured
    * ~20x slower here, and this subtree is evaluated twice (shingle
    * counts + the probe explode). Registered on BOTH frames' sessions:
    * inside a foreachBatch the corpus rides the stream's cloned
    * session while the benchmark usually comes from the driver
    * session, and select() analyzes eagerly against whichever session
    * owns the frame.
    */
  private def shinglePrep(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int): (DataFrame, DataFrame) = {
    graft.plans.NativeText.register(corpus.sparkSession)
    graft.plans.NativeText.register(benchmark.sparkSession)
    val cs = corpusShingles(corpus, idCol, textCol, shingleSize)
    val bench = corpusShingles(benchmark, idCol, textCol, shingleSize)
      .select(explode(col("sh")).as("h")).distinct()
    (cs, bench)
  }

  /** (doc_id, sh: distinct shingle hashes, n_shingles) per document.
    * Callers must have [[graft.plans.NativeText.register]]ed the
    * frame's session (the public entry points above do).
    */
  private def corpusShingles(
      df: DataFrame, idCol: String, textCol: String, shingleSize: Int): DataFrame = {
    graft.plans.NativeText.register(df.sparkSession)
    val emptyLongs = array().cast("array<long>")
    df.select(
      col(idCol).as("doc_id"),
      array_distinct(coalesce(
        graft.plans.NativeText.shingleHash32(
          split(graft.functions.TextFunctions.normalizeText(col(textCol)), " "),
          shingleSize),
        emptyLongs)).as("sh"))
      .withColumn("n_shingles", size(col("sh")).cast("long"))
  }

  /** FUZZY decontamination: corpus documents that are NEAR-duplicates
    * of a benchmark item — paraphrased or truncated eval leakage the
    * exact-shingle [[overlapReport]] underestimates (a doc sharing 40%
    * of its shingles with a rephrased test item can slip an 0.8
    * exact-overlap threshold). MinHash band collision proposes
    * (doc, bench) candidates; exact n-gram Jaccard verifies each, so
    * the output carries a true similarity, never an LSH guess.
    *
    * Scale shape: the corpus is hashed map-only
    * ([[Dedup.bandSignatures]]), the benchmark's band rows and shingle
    * sets BROADCAST (eval sets are MBs against 100 TB), candidates are
    * one distinct, and the verify joins shingle sets only for
    * colliding pairs — never all-pairs, never corpus-vs-corpus.
    *
    * @return (doc_id, bench_id, inter, uni, jaccard, contaminated) —
    *         one row per band-colliding candidate pair
    */
  def fuzzyOverlapReport(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      shingleSize: Int = 3,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold out of (0,1]: $threshold")
    val cBands = Dedup.bandSignatures(
      corpus, textCol, idCol, numHashes, shingleSize, bands)
    val bBands = Dedup.bandSignatures(
      benchmark, textCol, idCol, numHashes, shingleSize, bands)
      .select(col("id").as("bench_id"), col("band")).distinct()
    val cand = cBands
      .join(broadcast(bBands), "band")
      .select(col("id").as("doc_id"), col("bench_id")).distinct()
    val cSets = corpusShingles(corpus, idCol, textCol, shingleSize)
      .select(col("doc_id"), col("sh").as("sh_a"))
    val bSets = corpusShingles(benchmark, idCol, textCol, shingleSize)
      .select(col("doc_id").as("bench_id"), col("sh").as("sh_b"))
    cand
      .join(cSets, "doc_id")
      .join(broadcast(bSets), "bench_id")
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast("long") - col("inter"))
      .withColumn("jaccard",
        round(when(col("uni") > 0,
          col("inter").cast("double") / col("uni").cast("double"))
          .otherwise(lit(0.0)), 6))
      .select(col("doc_id"), col("bench_id"), col("inter"), col("uni"),
        col("jaccard"), (col("jaccard") >= threshold).as("contaminated"))
  }

  private def report(
      cs: DataFrame, hits: DataFrame, threshold: Double): DataFrame =
    cs.select("doc_id", "n_shingles")
      .join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("overlap_ratio",
        when(col("n_shingles") > 0,
          round(col("n_overlap") / col("n_shingles"), 6)).otherwise(lit(0.0)))
      .withColumn("contaminated", col("overlap_ratio") >= threshold)
}
