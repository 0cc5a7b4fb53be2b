package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Document deduplication operators for training-data pipelines, from
  * exact through fuzzy:
  *
  *   - exact: hash-groupBy on a normalized fingerprint (one shuffle on a
  *     high-cardinality key — scales linearly);
  *   - MinHash + LSH: shingle → minhash signature (per-row HOFs, no
  *     shuffle) → band buckets → candidate pairs via bucket self-join
  *     (shuffle on band hash; only colliding docs ever meet, so the
  *     quadratic blow-up is confined to buckets);
  *   - SimHash: 32-bit per-document signature, Hamming-adjacent buckets;
  *   - n-gram Jaccard: exact pairwise similarity, restricted to LSH (or
  *     caller-provided) candidate pairs — never all-pairs at scale;
  *   - embedding cosine near-dup: see [[SimilaritySearch]].
  *
  * MinHash params follow the classic (a*h + b) mod p universal-hash
  * family over a portable 32-bit base hash, so an external SQL engine
  * can reproduce signatures exactly.
  */
object Dedup {

  /** Large prime > 2^32 for the universal hash family. */
  val MinHashPrime: Long = 4294967311L

  /** Deterministic (a_i, b_i) parameters for `numHashes` hash functions,
    * derived from splitmix64-style mixing of the index — stable across
    * runs and engines (no RNG state).
    */
  def minHashParams(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { i =>
      def mix(x: Long): Long = {
        var z = x + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      // a, b < 2^31 so a*h + b stays under 2^63 for 32-bit base hashes
      // (identical arithmetic is then reproducible in any int64 engine).
      val a = java.lang.Math.floorMod(mix(i.toLong * 2 + 1), 2147483646L) + 1
      val b = java.lang.Math.floorMod(mix(i.toLong * 2 + 2), 2147483647L)
      (a, b)
    }

  /** Exact dedup: group documents by normalized-text fingerprint.
    * Output: one row per document with its cluster fingerprint, the
    * cluster's representative (min id), cluster size, and whether the
    * row is the representative.
    *
    * Single hash-shuffle on the fingerprint; at 100 TB this is the
    * cheapest possible exact formulation (partial aggregation does not
    * apply to the window, but the fingerprint key is near-unique so
    * partitions stay balanced).
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy("fp")
    df.withColumn("fp", fingerprint(col(textCol)))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("representative", min(col(idCol)).over(w))
      .withColumn("is_duplicate", col(idCol) =!= col("representative"))
  }

  /** Shingle-hash array for one document: word n-gram shingles, each
    * hashed with the portable 32-bit hash. MATERIALIZE THIS AS ITS OWN
    * COLUMN before fanning out into signatures: the signature/band
    * expressions reference it many times, and Catalyst duplicates (not
    * CSEs) expensive subtrees — inlining this into 32 signature branches
    * recomputes every sha256 32 times per row.
    */
  def shingleHashes(textCol: Column, shingleSize: Int): Column =
    transform(wordShingles(textCol, shingleSize), portableHash32 _)

  /** MinHash signature as an array<long> column over a PRE-MATERIALIZED
    * shingle-hash column: for each hash function i, min over shingle
    * hashes of (a_i * h + b_i) mod p. Pure per-row HOFs — zero shuffle.
    */
  def minHashSignature(hashesCol: Column, numHashes: Int): Column = {
    val params = minHashParams(numHashes)
    val sig = params.map { case (a, b) =>
      array_min(transform(hashesCol, h => pmod(lit(a) * h + lit(b), lit(MinHashPrime))))
    }
    array(sig: _*)
  }

  /** LSH band hashes from a minhash signature: split into `bands` bands
    * of `rows` values each; band key = sha2 of the joined slice.
    */
  def lshBandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      sha2(concat_ws(",", lit(b), concat_ws(",", slice(sig, b * rows + 1, rows))), 256)
    }: _*)

  /** MinHash-LSH near-duplicate candidate pairs.
    *
    * @return (id_a, id_b) with id_a < id_b, distinct — documents sharing
    *         at least one LSH band bucket — plus a second DataFrame of
    *         over-limit buckets that were dropped. Callers MUST surface this
    *         frame (count/log/alert) — a dropped bucket is lost recall.
    *
    * Scale shape: one pass computes shingle hashes → signature → band
    * keys (each in its own Project — Catalyst duplicates, not CSEs,
    * expensive subtrees referenced more than once, so inlining these
    * would recompute every sha256 32x per row). Then ONE shuffle groups
    * ids per band bucket and pairs are enumerated bucket-locally — a
    * self-join on the band key would re-execute the whole hash lineage
    * for the second side. `maxBucket` bounds per-bucket memory and the
    * quadratic pair blow-up of degenerate corpora.
    */
  /** All ordered (a, b) element pairs (a strictly before b) of a
    * sorted array column, exploded — the shared bucket-to-candidate-
    * pairs kernel (image/audio near-dup, winnowing, source overlap and
    * the streaming store all bucket then pair this way). The `i + 2`
    * is the 1-based slice start of the element AFTER the 0-based
    * transform index; getting it wrong silently self-pairs or drops
    * neighbors, so the indexing lives in exactly one place. Works for
    * any element type (ids or structs).
    */
  def orderedPairs(arr: Column): Column =
    explode(flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + 2, size(arr)), y =>
        struct(x.as("a"), y.as("b"))))))

  def minHashCandidates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      shingleSize: Int = 3,
      bands: Int = 8,
      maxBucket: Int = 1000): (DataFrame, DataFrame) = {
    // hashing pipeline, input-parallelism guard, and the require() all
    // live in bandSignatures (the persistable signature store shares
    // them verbatim)
    val buckets = bandSignatures(df, textCol, idCol, numHashes, shingleSize, bands)
    val grouped = buckets
      .groupBy("band")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
    val dropped = grouped.filter(size(col("ids")) > maxBucket)
      .select(col("band"), size(col("ids")).cast("long").as("bucket_n"))
    val pairs = grouped
      .filter(size(col("ids")).between(2, maxBucket))
      .select(Dedup.orderedPairs(col("ids")).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
    (pairs, dropped)
  }

  /** The LSH band rows for a corpus — one (id, band) row per document
    * per band, the thing a production pipeline PERSISTS next to the
    * corpus so incoming batches dedup against stored signatures
    * instead of rehashing 100 TB of text (see
    * [[incrementalCandidates]]). Map-only: shingle hashes → signature
    * → band keys, each stage in its own Project (Catalyst duplicates,
    * not CSEs, expensive subtrees), zero shuffles.
    */
  def bandSignatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      shingleSize: Int = 3,
      bands: Int = 8): DataFrame = {
    require(bands > 0 && numHashes > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands) " +
        "— otherwise signature values are silently ignored, and bands > " +
        "numHashes would key every document into identical empty-slice buckets")
    import graft.plans.NativeText
    NativeText.register(df.sparkSession, Seq(numHashes))
    val rows = numHashes / bands
    // CPU-bound per-row stage: make sure it parallelizes even when the
    // input is one small parquet row-group (common for side tables; at
    // real scale inputs arrive already partitioned and this is a no-op).
    // The split count is estimated from logical-plan size stats
    // (ceil(bytes / maxPartitionBytes) mirrors the scan's file
    // splitting) — never from df.rdd, which forces full physical
    // planning plus RDD lineage on every call. Overestimated stats
    // (e.g. join products) only skip the repartition, never add one —
    // EXCEPT for checkpointed inputs: a localCheckpoint'd frame plans
    // as a LogicalRDD leaf whose stats default to defaultSizeInBytes
    // (effectively unknown), which would silently skip the spread on
    // exactly the small-but-hot frames this guard exists for. Those
    // RDDs already exist, so their true partition count is free.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val maxSplit = BigInt(df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    val plan = df.queryExecution.optimizedPlan
    val leaves = plan.collectLeaves()
    val estParts: BigInt =
      if (leaves.nonEmpty && leaves.forall(_.isInstanceOf[LogicalRDD]))
        BigInt(leaves.map(_.asInstanceOf[LogicalRDD].rdd.getNumPartitions).sum)
      else
        (plan.stats.sizeInBytes + maxSplit - 1) / maxSplit
    val input = if (estParts.max(1) < par) df.repartition(par) else df
    input
      .select(col(idCol).as("id"),
        NativeText.shingleHash32(
          split(normalizeText(col(textCol)), " "), shingleSize).as("__hashes"))
      .select(col("id"),
        NativeText.minHashSig(col("__hashes"), numHashes).as("__sig"))
      .select(col("id"),
        explode(NativeText.bandHashes(col("__sig"), bands, rows)).as("band"))
  }

  /** Incremental dedup: candidate pairs for an incoming batch against
    * a corpus whose [[bandSignatures]] are already stored — the daily-
    * crawl shape. Only the BATCH is hashed; the corpus contributes
    * (id, band) rows, pruned to the bands the batch actually touches
    * (a semi join — at scale this is the difference between reading a
    * signature table and rehashing the corpus). Bucket membership —
    * and therefore the `maxBucket` bound — is evaluated over the FULL
    * bucket (corpus + batch members), so the pair set equals a full
    * [[minHashCandidates]] run restricted to batch-touching pairs.
    *
    * @return (pairs, dropped) like [[minHashCandidates]]: pairs are
    *         (id_a < id_b, distinct) with at least one batch side;
    *         dropped lists over-limit buckets (lost recall — surface it)
    */
  def incrementalCandidates(
      corpusSigs: DataFrame,
      incoming: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      shingleSize: Int = 3,
      bands: Int = 8,
      maxBucket: Int = 1000): (DataFrame, DataFrame) =
    // LAZY-checkpoint the batch signatures: they feed BOTH the
    // touched-band probe and the membership union, and Spark shares no
    // uncached subplan across branches — without this the batch text
    // would be shingled and sha-hashed twice, breaking the "only the
    // batch is hashed (once)" contract. Lazy (not eager) so merely
    // constructing the frames launches no job; the backing RDD
    // materializes once on the first action and both branches read it.
    incrementalCandidatesFromSigs(corpusSigs,
      bandSignatures(incoming, textCol, idCol, numHashes, shingleSize, bands)
        .localCheckpoint(false),
      maxBucket)

  /** [[incrementalCandidates]] over ALREADY-computed batch signatures
    * (`(id, band)`, one row per band) — the seam that lets a streaming
    * writer compute a batch's signatures once and use them for BOTH
    * candidate pairing and the signature-store append
    * ([[graft.streaming.StreamingDedup.incrementalDedupBatch]]).
    * Callers should hand in a materialized/checkpointed frame; the
    * signatures are read by two branches here.
    */
  def incrementalCandidatesFromSigs(
      corpusSigs: DataFrame,
      batchSigs: DataFrame,
      maxBucket: Int = 1000): (DataFrame, DataFrame) = {
    val newSigs = batchSigs
      .select(col("band"), struct(col("id"), lit(true).as("is_new")).as("m"))
    val touched = newSigs.select("band").distinct()
    val corpusMembers = corpusSigs
      .join(touched, Seq("band"), "left_semi")
      .select(col("band"), struct(col("id"), lit(false).as("is_new")).as("m"))
    // sort_array on (id, is_new) structs orders by id — the same a < b
    // enumeration the full run uses. Lazy-checkpointed because pairs
    // AND dropped are usually consumed as two separate actions — the
    // store scan, semi-join and bucket grouping must not run twice.
    val grouped = corpusMembers.unionByName(newSigs)
      .groupBy("band")
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .localCheckpoint(false)
    val dropped = grouped.filter(size(col("ms")) > maxBucket)
      .select(col("band"), size(col("ms")).cast("long").as("bucket_n"))
    val pairs = grouped
      .filter(size(col("ms")).between(2, maxBucket))
      .select(Dedup.orderedPairs(col("ms")).as("p"))
      .filter((col("p.a.is_new") || col("p.b.is_new")) &&
        col("p.a.id") =!= col("p.b.id")) // an id present on both sides
                                         // must not self-pair
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"))
      .distinct()
    (pairs, dropped)
  }

  /** Word-n-gram Jaccard similarity for given candidate pairs.
    * `pairs` must have columns (id_a, id_b); shingle sets are computed
    * once per document and joined in — never recomputed per pair.
    *
    * Shingles are compared by their portable 32-bit hash (one native
    * single-pass expression per document) rather than as strings — the
    * interpreted string-shingle HOF costs ~20x more per row and
    * dominated the whole query. A within-pair 32-bit collision could in
    * principle merge two distinct shingles (p ≈ |set|²/2³³ per pair),
    * but the hashing is deterministic and engine-portable, so a SQL
    * oracle replays it exactly; [[ngramJaccardExact]] is the
    * string-comparison truth for cross-checking.
    */
  def ngramJaccard(
      df: DataFrame,
      pairs: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3): DataFrame = {
    import graft.plans.NativeText
    NativeText.register(df.sparkSession)
    jaccardOnSets(pairs, df.select(
      col(idCol).as("id"),
      array_distinct(NativeText.shingleHash32(
        split(normalizeText(col(textCol)), " "), shingleSize)).as("sh")))
  }

  /** String-comparison formulation of [[ngramJaccard]] (collision-free
    * small-scale truth; ~20x slower per row).
    */
  def ngramJaccardExact(
      df: DataFrame,
      pairs: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3): DataFrame =
    jaccardOnSets(pairs, df.select(
      col(idCol).as("id"),
      array_distinct(wordShingles(col(textCol), shingleSize)).as("sh")))

  /** Asymmetric containment for the same candidate pairs:
    * cont_a = |A∩B| / |A| (how much of A lives inside B) and the
    * mirror — the quote/subset detector Jaccard blurs (a short doc
    * fully embedded in a long one has low Jaccard but cont ≈ 1).
    * Same shapes and hashed-shingle convention as [[ngramJaccard]].
    */
  def ngramContainment(
      df: DataFrame,
      pairs: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3): DataFrame = {
    import graft.plans.NativeText
    NativeText.register(df.sparkSession)
    val sets = df.select(
      col(idCol).as("id"),
      array_distinct(NativeText.shingleHash32(
        split(normalizeText(col(textCol)), " "), shingleSize)).as("sh"))
    pairs
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        col("inter").cast("long").as("inter"),
        size(col("sh_a")).cast("long").as("size_a"),
        size(col("sh_b")).cast("long").as("size_b"),
        when(size(col("sh_a")) > 0,
          round(col("inter") / size(col("sh_a")).cast("double"), 6))
          .otherwise(lit(0.0)).as("cont_a"),
        when(size(col("sh_b")) > 0,
          round(col("inter") / size(col("sh_b")).cast("double"), 6))
          .otherwise(lit(0.0)).as("cont_b"))
  }

  /** LSH candidate-recall audit on a deterministic sample: the
    * acceptance gate for banding parameters, mirroring what
    * [[graft.Queries.annRecall]] does for the ANN index. Ground truth
    * is the exact shingle Jaccard of every sample pair at or above
    * `minJaccard`; each truth pair is tagged with whether the
    * production LSH would have surfaced it. Banding is per-document,
    * so candidates computed ON the sample are exactly the full-corpus
    * BANDING's candidate set restricted to sample pairs — the audit
    * measures the banding semantics, not a scaled-down variant. The
    * capacity guard (`maxBucket`) is deliberately disabled here: it is
    * a production load shed whose bucket sizes differ between sample
    * and corpus, so letting it fire would tag pairs the full-corpus
    * run sheds (or vice versa) and silently skew the recall estimate.
    *
    * Scale shape: truth-pair discovery is a gram-keyed equi-join over
    * the SAMPLE's exploded shingles (pairs sharing zero grams cannot
    * reach any positive threshold, so no all-pairs stage), and the
    * sample fraction is the knob that bounds the audit's cost
    * independent of corpus size.
    */
  def lshRecall(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      sampleFraction: Double,
      seed: Long,
      minJaccard: Double,
      numHashes: Int = 32,
      shingleSize: Int = 3,
      bands: Int = 8): DataFrame = {
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"sampleFraction out of (0,1]: $sampleFraction")
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard out of (0,1]: $minJaccard")
    import graft.plans.NativeText
    NativeText.register(corpus.sparkSession)
    val sample = corpus.filter(
      Sampling.hashUnit(col(idCol), seed) < sampleFraction)
    val sets = sample.select(
      col(idCol).as("id"),
      array_distinct(NativeText.shingleHash32(
        split(normalizeText(col(textCol)), " "), shingleSize)).as("sh"))
    val sizes = sets.select(col("id"), size(col("sh")).cast("long").as("n"))
    // gram-keyed pair intersections: only pairs sharing >= 1 shingle appear
    val grams = sets.select(col("id"), explode(col("sh")).as("h"))
    val inter = grams.alias("a").join(grams.alias("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val truth = inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / col("uni").cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
    val (cand, _) = minHashCandidates(sample, textCol, idCol,
      numHashes = numHashes, shingleSize = shingleSize, bands = bands,
      maxBucket = Int.MaxValue)
    truth
      .join(cand.withColumn("__c", lit(true)), Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        col("jaccard"), coalesce(col("__c"), lit(false)).as("is_candidate"))
  }

  private def jaccardOnSets(pairs: DataFrame, sets: DataFrame): DataFrame =
    pairs
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn(
        "jaccard",
        when(col("uni") > 0, col("inter").cast("double") / col("uni").cast("double"))
          .otherwise(lit(0.0)))
      .select("id_a", "id_b", "inter", "uni", "jaccard")

  /** 32-bit SimHash over a PRE-MATERIALIZED word-hash column: per bit
    * position, majority vote of word-hash bits weighted +1/-1. Pure
    * per-row HOFs, no shuffle. Near-duplicates differ in few bits
    * (compare via Hamming distance / bucket on the signature).
    */
  def simHashFromHashes(hashesCol: Column): Column = {
    // Bit ops via exact power-of-two arithmetic (doubles are exact for
    // 2^i, i<32, and for h < 2^32) because the shift DSL functions take
    // literal ints, not lambda-bound columns.
    val bits = transform(
      sequence(lit(0), lit(31)),
      i => {
        val bitOf = (h: Column) =>
          pmod(floor(h / pow(lit(2.0), i)).cast("long"), lit(2L))
        val vote = aggregate(
          hashesCol,
          lit(0L),
          (acc, h) => acc + when(bitOf(h) === 1L, 1L).otherwise(-1L))
        when(vote > 0, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))
      })
    aggregate(bits, lit(0L), (acc, x) => acc + x)
  }

  /** DataFrame-level simhash: word hashing and the signature are both
    * native single-pass expressions (the HOF [[simHashFromHashes]] runs
    * 32 interpreted aggregate passes per row — ~10x slower; kept for
    * the parity spec). A 1-gram shingle is the word itself.
    */
  def withSimHash(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    import graft.plans.NativeText
    NativeText.register(df.sparkSession)
    df.withColumn(outCol,
      NativeText.simHash32(
        NativeText.shingleHash32(split(normalizeText(col(textCol)), " "), 1)))
  }

  /** MinHash-LSH banding planner (the MMDS ch.3 design table): for a
    * signature of `sigLen` minhashes, every factorization into
    * `bands × rows_per_band` with its S-curve characteristics —
    * `est_threshold = (1/b)^(1/r)` (the curve's inflection), the
    * candidate probability `1 − (1 − j^r)^b` AT the target Jaccard
    * `threshold`, the false-positive rate at `threshold − margin`
    * and the miss rate at `threshold + margin`. The design-time step
    * before committing a banding to a 100 TB dedup run — the table is
    * |divisors of sigLen| rows, data-independent, and every float
    * rounds to 6 dp so both engines emit identical cells.
    *
    * Output: (bands, rows_per_band, est_threshold, p_at_threshold,
    * fp_below, miss_above).
    */
  def lshPlan(
      spark: org.apache.spark.sql.SparkSession,
      sigLen: Int,
      threshold: Double,
      margin: Double = 0.125): DataFrame = {
    // default margin is 1/8: with a power-of-two threshold the probe
    // points threshold±margin are exactly representable doubles, so an
    // oracle's decimal literals parse to the SAME doubles both engines
    // then exponentiate
    require(sigLen >= 1, s"need sigLen >= 1, got $sigLen")
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
    require(margin > 0 && threshold - margin > 0 && threshold + margin < 1,
      s"margin $margin must keep threshold±margin inside (0,1)")
    val b = col("id").cast("double")
    val r = lit(sigLen.toDouble) / b
    def pCandidate(j: Double): Column =
      lit(1.0) - pow(lit(1.0) - pow(lit(j), r), b)
    spark.range(1, sigLen + 1L)
      .filter(lit(sigLen) % col("id") === 0)
      .select(
        col("id").as("bands"),
        (lit(sigLen.toLong) / col("id")).cast("long").as("rows_per_band"),
        round(pow(lit(1.0) / b, lit(1.0) / r), 6).as("est_threshold"),
        round(pCandidate(threshold), 6).as("p_at_threshold"),
        round(pCandidate(threshold - margin), 6).as("fp_below"),
        round(lit(1.0) - pCandidate(threshold + margin), 6).as("miss_above"))
  }
}
