package graft.scd

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.functions.TextFunctions
import graft.operators.{ConnectedComponents, Decontaminate, Dedup, Packing, Sampling}
import graft.sources.JsonLines

/** End-to-end training-corpus curation pipeline, composed entirely
  * from this engine's operators — the "a user can run their whole
  * workload on this library" demonstration:
  *
  *   1. ingest JSONL with corrupt-record quarantine ([[JsonLines]])
  *   2. exact dedup on the normalized fingerprint ([[Dedup.exactDedup]])
  *   3. near-dup candidates (minhash LSH) resolved to clusters
  *      ([[ConnectedComponents]]), keeping each cluster's min id
  *   4. benchmark decontamination ([[Decontaminate]])
  *   5. PII redaction + quality/language filters ([[TextFunctions]])
  *   6. deterministic stratified sampling ([[Sampling]])
  *   7. sequence packing ([[Packing]])
  *   8. shard-partitioned parquet output (pack locality on read)
  *
  * Every stage is the scale-shaped form proven by its own spec/oracle;
  * this job only wires them. Stage order matters: exact dedup before
  * minhash (why hash identical texts twice), decontamination before
  * sampling (contamination is absolute, not proportional), packing
  * last (packs must reflect the final corpus).
  */
object TrainingCorpusJob {

  val inputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  final case class Report(
      ingested: Long,
      quarantined: Long,
      exactDups: Long,
      nearDups: Long,
      contaminated: Long,
      lowQuality: Long,
      sampledOut: Long,
      packed: Long)

  /** @param splitFractions when non-empty, tag every surviving doc
    *        with a deterministic train/val/test split
    *        ([[Sampling.split]]) and PACK EACH SPLIT SEPARATELY — a
    *        pack that mixed splits would leak eval text into training
    *        batches, so the pack boundary is the split boundary by
    *        construction; output gains a `split` partition column.
    *        Empty (default) keeps the original single-line behavior.
    */
  def run(
      spark: SparkSession,
      inputGlob: String,
      benchmark: DataFrame,
      outDir: String,
      sampleFractions: Map[String, Double],
      seed: Long = 42L,
      tokenBudget: Long = 2048L,
      shards: Int = 8,
      minQuality: Double = 0.5,
      splitFractions: Seq[(String, Double)] = Nil): Report = {

    // Per-stage metrics ride the pipeline's OWN materializations as
    // observe() listeners — no stage runs a counting action of its
    // own. The job executes exactly: the quarantine gate (inside
    // JsonLines), ONE checkpoint at the dedup branch point, the
    // bounded connected-components rounds, and ONE output write. The
    // previous shape ran 7 extra counting actions, each re-executing
    // its shared plan prefix — at 100 TB that is 7 redundant scans.
    def counted(name: String): (Observation, org.apache.spark.sql.Column) =
      (Observation(name), count(lit(1)).as("n"))
    def metric(o: Observation): Long = o.get("n").asInstanceOf[Long]

    // 1. ingest + quarantine
    val q = JsonLines.readWithQuarantine(
      spark, inputGlob, inputSchema, s"$outDir/quarantine")
    val (obsIngested, mIngested) = counted("ingested")
    val raw = q.good.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .observe(obsIngested, mIngested)

    // 2. exact dedup: keep each fingerprint's representative. This is
    // the branch point (near-dup hashing AND the keep-join both read
    // it), so it is materialized ONCE — and the ingested/exact metrics
    // fire during that same checkpoint job.
    val (obsExact, mExact) = counted("exact_kept")
    val exact = Dedup.exactDedup(raw, "text", "doc_id")
      .filter(!col("is_duplicate"))
      .select(raw.columns.map(col): _*)
      .observe(obsExact, mExact)
      .localCheckpoint(true)

    // 3. near-dup clusters: minhash pairs -> components -> keep min id
    val (pairs, _) = Dedup.minHashCandidates(exact, "text", "doc_id")
    val clusters = ConnectedComponents.resolve(pairs, "id_a", "id_b")
    val nearDupLosers = clusters.filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    // deduped0 (metric-free) feeds the decontamination probe side;
    // the observed variant feeds the main line only — otherwise the
    // CollectMetrics subtree executes on both sides of the broadcast
    // and double-counts
    val deduped0 = exact.join(broadcast(nearDupLosers), Seq("doc_id"), "left_anti")
    val (obsDeduped, mDeduped) = counted("neardup_kept")
    val deduped = deduped0.observe(obsDeduped, mDeduped)

    // 4. decontamination against the benchmark
    val contaminatedIds = Decontaminate
      .overlapReport(deduped0, benchmark, "doc_id", "text")
      .filter(col("contaminated")).select("doc_id")
    val (obsClean, mClean) = counted("clean_kept")
    val clean = deduped.join(broadcast(contaminatedIds), Seq("doc_id"), "left_anti")
      .observe(obsClean, mClean)

    // 5. redaction + quality gate
    val (obsQuality, mQuality) = counted("quality_kept")
    val scored = clean
      .withColumn("text", TextFunctions.redactPii(col("text")))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
      .observe(obsQuality, mQuality)

    // 6. deterministic stratified sampling by language
    val (obsSampled, mSampled) = counted("sampled_kept")
    val sampled = Sampling.stratifiedSample(
        scored, "lang", "doc_id", sampleFractions, seed, defaultFraction = 1.0)
      .observe(obsSampled, mSampled)

    // 7. sequence packing, 8. shard-partitioned output — the single
    // pass that fires every main-line metric
    val (obsPacked, mPacked) = counted("packed")
    if (splitFractions.isEmpty) {
      val packed = Packing.packDocuments(sampled, "doc_id", "text", tokenBudget, shards)
        .observe(obsPacked, mPacked)
      packed.write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/corpus")
    } else {
      // split tag is a zero-shuffle hash-range projection, and the
      // split rides the pack window key — ONE pass, with the split
      // boundary being the pack boundary by construction (a per-split
      // filter-and-union would re-execute the redaction/quality/sample
      // lineage once per split)
      val tagged = Sampling.split(sampled, "doc_id", seed + 1, splitFractions)
      val packed = Packing.packDocuments(
          tagged, "doc_id", "text", tokenBudget, shards,
          extraKeyCols = Seq("split"))
        .observe(obsPacked, mPacked)
      packed.write.mode("overwrite")
        .partitionBy("split", "shard").parquet(s"$outDir/corpus")
    }

    val ingested = metric(obsIngested)
    val exactKept = metric(obsExact)
    val dedupedKept = metric(obsDeduped)
    val cleanKept = metric(obsClean)
    val qualityKept = metric(obsQuality)
    Report(
      ingested = ingested,
      quarantined = q.quarantined,
      exactDups = ingested - exactKept,
      nearDups = exactKept - dedupedKept,
      contaminated = dedupedKept - cleanKept,
      lowQuality = cleanKept - qualityKept,
      sampledOut = qualityKept - metric(obsSampled),
      packed = metric(obsPacked))
  }
}
