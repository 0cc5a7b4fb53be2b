package graft.scd

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def run(
      spark: SparkSession,
      inputGlob: String,
      benchmark: DataFrame,
      outDir: String,
      sampleFractions: Map[String, Double],
      seed: Long = 42L,
      tokenBudget: Long = 2048L,
      shards: Int = 8,
      minQuality: Double = 0.5): Report = {

    // 1. ingest + quarantine
    val q = JsonLines.readWithQuarantine(
      spark, inputGlob, inputSchema, s"$outDir/quarantine")
    val raw = q.good.filter(col("doc_id").isNotNull && col("text").isNotNull)
    val ingested = raw.count()

    // 2. exact dedup: keep each fingerprint's representative
    val exact = Dedup.exactDedup(raw, "text", "doc_id")
      .filter(!col("is_duplicate"))
      .select(raw.columns.map(col): _*)
    val exactKept = exact.count()

    // 3. near-dup clusters: minhash pairs -> components -> keep min id
    val (pairs, _) = Dedup.minHashCandidates(exact, "text", "doc_id")
    val clusters = ConnectedComponents.resolve(pairs, "id_a", "id_b")
    val nearDupLosers = clusters.filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    val deduped = exact.join(broadcast(nearDupLosers), Seq("doc_id"), "left_anti")
    val dedupedKept = deduped.count()

    // 4. decontamination against the benchmark
    val contaminatedIds = Decontaminate
      .overlapReport(deduped, benchmark, "doc_id", "text")
      .filter(col("contaminated")).select("doc_id")
    val clean = deduped.join(broadcast(contaminatedIds), Seq("doc_id"), "left_anti")
    val cleanKept = clean.count()

    // 5. redaction + quality gate
    val scored = clean
      .withColumn("text", TextFunctions.redactPii(col("text")))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
    val qualityKept = scored.count()

    // 6. deterministic stratified sampling by language
    val sampled = Sampling.stratifiedSample(
      scored, "lang", "doc_id", sampleFractions, seed, defaultFraction = 1.0)
    val sampledKept = sampled.count()

    // 7. sequence packing, 8. shard-partitioned output
    val packed = Packing.packDocuments(sampled, "doc_id", "text", tokenBudget, shards)
    packed.write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/corpus")
    val packedCount = spark.read.parquet(s"$outDir/corpus").count()

    Report(
      ingested = ingested,
      quarantined = q.quarantined,
      exactDups = ingested - exactKept,
      nearDups = exactKept - dedupedKept,
      contaminated = dedupedKept - cleanKept,
      lowQuality = cleanKept - qualityKept,
      sampledOut = qualityKept - sampledKept,
      packed = packedCount)
  }
}
