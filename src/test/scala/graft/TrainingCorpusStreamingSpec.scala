package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.scd.TrainingCorpusJob
import graft.streaming.TrainingCorpusStreaming

/** Streaming curation must CONVERGE TO BATCH: after the stream has
  * consumed all files (one file per micro-batch, so every cross-batch
  * code path runs), the curated corpus equals what TrainingCorpusJob
  * produces over the same files in one shot — including the
  * cross-batch cases that make incremental dedup hard: an exact dup
  * arriving in a later batch than its original, and a near-dup
  * bridge document arriving after both of its cluster partners.
  */
class TrainingCorpusStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def esc(s: String) =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                case c if c < ' ' => " "; case c => c.toString }

  private def line(id: Long, lang: String, text: String) =
    s"""{"doc_id": $id, "ts": "2024-01-01T00:00:00Z", "lang": "${esc(lang)}", "text": "${esc(text)}"}"""

  test("streamed curation converges to the batch corpus") {
    val dir = Files.createTempDirectory("corpus_stream").toString
    val inDir = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(inDir))

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text").limit(45)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val benchText = docs(3)._3

    // file 1: first 15 docs. file 2: next 15, plus an exact dup of a
    // file-1 doc (case change — same fingerprint) and one corrupt
    // line. file 3: rest, plus a near-dup bridge: a doc sharing text
    // with a file-1 doc (same minhash buckets) under a NEW id, so its
    // cluster must merge across batches.
    val f1 = docs.take(15).map { case (i, l, t) => line(i, l, t) }
    val f2 = docs.slice(15, 30).map { case (i, l, t) => line(i, l, t) } ++
      Seq(line(99001L, "en", docs(2)._3.toUpperCase), "not valid json {")
    val f3 = docs.drop(30).map { case (i, l, t) => line(i, l, t) } ++
      Seq(line(99002L, docs(5)._2, docs(5)._3 + " extra tail"))
    // write in arrival order; the stream reads one file per trigger
    Files.writeString(java.nio.file.Paths.get(s"$inDir/a.jsonl"), f1.mkString("", "\n", "\n"))
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b.jsonl"), f2.mkString("", "\n", "\n"))
    Files.writeString(java.nio.file.Paths.get(s"$inDir/c.jsonl"), f3.mkString("", "\n", "\n"))

    val benchmark = Seq((1L, benchText)).toDF("doc_id", "text")
    val cfg = TrainingCorpusStreaming.Config(
      sampleFractions = Map("zz-nonexistent" -> 0.0))

    val q = TrainingCorpusStreaming.start(
      spark, inDir, benchmark, s"$dir/stream_out", s"$dir/ckpt", cfg,
      maxFilesPerTrigger = 1, trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    val batchReport = TrainingCorpusJob.run(
      spark, s"$inDir/*.jsonl", benchmark, s"$dir/batch_out",
      sampleFractions = cfg.sampleFractions)
    assert(batchReport.packed > 0)

    def corpusKey(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "shard", "pack_id", "pack_pos", "text")
      .collect().map(_.toSeq).toSet

    val streamed = TrainingCorpusStreaming.corpus(spark, s"$dir/stream_out")
    val batch = spark.read.parquet(s"$dir/batch_out/corpus")
    assert(corpusKey(streamed) == corpusKey(batch),
      "streamed corpus diverged from the batch corpus over the same files")
    assert(streamed.count() == batchReport.packed)

    // the planted cross-batch problems actually dropped
    val ids = streamed.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(99001L), "late exact dup must lose to the earlier id")
    assert(!ids.contains(99002L), "cross-batch near-dup must resolve into its cluster")
    assert(!ids.contains(docs(3)._1), "benchmark member must be decontaminated")

    // quarantine captured the corrupt line
    assert(spark.read.parquet(s"$dir/stream_out/quarantine").count() == 1)
  }

  test("state writes are O(batch): a batch persists only its first-seen rows") {
    val dir = Files.createTempDirectory("corpus_state").toString
    val out = s"$dir/out"
    def batchOf(lines: Seq[String]) = spark.read
      .schema(TrainingCorpusStreaming.streamSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", graft.sources.JsonLines.CorruptCol)
      .json(lines.toDS)
    val benchmark = graft.operators.Decontaminate.benchmarkHashes(
      Seq((1L, "zz unrelated")).toDF("doc_id", "text"), "doc_id", "text")
    val cfg = TrainingCorpusStreaming.Config(sampleFractions = Map.empty)
    TrainingCorpusStreaming.mergeBatch(
      batchOf(Seq(line(1L, "en", "first batch text one two three"),
        line(2L, "en", "first batch other text four five"))),
      benchmark, out, cfg, batchId = 0L)
    TrainingCorpusStreaming.mergeBatch(
      batchOf(Seq(line(2L, "en", "REDELIVERED id two must not re-enter state"),
        line(3L, "en", "second batch brand new text six seven"))),
      benchmark, out, cfg, batchId = 1L)
    // batch 1's partition holds ONLY doc 3 — the redelivered id 2 lost
    // to its first delivery and the batch never rewrote docs 1-2
    val b1 = spark.read.parquet(s"$out/doc_state/batch_id=1")
    assert(b1.select("doc_id").as[Long].collect().toSeq == Seq(3L),
      "a batch's state partition must hold exactly its first-seen rows")
    val all = spark.read.parquet(s"$out/doc_state")
    assert(all.count() == 3 &&
      all.filter(col("doc_id") === 2L).select("text").as[String].head()
        .startsWith("first batch"),
      "first delivery wins across partitions")
  }

  test("partitioned corpus sink rewrites only changed shards") {
    val dir = Files.createTempDirectory("corpus_part").toString
    val outP = s"$dir/part"
    val outA = s"$dir/atomic"
    def batchOf(lines: Seq[String]) = spark.read
      .schema(TrainingCorpusStreaming.streamSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", graft.sources.JsonLines.CorruptCol)
      .json(lines.toDS)
    val benchmark = graft.operators.Decontaminate.benchmarkHashes(
      Seq((1L, "zz unrelated")).toDF("doc_id", "text"), "doc_id", "text")
    val part = TrainingCorpusStreaming.Config(
      sampleFractions = Map.empty, partitionedCorpus = true)
    val atomic = part.copy(partitionedCorpus = false)
    // enough docs that several shards are populated after batch 0;
    // per-doc-unique vocabulary so no two docs share shingles (LSH
    // must not collapse the fixture into one near-dup cluster)
    def text(i: Long) = s"doc$i alpha$i beta$i gamma$i delta$i " +
      s"epsilon$i zeta$i eta$i theta$i iota$i kappa$i lambda$i"
    val b0 = (1L to 40L).map(i => line(i, "en", text(i)))
    val b1 = Seq(line(500L, "en", text(500L)))
    TrainingCorpusStreaming.mergeBatch(batchOf(b0), benchmark, outP, part, 0L)
    // snapshot every shard's file listing (name -> mtime+len)
    def listing(shard: String) = {
      val d = new java.io.File(s"$outP/corpus/$shard")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified(), f.length())).toSet
    }
    val shards = new java.io.File(s"$outP/corpus").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shards.length > 1, "fixture must populate several shards")
    val before = shards.map(s => s -> listing(s)).toMap
    TrainingCorpusStreaming.mergeBatch(batchOf(b1), benchmark, outP, part, 1L)
    // doc 500 lands in exactly one shard; every other shard's files
    // must be bit-untouched (same names, mtimes, sizes)
    val touched = shards.filter(s => listing(s) != before(s))
    assert(touched.length == 1,
      s"one new doc must touch exactly one shard, touched: ${touched.mkString(",")}")
    // and the partitioned corpus equals the atomic-replace corpus
    TrainingCorpusStreaming.mergeBatch(batchOf(b0), benchmark, outA, atomic, 0L)
    TrainingCorpusStreaming.mergeBatch(batchOf(b1), benchmark, outA, atomic, 1L)
    def key(out: String) = TrainingCorpusStreaming.corpus(spark, out)
      .select("doc_id", "shard", "pack_id", "pack_pos", "text")
      .collect().map(_.toSeq).toSet
    assert(key(outP) == key(outA),
      "partitioned and atomic sinks must produce the same corpus")
  }

  test("a replayed batch does not duplicate quarantine rows") {
    val dir = Files.createTempDirectory("corpus_replay").toString
    val out = s"$dir/out"
    // build through the same PERMISSIVE path the stream uses
    val batch = spark.read
      .schema(TrainingCorpusStreaming.streamSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", graft.sources.JsonLines.CorruptCol)
      .json(Seq(line(1L, "en", "some perfectly fine text"),
        "garbage { not json").toDS)
    val benchmark = graft.operators.Decontaminate.benchmarkHashes(
      Seq((1L, "zz unrelated")).toDF("doc_id", "text"), "doc_id", "text")
    val cfg = TrainingCorpusStreaming.Config(sampleFractions = Map.empty)
    // same batchId delivered twice = a foreachBatch checkpoint replay
    TrainingCorpusStreaming.mergeBatch(batch, benchmark, out, cfg, batchId = 7L)
    TrainingCorpusStreaming.mergeBatch(batch, benchmark, out, cfg, batchId = 7L)
    assert(spark.read.parquet(s"$out/quarantine").count() == 1,
      "replaying a batch must overwrite its quarantine partition, not append")
    // a LATER batch with its own corrupt line still accumulates
    TrainingCorpusStreaming.mergeBatch(batch, benchmark, out, cfg, batchId = 8L)
    assert(spark.read.parquet(s"$out/quarantine").count() == 2)
  }

  test("corpus() reader never renames: mid-commit old-snapshot fallback") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("corpus_window").toString
    val dest = new Path(s"$dir/corpus")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((1L, "old snapshot")).toDF("doc_id", "text")
      .write.parquet(graft.sources.AtomicDir.oldPath(dest).toString)
    Seq((2L, "incoming")).toDF("doc_id", "text")
      .write.parquet(graft.sources.AtomicDir.tmpPath(dest).toString)
    // the exact commit window: dest renamed away, tmp not yet in place
    val got = TrainingCorpusStreaming.corpus(spark, dir)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L), "reader must fall back to the known-good old dir")
    assert(fs.exists(graft.sources.AtomicDir.oldPath(dest)) &&
      fs.exists(graft.sources.AtomicDir.tmpPath(dest)) && !fs.exists(dest),
      "a read must not move anything — recovery belongs to the writer")
  }
}
