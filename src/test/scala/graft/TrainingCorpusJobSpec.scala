package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.scd.TrainingCorpusJob

class TrainingCorpusJobSpec extends SparkSpec {
  import spark.implicits._

  test("the composed pipeline curates a corpus end to end, deterministically") {
    val dir = Files.createTempDirectory("corpus_job").toString
    val in = s"$dir/in.jsonl"

    // fixture docs as JSONL, plus planted problems: one corrupt line,
    // one exact duplicate (case change), one benchmark member
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text").limit(60)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val benchText = docs.head._3
    val jsonl = new StringBuilder
    def esc(s: String) =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case c if c < ' ' => " "; case c => c.toString }
    docs.foreach { case (id, lang, text) =>
      jsonl ++= s"""{"doc_id": $id, "ts": "2024-01-01T00:00:00Z", "lang": "${esc(lang)}", "text": "${esc(text)}"}\n"""
    }
    // exact dup of doc 2 under a new id
    jsonl ++= s"""{"doc_id": 99001, "ts": "2024-01-01T00:00:00Z", "lang": "en", "text": "${esc(docs(1)._3.toUpperCase)}"}\n"""
    jsonl ++= "this is not json\n"
    Files.writeString(java.nio.file.Paths.get(in), jsonl.toString)

    val benchmark = Seq((1L, benchText)).toDF("doc_id", "text")
    val report = TrainingCorpusJob.run(
      spark, in, benchmark, s"$dir/out",
      sampleFractions = Map("zz-nonexistent" -> 0.0))

    assert(report.quarantined == 1)
    assert(report.ingested == 61)
    assert(report.exactDups >= 1, s"the planted exact dup must drop: $report")
    assert(report.contaminated >= 1, s"the benchmark member must drop: $report")
    assert(report.packed > 0)

    // output: shard-partitioned, fully packed, PII-free text
    val out = spark.read.parquet(s"$dir/out/corpus")
    assert(out.columns.contains("pack_id") && out.columns.contains("shard"))
    assert(out.filter(col("text").rlike("@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).count() == 0,
      "no raw emails may survive redaction")
    assert(out.count() == report.packed)

    // determinism: a second run over the same input produces the same corpus
    val report2 = TrainingCorpusJob.run(
      spark, in, benchmark, s"$dir/out2",
      sampleFractions = Map("zz-nonexistent" -> 0.0))
    val a = spark.read.parquet(s"$dir/out/corpus")
      .select("doc_id", "shard", "pack_id", "pack_pos").collect().map(_.toSeq).toSet
    val b = spark.read.parquet(s"$dir/out2/corpus")
      .select("doc_id", "shard", "pack_id", "pack_pos").collect().map(_.toSeq).toSet
    assert(a == b && report.copy(quarantined = report2.quarantined) == report2)
  }

  test("stage metrics ride the write pass: no per-stage counting actions") {
    // the report's 7 stage counts are observe() metrics on the
    // pipeline's own materializations; the only count-typed action
    // left is the quarantine gate inside JsonLines. The pre-observe()
    // shape ran 8 (one per stage + the output re-read).
    val funcNames = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = funcNames.add(funcName)
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = funcNames.add(funcName)
    }
    val dir = Files.createTempDirectory("corpus_actions").toString
    val in = s"$dir/in.jsonl"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text").limit(30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    Files.writeString(java.nio.file.Paths.get(in),
      docs.map { case (id, lang, text) =>
        val esc = text.flatMap {
          case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
          case c if c < ' ' => " "; case c => c.toString }
        s"""{"doc_id": $id, "ts": "2024-01-01T00:00:00Z", "lang": "$lang", "text": "$esc"}"""
      }.mkString("", "\n", "\n"))

    spark.listenerManager.register(listener)
    val report =
      try TrainingCorpusJob.run(
        spark, in, Seq((1L, "benchmark text")).toDF("doc_id", "text"),
        s"$dir/out", sampleFractions = Map.empty)
      finally {
        // async bus: let in-flight events land before unregistering
        Thread.sleep(1500)
        spark.listenerManager.unregister(listener)
      }
    assert(report.ingested == 30 && report.packed > 0, s"$report")
    val counts = funcNames.toArray.count(_ == "count")
    assert(counts <= 1,
      s"expected at most the quarantine-gate count action, got $counts " +
        s"(all actions: ${funcNames.toArray.mkString(", ")})")
  }

  test("split mode packs each split separately: no train/eval pack sharing") {
    val dir = Files.createTempDirectory("corpus_split").toString
    val in = s"$dir/in.jsonl"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text").limit(80)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    Files.writeString(java.nio.file.Paths.get(in),
      docs.map { case (id, lang, text) =>
        val esc = text.flatMap {
          case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
          case c if c < ' ' => " "; case c => c.toString }
        s"""{"doc_id": $id, "ts": "2024-01-01T00:00:00Z", "lang": "$lang", "text": "$esc"}"""
      }.mkString("", "\n", "\n"))

    val fr = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val report = TrainingCorpusJob.run(
      spark, in, Seq((1L, "benchmark text")).toDF("doc_id", "text"),
      s"$dir/out", sampleFractions = Map.empty, splitFractions = fr)
    assert(report.packed > 0)

    val out = spark.read.parquet(s"$dir/out/corpus").cache()
    try {
      assert(out.count() == report.packed)
      assert(out.select("split").distinct().collect().map(_.getString(0)).toSet
        .subsetOf(Set("train", "val", "test")))
      assert(out.select("doc_id").distinct().count() == out.count())
      // THE leakage invariant: every row's split partition equals the
      // deterministic split of its doc_id — so no document can sit in
      // another split's pack, and (with doc uniqueness above) no pack
      // can contain a wrong-split document
      val tags = out.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = graft.operators.Sampling.split(
          out.select("doc_id"), "doc_id", 43L, fr) // seed + 1 of default 42
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(tags == expected)
      // and pack positions are dense per (split, shard, pack_id) —
      // packs are complete, not interleaved across splits
      val dense = out.groupBy("split", "shard", "pack_id")
        .agg(count(lit(1)).as("n"), max("pack_pos").as("hi"), min("pack_pos").as("lo"))
        .filter(col("lo") =!= 1 || col("hi") =!= col("n")).count()
      assert(dense == 0, "pack positions must be dense 1..n per pack")
    } finally out.unpersist()
  }
}
