package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.HeavyHitters
import graft.streaming.StreamingSketch

class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def tokens = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"),
      explode(split(TextFunctions.normalizeText(col("text")), " ")).as("word"))

  test("merged batch sketches equal the one-pass sketch exactly") {
    // CMS counters are linear: sum of per-batch counters == one-pass
    // counters, so every estimate must match bit-for-bit, not within
    // a bound
    val dir = Files.createTempDirectory("sketchstate").toString
    val toks = tokens.cache()
    try {
      val cfg = StreamingSketch.Config()
      (0L until 3L).foreach { b =>
        StreamingSketch.mergeBatch(
          toks.filter(col("doc_id") % 3 === b), "word", dir, cfg, b)
      }
      val words = toks.select("word").distinct()
      val streamed = StreamingSketch.estimates(words, "word", dir, cfg)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val oneShot = HeavyHitters.withEstimates(
          words, "word", toks, "word",
          eps = cfg.eps, confidence = cfg.confidence, seed = cfg.seed)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == oneShot)
      assert(streamed.nonEmpty)
    } finally toks.unpersist()
  }

  test("replaying a batch id overwrites instead of double-counting") {
    val dir = Files.createTempDirectory("sketchstate").toString
    val cfg = StreamingSketch.Config()
    val batch = Seq("a", "a", "b").toDF("word")
    StreamingSketch.mergeBatch(batch, "word", dir, cfg, 0L)
    val before = StreamingSketch.estimates(Seq("a").toDF("word"), "word", dir, cfg)
      .select("cms_est", "cms_slack").head()
    StreamingSketch.mergeBatch(batch, "word", dir, cfg, 0L) // replay
    val after = StreamingSketch.estimates(Seq("a").toDF("word"), "word", dir, cfg)
      .select("cms_est", "cms_slack").head()
    assert(before == after, s"replay changed state: $before -> $after")
  }

  test("empty state and empty batches degrade to null estimates") {
    val dir = Files.createTempDirectory("sketchstate").toString
    val cfg = StreamingSketch.Config()
    val out = StreamingSketch.estimates(Seq("a").toDF("word"), "word", dir, cfg).head()
    assert(out.isNullAt(1) && out.isNullAt(2))
    StreamingSketch.mergeBatch(
      Seq.empty[String].toDF("word"), "word", dir, cfg, 0L)
    val still = StreamingSketch.estimates(Seq("a").toDF("word"), "word", dir, cfg).head()
    assert(still.isNullAt(1))
  }

  test("a real stream converges to the batch sketch") {
    val dir = Files.createTempDirectory("sketchstate").toString
    val ckpt = Files.createTempDirectory("sketchckpt").toString
    val cfg = StreamingSketch.Config()
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingSketch.start(
      mem.toDF().withColumnRenamed("value", "word"), "word", dir, ckpt, cfg)
    try {
      mem.addData("x", "y", "x")
      q.processAllAvailable()
      mem.addData("x", "z")
      q.processAllAvailable()
    } finally q.stop()
    val est = StreamingSketch.estimates(
        Seq("x", "y", "z", "w").toDF("word"), "word", dir, cfg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("x" -> 3L, "y" -> 1L, "z" -> 1L, "w" -> 0L), est.toString)
  }
}
