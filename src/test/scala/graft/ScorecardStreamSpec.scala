package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.ScorecardStream

/** The live scorecard must EXACTLY equal the batch composition over
  * the union of delivered batches — every column, including the
  * DECIMAL-folded means. Parity precondition: nondecreasing doc ids
  * across batches (crawl order), which every fixture respects.
  */
class ScorecardStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Docs with deliberate cross-batch exact duplicates (every 6th doc
    * repeats doc i-6's text verbatim) and shared trigrams.
    */
  private def slice(lo: Long, n: Int): DataFrame =
    (lo until lo + n).map { i =>
      val base = i % 6
      (i, s"src${i % 3}", s"l${i % 2}",
        s"w${base} w${(base + 1) % 5} w${(base + 2) % 4} w${base % 7} w${i % 2}")
    }.toDF("doc_id", "source", "lang", "text")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def truth(all: DataFrame): Seq[String] =
    canon(Queries.corpusScorecardFrame(all))

  private def fold(batches: Seq[DataFrame], root: String): Unit =
    batches.zipWithIndex.foreach { case (b, i) =>
      ScorecardStream.scorecardBatch(b, "doc_id", "source", "lang", "text",
        root, ScorecardStream.Config(), i.toLong)
    }

  test("live scorecard equals the batch composition after every batch") {
    val root = Files.createTempDirectory("scorecard").toString
    val batches = Seq(slice(0, 12), slice(12, 9), slice(21, 15))
    batches.zipWithIndex.foreach { case (b, i) =>
      ScorecardStream.scorecardBatch(b, "doc_id", "source", "lang", "text",
        root, ScorecardStream.Config(), i.toLong)
      val got = canon(ScorecardStream.scorecard(spark, root).get)
      val want = truth(batches.take(i + 1).reduce(_ unionAll _))
      assert(got === want, s"after batch $i")
    }
  }

  test("empty store yields None, not a crash") {
    val root = Files.createTempDirectory("scorecard").toString
    assert(ScorecardStream.scorecard(spark, root).isEmpty)
  }

  test("replaying the newest batch is idempotent") {
    val root = Files.createTempDirectory("scorecard").toString
    val batches = Seq(slice(0, 12), slice(12, 9))
    fold(batches, root)
    val before = canon(ScorecardStream.scorecard(spark, root).get)
    ScorecardStream.scorecardBatch(batches(1), "doc_id", "source", "lang",
      "text", root, ScorecardStream.Config(), 1L)
    assert(canon(ScorecardStream.scorecard(spark, root).get) === before)
  }

  test("compaction is lossless and later batches keep folding") {
    val root = Files.createTempDirectory("scorecard").toString
    val batches = Seq(slice(0, 12), slice(12, 9), slice(21, 15))
    fold(batches.take(2), root)
    val before = canon(ScorecardStream.scorecard(spark, root).get)
    ScorecardStream.compact(spark, root)
    assert(canon(ScorecardStream.scorecard(spark, root).get) === before)
    ScorecardStream.scorecardBatch(batches(2), "doc_id", "source", "lang",
      "text", root, ScorecardStream.Config(), 2L)
    assert(canon(ScorecardStream.scorecard(spark, root).get) ===
      truth(batches.reduce(_ unionAll _)))
  }

  test("a crash before the sums commit point leaves a consistent pre-batch view") {
    // sums/ is written LAST: simulate a crash that landed the
    // supporting stores (grams, fps, langs) but not sums — the reader
    // must see exactly the pre-batch scorecard, and the stream's
    // replay of the batch must then restore full parity
    val root = Files.createTempDirectory("scorecard").toString
    val batches = Seq(slice(0, 12), slice(12, 9))
    fold(batches, root)
    val afterBoth = canon(ScorecardStream.scorecard(spark, root).get)
    // reconstruct the crash state: batch 1's sums partition vanishes
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new Path(s"$root/sums/batch_id=1"), true))
    assert(canon(ScorecardStream.scorecard(spark, root).get) ===
      truth(batches.head), "reader must see the pre-batch snapshot")
    // structured streaming re-delivers the uncommitted batch
    ScorecardStream.scorecardBatch(batches(1), "doc_id", "source", "lang",
      "text", root, ScorecardStream.Config(), 1L)
    assert(canon(ScorecardStream.scorecard(spark, root).get) === afterBoth)
  }

  test("a real micro-batch stream matches the batch composition") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("scorecard").toString
    val ckpt = Files.createTempDirectory("scorecardckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String)]
    val src = mem.toDF().toDF("doc_id", "source", "lang", "text")
    val q = ScorecardStream.start(src, "doc_id", "source", "lang", "text",
      root, ckpt)
    val b0 = slice(0, 10); val b1 = slice(10, 8)
    try {
      mem.addData(b0.as[(Long, String, String, String)].collect().toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b1.as[(Long, String, String, String)].collect().toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(canon(ScorecardStream.scorecard(spark, root).get) ===
      truth(b0 unionAll b1))
  }
}
