package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.operators.{Divergence, Lexicon}
import graft.streaming.LexiconStream

/** Every live lexical signal must EXACTLY equal its batch operator
  * over the union of delivered batches — counts are the mergeable
  * representation, so nothing depends on batch boundaries.
  */
class LexiconStreamSpec extends SparkSpec {
  import spark.implicits._

  private def slice(k: Int, n: Int): DataFrame =
    (0 until n).map { i =>
      val words = (0 until 6).map(j => s"w${(i * (k + 2) + j * 7) % 23}")
      (if (i % 3 == 0) "web" else "books", words.mkString(" "))
    }.toDF("source", "text")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("live zipf, JS divergence and keyness equal batch operators per batch") {
    val dir = Files.createTempDirectory("lex").toString
    val write = LexiconStream.lexiconBatch("source", "text", s"$dir/store") _
    val batches = Seq(slice(0, 60), slice(1, 45), slice(2, 80))
    batches.zipWithIndex.foreach { case (b, i) =>
      write(b, i.toLong)
      val union = batches.take(i + 1).reduce(_ unionAll _)
      assert(canon(LexiconStream.zipfSlope(spark, s"$dir/store")) ===
        canon(Divergence.zipfSlope(union, "source", "text")), s"zipf @ $i")
      assert(canon(LexiconStream.jsDivergence(spark, s"$dir/store")) ===
        canon(Divergence.jsDivergence(union, "source", "text")), s"js @ $i")
      assert(canon(LexiconStream.distinctiveTerms(spark, s"$dir/store")) ===
        canon(Lexicon.distinctiveTerms(union, "source", "text")), s"keyness @ $i")
    }
  }

  test("replaying a middle batch is idempotent") {
    val dir = Files.createTempDirectory("lex").toString
    val write = LexiconStream.lexiconBatch("source", "text", s"$dir/store") _
    val batches = Seq(slice(0, 60), slice(1, 45), slice(2, 80))
    batches.zipWithIndex.foreach { case (b, i) => write(b, i.toLong) }
    val before = canon(LexiconStream.zipfSlope(spark, s"$dir/store"))
    write(batches(1), 1L)
    assert(canon(LexiconStream.zipfSlope(spark, s"$dir/store")) === before)
  }

  test("compaction is lossless and later batches keep merging") {
    val dir = Files.createTempDirectory("lex").toString
    val write = LexiconStream.lexiconBatch("source", "text", s"$dir/store") _
    val batches = Seq(slice(0, 60), slice(1, 45), slice(2, 80))
    write(batches(0), 0L); write(batches(1), 1L)
    val before = canon(LexiconStream.jsDivergence(spark, s"$dir/store"))
    LexiconStream.compact(spark, s"$dir/store")
    assert(canon(LexiconStream.jsDivergence(spark, s"$dir/store")) === before)
    write(batches(2), 2L)
    assert(canon(LexiconStream.jsDivergence(spark, s"$dir/store")) ===
      canon(Divergence.jsDivergence(
        batches.reduce(_ unionAll _), "source", "text")))
  }

  test("batchless store yields empty frames, not crashes") {
    val dir = Files.createTempDirectory("nolex").toString
    assert(LexiconStream.zipfSlope(spark, dir).isEmpty)
    assert(LexiconStream.jsDivergence(spark, dir).isEmpty)
    assert(LexiconStream.distinctiveTerms(spark, dir).isEmpty)
  }

  test("a real micro-batch stream through the query matches the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("lex").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val src = mem.toDF().toDF("source", "text")
    val q = LexiconStream.lexiconStream(
      src, "source", "text", s"$dir/store", s"$dir/ckpt").start()
    try {
      mem.addData(("web", "a b a c"), ("books", "b b d"))
      q.processAllAvailable()
      mem.addData(("web", "c c a"), ("books", "d e"))
      q.processAllAvailable()
    } finally q.stop()
    val union = Seq(
      ("web", "a b a c"), ("books", "b b d"),
      ("web", "c c a"), ("books", "d e")).toDF("source", "text")
    assert(canon(LexiconStream.distinctiveTerms(spark, s"$dir/store")) ===
      canon(Lexicon.distinctiveTerms(union, "source", "text")))
  }
}
