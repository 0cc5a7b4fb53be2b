package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.streaming.SkewStream

class SkewStreamSpec extends SparkSpec {
  import spark.implicits._

  // arriving event slices with one key going progressively hotter
  private def slice(seed: Int, n: Int, hotShare: Int): DataFrame =
    spark.range(n).select(
      when(col("id") % 100 < hotShare, lit(999L))
        .otherwise(pmod(col("id") * (13 + seed), lit(50L))).as("k"))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("the live report equals the batch skewReport on the union, after every batch") {
    val dir = Files.createTempDirectory("skewstream").toString
    val batches = Seq(slice(1, 2000, 10), slice(2, 1500, 40), slice(3, 2500, 70))
    batches.zipWithIndex.foreach { case (b, i) =>
      SkewStream.countBatch(b, "k", dir, i.toLong)
      val got = canon(SkewStream.report(spark, dir, "k").get)
      val want = canon(Skew.skewReport(batches.take(i + 1).reduce(_ unionAll _), "k"))
      assert(got === want, s"after batch $i")
    }
    // the monitor's purpose: the hot key drives suggested_salt UP
    val salt = SkewStream.report(spark, dir, "k").get
      .select("suggested_salt").collect().head.getLong(0)
    assert(salt > 1L, "the planted hot key must demand salting")
  }

  test("replaying a batch overwrites its own partition — counts never double") {
    val dir = Files.createTempDirectory("skewstream").toString
    val batches = Seq(slice(1, 1000, 10), slice(2, 800, 30))
    batches.zipWithIndex.foreach { case (b, i) =>
      SkewStream.countBatch(b, "k", dir, i.toLong)
    }
    val before = canon(SkewStream.report(spark, dir, "k").get)
    SkewStream.countBatch(batches(1), "k", dir, 1L) // crash-recovery replay
    assert(canon(SkewStream.report(spark, dir, "k").get) === before)
  }

  test("compaction preserves the report and shrinks the store to two partitions") {
    val dir = Files.createTempDirectory("skewstream").toString
    val batches = Seq(slice(1, 900, 5), slice(2, 700, 20), slice(3, 1100, 45))
    batches.zipWithIndex.foreach { case (b, i) =>
      SkewStream.countBatch(b, "k", dir, i.toLong)
    }
    val before = canon(SkewStream.report(spark, dir, "k").get)
    SkewStream.compact(spark, dir)
    assert(canon(SkewStream.report(spark, dir, "k").get) === before)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted
    assert(parts.length === 2, s"expected compacted + newest, got ${parts.toSeq}")
  }

  test("an empty batch writes nothing and the report is unchanged") {
    val dir = Files.createTempDirectory("skewstream").toString
    SkewStream.countBatch(slice(1, 500, 10), "k", dir, 0L)
    val before = canon(SkewStream.report(spark, dir, "k").get)
    SkewStream.countBatch(slice(1, 500, 10).limit(0), "k", dir, 1L)
    assert(canon(SkewStream.report(spark, dir, "k").get) === before)
  }
}
