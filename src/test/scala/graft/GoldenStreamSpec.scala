package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Survivorship
import graft.operators.Survivorship._
import graft.streaming.GoldenStream

/** The live golden record's parity contract: the served record off
  * the cumulative (entity × attr × value) count store equals the
  * batch survivorship on the union of every delivered batch — after
  * EVERY batch — plus store mechanics (replay, compaction, empties).
  */
class GoldenStreamSpec extends SparkSpec {

  private val attrs = Seq("name", "nation", "bal")
  private val rules = Seq(
    MostFrequent("name", "name"),
    MostFrequent("nation", "nation", tieCast = "long"),
    MaxOf("bal", "best_bal"))

  private def slice(seed: Int, n: Int): DataFrame =
    spark.range(n).select(
      (col("id") % 40).as("entity_id"),
      (col("id") + seed * 100000L).as("rec_id"),
      concat(lit("n"), (col("id") * (3 + seed) % 7).cast("string")).as("name"),
      (col("id") * (5 + seed) % 11).as("nation"),
      when(col("id") % 9 === 0, lit(null).cast("double"))
        .otherwise((col("id") % 500).cast("double") / 10.0).as("bal"))

  private def served(dir: String): Seq[String] =
    GoldenStream.goldenRecord(spark, dir, rules).get
      .select(col("entity_id"), col("n_records"), col("name"),
        col("nation").cast("long").as("nation"), col("best_bal"))
      .collect().map(_.toString).sorted.toSeq

  private def batchTruth(union: DataFrame): Seq[String] =
    Survivorship.goldenRecord(union, "entity_id", rules)
      .collect().map(_.toString).sorted.toSeq

  test("the served golden record equals batch survivorship after every batch") {
    val dir = Files.createTempDirectory("goldenstream").toString
    val batches = Seq(slice(1, 300), slice(2, 200), slice(3, 400))
    batches.zipWithIndex.foreach { case (b, i) =>
      GoldenStream.countBatch(b, "entity_id", attrs, dir, i.toLong)
      val union = batches.take(i + 1).reduce(_ unionAll _)
      assert(served(dir) === batchTruth(union), s"divergence after batch $i")
    }
  }

  test("replaying a batch overwrites its partition — counts never double") {
    val dir = Files.createTempDirectory("goldenstream").toString
    val batches = Seq(slice(1, 250), slice(2, 150))
    batches.zipWithIndex.foreach { case (b, i) =>
      GoldenStream.countBatch(b, "entity_id", attrs, dir, i.toLong)
    }
    val before = served(dir)
    GoldenStream.countBatch(batches(1), "entity_id", attrs, dir, 1L)
    assert(served(dir) === before)
  }

  test("compaction preserves the served record and shrinks the store") {
    val dir = Files.createTempDirectory("goldenstream").toString
    Seq(slice(1, 200), slice(2, 300), slice(3, 100)).zipWithIndex.foreach {
      case (b, i) => GoldenStream.countBatch(b, "entity_id", attrs, dir, i.toLong)
    }
    val before = served(dir)
    GoldenStream.compact(spark, dir)
    assert(served(dir) === before)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName)
    assert(parts.length === 2, s"expected compacted + newest, got ${parts.toSeq}")
  }

  test("latest-wins store serves LatestBy equal to batch survivorship after every batch") {
    import org.apache.spark.sql.DataFrame
    val dir = Files.createTempDirectory("goldenlatest").toString
    val lrules = Seq(Survivorship.LatestBy("name", "seen_ts", "rec_id", "latest_name"))
    def withTs(df: DataFrame, seed: Int): DataFrame =
      df.withColumn("seen_ts",
        timestamp_seconds(lit(1700000000L) + pmod(hash(col("rec_id"), lit(seed)), lit(100000))))
    val batches = Seq(withTs(slice(1, 300), 11), withTs(slice(2, 200), 12),
      withTs(slice(3, 400), 13))
    batches.zipWithIndex.foreach { case (b, i) =>
      GoldenStream.latestBatch(b, "entity_id", lrules, dir, i.toLong)
      val union = batches.take(i + 1).reduce(_ unionAll _)
      val want = Survivorship.goldenRecord(union, "entity_id", lrules)
        .select("entity_id", "latest_name")
        .collect().map(_.toString).sorted.toSeq
      val got = GoldenStream.latest(spark, dir, lrules).get
        .collect().map(_.toString).sorted.toSeq
      assert(got === want, s"latest divergence after batch $i")
    }
    // replay overwrites its own partition
    val before = GoldenStream.latest(spark, dir, lrules).get
      .collect().map(_.toString).sorted.toSeq
    GoldenStream.latestBatch(batches(1), "entity_id", lrules, dir, 1L)
    assert(GoldenStream.latest(spark, dir, lrules).get
      .collect().map(_.toString).sorted.toSeq === before)
    // compaction is lossless (argmax merge)
    GoldenStream.compactLatest(spark, dir)
    assert(GoldenStream.latest(spark, dir, lrules).get
      .collect().map(_.toString).sorted.toSeq === before)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName)
    assert(parts.length === 2)
  }

  test("empty batches fold to nothing; the record appears with first data") {
    val dir = Files.createTempDirectory("goldenstream").toString
    GoldenStream.countBatch(slice(1, 100).limit(0), "entity_id", attrs, dir, 0L)
    assert(GoldenStream.goldenRecord(spark, dir, rules).isEmpty)
    GoldenStream.countBatch(slice(1, 100), "entity_id", attrs, dir, 1L)
    assert(GoldenStream.goldenRecord(spark, dir, rules).get.count() > 0)
  }
}
