package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Anomaly
import graft.streaming.RateStream

/** The live control chart's parity contract: the cumulative report
  * equals the batch operator on the union after every batch —
  * including the zero-filled grid EXPANDING as later batches widen
  * the hour span — plus replay and compaction.
  */
class RateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def slice(fromHour: Int, toHour: Int, perHour: Int): DataFrame =
    (for (h <- fromHour until toHour; i <- 0 until perHour)
      yield ("api", h * 3600 + i)).toDF("event_type", "s")
      .select(col("event_type"),
        timestamp_seconds(lit(1700000000L) + col("s")).as("ts"))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("the live report equals the batch chart on the union, after every batch") {
    val dir = Files.createTempDirectory("ratestream").toString
    val batches = Seq(slice(0, 3, 5), slice(3, 6, 9), slice(8, 10, 2))
    batches.zipWithIndex.foreach { case (b, i) =>
      RateStream.countBatch(b, "event_type", "ts", dir, i.toLong)
      val got = canon(RateStream.report(spark, dir, "event_type").get)
      val want = canon(Anomaly.rateAnomaly(
        batches.take(i + 1).reduce(_ unionAll _), "event_type", "ts"))
      assert(got === want, s"after batch $i")
    }
    // batch 3 skipped hours 6-7: the widened grid zero-fills them
    val dark = RateStream.report(spark, dir, "event_type").get
      .filter(col("n_events") === 0).count()
    assert(dark == 2L, "the gap hours must appear as zero rows")
  }

  test("replaying a batch overwrites its own partition — counts never double") {
    val dir = Files.createTempDirectory("ratestream").toString
    val batches = Seq(slice(0, 2, 4), slice(2, 4, 6))
    batches.zipWithIndex.foreach { case (b, i) =>
      RateStream.countBatch(b, "event_type", "ts", dir, i.toLong)
    }
    val before = canon(RateStream.report(spark, dir, "event_type").get)
    RateStream.countBatch(batches(1), "event_type", "ts", dir, 1L) // replay
    assert(canon(RateStream.report(spark, dir, "event_type").get) === before)
  }

  test("compaction preserves the report and shrinks the store") {
    val dir = Files.createTempDirectory("ratestream").toString
    val batches = Seq(slice(0, 2, 3), slice(1, 3, 4), slice(3, 5, 5))
    batches.zipWithIndex.foreach { case (b, i) =>
      RateStream.countBatch(b, "event_type", "ts", dir, i.toLong)
    }
    val before = canon(RateStream.report(spark, dir, "event_type").get)
    RateStream.compact(spark, dir, "event_type")
    assert(canon(RateStream.report(spark, dir, "event_type").get) === before)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName)
    assert(parts.length === 2, s"expected compacted + newest, got ${parts.toSeq}")
  }
}
