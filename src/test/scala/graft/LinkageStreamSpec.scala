package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.LinkField
import graft.streaming.LinkageStream

/** The incremental entity-resolution contract: per-batch scored
  * verdicts union to the one-shot batch linkage (a pair lands exactly
  * once, when its right-side row arrives), replay overwrites its own
  * partition, and the per-batch maxBlock guard files its drop report
  * under the batch that tripped it.
  */
class LinkageStreamSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    LinkField("l_name", "r_name", m = 0.9, u = 0.1, maxDist = 1),
    LinkField("l_city", "r_city", m = 0.8, u = 0.2))

  private lazy val reference = Seq(
    (1L, "b1", "alice", "rome"),
    (2L, "b2", "bobby", "oslo"),
    (3L, "b3", "carol", "lima")).toDF("l_id", "l_block", "l_name", "l_city")

  private def arrivals(seed: Int): DataFrame = Seq(
    (10L + seed, "b1", "alicx", "rome"),
    (20L + seed, "b2", "bobbz", "kiev"),
    (30L + seed, "b3", "carol", "lima")).toDF("r_id", "r_block", "r_name", "r_city")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def fold(dir: String, batches: Seq[DataFrame], maxBlock: Long = 0L): Unit =
    batches.zipWithIndex.foreach { case (b, i) =>
      LinkageStream.linkBatch(reference, b, Seq(("l_block", "r_block")),
        fields, keep = Seq("l_id", "r_id"), upper = 2.0, lower = -0.5,
        pairsDir = dir, batchId = i.toLong, maxBlock = maxBlock)
    }

  test("the verdict union equals the one-shot batch linkage, after every batch") {
    val dir = Files.createTempDirectory("linkstream").toString
    val batches = Seq(arrivals(0), arrivals(1), arrivals(2))
    batches.zipWithIndex.foreach { case (b, i) =>
      LinkageStream.linkBatch(reference, b, Seq(("l_block", "r_block")),
        fields, keep = Seq("l_id", "r_id"), upper = 2.0, lower = -0.5,
        pairsDir = dir, batchId = i.toLong)
      val got = canon(LinkageStream.verdicts(spark, dir).get.drop("batch_id"))
      val want = canon(RecordLinkage.link(
        reference, batches.take(i + 1).reduce(_ unionAll _),
        Seq(("l_block", "r_block")), fields, keep = Seq("l_id", "r_id"),
        upper = 2.0, lower = -0.5)._1)
      assert(got === want, s"after batch $i")
    }
  }

  test("replaying a batch overwrites its own partition — verdicts never double") {
    val dir = Files.createTempDirectory("linkstream").toString
    val batches = Seq(arrivals(0), arrivals(1))
    fold(dir, batches)
    val before = canon(LinkageStream.verdicts(spark, dir).get)
    fold(dir, Seq(batches.head)) // crash-recovery replay of batch 0
    assert(canon(LinkageStream.verdicts(spark, dir).get) === before)
  }

  test("the per-batch maxBlock guard drops and reports under its batch") {
    val dir = Files.createTempDirectory("linkstream").toString
    // batch with 4 rows in block b1: 1(left)x4 = 4 pairs > 3 cap
    val fat = Seq.tabulate(4)(i => (100L + i, "b1", "alice", "rome"))
      .toDF("r_id", "r_block", "r_name", "r_city")
    LinkageStream.linkBatch(reference, fat, Seq(("l_block", "r_block")),
      fields, keep = Seq("l_id", "r_id"), upper = 2.0, lower = -0.5,
      pairsDir = dir, batchId = 0L, maxBlock = 3L)
    val dropped = spark.read.parquet(s"$dir/__dropped__/batch_id=0")
    assert(dropped.select("l_block").as[String].collect().toSeq == Seq("b1"))
    // the surviving store holds no b1 verdicts
    assert(LinkageStream.verdicts(spark, dir).get
      .filter(col("r_id") >= 100L).count() == 0)
  }

  test("empty batches write nothing") {
    val dir = Files.createTempDirectory("linkstream").toString
    LinkageStream.linkBatch(reference, arrivals(0).limit(0),
      Seq(("l_block", "r_block")), fields, keep = Seq("l_id", "r_id"),
      upper = 2.0, lower = -0.5, pairsDir = dir, batchId = 0L)
    assert(LinkageStream.verdicts(spark, dir).isEmpty)
  }
}
