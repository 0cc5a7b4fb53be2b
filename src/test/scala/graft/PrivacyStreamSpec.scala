package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Privacy
import graft.streaming.PrivacyStream

/** The live privacy monitor's parity contract: every report off the
  * cumulative (quasi × sensitive) count store equals its batch
  * operator on the union of delivered batches — after EVERY batch —
  * plus the store mechanics (replay overwrite, compaction, empty
  * batches).
  */
class PrivacyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val quasi = Seq("zip", "gender")

  private def slice(seed: Int, n: Int): DataFrame =
    spark.range(n).select(
      concat(lit("02"), lpad((col("id") * (7 + seed) % 4).cast("string"), 3, "1")).as("zip"),
      when(col("id") % 2 === 0, lit("f")).otherwise(lit("m")).as("gender"),
      (col("id") * (3 + seed) % 5).cast("string").as("dx"))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("all four live reports equal their batch operators after every batch") {
    val dir = Files.createTempDirectory("privstream").toString
    val batches = Seq(slice(1, 400), slice(2, 300), slice(3, 500))
    batches.zipWithIndex.foreach { case (b, i) =>
      PrivacyStream.countBatch(b, quasi, "dx", dir, i.toLong)
      val union = batches.take(i + 1).reduce(_ unionAll _)
      assert(canon(PrivacyStream.kAnonymity(spark, dir, quasi, "dx", 5L).get)
        === canon(Privacy.kAnonymity(union, quasi, 5L)), s"kAnonymity after $i")
      assert(canon(PrivacyStream.lDiversity(spark, dir, quasi, "dx", 5L, 3L).get)
        === canon(Privacy.lDiversity(union, quasi, "dx", 5L, 3L)), s"lDiversity after $i")
      assert(canon(PrivacyStream.tCloseness(spark, dir, quasi, "dx", 0.2).get)
        === canon(Privacy.tCloseness(union, quasi, "dx", 0.2)), s"tCloseness after $i")
      // epoch = batch id: each release over the grown store draws
      // fresh noise but still equals the batch operator AT that epoch
      assert(canon(PrivacyStream.dpRelease(spark, dir, quasi, "dx", 1.0, 5.0, 42L, i.toLong).get)
        === canon(Privacy.dpRelease(union, quasi, 1.0, 5.0, 42L, i.toLong)), s"dpRelease after $i")
    }
    // the per-epoch releases of the FINAL store differ from each other
    // (fresh noise per epoch — serial releases can't be differenced)
    val rel = (0L to 2L).map(e =>
      canon(PrivacyStream.dpRelease(spark, dir, quasi, "dx", 1.0, -100.0, 42L, e).get))
    assert(rel.distinct.size === 3, "epochs drew identical noise")
  }

  test("replaying a batch overwrites its own partition — counts never double") {
    val dir = Files.createTempDirectory("privstream").toString
    val batches = Seq(slice(1, 300), slice(2, 200))
    batches.zipWithIndex.foreach { case (b, i) =>
      PrivacyStream.countBatch(b, quasi, "dx", dir, i.toLong)
    }
    val before = canon(PrivacyStream.kAnonymity(spark, dir, quasi, "dx", 5L).get)
    PrivacyStream.countBatch(batches(1), quasi, "dx", dir, 1L) // replay
    assert(canon(PrivacyStream.kAnonymity(spark, dir, quasi, "dx", 5L).get) === before)
  }

  test("compaction preserves every report and shrinks the store") {
    val dir = Files.createTempDirectory("privstream").toString
    val batches = Seq(slice(1, 250), slice(2, 350), slice(3, 450))
    batches.zipWithIndex.foreach { case (b, i) =>
      PrivacyStream.countBatch(b, quasi, "dx", dir, i.toLong)
    }
    val k0 = canon(PrivacyStream.kAnonymity(spark, dir, quasi, "dx", 5L).get)
    val t0 = canon(PrivacyStream.tCloseness(spark, dir, quasi, "dx", 0.2).get)
    PrivacyStream.compact(spark, dir, quasi, "dx")
    assert(canon(PrivacyStream.kAnonymity(spark, dir, quasi, "dx", 5L).get) === k0)
    assert(canon(PrivacyStream.tCloseness(spark, dir, quasi, "dx", 0.2).get) === t0)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName)
    assert(parts.length === 2, s"expected compacted + newest, got ${parts.toSeq}")
  }

  test("empty batches fold to nothing; reports appear with the first data") {
    val dir = Files.createTempDirectory("privstream").toString
    PrivacyStream.countBatch(slice(1, 100).limit(0), quasi, "dx", dir, 0L)
    assert(PrivacyStream.kAnonymity(spark, dir, quasi, "dx", 5L).isEmpty)
    PrivacyStream.countBatch(slice(1, 100), quasi, "dx", dir, 1L)
    assert(PrivacyStream.kAnonymity(spark, dir, quasi, "dx", 5L).get.count() > 0)
  }
}
