package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Drift
import graft.streaming.DriftStream

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  // three arriving document slices with shifting length shapes
  private def slice(seed: Int, n: Int): DataFrame =
    spark.range(n).select(
      when(col("id") % 3 === 0, "web").otherwise("books").as("source"),
      ((col("id") * (7 + seed) + seed * 13) % 12).cast("long").as("bucket"))

  private def chi2(df: DataFrame): Map[String, (Long, Double)] =
    Drift.chi2FromCounts(
      df.groupBy("source", "bucket").agg(count(lit(1)).as("o")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private def logAt(dir: String, b: Long): Map[String, (Long, Double)] =
    DriftStream.driftLog(spark, s"$dir/drift")
      .filter(col("batch_id") === b)
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("chi2"))).toMap

  test("cumulative streaming drift equals the batch operator on the union") {
    val dir = Files.createTempDirectory("drift").toString
    val write = DriftStream.driftBatch(s"$dir/store", s"$dir/drift") _
    val batches = Seq(slice(1, 300), slice(5, 200), slice(9, 400))
    batches.zipWithIndex.foreach { case (b, i) => write(b, i.toLong) }
    for (k <- 0 until 3) {
      val expect = chi2(batches.take(k + 1).reduce(_ unionAll _))
      assert(logAt(dir, k.toLong) === expect, s"batch $k")
    }
  }

  test("live PSI over the streamed count store equals the batch PSI on the union") {
    val dir = Files.createTempDirectory("drift").toString
    val write = DriftStream.driftBatch(s"$dir/store", s"$dir/drift") _
    val batches = Seq(slice(1, 300), slice(5, 200), slice(9, 400))
    batches.zipWithIndex.foreach { case (b, i) => write(b, i.toLong) }
    val expect = Drift.psiFromCounts(
      batches.reduce(_ unionAll _)
        .groupBy("source", "bucket").agg(count(lit(1)).as("o")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val got = DriftStream.psi(spark, s"$dir/store")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === expect)
    assert(got.values.forall(v => v._2 >= 0.0), "PSI is non-negative")
    // batchless store -> empty frame, not a crash
    assert(DriftStream.psi(
      spark, Files.createTempDirectory("nodrift").toString).isEmpty)
  }

  test("replaying a middle batch is idempotent") {
    val dir = Files.createTempDirectory("drift").toString
    val write = DriftStream.driftBatch(s"$dir/store", s"$dir/drift") _
    val batches = Seq(slice(1, 300), slice(5, 200), slice(9, 400))
    batches.zipWithIndex.foreach { case (b, i) => write(b, i.toLong) }
    val before = logAt(dir, 1L)
    write(batches(1), 1L) // replay: must see only batch 0's store
    assert(logAt(dir, 1L) === before)
    assert(DriftStream.driftLog(spark, s"$dir/drift").count() === 6L) // 3 batches x 2 sources
  }

  test("a drifting source's chi-square moves while a stable one's settles") {
    val dir = Files.createTempDirectory("drift").toString
    val write = DriftStream.driftBatch(s"$dir/store", s"$dir/drift") _
    // chi-square is per-source against the CORPUS-WIDE blend, so the
    // stable source must be the majority (5/6 of rows) to anchor the
    // blend — with equal sizes a one-source collapse shifts the blend
    // to the midpoint and both sources deviate symmetrically.
    // batch 0: both sources uniform; batch 1: web collapses to bucket 3
    val b0 = spark.range(600).select(
      when(col("id") % 6 === 0, "web").otherwise("books").as("source"),
      (col("id") % 12).cast("long").as("bucket"))
    val b1 = spark.range(600).select(
      when(col("id") % 6 === 0, "web").otherwise("books").as("source"),
      when(col("id") % 6 === 0, 3L).otherwise(col("id") % 12).cast("long").as("bucket"))
    write(b0, 0L); write(b1, 1L)
    val at0 = logAt(dir, 0L)
    val at1 = logAt(dir, 1L)
    assert(at1("web")._2 > at0("web")._2 + 50.0,
      s"collapsed source must spike: ${at0("web")} -> ${at1("web")}")
    assert(at1("web")._2 > at1("books")._2 * 3,
      s"the drifting minority must dominate the stable majority: $at1")
  }
}
