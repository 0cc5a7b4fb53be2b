package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.operators.VectorStats
import graft.streaming.EmbeddingDriftStream

/** The streamed shift must EXACTLY equal the batch operator over
  * reference vs the union of every delivered batch — centroid sums
  * are the mergeable representation, so batch boundaries are
  * invisible.
  */
class EmbeddingDriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def slice(k: Int, n: Int): DataFrame =
    (0 until n).map { i =>
      (k * 1000L + i, i % 3,
        Seq((math.cos(i * 0.4 + k) * (1 + k * 0.1)).toFloat,
          (math.sin(i * 0.4 + k)).toFloat))
    }.toDF("vec_id", "label", "embedding")

  private val ref = slice(9, 45)

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def batchShift(cur: DataFrame): Seq[String] =
    canon(VectorStats.centroidShift(ref, cur, "label", "embedding"))

  test("streamed shift equals the batch operator on the union, per batch") {
    val dir = Files.createTempDirectory("edrift").toString
    val write = EmbeddingDriftStream.driftBatch("label", "embedding", s"$dir/store") _
    val refSums = EmbeddingDriftStream.referenceSums(ref, "label", "embedding")
    val batches = Seq(slice(0, 30), slice(1, 20), slice(2, 40))
    batches.zipWithIndex.foreach { case (b, i) =>
      write(b, i.toLong)
      val expect = batchShift(batches.take(i + 1).reduce(_ unionAll _))
      assert(canon(EmbeddingDriftStream.shift(spark, s"$dir/store", refSums))
        === expect, s"after batch $i")
    }
  }

  test("replaying a middle batch is idempotent") {
    val dir = Files.createTempDirectory("edrift").toString
    val write = EmbeddingDriftStream.driftBatch("label", "embedding", s"$dir/store") _
    val refSums = EmbeddingDriftStream.referenceSums(ref, "label", "embedding")
    val batches = Seq(slice(0, 30), slice(1, 20), slice(2, 40))
    batches.zipWithIndex.foreach { case (b, i) => write(b, i.toLong) }
    val before = canon(EmbeddingDriftStream.shift(spark, s"$dir/store", refSums))
    write(batches(1), 1L)
    assert(canon(EmbeddingDriftStream.shift(spark, s"$dir/store", refSums)) === before)
  }

  test("compaction is lossless and later batches keep merging") {
    val dir = Files.createTempDirectory("edrift").toString
    val write = EmbeddingDriftStream.driftBatch("label", "embedding", s"$dir/store") _
    val refSums = EmbeddingDriftStream.referenceSums(ref, "label", "embedding")
    val batches = Seq(slice(0, 30), slice(1, 20), slice(2, 40))
    write(batches(0), 0L); write(batches(1), 1L)
    val before = canon(EmbeddingDriftStream.shift(spark, s"$dir/store", refSums))
    EmbeddingDriftStream.compact(spark, s"$dir/store")
    assert(canon(EmbeddingDriftStream.shift(spark, s"$dir/store", refSums)) === before)
    write(batches(2), 2L)
    assert(canon(EmbeddingDriftStream.shift(spark, s"$dir/store", refSums))
      === batchShift(batches.reduce(_ unionAll _)))
  }

  test("batchless store yields an empty shift, not a crash") {
    val refSums = EmbeddingDriftStream.referenceSums(ref, "label", "embedding")
    assert(EmbeddingDriftStream.shift(
      spark, Files.createTempDirectory("noedrift").toString, refSums).isEmpty)
  }

  test("shift schema is identical before and after the first batch") {
    // a reader that writes both the empty and populated results to one
    // parquet path needs the label column's TYPE stable, not just the
    // column names — the empty case must derive it from refSums
    val dir = Files.createTempDirectory("edrift").toString
    val stringRef = ref.withColumn("label",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("lab_"), $"label"))
    val refSums = EmbeddingDriftStream.referenceSums(stringRef, "label", "embedding")
    val empty = EmbeddingDriftStream.shift(spark, s"$dir/store", refSums)
    EmbeddingDriftStream.driftBatch("label", "embedding", s"$dir/store")(
      stringRef.limit(10), 0L)
    val populated = EmbeddingDriftStream.shift(spark, s"$dir/store", refSums)
    assert(empty.schema === populated.schema)
  }

  test("a real micro-batch stream through the query matches the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("edrift").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Int, Seq[Float])]
    val src = mem.toDF().toDF("vec_id", "label", "embedding")
    val refSums = EmbeddingDriftStream.referenceSums(ref, "label", "embedding")
    val q = EmbeddingDriftStream.driftStream(
      src, "label", "embedding", s"$dir/store", s"$dir/ckpt").start()
    val b0 = slice(0, 12); val b1 = slice(1, 9)
    try {
      mem.addData(b0.as[(Long, Int, Seq[Float])].collect().toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b1.as[(Long, Int, Seq[Float])].collect().toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(canon(EmbeddingDriftStream.shift(spark, s"$dir/store", refSums))
      === batchShift(b0 unionAll b1))
  }
}
