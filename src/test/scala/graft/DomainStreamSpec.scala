package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.DomainStream

/** Live domain-rollup gates: cumulative report equals the batch
  * operator on the union after EVERY batch (DECIMAL mass included),
  * replay idempotence, compaction, empty batches, and the real
  * micro-batch engine path.
  */
class DomainStreamSpec extends SparkSpec {
  import spark.implicits._

  // a messy URL feed: mixed case, ports, tracking params, three
  // domains across five hosts
  private def slice(seed: Int, n: Int): DataFrame =
    spark.range(n).select(
      (col("id") + seed * 10000L).as("rid"),
      concat(
        when(col("id") % 2 === 0, lit("HTTP://")).otherwise(lit("https://")),
        when(col("id") % 5 === 0, lit("WWW.Alpha.COM"))
          .when(col("id") % 5 === 1, lit("cdn.alpha.com"))
          .when(col("id") % 5 === 2, lit("news.beta.co.uk"))
          .when(col("id") % 5 === 3, lit("m.beta.co.uk"))
          .otherwise(lit("gamma.io")),
        lit("/p/"), col("id").cast("string"),
        when(col("id") % 3 === 0, lit("?utm_source=x")).otherwise(lit("")))
        .as("url"),
      (col("id") % 97).cast("double").as("mass"))

  /** The batch q_domain_stats shape over a plain frame. */
  private def batchRollup(df: DataFrame): DataFrame = {
    val host = graft.functions.UrlFunctions.hostOf(col("url"))
    df.select(
      graft.functions.UrlFunctions.registrableDomain(host).as("domain"),
      host.as("host"), col("mass"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("host")).as("n_hosts"),
        sum(col("mass").cast("decimal(18,2)")).cast("double").as("mass"))
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("live report equals the batch rollup on the union, after every batch") {
    val dir = Files.createTempDirectory("domainstream").toString
    val batches = Seq(slice(1, 500), slice(2, 300), slice(3, 700))
    batches.zipWithIndex.foreach { case (b, i) =>
      DomainStream.countBatch(b, "url", "mass", dir, i.toLong)
      val got = canon(DomainStream.report(spark, dir).get)
      val want = canon(batchRollup(batches.take(i + 1).reduce(_ unionAll _)))
      assert(got === want, s"after batch $i")
    }
  }

  test("replaying a batch overwrites its own partition — counts never double") {
    val dir = Files.createTempDirectory("domainstream").toString
    val batches = Seq(slice(1, 400), slice(2, 350))
    batches.zipWithIndex.foreach { case (b, i) =>
      DomainStream.countBatch(b, "url", "mass", dir, i.toLong)
    }
    val before = canon(DomainStream.report(spark, dir).get)
    DomainStream.countBatch(batches(1), "url", "mass", dir, 1L)
    assert(canon(DomainStream.report(spark, dir).get) === before)
  }

  test("compaction preserves the report; empty batch writes nothing") {
    val dir = Files.createTempDirectory("domainstream").toString
    (0 to 2).foreach(i =>
      DomainStream.countBatch(slice(i, 300 + i * 100), "url", "mass", dir, i.toLong))
    val before = canon(DomainStream.report(spark, dir).get)
    DomainStream.compact(spark, dir)
    assert(canon(DomainStream.report(spark, dir).get) === before)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName)
    assert(parts.length === 2, s"expected compacted + newest, got ${parts.toSeq}")
    DomainStream.countBatch(slice(9, 100).limit(0), "url", "mass", dir, 9L)
    assert(canon(DomainStream.report(spark, dir).get) === before)
  }

  test("the real micro-batch engine converges to the batch rollup") {
    val src = Files.createTempDirectory("domainstream_src")
    val state = Files.createTempDirectory("domainstream_state").toString
    val ckpt = Files.createTempDirectory("domainstream_ckpt").toString
    val batches = Seq(slice(1, 300), slice(2, 200))
    batches.zipWithIndex.foreach { case (b, i) =>
      b.coalesce(1).write.parquet(s"$src/b$i")
    }
    val stream = spark.readStream
      .schema(batches.head.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/b*")
    val q = DomainStream.start(stream, "url", "mass", state, ckpt)
    q.processAllAvailable()
    q.stop()
    assert(canon(DomainStream.report(spark, state).get) ===
      canon(batchRollup(batches.reduce(_ unionAll _))))
  }
}
