package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("exactDedupStream keeps the first arrival of each fingerprint within the horizon") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingDedup.exactDedupStream(docs, "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName("sd")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 00:00:00"), "hello world"),
        (2L, ts("2024-01-01 00:00:30"), "HELLO   world"), // same normalized text
        (3L, ts("2024-01-01 00:01:00"), "different doc"))
      q.processAllAvailable()
      // same content again inside the horizon: still a duplicate
      mem.addData((4L, ts("2024-01-01 00:02:00"), "hello world"))
      q.processAllAvailable()
      val ids = spark.table("sd").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L),
        s"expected first arrivals only, got $ids")
    } finally q.stop()
  }

  test("streaming dedup state is watermark-bounded, not dropDuplicates-unbounded") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingDedup.exactDedupStream(docs, "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName("sdw")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 00:00:00"), "recurring doc"))
      q.processAllAvailable()
      // push the watermark far past the first doc's event time, expiring
      // its fingerprint state; the re-ingested copy is then NOT seen as
      // a duplicate (the documented cross-horizon tradeoff)
      mem.addData((2L, ts("2024-01-01 05:00:00"), "unrelated late doc"))
      q.processAllAvailable()
      mem.addData((3L, ts("2024-01-01 05:00:01"), "recurring doc"))
      q.processAllAvailable()
      val ids = spark.table("sdw").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 3L),
        s"fingerprint state must expire with the watermark, got $ids")
    } finally q.stop()
  }

  test("ingest signatures match the batch dedup operators bit-for-bit") {
    implicit val sql = spark.sqlContext
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(50).cache()

    // streaming plan over a memory source
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.withDedupSignatures(
        mem.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("sigs")
      .outputMode("append").start()
    try {
      mem.addData(fixture.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("sigs")
        .select("doc_id", "fingerprint", "simhash", "minhash_sig")

      val batch = Dedup.withSimHash(fixture, "text", "simhash")
        .withColumn("fingerprint", graft.functions.TextFunctions.fingerprint(col("text")))
        .withColumn("minhash_sig", graft.plans.NativeText.minHashSig(
          graft.plans.NativeText.shingleHash32(
            split(graft.functions.TextFunctions.normalizeText(col("text")), " "), 3), 32))
        .select("doc_id", "fingerprint", "simhash", "minhash_sig")

      assert(streamed.count() == 50)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streaming and batch signatures must be identical")
    } finally q.stop()
  }
}
