package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class IncrementalDedupSpec extends SparkSpec {

  // documents plus planted near-dups, split into "stored corpus" and
  // "incoming batch" by id residue (both sides keep planted pairs)
  private lazy val all = {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val nd = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 15, lit(20))).as("text"))
    d.union(nd).cache()
  }
  private lazy val corpus = all.filter(col("doc_id") % 5 =!= 0)
  private lazy val batch = all.filter(col("doc_id") % 5 === 0)

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental pairs == full run restricted to batch-touching pairs") {
    val (full, _) = Dedup.minHashCandidates(all, "text", "doc_id")
    val expected = pairSet(full.filter(
      col("id_a") % 5 === 0 || col("id_b") % 5 === 0))
    val (inc, dropped) = Dedup.incrementalCandidates(
      Dedup.bandSignatures(corpus, "text", "doc_id"), batch, "text", "doc_id")
    assert(dropped.isEmpty)
    val got = pairSet(inc)
    assert(got == expected,
      s"missing ${(expected -- got).take(5)}, extra ${(got -- expected).take(5)}")
    assert(got.nonEmpty, "fixture must produce batch-touching pairs")
    assert(got.exists { case (a, b) => a % 5 == 0 && b % 5 == 0 },
      "expected batch-batch pairs too")
  }

  test("stored signatures round-trip through parquet (no corpus rehash needed)") {
    val dir = Files.createTempDirectory("sigstore").toString
    Dedup.bandSignatures(corpus, "text", "doc_id")
      .write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir) // only (id, band) — no text anywhere
    assert(loaded.columns.toSet == Set("id", "band"))
    val (incLive, _) = Dedup.incrementalCandidates(
      Dedup.bandSignatures(corpus, "text", "doc_id"), batch, "text", "doc_id")
    val (incStored, _) = Dedup.incrementalCandidates(
      loaded, batch, "text", "doc_id")
    assert(pairSet(incStored) == pairSet(incLive))
  }

  test("streaming batches against the store discover exactly the full-corpus pairs") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("incstream").toString
    val (storeDir, pairsDir) = (s"$dir/store", s"$dir/pairs")
    val merge = graft.streaming.StreamingDedup.incrementalDedupBatch(
      storeDir, pairsDir, "text", "doc_id") _

    // three arrival waves by id residue; every doc hashed exactly once
    val waves = Seq(
      all.filter(col("doc_id") % 3 === 0),
      all.filter(col("doc_id") % 3 === 1),
      all.filter(col("doc_id") % 3 === 2))
    waves.zipWithIndex.foreach { case (b, i) => merge(b, i.toLong) }

    val streamed = pairSet(spark.read.parquet(pairsDir).select("id_a", "id_b"))
    val (full, _) = Dedup.minHashCandidates(all, "text", "doc_id")
    assert(streamed == pairSet(full),
      "union of per-batch pair outputs must equal the full-corpus run")

    // replay the LAST batch: its store partition already exists, yet
    // output must be byte-identical (the batch_id < N store read
    // restores pre-batch state)
    val before = streamed
    merge(waves(2), 2L)
    val after = pairSet(spark.read.parquet(pairsDir).select("id_a", "id_b"))
    assert(after == before, "replayed batch must be idempotent")

    // backfill an EARLIER batch: batches 1 and 2's store partitions are
    // newer than the replayed id and must be invisible to it
    merge(waves(0), 0L)
    val afterBackfill = pairSet(spark.read.parquet(pairsDir).select("id_a", "id_b"))
    assert(afterBackfill == before, "backfilled earlier batch must be idempotent")
  }

  test("maxBucket counts the full bucket (corpus + batch members)") {
    import spark.implicits._
    // 5 identical docs: 3 stored, 2 incoming -> every band bucket has 5
    val dup = (1L to 5L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val sigs = Dedup.bandSignatures(dup.filter($"doc_id" <= 3), "text", "doc_id")
    val (pairs, dropped) = Dedup.incrementalCandidates(
      sigs, dup.filter($"doc_id" > 3), "text", "doc_id", maxBucket = 4)
    assert(pairs.isEmpty, "buckets of 5 must be dropped at maxBucket=4")
    assert(dropped.count() > 0 &&
      dropped.select(max("bucket_n")).head().getLong(0) == 5L)
  }
}
