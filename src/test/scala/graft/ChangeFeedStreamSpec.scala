package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable
import graft.streaming.ChangeFeedStream

/** The change-feed follower: a second table continuously applying a
  * source table's CDC must CONVERGE to the source snapshot after any
  * mix of appends, merges, rewrite deletes and vectored deletes —
  * exactly once, replay-proof, without ever re-reading the source
  * snapshot.
  */
class ChangeFeedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_cfs").toString

  private def snap(root: String): Set[(Long, String)] =
    VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("follower converges to the source through append/merge/delete/dvdelete") {
    val src = freshRoot()
    val dst = freshRoot()
    VersionedTable.commit(
      (1L to 20L).map(i => (i, "base")).toDF("id", "s").repartition(2),
      src, statsColumns = Seq("*"))                                  // v0
    VersionedTable.commit(
      (21L to 25L).map(i => (i, "app")).toDF("id", "s"), src)        // v1
    VersionedTable.merge(spark, src,
      Seq((3L, "upd"), (30L, "ins")).toDF("id", "s"), Seq("id"))     // v2
    VersionedTable.delete(spark, src, col("id") === 7L)              // v3
    VersionedTable.deleteVectored(spark, src, col("id") === 11L)     // v4
    // strict micro-batching: one source version per apply
    val batches = ChangeFeedStream.sync(spark, src, dst, Seq("id"), "f1")
    assert(batches === 5, s"expected 5 single-version batches, got $batches")
    assert(snap(dst) === snap(src))
    assert(ChangeFeedStream.lastConsumed(spark, dst, "f1") === 4L)
    // caught up: another tick is a no-op — nothing lands, no version
    val vBefore = VersionedTable.latestVersion(spark, dst)
    assert(ChangeFeedStream.applyOnce(spark, src, dst, Seq("id"), "f1").isEmpty)
    assert(VersionedTable.latestVersion(spark, dst) === vBefore)
    // new source activity resumes the feed from the watermark
    VersionedTable.commit(Seq((40L, "late")).toDF("id", "s"), src)   // v5
    assert(ChangeFeedStream.sync(spark, src, dst, Seq("id"), "f1") === 1)
    assert(snap(dst) === snap(src))
  }

  test("a coarse batch nets multi-version churn on one key correctly") {
    val src = freshRoot()
    val dst = freshRoot()
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      src, statsColumns = Seq("*"))                                  // v0
    VersionedTable.merge(spark, src, Seq((1L, "a2")).toDF("id", "s"),
      Seq("id"))                                                     // v1
    VersionedTable.delete(spark, src, col("id") === 1L)              // v2
    VersionedTable.merge(spark, src, Seq((1L, "a3")).toDF("id", "s"),
      Seq("id"))                                                     // v3
    // one batch consumes all four versions; the net for id=1 is the
    // LAST post-image, not the intermediate delete
    assert(ChangeFeedStream.sync(spark, src, dst, Seq("id"), "f",
      maxVersions = Int.MaxValue) === 1)
    assert(snap(dst) === Set((1L, "a3"), (2L, "b")))
    // a churn cycle that ends deleted nets to a tombstone
    VersionedTable.merge(spark, src, Seq((2L, "b2")).toDF("id", "s"),
      Seq("id"))                                                     // v4
    VersionedTable.delete(spark, src, col("id") === 2L)              // v5
    ChangeFeedStream.sync(spark, src, dst, Seq("id"), "f",
      maxVersions = Int.MaxValue)
    assert(snap(dst) === Set((1L, "a3")))
  }

  test("replayed applies are skipped by the txn ledger (exactly once)") {
    val src = freshRoot()
    val dst = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "s"), src,
      statsColumns = Seq("*"))
    VersionedTable.commit(Seq((2L, "b")).toDF("id", "s"), src)
    ChangeFeedStream.sync(spark, src, dst, Seq("id"), "f")
    val v = VersionedTable.latestVersion(spark, dst)
    // crash-after-commit redelivery: the engine re-runs the same
    // trigger body; the ledger already records the watermark, so
    // NOTHING lands again
    assert(ChangeFeedStream.applyOnce(spark, src, dst, Seq("id"), "f").isEmpty)
    assert(ChangeFeedStream.sync(spark, src, dst, Seq("id"), "f") === 0)
    assert(VersionedTable.latestVersion(spark, dst) === v)
    assert(snap(dst) === Set((1L, "a"), (2L, "b")))
  }

  test("a LIVE foreachBatch trigger drives the follower exactly once") {
    val src = freshRoot()
    val dst = freshRoot()
    VersionedTable.commit((1L to 10L).map(i => (i, "base")).toDF("id", "s"),
      src, statsColumns = Seq("*"))
    // three tick files; each micro-batch mutates the SOURCE through a
    // txn-guarded op, then drains the follower — the real engine, the
    // real at-least-once delivery
    val ticks = java.nio.file.Files.createTempDirectory("cfs_ticks")
    val ckpt = java.nio.file.Files.createTempDirectory("cfs_ckpt").toString
    (0L to 2L).foreach(i =>
      Seq(i).toDF("tick").coalesce(1).write.parquet(s"$ticks/t$i"))
    def body(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      batch.collect().map(_.getLong(0)).sorted.headOption.foreach {
        case 0L => VersionedTable.streamCommit(
          Seq((21L, "app")).toDF("id", "s"), src, "mut", 0L); ()
        case 1L => VersionedTable.merge(spark, src,
          Seq((3L, "upd")).toDF("id", "s"), Seq("id"),
          txn = Some(("mut2", 1L))); ()
        case _ => VersionedTable.deleteVectored(spark, src,
          col("id") === 7L, txn = Some(("mut3", 2L))); ()
      }
      ChangeFeedStream.sync(spark, src, dst, Seq("id"), "live")
      ()
    }
    def run(checkpoint: String): Unit = {
      val q = spark.readStream
        .schema(Seq(1L).toDF("tick").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$ticks/t*")
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch(body _)
        .start()
      q.processAllAvailable(); q.stop()
    }
    run(ckpt)
    assert(snap(dst) === snap(src))
    assert(snap(dst).size === 10)
    val srcV = VersionedTable.latestVersion(spark, src)
    val dstV = VersionedTable.latestVersion(spark, dst)
    // crash-redelivery: a FRESH checkpoint replays every tick; the
    // txn ledgers (source mutations AND follower applies) skip all of
    // it — nothing lands twice anywhere
    run(java.nio.file.Files.createTempDirectory("cfs_ckpt2").toString)
    assert(VersionedTable.latestVersion(spark, src) === srcV)
    assert(VersionedTable.latestVersion(spark, dst) === dstV)
    assert(snap(dst) === snap(src))
  }

  test("compaction-only slices advance the watermark without data") {
    val src = freshRoot()
    val dst = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "s").coalesce(1), src,
      statsColumns = Seq("*"))
    VersionedTable.commit(Seq((2L, "b")).toDF("id", "s").coalesce(1), src)
    ChangeFeedStream.sync(spark, src, dst, Seq("id"), "f")
    VersionedTable.compact(spark, src, targetPartitions = 1) // data-identical
    assert(ChangeFeedStream.sync(spark, src, dst, Seq("id"), "f") === 1)
    assert(ChangeFeedStream.lastConsumed(spark, dst, "f")
      === VersionedTable.latestVersion(spark, src).get)
    assert(snap(dst) === Set((1L, "a"), (2L, "b")))
    // and the follower does not loop on it
    assert(ChangeFeedStream.sync(spark, src, dst, Seq("id"), "f") === 0)
  }

  test("a metadata-only schema commit does not wedge the follower") {
    val src = freshRoot()
    val dst = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "s").coalesce(1), src,
      statsColumns = Seq("*"))                                       // v0
    VersionedTable.commit(Seq((2L, "b")).toDF("id", "s").coalesce(1), src) // v1
    ChangeFeedStream.sync(spark, src, dst, Seq("id"), "f")
    // rename is DATA-IDENTICAL (changes() emits nothing for it), but
    // its manifest carries a different schema — a range guard over
    // ALL manifests in the slice would refuse every range crossing
    // it, wedging the follower permanently even at maxVersions = 1
    VersionedTable.renameColumn(spark, src, "s", "label")            // v2
    VersionedTable.commit(Seq((3L, "c")).toDF("id", "label").coalesce(1),
      src)                                                           // v3
    // the rename version consumes as a pure watermark advance (no
    // merge runs, so the source's new column names are NOT imposed on
    // a follower that has not mirrored them yet)
    assert(ChangeFeedStream.applyOnce(spark, src, dst, Seq("id"), "f",
      maxVersions = 1).isDefined)
    assert(ChangeFeedStream.lastConsumed(spark, dst, "f") === 2L)
    assert(VersionedTable.read(spark, dst).columns.toSeq === Seq("id", "s"))
    // the operator mirrors the rename, then consumption resumes
    VersionedTable.renameColumn(spark, dst, "s", "label")
    assert(ChangeFeedStream.sync(spark, src, dst, Seq("id"), "f") === 1)
    assert(ChangeFeedStream.lastConsumed(spark, dst, "f") === 3L)
    assert(VersionedTable.read(spark, dst).count() === 3L)
    // a range straddling the rename with emitting versions on BOTH
    // sides still refuses loudly — the union would be incoherent
    VersionedTable.commit(Seq((4L, "d")).toDF("id", "label").coalesce(1), src)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.changes(spark, src, 0L, 4L).collect()
    }
    assert(e.getMessage.contains("row-emitting"))
  }
}
