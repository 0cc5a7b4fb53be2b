package graft

import org.apache.spark.sql.DataFrame

import graft.sources.VersionedTable

/** The Kafka-offset exactly-once seam
  * ([[VersionedTable.streamCommitOffsets]]), gated against a SIMULATED
  * offset source (no broker in this harness): a per-topic-partition
  * log of (tp, offset, payload) rows batched by offset ranges, with
  * at-least-once delivery simulated by literally re-committing ranges.
  */
class VersionedTableOffsetSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_vto").toString

  // the simulated source: offsets 0..19 on two partitions
  private lazy val log: Seq[(String, Long, String)] =
    for (tp <- Seq("t-0", "t-1"); o <- 0L until 20L)
      yield (tp, o, s"$tp/$o")

  private def batch(ranges: Map[String, (Long, Long)]): DataFrame =
    log.filter { case (tp, o, _) =>
      ranges.get(tp).exists { case (s, e) => o >= s && o < e }
    }.toDF("tp", "off", "payload")

  private def commit(root: String, ranges: Map[String, (Long, Long)]) =
    VersionedTable.streamCommitOffsets(
      batch(ranges), root, "w1", ranges, statsColumns = Seq("*"))

  test("a replayed offset range lands zero rows") {
    val root = freshRoot()
    val b1 = Map("t-0" -> (0L, 5L), "t-1" -> (0L, 3L))
    assert(commit(root, b1).nonEmpty)
    assert(VersionedTable.read(spark, root).count() === 8L)
    // at-least-once redelivery: the SAME ranges replay -> skip
    assert(commit(root, b1).isEmpty, "replay committed rows")
    assert(VersionedTable.read(spark, root).count() === 8L)
    // the next batch advances; replaying batch ONE again still skips
    val b2 = Map("t-0" -> (5L, 9L), "t-1" -> (3L, 6L))
    assert(commit(root, b2).nonEmpty)
    assert(commit(root, b1).isEmpty, "stale replay after later batches")
    assert(commit(root, b2).isEmpty)
    assert(VersionedTable.read(spark, root).count() === 15L)
    // the ledger is visible commit over commit
    val m = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m.txn === Map("w1:t-0" -> 9L, "w1:t-1" -> 6L))
  }

  test("misaligned replays refuse loudly instead of guessing") {
    val root = freshRoot()
    assert(commit(root, Map("t-0" -> (0L, 5L), "t-1" -> (0L, 3L))).nonEmpty)
    // a range the ledger TEARS (recorded end 5 inside [3, 9))
    val torn = intercept[IllegalStateException] {
      commit(root, Map("t-0" -> (3L, 9L)))
    }
    assert(torn.getMessage.contains("strictly inside"))
    // a batch where only SOME partitions are already committed
    val partial = intercept[IllegalStateException] {
      commit(root, Map("t-0" -> (0L, 5L), "t-1" -> (3L, 6L)))
    }
    assert(partial.getMessage.contains("PARTIALLY committed"))
    // nothing leaked through either refusal
    assert(VersionedTable.read(spark, root).count() === 8L)
  }

  test("idle (empty) partition ranges neither block nor advance the ledger") {
    val root = freshRoot()
    assert(commit(root, Map("t-0" -> (0L, 5L), "t-1" -> (0L, 3L))).nonEmpty)
    // the Kafka shape: a caught-up partition contributes [e, e) while
    // others carry rows — this must be a normal commit, not a
    // false-positive PARTIAL refusal
    assert(commit(root, Map("t-0" -> (5L, 5L), "t-1" -> (3L, 6L))).nonEmpty)
    assert(VersionedTable.read(spark, root).count() === 11L)
    val m = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m.txn === Map("w1:t-0" -> 5L, "w1:t-1" -> 6L),
      "an empty range must not advance its ledger entry")
    // an all-idle batch is a no-op skip, not a version bump
    val vBefore = VersionedTable.latestVersion(spark, root)
    assert(commit(root, Map("t-0" -> (5L, 5L), "t-1" -> (6L, 6L))).isEmpty)
    assert(VersionedTable.latestVersion(spark, root) === vBefore)
  }

  test("distinct writers keep independent ledgers; batchId ledger coexists") {
    val root = freshRoot()
    assert(commit(root, Map("t-0" -> (0L, 5L))).nonEmpty)
    // another writer consuming the SAME ranges is not deduped
    assert(VersionedTable.streamCommitOffsets(
      batch(Map("t-0" -> (0L, 5L))), root, "w2",
      Map("t-0" -> (0L, 5L))).nonEmpty)
    // and the classic batchId ledger shares the txn map peacefully
    assert(VersionedTable.streamCommit(
      Seq(("x", 0L, "p")).toDF("tp", "off", "payload"), root, "w3", 1L)
      .nonEmpty)
    val m = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m.txn === Map("w1:t-0" -> 5L, "w2:t-0" -> 5L, "w3" -> 1L))
    assert(VersionedTable.read(spark, root).count() === 11L)
  }
}
