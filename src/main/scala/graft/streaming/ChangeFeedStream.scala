package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Streaming CONSUMPTION of a versioned table's change feed — the
  * Delta `readChangeFeed` + `startingVersion` role: a follower table
  * continuously applies another table's CDC without ever re-reading
  * the source snapshot, and without hand-tracking which versions it
  * has seen.
  *
  * Progress tracking is the same exactly-once machinery the write
  * side already uses: the follower's OWN manifest txn map records
  * `readerId → last consumed source version`. Each micro-batch
  *
  *   1. reads the follower's txn record (driver-side, one manifest),
  *   2. pulls `changes(source, lastConsumed, head]` — cost bounded by
  *      the slice's touched files, never the source table,
  *   3. nets the slice per key (latest version wins; within a
  *      version the post-image beats the pre-image, so an update
  *      applies as its new row), and
  *   4. applies it as ONE txn-guarded [[VersionedTable.merge]] keyed
  *      on `keys`, with net deletes as tombstones.
  *
  * Crash-before-commit replays the slice (merge's txn skips nothing —
  * the batch never landed); crash-after-commit re-delivery is skipped
  * by the txn record. Either way the follower applies each source
  * version EXACTLY once — the foreachBatch at-least-once contract
  * upgraded end to end, same as the engine's other streaming sinks.
  *
  * Scale shape: the netting window partitions by the merge keys over
  * only the slice's change rows, and the apply inherits merge's three
  * bounded phases (zone-map prune on the slice's key bounds → touch
  * probe → touched-file rewrite) — a trickle of source commits costs
  * O(slice) per batch on a 100 TB follower.
  */
object ChangeFeedStream {

  /** The last source version `readerId` has applied to `followerRoot`,
    * or -1 when nothing has been consumed yet (also when the follower
    * table does not exist).
    */
  def lastConsumed(spark: SparkSession, followerRoot: String,
      readerId: String): Long =
    VersionedTable.latestVersion(spark, followerRoot)
      .map(v => VersionedTable.manifest(spark, followerRoot, v)
        .txn.getOrElse(readerId, -1L))
      .getOrElse(-1L)

  /** Apply the next unconsumed CDC slice of `sourceRoot` onto
    * `followerRoot` (keyed on `keys`), consuming up to `maxVersions`
    * source versions in this batch. Returns the follower version
    * committed, or None when the follower is already caught up (or
    * the slice nets to a no-op — the consumed watermark still
    * advances through an empty txn-guarded merge in that case).
    *
    * The SOURCE table must be key-unique on `keys` (the serving-table
    * shape merge itself enforces); a slice with two post-images for
    * one key fails loudly rather than applying either.
    */
  def applyOnce(spark: SparkSession, sourceRoot: String,
      followerRoot: String, keys: Seq[String], readerId: String,
      maxVersions: Int = Int.MaxValue): Option[Long] = {
    require(keys.nonEmpty, "changefeed apply requires merge keys")
    require(maxVersions >= 1, s"maxVersions must be >= 1, got $maxVersions")
    val head = VersionedTable.latestVersion(spark, sourceRoot).getOrElse(
      throw new java.io.IOException(
        s"no committed version under source $sourceRoot"))
    val from = lastConsumed(spark, followerRoot, readerId)
    if (from >= head) return None // caught up
    val to = math.min(head, from + maxVersions)
    // bootstrap: an empty follower seeded with the source's schema so
    // the first slice applies through the same merge path
    if (VersionedTable.latestVersion(spark, followerRoot).isEmpty) {
      val schema = org.apache.spark.sql.types.DataType
        .fromJson(VersionedTable.manifest(spark, sourceRoot, to).schemaJson
          .getOrElse(throw new java.io.IOException(
            s"source $sourceRoot has no recorded schema")))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      VersionedTable.commit(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
        followerRoot, statsColumns = Seq("*"))
    }
    // a slice of ONLY data-identical commits (compact/stats/rename/
    // drop/widen) advances the watermark without touching merge at
    // all: the netted frame would be empty anyway, and binding it
    // through merge would impose the source's post-rename column
    // names on a follower that has not mirrored the rename — wedging
    // the feed on a batch that carries no rows. Driver-side manifest
    // modes decide; zero data jobs run.
    val dataIdentical =
      Set("compact", "stats", "rename", "drop", "widen", "constraint")
    if (((from + 1) to to).forall(v =>
        dataIdentical(VersionedTable.manifest(spark, sourceRoot, v).mode))) {
      val advanced = VersionedTable.streamCommit(
        VersionedTable.read(spark, followerRoot).limit(0),
        followerRoot, readerId, to)
      return Some(advanced.getOrElse(
        VersionedTable.latestVersion(spark, followerRoot).get))
    }
    val ch = VersionedTable.changes(spark, sourceRoot, from, to)
    // net effect per key across the slice: the latest version's
    // change wins; within one version an insert (post-image) beats
    // the delete (pre-image) — that pair IS an update
    val ranked = ch.withColumn("_rk", row_number().over(
      Window.partitionBy(keys.map(col): _*)
        .orderBy(col("_commit_version").desc,
          when(col("_change_type") === "insert", 0).otherwise(1))))
      .filter(col("_rk") === 1)
      .withColumn("_graft_cdc_tombstone", col("_change_type") === "delete")
      .drop("_rk", "_change_type", "_commit_version")
    val committed = VersionedTable.merge(spark, followerRoot, ranked, keys,
      deleteMatched = Some(col("_graft_cdc_tombstone")),
      txn = Some((readerId, to)))
    // a slice that nets to nothing (compactions only, an update cycle
    // that cancels) must still advance the watermark, or the follower
    // would re-pull it forever: land a zero-row txn commit through
    // the streaming append path (same readerId ledger)
    val advanced = committed.orElse(VersionedTable.streamCommit(
      VersionedTable.read(spark, followerRoot).limit(0),
      followerRoot, readerId, to))
    Some(advanced.getOrElse(
      VersionedTable.latestVersion(spark, followerRoot).get))
  }

  /** Drain the feed: apply batches until the follower has consumed
    * the source's head version. Returns the number of apply batches
    * that ran. This is the loop a foreachBatch trigger body runs once
    * per tick; callers wanting strict micro-batching pass
    * `maxVersions = 1`.
    */
  def sync(spark: SparkSession, sourceRoot: String, followerRoot: String,
      keys: Seq[String], readerId: String, maxVersions: Int = 1): Int = {
    var n = 0
    while (applyOnce(spark, sourceRoot, followerRoot, keys, readerId,
        maxVersions).isDefined) n += 1
    n
  }
}
