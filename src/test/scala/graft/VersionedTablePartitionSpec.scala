package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Hive-style partition columns on the versioned table: `col=value/`
  * directory layout under each commit dir, partition values recorded
  * as exact (min = max) zone-map stats off the path, so partition
  * pruning IS zone-map pruning — one routine, no second prune path.
  * Every mutating op (append, delete, merge, replaceWhere, compact,
  * vacuum) must preserve the layout and the pruning.
  */
class VersionedTablePartitionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_vtp").toString

  private def sample = Seq(
    (1L, "2020-01-01", "a"), (2L, "2020-01-01", "b"),
    (3L, "2020-01-02", "c"), (4L, "2020-01-02", "d"),
    (5L, "2020-01-03", "e"))
    .toDF("id", "d", "s").withColumn("d", col("d").cast("date"))

  test("partitioned commit lays out col=value dirs and reads back typed") {
    val root = freshRoot()
    VersionedTable.commit(sample, root, partitionBy = Seq("d"))
    val m = VersionedTable.manifest(spark, root, 0L)
    assert(m.partitionBy === Seq("d"))
    assert(m.files.nonEmpty && m.files.forall(_.contains("/d=2020-01-0")),
      s"partition segments missing from rels: ${m.files}")
    val back = VersionedTable.read(spark, root)
    assert(back.schema("d").dataType.typeName === "date")
    assert(back.collect().map(r => (r.getLong(0), r.getDate(1).toString,
      r.getString(2))).sortBy(_._1).toSeq === Seq(
      (1L, "2020-01-01", "a"), (2L, "2020-01-01", "b"),
      (3L, "2020-01-02", "c"), (4L, "2020-01-02", "d"),
      (5L, "2020-01-03", "e")))
  }

  test("partition predicates prune to exactly the partition's files — stats off") {
    val root = freshRoot()
    // NO statsColumns: partition stats come off the path alone
    VersionedTable.commit(sample, root, partitionBy = Seq("d"))
    val (kept, dropped) = VersionedTable.pruneFiles(spark, root,
      col("d") === lit("2020-01-02").cast("date"))
    assert(kept.forall(_.contains("d=2020-01-02")) && kept.nonEmpty)
    assert(dropped.nonEmpty && dropped.forall(!_.contains("d=2020-01-02")))
    // range shape prunes too (min = max bounds are ordinary zone maps)
    val (k2, _) = VersionedTable.pruneFiles(spark, root,
      col("d") >= lit("2020-01-03").cast("date"))
    assert(k2.forall(_.contains("d=2020-01-03")) && k2.nonEmpty)
    // the pruned read is exact
    assert(VersionedTable.readWhere(spark, root,
      col("d") === lit("2020-01-02").cast("date"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
    // rowCount honest: partition-only stats carry no row counts
    assert(VersionedTable.rowCount(spark, root).isEmpty)
    // analyze backfills the placeholder entries and keeps pruning
    assert(VersionedTable.analyzeStats(spark, root).nonEmpty)
    assert(VersionedTable.rowCount(spark, root) === Some(5L))
    val (k3, d3) = VersionedTable.pruneFiles(spark, root,
      col("d") === lit("2020-01-01").cast("date"))
    assert(k3.forall(_.contains("d=2020-01-01")) && d3.nonEmpty)
  }

  test("appends inherit the partition spec; contradictions fail loudly") {
    val root = freshRoot()
    VersionedTable.commit(sample, root, partitionBy = Seq("d"),
      statsColumns = Seq("*"))
    // plain append inherits the layout
    val extra = Seq((6L, "2020-01-03", "f")).toDF("id", "d", "s")
      .withColumn("d", col("d").cast("date"))
    VersionedTable.commit(extra, root)
    val m = VersionedTable.manifest(spark, root, 1L)
    assert(m.partitionBy === Seq("d"))
    assert(m.files.forall(_.contains("/d=")), s"append broke layout: ${m.files}")
    assert(VersionedTable.read(spark, root).count() === 6L)
    // a contradictory spec is rejected
    intercept[IllegalArgumentException] {
      VersionedTable.commit(extra, root, partitionBy = Seq("s"))
    }
    // partitioning an unpartitioned table without overwrite is rejected
    val flat = freshRoot()
    VersionedTable.commit(sample, flat)
    intercept[IllegalArgumentException] {
      VersionedTable.commit(extra, flat, partitionBy = Seq("d"))
    }
    // overwrite may repartition
    VersionedTable.commit(sample, flat, overwrite = true,
      partitionBy = Seq("d"))
    assert(VersionedTable.manifest(spark, flat, 1L).partitionBy === Seq("d"))
  }

  test("delete, merge and replaceWhere preserve the partitioned layout") {
    val root = freshRoot()
    VersionedTable.commit(sample, root, partitionBy = Seq("d"),
      statsColumns = Seq("*"))
    // delete: partial hit inside one partition rewrites THERE only
    VersionedTable.delete(spark, root, col("id") === 3L)
    val m1 = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m1.files.forall(_.contains("/d=")), s"delete broke layout: ${m1.files}")
    assert(VersionedTable.read(spark, root).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 4L, 5L))
    // merge: update + insert, layout preserved, partition pruning intact
    val src = Seq((4L, "2020-01-02", "D"), (9L, "2020-01-04", "i"))
      .toDF("id", "d", "s").withColumn("d", col("d").cast("date"))
    VersionedTable.merge(spark, root, src, Seq("id"))
    val m2 = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m2.files.forall(_.contains("/d=")), s"merge broke layout: ${m2.files}")
    val rows = VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(rows(4L) === "D" && rows(9L) === "i" && rows.size === 5)
    val (kept, _) = VersionedTable.pruneFiles(spark, root,
      col("d") === lit("2020-01-04").cast("date"))
    assert(kept.nonEmpty && kept.forall(_.contains("d=2020-01-04")))
    // per-partition replaceWhere: the partition's files drop wholesale
    val repl = Seq((7L, "2020-01-01", "z")).toDF("id", "d", "s")
      .withColumn("d", col("d").cast("date"))
    VersionedTable.replaceWhere(spark, root, repl,
      col("d") === lit("2020-01-01").cast("date"))
    val fin = VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(fin === Map(7L -> "z", 4L -> "D", 5L -> "e", 9L -> "i"))
  }

  test("compact preserves partitioning; vacuum sweeps partition subdirs file-granularly") {
    val root = freshRoot()
    VersionedTable.commit(sample, root, partitionBy = Seq("d"),
      statsColumns = Seq("*"))
    VersionedTable.delete(spark, root, col("id") === 1L) // rewrites d=2020-01-01
    VersionedTable.commit(Seq((8L, "2020-01-03", "h")).toDF("id", "d", "s")
      .withColumn("d", col("d").cast("date")), root)
    VersionedTable.compact(spark, root, targetPartitions = 1)
    val m = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m.files.forall(_.contains("/d=")), s"compact broke layout: ${m.files}")
    assert(VersionedTable.read(spark, root).count() === 5L)
    // vacuum to 1 version: the rewritten-away v0 file inside the
    // partition subdir must be destroyed, the live ones kept
    VersionedTable.vacuum(spark, root, keepVersions = 1)
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val left = {
      val it = f.listFiles(new Path(root, "data"), true)
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString).toSeq
    }
    assert(left.size === m.files.size,
      s"vacuum left ${left.size} files for ${m.files.size} live: $left")
    assert(VersionedTable.read(spark, root).count() === 5L)
  }

  test("compactWhere bin-packs ONE partition; the others never move") {
    val root = freshRoot()
    // a day of trickle appends: 5 small files land in d=2020-01-01,
    // one healthy file in each other partition
    VersionedTable.commit(sample, root, partitionBy = Seq("d"),
      statsColumns = Seq("*"))
    (10L to 14L).foreach(i => VersionedTable.commit(
      Seq((i, "2020-01-01", s"t$i")).toDF("id", "d", "s")
        .withColumn("d", col("d").cast("date")).coalesce(1), root))
    val before = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    val day1 = before.files.filter(_.contains("d=2020-01-01"))
    val others = before.files.filterNot(_.contains("d=2020-01-01")).toSet
    assert(day1.size >= 6)
    VersionedTable.compactWhere(spark, root,
      col("d") === lit("2020-01-01").cast("date"), statsColumns = Seq("*"))
    val after = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    // the other partitions' files carried through untouched
    assert(others.subsetOf(after.files.toSet),
      "compactWhere moved files outside the target partition")
    val day1After = after.files.filter(_.contains("d=2020-01-01"))
    assert(day1After.size < day1.size,
      s"partition not bin-packed: ${day1.size} -> ${day1After.size}")
    assert(day1After.forall(f => !day1.contains(f)))
    // data identical
    assert(VersionedTable.read(spark, root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
      === ((1L to 5L) ++ (10L to 14L)).sorted)
    // a predicate matching nothing is a no-op
    assert(VersionedTable.compactWhere(spark, root,
      col("d") === lit("1990-01-01").cast("date")).isEmpty)
  }

  test("bloom sidecars prune point lookups inside partition subdirs") {
    val root = freshRoot()
    // ids hash-scatter across partitions: zone maps alone keep every
    // file for a point lookup on id; the blooms must prove absence
    // THROUGH the col=value/ subdirectory layout
    val df = (1L to 300L).map(i => (i, s"2020-01-0${1 + (i % 3)}", s"r$i"))
      .toDF("id", "d", "s").withColumn("d", col("d").cast("date"))
    VersionedTable.commit(df.repartition(4, col("id")), root,
      partitionBy = Seq("d"), statsColumns = Seq("*"),
      bloomColumns = Seq("id"))
    // partition columns may not carry blooms (their exact stats win)
    intercept[IllegalArgumentException] {
      VersionedTable.commit(df, root, bloomColumns = Seq("d"))
    }
    val m = VersionedTable.manifest(spark, root, 0L)
    assert(m.blooms.contains("id"))
    val (kept, dropped) = VersionedTable.pruneFiles(spark, root,
      col("id") === 137L)
    assert(dropped.nonEmpty,
      s"blooms pruned nothing through partition subdirs: kept ${kept.size}")
    assert(VersionedTable.readWhere(spark, root, col("id") === 137L)
      .select("s").collect().map(_.getString(0)).toSeq === Seq("r137"))
    // absence proof: a never-inserted id prunes every file
    val (k2, _) = VersionedTable.pruneFiles(spark, root, col("id") === 9999L)
    assert(k2.isEmpty, s"bloom absence proof failed: kept $k2")
  }

  test("vacuum's grace window spares a staged-but-unpublished commit") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "s"), root,
      statsColumns = Seq("*"))
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a commit IN FLIGHT: a staged data dir not yet named by
    // any manifest (exactly what lives between stage() and publish())
    val inflight = new Path(root, "data/cinflight0000000")
    f.mkdirs(inflight)
    val part = new Path(inflight, "part-00000.parquet")
    val out = f.create(part, true); out.write(1); out.close()
    // with the window, the young dir survives the sweep…
    VersionedTable.vacuum(spark, root, keepVersions = 1,
      minAgeMs = 60L * 60L * 1000L)
    assert(f.exists(inflight), "vacuum reaped an in-flight commit")
    // …an OLD unreferenced dir (a true crash leftover) is reaped
    f.setTimes(inflight, System.currentTimeMillis() - 2L * 60L * 60L * 1000L,
      -1L)
    VersionedTable.vacuum(spark, root, keepVersions = 1,
      minAgeMs = 60L * 60L * 1000L)
    assert(!f.exists(inflight), "grace window never reaps old leftovers")
    // and the default stays eager (single-writer crash cleanup)
    f.mkdirs(inflight)
    VersionedTable.vacuum(spark, root, keepVersions = 1)
    assert(!f.exists(inflight))
    assert(VersionedTable.read(spark, root).count() === 1L)
  }

  test("special-char partition values survive stats, read-back, delete, merge and blooms") {
    // space is raw on disk but URL-encoded by _metadata.file_path
    // (%20); colon/equals/percent are Hive-escaped on disk (%3A…)
    // and their '%' is THEN URL-encoded (%253A) — every rel-matching
    // probe must land on the listing form or delete/merge silently
    // no-op and stats/bloom sidecar keys miss
    val root = freshRoot()
    val vals = Seq("a b", "a:b", "a%b", "a=b", "a+b", "a#b")
    val df = vals.zipWithIndex.map { case (p, i) => (i.toLong, p, s"x$i") }
      .toDF("id", "p", "s")
    VersionedTable.commit(df, root, partitionBy = Seq("p"),
      statsColumns = Seq("*"), bloomColumns = Seq("id"))
    // per-file stats keyed on the listing rel: rowCount sums them
    assert(VersionedTable.rowCount(spark, root) === Some(6L),
      "collectStats keyed files by the URL-encoded tail — stats lost")
    // partition values decode back exactly (two layers: URL + Hive)
    val back = VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(back === vals.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toMap,
      s"partition read-back mangled values: $back")
    // bloom sidecar keys reach files under special-char segments
    val (kept, _) = VersionedTable.pruneFiles(spark, root, col("id") === 3L)
    assert(kept.nonEmpty && kept.size < 6,
      s"bloom/zone pruning missed special-char partition files: kept $kept")
    // DELETE: the touched-file probe must match manifest rels
    VersionedTable.delete(spark, root, col("s") === "x1") // lives in p='a:b'
    assert(VersionedTable.read(spark, root).count() === 5L,
      "delete silently no-opped: file_path rel never matched the manifest")
    assert(!VersionedTable.read(spark, root).collect().exists(_.getLong(0) == 1L))
    // MERGE: an update must rewrite in place, not insert a duplicate
    val up = Seq((0L, "a b", "updated")).toDF("id", "p", "s")
    VersionedTable.merge(spark, root, up, Seq("id"))
    val r0 = VersionedTable.read(spark, root)
      .filter(col("id") === 0L).collect()
    assert(r0.length === 1 && r0.head.getString(2) === "updated",
      s"merge touched-probe missed the special-char partition: ${r0.toSeq}")
    assert(VersionedTable.read(spark, root).count() === 5L)
    // vectored delete: the DV anti-join matches rels both directions
    VersionedTable.deleteVectored(spark, root, col("s") === "x4") // p='a+b'
    assert(VersionedTable.read(spark, root).count() === 4L,
      "deletion vector never applied under a special-char partition")
    // partition pruning on the special values themselves stays exact
    assert(VersionedTable.readWhere(spark, root, col("p") === "a%b")
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("multi-level and null partitions prune soundly") {
    val root = freshRoot()
    val df = Seq(
      (1L, Some(1), "x"), (2L, Some(1), "y"),
      (3L, Some(2), "x"), (4L, None: Option[Int], "z"))
      .toDF("id", "p", "s")
    VersionedTable.commit(df, root, partitionBy = Seq("p", "s"))
    // two-level equality prunes on both dimensions
    val (kept, _) = VersionedTable.pruneFiles(spark, root,
      col("p") === 1 && col("s") === "x")
    assert(kept.nonEmpty && kept.forall(r =>
      r.contains("p=1") && r.contains("s=x")), s"kept $kept")
    assert(VersionedTable.readWhere(spark, root, col("p") === 1 && col("s") === "x")
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    // the null partition is pruned out of equalities and IS NOT NULL…
    val (k2, _) = VersionedTable.pruneFiles(spark, root, col("p") === 2)
    assert(k2.forall(!_.contains("__HIVE_DEFAULT_PARTITION__")))
    // …and kept for IS NULL; the read is exact either way
    assert(VersionedTable.readWhere(spark, root, col("p").isNull)
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(4L))
    assert(VersionedTable.readWhere(spark, root, col("p").isNotNull)
      .count() === 3L)
  }
}
