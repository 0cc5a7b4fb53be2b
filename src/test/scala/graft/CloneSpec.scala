package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Shallow CLONE (the r17 verdict's #8): a zero-copy manifest fork for
  * experiment branches of a training corpus. The gates the verdict
  * names: clone, diverge BOTH sides, both read back correctly, and a
  * vacuum on either side never destroys the other's files.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def ids(root: String): Seq[Long] =
    VersionedTable.read(spark, root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("clone is zero-copy, reads identically, and keeps pruning") {
    val src = freshDir("graft_clone_src")
    val dst = freshDir("graft_clone_dst") + "/t"
    (0 to 2).foreach(k => VersionedTable.commit(
      (k * 100L until k * 100L + 50L).toDF("id")
        .withColumn("s", concat(lit("r"), col("id"))).coalesce(1),
      src, statsColumns = Seq("*")))
    VersionedTable.cloneTable(spark, src, dst)
    // zero-copy: no data bytes under the clone root
    assert(!new java.io.File(dst, "data").exists(),
      "a shallow clone must not copy data files")
    assert(ids(dst) === ids(src))
    // the clone's manifest references the source ABSOLUTELY and its
    // re-keyed zone maps still prune
    val m = VersionedTable.manifest(spark, dst, 0L)
    assert(m.files.forall(f =>
      new org.apache.hadoop.fs.Path(f).isAbsolute))
    val (kept, dropped) = VersionedTable.pruneFiles(spark, dst,
      col("id") === 120L)
    assert(kept.size === 1 && dropped.size === 2,
      s"clone zone maps must prune: kept $kept")
    // constraints travel: a violating append refuses on the clone
    VersionedTable.addConstraint(spark, src, "id_nonneg", "id >= 0")
    val dst2 = freshDir("graft_clone_dst2") + "/t"
    VersionedTable.cloneTable(spark, src, dst2)
    intercept[VersionedTable.ConstraintViolationException] {
      VersionedTable.commit(Seq(-1L).toDF("id")
        .withColumn("s", lit("bad")), dst2, statsColumns = Seq("*"))
    }
  }

  test("both sides diverge independently; vacuum never crosses roots") {
    val src = freshDir("graft_clone_v_src")
    val dst = freshDir("graft_clone_v_dst") + "/t"
    (0 to 2).foreach(k => VersionedTable.commit(
      (k * 100L until k * 100L + 10L).toDF("id").coalesce(1),
      src, statsColumns = Seq("*")))
    VersionedTable.cloneTable(spark, src, dst)
    // diverge: branch appends + deletes; source deletes other rows
    VersionedTable.commit((900L until 910L).toDF("id"), dst,
      statsColumns = Seq("*"))
    VersionedTable.delete(spark, dst, col("id") < 5L)
    VersionedTable.delete(spark, src, col("id") >= 200L)
    assert(ids(dst) === ((5L until 10L) ++ (100L until 110L) ++
      (200L until 210L) ++ (900L until 910L)))
    assert(ids(src) === ((0L until 10L) ++ (100L until 110L)))
    // vacuum the BRANCH hard (retention 1): it may sweep its own
    // rewritten files but must not reach into the source root
    VersionedTable.vacuum(spark, dst, keepVersions = 1)
    assert(ids(src) === ((0L until 10L) ++ (100L until 110L)),
      "branch vacuum touched source bytes")
    assert(ids(dst) === ((5L until 10L) ++ (100L until 110L) ++
      (200L until 210L) ++ (900L until 910L)))
    // vacuum the SOURCE hard: the clone PINNED its version with a tag,
    // so the files the branch still shares survive — including the
    // 200-block the source itself no longer references
    VersionedTable.vacuum(spark, src, keepVersions = 1)
    assert(ids(dst) === ((5L until 10L) ++ (100L until 110L) ++
      (200L until 210L) ++ (900L until 910L)),
      "source vacuum destroyed bytes the clone still references")
    assert(ids(src) === ((0L until 10L) ++ (100L until 110L)))
  }

  test("partitioned + renamed-column tables clone with their mapping") {
    val src = freshDir("graft_clone_p_src")
    val dst = freshDir("graft_clone_p_dst") + "/t"
    VersionedTable.commit(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
        .toDF("id", "part", "v"),
      src, statsColumns = Seq("*"), partitionBy = Seq("part"))
    VersionedTable.renameColumn(spark, src, "v", "w")
    VersionedTable.cloneTable(spark, src, dst)
    val got = VersionedTable.read(spark, dst)
      .select("id", "part", "w").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got === Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L)))
    // appends to the clone write under the carried PHYSICAL layout and
    // read back merged
    VersionedTable.commit(Seq((4L, "b", 40L)).toDF("id", "part", "w"), dst)
    assert(VersionedTable.read(spark, dst).count() === 4L)
  }

  test("compaction localizes a clone: afterwards no source refs remain") {
    val src = freshDir("graft_clone_c_src")
    val dst = freshDir("graft_clone_c_dst") + "/t"
    (0 to 1).foreach(k => VersionedTable.commit(
      (k * 10L until k * 10L + 10L).toDF("id").coalesce(1),
      src, statsColumns = Seq("*")))
    VersionedTable.cloneTable(spark, src, dst)
    VersionedTable.compact(spark, dst, targetPartitions = 1)
    val m = VersionedTable.manifest(spark, dst,
      VersionedTable.latestVersion(spark, dst).get)
    assert(m.files.forall(f => !new org.apache.hadoop.fs.Path(f).isAbsolute),
      s"compaction must localize the clone: ${m.files}")
    assert(ids(dst) === (0L until 20L))
    // fully localized: even destroying the source leaves the clone whole
    VersionedTable.vacuum(spark, dst, keepVersions = 1)
    assert(ids(dst) === (0L until 20L))
  }

  test("the change feed bootstraps a clone as v0 inserts") {
    val src = freshDir("graft_clone_cdc_src")
    VersionedTable.commit((0L until 5L).toDF("id"), src,
      statsColumns = Seq("*"))
    val dst = freshDir("graft_clone_cdc_dst") + "/t"
    VersionedTable.cloneTable(spark, src, dst)
    VersionedTable.commit((100L until 103L).toDF("id"), dst,
      statsColumns = Seq("*"))
    // startingVersion = -1 replays the branch's whole history: the
    // clone's v0 snapshot streams as inserts (the bootstrap a CDC
    // follower needs), the append as v1 inserts
    val feed = VersionedTable.changes(spark, dst, -1L, 1L)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"),
        r.getAs[Long]("_commit_version")))
    assert(feed.forall(_._2 == "insert"))
    assert(feed.filter(_._3 == 0L).map(_._1).sorted.toSeq ===
      (0L until 5L))
    assert(feed.filter(_._3 == 1L).map(_._1).sorted.toSeq ===
      (100L until 103L))
  }

  test("re-clone to a recycled destination re-pins the NEW version") {
    val src = freshDir("graft_clone_t_src")
    VersionedTable.commit((0L until 10L).toDF("id"), src,
      statsColumns = Seq("*"))
    val dstDir = freshDir("graft_clone_t_dst")
    val dst = dstDir + "/t"
    VersionedTable.cloneTable(spark, src, dst) // pins v0
    val tagName = VersionedTable.listTags(spark, src).keys
      .find(_.startsWith("graft-clone-")).get
    assert(VersionedTable.tagVersion(spark, src, tagName) === Some(0L))
    // destroy the branch, advance the source, re-clone to the SAME path
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(dst))
    VersionedTable.commit((100L until 110L).toDF("id"), src,
      statsColumns = Seq("*")) // v1
    VersionedTable.cloneTable(spark, src, dst)
    // the pin must MOVE to the newly cloned version — a skipped retag
    // would leave v1 unprotected from the source's vacuum
    assert(VersionedTable.tagVersion(spark, src, tagName) === Some(1L))
    VersionedTable.vacuum(spark, src, keepVersions = 1)
    assert(ids(dst) === (0L until 10L) ++ (100L until 110L))
  }

  test("refusals: occupied target, nested roots, outstanding vectors") {
    val src = freshDir("graft_clone_r_src")
    VersionedTable.commit((0L until 10L).toDF("id"), src,
      statsColumns = Seq("*"))
    val dst = freshDir("graft_clone_r_dst") + "/t"
    VersionedTable.cloneTable(spark, src, dst)
    intercept[IllegalArgumentException] {
      VersionedTable.cloneTable(spark, src, dst)
    }
    intercept[IllegalArgumentException] {
      VersionedTable.cloneTable(spark, src, src + "/nested")
    }
    VersionedTable.deleteVectored(spark, src, col("id") === 3L)
    intercept[java.io.IOException] {
      VersionedTable.cloneTable(spark, src,
        freshDir("graft_clone_r_dst2") + "/t")
    }
    // purging re-enables the clone
    VersionedTable.purgeVectors(spark, src)
    val dst3 = freshDir("graft_clone_r_dst3") + "/t"
    VersionedTable.cloneTable(spark, src, dst3)
    assert(ids(dst3) === ((0L until 10L).filterNot(_ == 3L)))
  }
}
