package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, "alice", 10, "eng"),
    (2L, "bob", 20, "ops"),
    (3L, "carol", 30, "eng"),
    (4L, "dave", 40, null.asInstanceOf[String])
  ).toDF("id", "name", "score", "team")

  private def newSnap = Seq(
    (1L, "alice", 10, "eng"),        // unchanged -> omitted
    (2L, "bob", 25, "sales"),        // changed: score, team
    (4L, "dave", 40, "eng"),         // changed: null -> value
    (5L, "erin", 50, "eng")          // added
  ).toDF("id", "name", "score", "team")

  test("classifies added / removed / changed and names the columns") {
    val out = SnapshotDiff.diff(oldSnap, newSnap, Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out === Seq(
      (2L, "changed", "score,team"),
      (3L, "removed", ""),
      (4L, "changed", "team"),
      (5L, "added", "")))
  }

  test("changed_cols follows the old snapshot's column order") {
    // swap the new side's column order; output order must not move
    val reordered = newSnap.select("id", "team", "score", "name")
    val r2 = SnapshotDiff.diff(oldSnap, reordered, Seq("id"))
      .filter($"id" === 2L).select("changed_cols").as[String].head()
    assert(r2 === "score,team")
  }

  test("compareCols restricts the diff; identical snapshots diff empty") {
    val scoreOnly = SnapshotDiff.diff(
      oldSnap, newSnap, Seq("id"), Some(Seq("score")))
      .filter($"change_type" === "changed")
      .select("id").as[Long].collect().sorted
    assert(scoreOnly === Seq(2L))
    assert(SnapshotDiff.diff(oldSnap, oldSnap, Seq("id")).isEmpty)
  }

  test("columns present in only one snapshot are ignored, not drift") {
    val withExtra = newSnap.withColumn("extra", lit(1))
    val out = SnapshotDiff.diff(oldSnap, withExtra, Seq("id"))
      .filter($"id" === 4L).select("changed_cols").as[String].head()
    assert(out === "team")
  }

  test("null-safe compare: value to null and null to value both count") {
    val a = Seq((1L, Some(5)), (2L, None)).toDF("id", "v")
    val b = Seq((1L, None), (2L, Some(7))).toDF("id", "v")
    val out = SnapshotDiff.diff(a, b, Seq("id"))
      .select("id", "change_type", "changed_cols")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out === Seq((1L, "changed", "v"), (2L, "changed", "v")))
  }

  test("composite keys join on all key columns") {
    val a = Seq((1L, "x", 10), (1L, "y", 20)).toDF("k1", "k2", "v")
    val b = Seq((1L, "x", 11), (1L, "z", 30)).toDF("k1", "k2", "v")
    val out = SnapshotDiff.diff(a, b, Seq("k1", "k2"))
      .orderBy("k1", "k2").collect()
      .map(r => (r.getString(2), r.getString(3)))
    assert(out === Seq(("changed", "v"), ("removed", ""), ("added", "")))
  }
}
