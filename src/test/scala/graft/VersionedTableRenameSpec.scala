package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Column mapping: `renameColumn` is a METADATA-ONLY commit — the
  * logical name moves in the manifest, files/stats/blooms stay keyed
  * by the immutable PHYSICAL name, reads alias inside the scan, and
  * appends keep writing the physical name. The Delta column-mapping
  * role, collapsed to the rename case.
  */
class VersionedTableRenameSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_vtr").toString

  test("rename is metadata-only; old data reads under the new name") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "score")
        .coalesce(1), root, statsColumns = Seq("*"))
    val filesBefore = VersionedTable.manifest(spark, root, 0L).files
    VersionedTable.renameColumn(spark, root, "score", "points")
    val m1 = VersionedTable.manifest(spark, root, 1L)
    // no data file moved, stats intact under the physical key
    assert(m1.files === filesBefore)
    assert(m1.colMap === Map("points" -> "score"))
    assert(m1.stats.values.forall(_.cols.contains("score")))
    val back = VersionedTable.read(spark, root)
    assert(back.columns.toSeq === Seq("id", "s", "points"))
    assert(back.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      === Set((1L, 10L), (2L, 20L)))
    // time travel BEFORE the rename still shows the old name
    assert(VersionedTable.read(spark, root, Some(0L)).columns.toSeq
      === Seq("id", "s", "score"))
  }

  test("pruning and metadata counts survive the rename; appends write physical") {
    val root = freshRoot()
    // three files with disjoint score ranges → sharp zone maps
    (0 to 2).foreach(k => VersionedTable.commit(
      Seq((k.toLong, s"r$k", k * 100L)).toDF("id", "s", "score").coalesce(1),
      root, statsColumns = Seq("*")))
    VersionedTable.renameColumn(spark, root, "score", "points")
    // predicates on the NEW logical name prune via the physical stats
    val (kept, dropped) = VersionedTable.pruneFiles(spark, root,
      col("points") === 200L)
    assert(kept.size === 1 && dropped.size === 2,
      s"rename broke pruning: kept $kept")
    assert(VersionedTable.readWhere(spark, root, col("points") >= 100L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(VersionedTable.rowCount(spark, root) === Some(3L))
    // an append under the new logical schema writes the PHYSICAL name
    VersionedTable.commit(
      Seq((9L, "new", 900L)).toDF("id", "s", "points"), root,
      statsColumns = Seq("*"))
    val m = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m.stats.values.forall(_.cols.contains("score")),
      "appended file's stats must key by the physical name")
    assert(VersionedTable.read(spark, root).count() === 4L)
    assert(VersionedTable.readWhere(spark, root, col("points") === 900L)
      .select("s").collect().map(_.getString(0)).toSeq === Seq("new"))
    // delete/merge keep working through the map
    VersionedTable.delete(spark, root, col("points") === 0L)
    VersionedTable.merge(spark, root,
      Seq((9L, "upd", 901L)).toDF("id", "s", "points"), Seq("id"))
    val fin = VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(fin === Map(1L -> 100L, 2L -> 200L, 9L -> 901L))
  }

  test("rename guards: missing/duplicate/partition columns, physical reuse") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, "2020-01-01", "a")).toDF("id", "d", "s")
        .withColumn("d", col("d").cast("date")),
      root, partitionBy = Seq("d"), statsColumns = Seq("*"))
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "id", "s")
    }
    // partition columns carry their physical name in the layout
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "d", "day")
    }
    // data column renames on a partitioned table still work
    VersionedTable.renameColumn(spark, root, "s", "label")
    assert(VersionedTable.read(spark, root).columns.toSeq
      === Seq("id", "d", "label"))
    // a later column may not squat on the still-live physical name
    intercept[IllegalArgumentException] {
      VersionedTable.commit(
        Seq((2L, "2020-01-01", "b", "boom")).toDF("id", "d", "label", "s")
          .withColumn("d", col("d").cast("date")),
        root, mergeSchema = true)
    }
    // chained rename keeps ONE physical hop (label→tag still maps to s)
    VersionedTable.renameColumn(spark, root, "label", "tag")
    val m = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m.colMap === Map("tag" -> "s"))
    assert(VersionedTable.readWhere(spark, root, col("tag") === "a")
      .count() === 1L)
    // renaming BACK to the physical name clears the mapping entry
    VersionedTable.renameColumn(spark, root, "tag", "s")
    val m2 = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m2.colMap === Map.empty)
    // and export refuses only while a mapping is live
    VersionedTable.exportSnapshot(spark, root)
  }

  test("a rename CHAIN that recycles a freed logical name still appends") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, 10L)).toDF("a", "c"), root,
      statsColumns = Seq("*"))
    VersionedTable.renameColumn(spark, root, "a", "b") // colMap b→a
    VersionedTable.renameColumn(spark, root, "c", "a") // colMap b→a, a→c
    // the append's `a` is itself MAPPED (writes physical `c`), so it
    // can never collide with b's physical name `a` — the reuse guard
    // must only fire for identity-mapped columns
    VersionedTable.commit(Seq((2L, 20L)).toDF("b", "a"), root,
      statsColumns = Seq("*"))
    val rows = VersionedTable.read(spark, root).select("b", "a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === Set((1L, 10L), (2L, 20L)),
      s"rename-chain append misrouted physical columns: $rows")
    // pruning on the recycled name binds the RIGHT physical stats
    assert(VersionedTable.readWhere(spark, root, col("a") === 20L)
      .select("b").collect().map(_.getLong(0)).toSeq === Seq(2L))
    // the guard still fires where it must: a NEW identity-mapped
    // column squatting on a still-live physical name
    intercept[IllegalArgumentException] {
      VersionedTable.commit(Seq((3L, 30L, "boom")).toDF("b", "a", "c"),
        root, mergeSchema = true)
    }
  }

  test("dropColumn is metadata-only; the name is tombstoned against reuse") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "score")
        .coalesce(1), root, statsColumns = Seq("*"))
    val filesBefore = VersionedTable.manifest(spark, root, 0L).files
    VersionedTable.dropColumn(spark, root, "score")
    val m = VersionedTable.manifest(spark, root, 1L)
    assert(m.files === filesBefore, "drop must move no data file")
    assert(m.droppedCols === Seq("score"))
    val back = VersionedTable.read(spark, root)
    assert(back.columns.toSeq === Seq("id", "s"))
    assert(back.count() === 2L)
    // time travel before the drop still shows the column
    assert(VersionedTable.read(spark, root, Some(0L)).columns.toSeq
      === Seq("id", "s", "score"))
    // appends under the narrowed schema work; reusing the dropped
    // name is refused (old bytes would resurrect as the new column)
    VersionedTable.commit(Seq((3L, "c")).toDF("id", "s"), root,
      statsColumns = Seq("*"))
    assert(VersionedTable.read(spark, root).count() === 3L)
    intercept[IllegalArgumentException] {
      VersionedTable.commit(
        Seq((4L, "d", 99L)).toDF("id", "s", "score"), root,
        mergeSchema = true)
    }
    // a DIFFERENT new column is fine…
    VersionedTable.commit(Seq((4L, "d", 99L)).toDF("id", "s", "points"),
      root, mergeSchema = true)
    assert(VersionedTable.read(spark, root).columns.toSeq
      === Seq("id", "s", "points"))
    // …and dropping a RENAMED column tombstones its PHYSICAL name
    VersionedTable.renameColumn(spark, root, "points", "pts")
    VersionedTable.dropColumn(spark, root, "pts")
    val m2 = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m2.droppedCols.sorted === Seq("points", "score"))
    assert(m2.colMap === Map.empty)
    // overwrite resets the namespace: the old names are reusable
    VersionedTable.commit(Seq((9L, 1L)).toDF("id", "score"), root,
      overwrite = true)
    assert(VersionedTable.read(spark, root).columns.toSeq
      === Seq("id", "score"))
  }

  test("drop guards: partition/only/missing columns") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, "2020-01-01")).toDF("id", "d")
        .withColumn("d", col("d").cast("date")),
      root, partitionBy = Seq("d"), statsColumns = Seq("*"))
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "d")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "nope")
    }
    VersionedTable.dropColumn(spark, root, "id")
    intercept[IllegalArgumentException] { // only column left
      VersionedTable.dropColumn(spark, root, "d")
    }
  }
}
