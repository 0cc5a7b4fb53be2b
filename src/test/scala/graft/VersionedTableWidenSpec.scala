package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.VersionedTable

/** Metadata-only TYPE WIDENING: `widenColumn` changes the recorded
  * schema's field to a wider type and moves nothing — old files
  * upcast inside the scan (pinned here by a direct probe of the
  * parquet reader), appends write the wide type, and pruning keeps
  * biting because every allowed widening shares its stats domain.
  */
class VersionedTableWidenSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_vtw").toString

  test("probe: the parquet reader upcasts int->long, float->double in-scan") {
    val d = java.nio.file.Files.createTempDirectory("widen").toString
    spark.range(5).selectExpr("cast(id as int) as a", "cast(id as float) as b",
      "cast(id as short) as c").write.mode("overwrite").parquet(d)
    val s = StructType(Seq(StructField("a", LongType),
      StructField("b", DoubleType), StructField("c", IntegerType)))
    val rows = spark.read.schema(s).parquet(d).orderBy("a").collect()
    assert(rows.length === 5)
    assert(rows.last.getLong(0) === 4L && rows.last.getDouble(1) === 4.0
      && rows.last.getInt(2) === 4)
  }

  test("widenColumn is metadata-only; mixed-width files read and prune") {
    val root = freshRoot()
    // three int-keyed files with disjoint ranges
    (0 to 2).foreach(k => VersionedTable.commit(
      Seq((k * 100, s"r$k")).toDF("id", "s")
        .withColumn("id", col("id").cast("int")).coalesce(1),
      root, statsColumns = Seq("*")))
    val filesBefore = VersionedTable.manifest(spark, root, 2L).files
    VersionedTable.widenColumn(spark, root, "id", LongType)
    val m = VersionedTable.manifest(spark, root, 3L)
    assert(m.files === filesBefore, "widen must move no data file")
    val back = VersionedTable.read(spark, root)
    assert(back.schema("id").dataType === LongType)
    assert(back.select("id").collect().map(_.getLong(0)).sorted
      === Seq(0L, 100L, 200L))
    // append with LONG keys beyond int range
    VersionedTable.commit(Seq((4000000000L, "big")).toDF("id", "s"),
      root, statsColumns = Seq("*"))
    assert(VersionedTable.read(spark, root).count() === 4L)
    // pruning through mixed int/long files stays sharp AND exact
    val (kept, dropped) = VersionedTable.pruneFiles(spark, root,
      col("id") === 100L)
    assert(kept.size === 1 && dropped.size === 3,
      s"widen broke pruning: kept $kept")
    assert(VersionedTable.readWhere(spark, root, col("id") >= 200L)
      .select("id").collect().map(_.getLong(0)).sorted
      === Seq(200L, 4000000000L))
    assert(VersionedTable.rowCount(spark, root) === Some(4L))
    // time travel before the widen keeps the narrow type
    assert(VersionedTable.read(spark, root, Some(2L))
      .schema("id").dataType === IntegerType)
    // merge through the widened schema
    VersionedTable.merge(spark, root,
      Seq((100L, "upd")).toDF("id", "s"), Seq("id"))
    assert(VersionedTable.read(spark, root)
      .filter(col("id") === 100L).collect().map(_.getString(1)).toSeq
      === Seq("upd"))
  }

  test("widen guards: only exact widenings; narrowing and strings refuse") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1, 1.5f, "a")).toDF("i", "f", "s"), root, statsColumns = Seq("*"))
    VersionedTable.widenColumn(spark, root, "f", DoubleType)
    assert(VersionedTable.read(spark, root).schema("f").dataType === DoubleType)
    intercept[IllegalArgumentException] {
      VersionedTable.widenColumn(spark, root, "i", ShortType) // narrowing
    }
    intercept[IllegalArgumentException] {
      VersionedTable.widenColumn(spark, root, "i", DoubleType) // inexact
    }
    intercept[IllegalArgumentException] {
      VersionedTable.widenColumn(spark, root, "s", LongType)
    }
    intercept[IllegalArgumentException] {
      VersionedTable.widenColumn(spark, root, "nope", LongType)
    }
  }
}
