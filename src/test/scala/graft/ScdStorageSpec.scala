package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.ScdStorage

class ScdStorageSpec extends SparkSpec {

  test("date-partitioned history prunes partitions on date predicates") {
    val work = Files.createTempDirectory("scd_storage").toString
    val snaps = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(
        col("o_orderdate").cast("date").as("snapshot_date"),
        col("o_custkey"), col("o_orderstatus"))
      .filter(year(col("snapshot_date")) === 1997)
    ScdStorage.writeHistory(snaps, s"$work/history")

    val dirs = new java.io.File(s"$work/history").listFiles()
      .filter(_.getName.startsWith("snapshot_date="))
    assert(dirs.length > 1, "expected one directory per snapshot date")

    val pruned = ScdStorage.readHistory(spark, s"$work/history")
      .filter(col("snapshot_date") === "1997-03-15")
    val scanNode = pruned.queryExecution.executedPlan.toString
    assert(scanNode.contains("PartitionFilters"), "scan lost partition filters")
    // the partition filter must actually restrict the scan
    val full = ScdStorage.readHistory(spark, s"$work/history")
    assert(pruned.count() <= full.count())
    assert(pruned.select("snapshot_date").distinct().count() <= 1)
  }

  test("compaction merges small files per partition, atomically, data intact") {
    import spark.implicits._
    val work = Files.createTempDirectory("scd_compact").toString + "/hist"
    // two partitions: one fragmented into many tiny files, one already fine
    val frag = (1L to 200L).map(i => ("2024-01-01", i, s"v$i")).toDF("snapshot_date", "id", "v")
      .repartition(20)
    val fine = (1L to 50L).map(i => ("2024-01-02", i, s"w$i")).toDF("snapshot_date", "id", "v")
      .coalesce(1)
    frag.union(fine).write.partitionBy("snapshot_date").parquet(work)

    def files(part: String) = {
      val d = new java.io.File(s"$work/snapshot_date=$part")
      d.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).sortBy(_.getName)
    }
    val before = spark.read.parquet(work).orderBy("snapshot_date", "id")
      .collect().map(_.toSeq).toSeq
    val fineBefore = files("2024-01-02").map(f => (f.getName, f.lastModified)).toSeq
    assert(files("2024-01-01").length > 1)

    val stats = ScdStorage.compactHistory(spark, work, targetFileBytes = 1L << 30)
    assert(stats.map(_.partition) == Seq("snapshot_date=2024-01-01"),
      s"only the fragmented partition should compact, got $stats")
    assert(files("2024-01-01").length == 1)
    // untouched partition: same files, same mtimes
    assert(files("2024-01-02").map(f => (f.getName, f.lastModified)).toSeq == fineBefore)
    val after = spark.read.parquet(work).orderBy("snapshot_date", "id")
      .collect().map(_.toSeq).toSeq
    assert(after == before, "compaction must not change the data")
    // second run: nothing left to do
    assert(ScdStorage.compactHistory(spark, work, targetFileBytes = 1L << 30).isEmpty)
  }

  test("a reader mid-compaction never sees staging dirs as partitions") {
    import spark.implicits._
    val work = Files.createTempDirectory("scd_stage").toString + "/hist"
    Seq(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "b"))
      .toDF("snapshot_date", "id", "v")
      .write.partitionBy("snapshot_date").parquet(work)

    // simulate in-flight compaction: a fully-written staging copy of
    // partition 2024-01-01 sitting next to it
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = new org.apache.hadoop.fs.Path(s"$work/snapshot_date=2024-01-01")
    val tmp = graft.sources.AtomicDir.tmpPath(part)
    spark.read.parquet(part.toString).write.parquet(tmp.toString)

    // whole-table partition discovery: staging dir must be invisible
    val rows = spark.read.parquet(work).orderBy("id")
      .select("snapshot_date", "id", "v").as[(String, Long, String)]
      .collect().toSeq
    assert(rows == Seq(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "b")),
      s"staging dir leaked into partition discovery: $rows")
    // and compactHistory itself must not list it as a partition
    assert(ScdStorage.compactHistory(spark, work, targetFileBytes = 1L)
      .forall(!_.partition.contains("__tmp__")))
    fs.delete(tmp, true)
  }

  test("entity-bucketed tables join without shuffling the bucketed sides") {
    spark.sql("DROP TABLE IF EXISTS cur_b")
    spark.sql("DROP TABLE IF EXISTS inc_b")
    // a fresh in-memory catalog forgets tables but their warehouse dirs
    // survive across JVMs — clear the locations too
    Seq("cur_b", "inc_b").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    ScdStorage.writeBucketed(o.filter(col("o_orderkey") % 2 === 0), "cur_b", Seq("o_custkey"), 8)
    ScdStorage.writeBucketed(o.filter(col("o_orderkey") % 2 === 1), "inc_b", Seq("o_custkey"), 8)
    val joined = spark.table("cur_b").as("c")
      .join(spark.table("inc_b").as("i"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
  }
}
