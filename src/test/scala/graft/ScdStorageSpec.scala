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
