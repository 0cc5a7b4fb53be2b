package graft

import java.nio.file.{Files, Paths}
import java.sql.Date
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.scd.{EmployeeDimJob, EmployeeTables}
import graft.streaming.ScdStreaming

/** Incremental SCD with incremental I/O: the date-partitioned store
  * must (a) converge to the full recompute and (b) physically rewrite
  * ONLY the partitions whose rows could change — untouched partition
  * files stay byte-identical on disk.
  */
class ScdPartitionedStreamingSpec extends SparkSpec {

  private val cfg = EmployeeDimJob.Config(
    inputDir = "", outputDir = "", legacyChangedStatusDate = false)

  private def snap(rows: (String, Int, Int)*): DataFrame = {
    val data = rows.map { case (d, e, salary) =>
      Row(Date.valueOf(d), e, "Active", null, null, null, null, null, salary, null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data), EmployeeTables.snapshotSchema)
  }

  private def partitionFiles(tableDir: String): Map[String, Set[(String, Long, Long)]] = {
    val root = new java.io.File(tableDir)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("snapshot_date="))
      .map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      }.toMap
  }

  test("only changed partitions are rewritten, result equals full recompute") {
    val work = Files.createTempDirectory("scd_part").toString
    val table = s"$work/table"
    // bootstrap: e1 ends at d1 (already Deleted), e2 active through d2,
    // e6 unchanged through d2 (No Change on its last row)
    val base = snap(
      ("2023-05-01", 1, 100),
      ("2023-05-02", 1, 100),
      ("2023-05-02", 2, 200), ("2023-05-03", 2, 300),
      ("2023-05-02", 6, 600), ("2023-05-03", 6, 600))
    ScdStreaming.mergeBatchPartitioned(spark, base, table, cfg)
    val before = partitionFiles(table)
    assert(before.keySet == Set(
      "snapshot_date=2023-05-01", "snapshot_date=2023-05-02", "snapshot_date=2023-05-03"))

    // batch 2 touches e2 (update) and e4 (new); e6 must flip to Deleted
    // (global max advanced past its last row); e1 is already Deleted.
    val batch = snap(("2023-05-04", 2, 400), ("2023-05-04", 4, 900))
    ScdStreaming.mergeBatchPartitioned(spark, batch, table, cfg)
    val after = partitionFiles(table)

    // d0 (2023-05-01) holds only e1's first row — no touched entity, no
    // flip — its files must be byte-identical (same names/sizes/mtimes)
    assert(after("snapshot_date=2023-05-01") == before("snapshot_date=2023-05-01"),
      "untouched partition was rewritten")
    // e2's history dates, the batch date, and e6's flipped date rewrite
    assert(after("snapshot_date=2023-05-02") != before("snapshot_date=2023-05-02"))
    assert(after("snapshot_date=2023-05-03") != before("snapshot_date=2023-05-03"))
    assert(after.contains("snapshot_date=2023-05-04"))

    // logical result equals the from-scratch full recompute
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], EmployeeTables.scdSchema)
    val want = EmployeeDimJob.stageEmployeeAll(empty, base.union(batch), cfg)
      .orderBy("snapshot_date", "employee_number").collect().toSeq
    val got = ScdStreaming.historyTable(spark, table)
      .orderBy("snapshot_date", "employee_number").collect().toSeq
    assert(got.size == want.size, s"rows ${got.size} != ${want.size}")
    got.zip(want).foreach { case (a, b) => assert(a == b, s"differs: $a vs $b") }

    // the flip actually landed
    val e6 = ScdStreaming.historyTable(spark, table)
      .filter(col("employee_number") === 6 && col("snapshot_date") === lit("2023-05-03"))
      .select("change_status").head().getString(0)
    assert(e6 == "Deleted", s"e6 last row should have flipped, got $e6")
  }

  test("streamed micro-batches over partitioned storage converge to full recompute") {
    val work = Files.createTempDirectory("scd_part_stream").toString
    val inputDir = s"$work/input"
    Files.createDirectories(Paths.get(inputDir))
    new java.io.File("/root/reference/data/input")
      .listFiles().filter(_.getName.endsWith(".csv")).sortBy(_.getName)
      .foreach(f => Files.copy(f.toPath, Paths.get(inputDir, f.getName)))

    val q = ScdStreaming.start(
      spark, inputDir, s"$work/table", s"$work/ckpt", cfg,
      maxFilesPerTrigger = 3, incremental = true, partitionedStorage = true)
    q.awaitTermination(120000)

    val got = ScdStreaming.historyTable(spark, s"$work/table")
      .orderBy("snapshot_date", "employee_number").collect().toSeq
    val (snapshots, _) = graft.sources.CsvSnapshots.read(
      spark,
      EmployeeTables.empSnapshots("/root/reference/data/input")
        .copy(inputGlob = "/root/reference/data/input/*.csv"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], EmployeeTables.scdSchema)
    val want = EmployeeDimJob.stageEmployeeAll(empty, snapshots, cfg)
      .orderBy("snapshot_date", "employee_number").collect().toSeq
    assert(got.size == want.size, s"rows ${got.size} != ${want.size}")
    got.zip(want).foreach { case (a, b) => assert(a == b, s"differs: $a vs $b") }
  }
}
