package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.scd.EmployeeDimJob
import graft.streaming.ScdStreaming

/** Streaming SCD maintains the same table the batch pipeline produces:
  * feed the 10 reference snapshot CSVs through the file source in
  * micro-batches of 3 and compare the final history to the golden
  * output (the strongest possible check of by-value late-data handling
  * across batch boundaries — the late employee-25 row arrives in a
  * different micro-batch than its snapshot_date peers).
  */
class ScdStreamingSpec extends SparkSpec {

  test("streamed micro-batches converge to the golden employee_all") {
    val work = Files.createTempDirectory("scd_stream").toString
    val inputDir = s"$work/input"
    Files.createDirectories(Paths.get(inputDir))
    val refFiles = new java.io.File("/root/reference/data/input")
      .listFiles().filter(_.getName.endsWith(".csv")).sortBy(_.getName)
    refFiles.foreach { f =>
      Files.copy(f.toPath, Paths.get(inputDir, f.getName))
    }

    val cfg = EmployeeDimJob.Config(inputDir = "", outputDir = "")
    val q = ScdStreaming.start(
      spark, inputDir, s"$work/table", s"$work/ckpt", cfg,
      maxFilesPerTrigger = 3)
    q.awaitTermination(120000)

    val got = ScdStreaming.historyTable(spark, s"$work/table")
      .orderBy("snapshot_date", "employee_number").collect().toSeq
    val (golden, _) = graft.sources.CsvSnapshots.read(
      spark,
      graft.scd.EmployeeTables.employeeAll("")
        .copy(inputGlob = "/root/reference/data/output/employee_all/*.csv"))
    val want = golden.orderBy("snapshot_date", "employee_number").collect().toSeq
    assert(got.size == want.size, s"rows ${got.size} != ${want.size}")
    got.zip(want).foreach { case (a, b) => assert(a == b, s"row differs: $a vs $b") }

    // consumed inputs are engine-archived to the sibling archive dir.
    // cleanSource archival runs as later batches progress, so with 4
    // micro-batches at least the earlier batches' files must be there.
    val archived = new java.io.File(s"${inputDir}_processed")
    def archivedCount(d: java.io.File): Int =
      if (!d.exists()) 0
      else d.listFiles().map(f => if (f.isDirectory) archivedCount(f) else 1).sum
    assert(archivedCount(archived) > 0, "no inputs were archived")

    // current view over the maintained table matches the golden current
    val current = ScdStreaming.currentView(spark, s"$work/table", cfg)
    assert(current.count() == 50)
    assert(current.filter(col("change_status") === "Deleted").count() == 1)
  }

  test("incremental streaming converges to the corrected-mode full recompute") {
    val work = Files.createTempDirectory("scd_stream_inc").toString
    val inputDir = s"$work/input"
    Files.createDirectories(Paths.get(inputDir))
    new java.io.File("/root/reference/data/input")
      .listFiles().filter(_.getName.endsWith(".csv")).sortBy(_.getName)
      .foreach(f => Files.copy(f.toPath, Paths.get(inputDir, f.getName)))

    val cfg = EmployeeDimJob.Config(
      inputDir = "", outputDir = "", legacyChangedStatusDate = false)
    val q = ScdStreaming.start(
      spark, inputDir, s"$work/table", s"$work/ckpt", cfg,
      maxFilesPerTrigger = 3, incremental = true)
    q.awaitTermination(120000)

    val got = ScdStreaming.historyTable(spark, s"$work/table")
      .orderBy("snapshot_date", "employee_number").collect().toSeq

    val (snapshots, _) = graft.sources.CsvSnapshots.read(
      spark,
      graft.scd.EmployeeTables.empSnapshots(s"/root/reference/data/input")
        .copy(inputGlob = "/root/reference/data/input/*.csv"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.scd.EmployeeTables.scdSchema)
    val want = EmployeeDimJob.stageEmployeeAll(empty, snapshots, cfg)
      .orderBy("snapshot_date", "employee_number").collect().toSeq

    assert(got.size == want.size, s"rows ${got.size} != ${want.size}")
    got.zip(want).foreach { case (a, b) => assert(a == b, s"differs: $a vs $b") }
  }
}
