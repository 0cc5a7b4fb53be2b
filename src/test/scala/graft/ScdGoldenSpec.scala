package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.scd.{EmployeeDimJob, EmployeeTables}
import graft.sources.CsvSnapshots

/** Golden end-to-end: run the SCD pipeline on the reference's own input
  * CSVs and compare cell-for-cell with its committed golden outputs
  * (/root/reference/data/output/employee_all, .../employee_current).
  *
  * Row order in the goldens is partition-arbitrary, so both sides are
  * canonicalized (sorted by snapshot_date, employee_number) before
  * comparison. The legacy changed_status_date quirk (SURVEY.md §2.7 W6)
  * must be ON to match.
  */
class ScdGoldenSpec extends SparkSpec {

  private val refData = "/root/reference/data"

  private def readGolden(dir: String): DataFrame = {
    val (df, files) = CsvSnapshots.read(
      spark,
      EmployeeTables.employeeAll("/dev/null").copy(inputGlob = s"$dir/*.csv"))
    assert(files.nonEmpty, s"no golden files under $dir")
    df
  }

  private def canonical(df: DataFrame): Seq[Row] =
    df.select(df.columns.map(col).toSeq: _*)
      .orderBy("snapshot_date", "employee_number")
      .collect()
      .toSeq

  private def assertSameRows(got: DataFrame, want: DataFrame): Unit = {
    assert(got.columns.toSeq == want.columns.toSeq)
    val g = canonical(got)
    val w = canonical(want)
    assert(g.size == w.size, s"row count ${g.size} != ${w.size}")
    g.zip(w).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs:\n  got:  $a\n  want: $b")
    }
  }

  private lazy val staged: DataFrame = {
    val cfg = EmployeeDimJob.Config(inputDir = "", outputDir = "")
    val (incoming, files) = CsvSnapshots.read(
      spark,
      EmployeeTables.empSnapshots(s"$refData/input").copy(inputGlob = s"$refData/input/*.csv"))
    assert(files.size == 10, s"expected 10 input CSVs, got ${files.size}")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], EmployeeTables.scdSchema)
    EmployeeDimJob.stageEmployeeAll(empty, incoming, cfg)
  }

  test("employee_all matches the reference golden output") {
    val want = readGolden(s"$refData/output/employee_all")
    assertSameRows(staged, want)
  }

  test("employee_current matches the reference golden output") {
    val cfg = EmployeeDimJob.Config(inputDir = "", outputDir = "")
    val want = readGolden(s"$refData/output/employee_current")
    assertSameRows(EmployeeDimJob.stageEmployeeCurrent(staged, cfg), want)
  }

  test("legacy single-partition window plan produces identical values") {
    val cfg = EmployeeDimJob.Config(
      inputDir = "", outputDir = "", useSinglePartitionWindow = true)
    val (incoming, _) = CsvSnapshots.read(
      spark,
      EmployeeTables.empSnapshots(s"$refData/input").copy(inputGlob = s"$refData/input/*.csv"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], EmployeeTables.scdSchema)
    val legacyPlan = EmployeeDimJob.stageEmployeeAll(empty, incoming, cfg)
    assertSameRows(legacyPlan, staged)
  }

  test("pipeline is a fixed point: rerun on its own output changes nothing") {
    val cfg = EmployeeDimJob.Config(inputDir = "", outputDir = "")
    val incoming = staged.select(
      EmployeeTables.snapshotSchema.fieldNames.map(col).toSeq: _*)
    val again = EmployeeDimJob.stageEmployeeAll(staged, incoming, cfg)
    assertSameRows(again, staged)
  }

  test("golden status distribution") {
    val counts = staged.groupBy("change_status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map(
      "New" -> 50L, "Changed" -> 6L, "No Change" -> 437L, "Deleted" -> 1L))
  }
}
