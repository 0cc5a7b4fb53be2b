package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.scd.{EmployeeDimJob, EmployeeTables}
import graft.sources.CsvSnapshots

/** The SCD pipeline behind the SQL table functions
  * ([[GraftExtensions]]): a BOOTSTRAP run (empty existing
  * `employee_all` — the reference's first-run path) over every
  * snapshot CSV in `inputDir`, returned as a frame instead of written
  * to a sink — so a PySpark user gets the reference pipeline's exact
  * output from one `spark.sql` call. The golden CLI semantics
  * (archival, atomic sink swap, quality gates) stay on
  * [[graft.scd.EmployeeDimJob]]; this is the QUERY surface.
  */
private[plans] object ScdSql {

  private def cfg(inputDir: String) = EmployeeDimJob.Config(
    inputDir = inputDir, outputDir = inputDir,
    archiveInputs = false, singleFile = false)

  def employeeAll(spark: SparkSession, inputDir: String): DataFrame = {
    val snapshots = EmployeeTables.empSnapshots(inputDir)
    val (incoming, _) = CsvSnapshots.read(spark, snapshots)
    val existing = incoming.limit(0) // bootstrap: no prior employee_all
    EmployeeDimJob.stageEmployeeAll(existing, incoming, cfg(inputDir))
  }

  def employeeCurrent(spark: SparkSession, inputDir: String): DataFrame =
    EmployeeDimJob.stageEmployeeCurrent(
      employeeAll(spark, inputDir), cfg(inputDir))
}
