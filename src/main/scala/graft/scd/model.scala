package graft.scd

import org.apache.spark.sql.types._

/** Raised by the write-time quality gates.
  *
  * Mirrors the reference's `CustomError`
  * (/root/reference/jobs/create_employee_all.py:16-18).
  */
final class DataQualityException(msg: String) extends RuntimeException(msg)

/** Catalog entry for one managed table: where to read it, where to write
  * it, its declared schema, and its uniqueness keys.
  *
  * Spark-native equivalent of the reference's `table_profiles` dict
  * (/root/reference/configs/config.py:3-62). Schemas are fixed/declared,
  * never inferred, and enforced both at read (FAILFAST) and at write
  * (exact schema-equality gate, including nullability).
  *
  * @param inputGlob   glob of CSV files to ingest
  * @param outputPath  directory the table is written to
  * @param archivePath where consumed input files are moved after a
  *                    successful run (reference: `processed/`)
  * @param schema      declared schema, enforced exactly
  * @param keys        columns that must be unique per row
  */
final case class TableProfile(
    inputGlob: String,
    outputPath: String,
    archivePath: Option[String],
    schema: StructType,
    keys: Seq[String])

/** The three employee-dimension table profiles, parameterized by base
  * directories instead of the reference's hardcoded relative paths
  * (/root/reference/configs/config.py:5-6,:23-24,:43-44).
  */
object EmployeeTables {

  /** 10-column daily snapshot schema (config.py:7-19). */
  val snapshotSchema: StructType = StructType(Seq(
    StructField("snapshot_date", DateType, nullable = true),
    StructField("employee_number", IntegerType, nullable = true),
    StructField("status", StringType, nullable = true),
    StructField("first_name", StringType, nullable = true),
    StructField("last_name", StringType, nullable = true),
    StructField("gender", StringType, nullable = true),
    StructField("email", StringType, nullable = true),
    StructField("phone_number", StringType, nullable = true),
    StructField("salary", IntegerType, nullable = true),
    StructField("termination_date", DateType, nullable = true)))

  /** 12-column SCD output schema: snapshot columns + change_status
    * (non-nullable — the when/otherwise chain with all-literal branches
    * produces exactly this, config.py:37) + changed_status_date.
    */
  val scdSchema: StructType = StructType(
    snapshotSchema.fields.toSeq ++ Seq(
      StructField("change_status", StringType, nullable = false),
      StructField("changed_status_date", DateType, nullable = true)))

  val keys: Seq[String] = Seq("snapshot_date", "employee_number")

  def empSnapshots(inputDir: String): TableProfile = TableProfile(
    inputGlob = s"$inputDir/*.csv",
    outputPath = s"$inputDir/processed",
    archivePath = Some(s"$inputDir/processed"),
    schema = snapshotSchema,
    keys = keys)

  def employeeAll(outputDir: String): TableProfile = TableProfile(
    inputGlob = s"$outputDir/employee_all/*.csv",
    outputPath = s"$outputDir/employee_all",
    archivePath = None,
    schema = scdSchema,
    keys = keys)

  def employeeCurrent(outputDir: String): TableProfile = TableProfile(
    inputGlob = s"$outputDir/employee_current/*.csv",
    outputPath = s"$outputDir/employee_current",
    archivePath = None,
    schema = scdSchema,
    keys = keys)
}
