package graft.scd

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import graft.operators.Scd
import graft.sources.CsvSnapshots

/** The employee-dimension ETL pipeline: the reference's single job
  * (/root/reference/jobs/create_employee_all.py:226-251) as a proper
  * Scala `main` with explicit wiring (the reference couples transforms to
  * module globals, create_employee_all.py:77 vs :232).
  *
  * Flow: read existing employee_all + new snapshot CSVs → merge + dedup →
  * hash → classify changes → gate + write employee_all → derive current
  * view → gate + write employee_current → archive consumed inputs.
  *
  * Fixes over the reference, same results:
  *   - staged plan is cached once; the reference re-executes it ≥6 times;
  *   - writes are temp-dir + atomic swap (no overwrite-what-you-read
  *     FileNotFoundException, /root/reference/README.md:109-112);
  *   - single-file output and the legacy cross-entity
  *     changed_status_date quirk are opt-in flags.
  */
object EmployeeDimJob {

  /** @param canonicalSort order output by the table keys before writing
    *   — row order is otherwise partition-arbitrary (SURVEY.md §2.9).
    *   Off by default: a global sort is an extra exchange, and consumers
    *   comparing tables should canonicalize at read anyway.
    */
  final case class Config(
      inputDir: String,
      outputDir: String,
      legacyChangedStatusDate: Boolean = true,
      useSinglePartitionWindow: Boolean = false,
      singleFile: Boolean = true,
      archiveInputs: Boolean = true,
      canonicalSort: Boolean = false)

  /** Pure transform chain: (existing employee_all, new snapshots) → staged
    * employee_all (create_employee_all.py:236-240).
    */
  def stageEmployeeAll(existing: DataFrame, incoming: DataFrame, cfg: Config): DataFrame =
    Scd.importNewFiles(existing, incoming, entityCols = Seq("employee_number"))
      .transform(Scd.removeColumns(Nil))
      .transform(Scd.addRowHash(exclude = Seq("snapshot_date")))
      .transform(Scd.changeStatus(
        entityCols = Seq("employee_number"),
        legacyChangedStatusDate = cfg.legacyChangedStatusDate,
        useSinglePartitionWindow = cfg.useSinglePartitionWindow))

  /** Staged employee_all → employee_current (create_employee_all.py:243-244). */
  def stageEmployeeCurrent(all: DataFrame, cfg: Config): DataFrame =
    all.transform(Scd.latestSnapshot(
      entityCols = Seq("employee_number"),
      useSinglePartitionWindow = cfg.useSinglePartitionWindow))

  def run(spark: SparkSession, cfg: Config): Unit = {
    val snapshots = EmployeeTables.empSnapshots(cfg.inputDir)
    val allProfile = EmployeeTables.employeeAll(cfg.outputDir)
    val currentProfile = EmployeeTables.employeeCurrent(cfg.outputDir)

    val (existingAll, _) = CsvSnapshots.read(spark, allProfile)
    val (incoming, inputFiles) = CsvSnapshots.read(spark, snapshots)

    val staged = stageEmployeeAll(existingAll, incoming, cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    def ordered(df: DataFrame, profile: TableProfile): DataFrame =
      if (cfg.canonicalSort)
        df.orderBy(profile.keys.map(org.apache.spark.sql.functions.col): _*)
      else df
    try {
      Quality.check(staged, allProfile)
      CsvSnapshots.write(ordered(staged, allProfile), allProfile, cfg.singleFile)

      val current = stageEmployeeCurrent(staged, cfg)
      Quality.check(current, currentProfile)
      CsvSnapshots.write(ordered(current, currentProfile), currentProfile, cfg.singleFile)
    } finally staged.unpersist()

    if (cfg.archiveInputs)
      CsvSnapshots.archive(spark, inputFiles, snapshots)
  }

  def main(args: Array[String]): Unit = {
    val inputDir = args.lift(0).getOrElse(sys.error("usage: EmployeeDimJob <inputDir> <outputDir>"))
    val outputDir = args.lift(1).getOrElse(sys.error("usage: EmployeeDimJob <inputDir> <outputDir>"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("employee_dim")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, Config(inputDir, outputDir))
    finally spark.stop()
  }
}
