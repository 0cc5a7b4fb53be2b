package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import graft.scd.TableProfile

/** Schema-enforced CSV ingest / egress / archival for snapshot tables.
  *
  * Re-expresses the reference's S1-S5 file operators
  * (/root/reference/jobs/create_employee_all.py:29-49,:182-214) with two
  * fixes the reference lacks:
  *
  *   - the sink writes to a temp dir and atomically swaps it in, so a
  *     plan that reads the same directory it overwrites can never hit
  *     the reference's intermittent FileNotFoundException
  *     (/root/reference/README.md:109-112);
  *   - the single-file `coalesce(1)` is opt-in (`singleFile`), since a
  *     one-partition write is fatal at large scale.
  */
object CsvSnapshots {

  /** Expand a glob to a concrete, sorted file list (reference keeps the
    * list so the same files can be archived after the load,
    * create_employee_all.py:36). Uses the Hadoop FileSystem so the same
    * code works on HDFS/S3A paths on a real cluster.
    */
  def globFiles(spark: SparkSession, glob: String): Seq[String] = {
    val path = new Path(glob)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(path)).getOrElse(Array.empty)
    matched.filter(_.isFile).map(_.getPath.toString).sorted.toSeq
  }

  /** Read all files matching the profile's input glob with the declared
    * schema (never inferred): FAILFAST, header, nullValue=NULL,
    * dateFormat=yyyy-MM-dd (create_employee_all.py:40-47). An empty glob
    * bootstraps an empty DataFrame with the declared schema — the
    * reference's first-run behavior (S3, config.py:23).
    *
    * @return the DataFrame and the concrete file list that produced it
    */
  def read(spark: SparkSession, profile: TableProfile): (DataFrame, Seq[String]) = {
    // repair any swap interrupted by a crash before globbing
    val destDir = new Path(profile.outputPath)
    AtomicDir.recover(
      destDir.getFileSystem(spark.sparkContext.hadoopConfiguration), destDir)
    val files = globFiles(spark, profile.inputGlob)
    val df =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], profile.schema)
      else
        spark.read
          .schema(profile.schema)
          .option("mode", "FAILFAST")
          .option("header", "true")
          .option("nullValue", "NULL")
          .option("dateFormat", "yyyy-MM-dd")
          .csv(files: _*)
    (df, files)
  }

  /** Write with the reference's CSV options (create_employee_all.py:190-196)
    * via temp-dir + atomic rename. `singleFile=true` reproduces the
    * reference's `coalesce(1)` single-part output; leave it false at scale.
    */
  def write(df: DataFrame, profile: TableProfile, singleFile: Boolean = false): Unit = {
    val dest = new Path(profile.outputPath)
    val fs = dest.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = if (singleFile) df.coalesce(1) else df
    out.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("nullValue", "NULL")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(AtomicDir.tmpPath(dest).toString)
    AtomicDir.commit(fs, dest)
  }

  /** Move consumed input files to the archive dir (reference's
    * `move_files`, create_employee_all.py:198-214). Called only after all
    * writes succeed, so a failed run leaves inputs in place for retry.
    */
  def archive(spark: SparkSession, files: Seq[String], profile: TableProfile): Unit =
    profile.archivePath.foreach { dir =>
      val destDir = new Path(dir)
      val fs = destDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(destDir)) fs.mkdirs(destDir)
      files.foreach { f =>
        val src = new Path(f)
        fs.rename(src, new Path(destDir, src.getName))
      }
    }
}
