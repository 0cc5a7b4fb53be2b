package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for all suites (UTC, small shuffle
  * partition count for local mode).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterEach {
  lazy val spark: SparkSession = SparkSpec.session

  /** The manifest parse cache's (mtime, len) guard cannot see a
    * same-length in-place rewrite within the filesystem's mtime
    * granularity — impossible for committed tables (the rename arbiter
    * writes a version file once) but reachable by a test that rebuilds
    * a fixture tree in place quickly. Start every test cold so no spec
    * can observe a stale parse.
    */
  override protected def beforeEach(): Unit = {
    graft.sources.VersionedTable.clearManifestCaches()
    super.beforeEach()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the production deployment line — tests run what users run.
      // BOTH routes on purpose: the config string is what a cluster
      // sets, but it is a STATIC conf read off the SparkContext's
      // SparkConf — if another suite created the context first the
      // string is silently ignored, so withExtensions (context-
      // independent) guarantees the surface is always present
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
