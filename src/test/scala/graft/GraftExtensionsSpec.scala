package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class exposes the native functions to pure-SQL users
  * in a session built with `.withExtensions` (the config-string route
  * `spark.sql.extensions` goes through the same injection).
  *
  * Isolation: `getOrCreate` would silently return the suite-shared
  * session (extensions NOT applied) if one is active, so the default/
  * active sessions are cleared first; the new session shares the
  * existing SparkContext, so it must NOT be stopped.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("SQL surface: graft_* functions resolve and compute") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)
      val sig = spark.sql(
        "SELECT graft_minhash_sig32(graft_shingle_hash32(array('a','b','c','d'), 2)) AS s")
        .head().getSeq[Long](0)
      assert(sig.length == 32 && sig.forall(_ >= 0))
      val bands = spark.sql(
        "SELECT graft_band_hashes(graft_minhash_sig32(" +
          "graft_shingle_hash32(array('a','b','c','d'), 2)), 8, 4) AS b")
        .head().getSeq[String](0)
      assert(bands.length == 8 && bands.forall(_.length == 64))
      val hp = spark.sql(
        "SELECT graft_hyperplane_sig(array(0.5d, -0.5d), 8, 42L) AS h")
        .head().getLong(0)
      assert(hp >= 0 && hp < 256)
      val red = spark.sql(
        "SELECT graft_redact_pii('mail a@b.co or https://x.io now') AS r")
        .head().getString(0)
      assert(red == "mail <EMAIL> or <URL> now", red)
      val nfc = spark.sql(
        "SELECT graft_nfc('café') AS n").head().getString(0)
      assert(nfc == "café", nfc)
      val cr = spark.sql(
        "SELECT graft_compression_ratio(repeat('ab', 200)) AS c")
        .head().getDouble(0)
      assert(cr > 0.0 && cr < 0.2, s"repetitive text must compress hard: $cr")

      // ---- TABLE functions: the PySpark/SQL driving surface --------
      import spark.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("graft_ext_vt").toString + "/t"
      graft.sources.VersionedTable.commit(
        Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), root,
        statsColumns = Seq("*"))
      graft.sources.VersionedTable.commit(
        Seq((3L, 30L)).toDF("id", "v"), root, statsColumns = Seq("*"))
      assert(spark.sql(
        s"SELECT id FROM graft_table_snapshot('$root') ORDER BY id")
        .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
      assert(spark.sql(
        s"SELECT id FROM graft_table_snapshot('$root', 0) ORDER BY id")
        .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
      assert(spark.sql(
        s"SELECT id, _change_type FROM graft_table_changes('$root', 0, 1)")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        === Seq((3L, "insert")))
      assert(spark.sql(
        s"SELECT version, operation, total_rows FROM " +
          s"graft_table_history('$root') ORDER BY version")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq === Seq((0L, "append", 2L), (1L, "append", 3L)))
      // the SCD pipeline from pure SQL, against the reference inputs
      val inp = java.nio.file.Files
        .createTempDirectory("graft_ext_scd").toString
      val refIn = new java.io.File("/root/reference/data/input")
      if (refIn.isDirectory) {
        refIn.listFiles().filter(_.getName.endsWith(".csv")).foreach(f =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(inp, f.getName)))
        val all = spark.sql(
          s"SELECT * FROM graft_scd_employee_all('$inp')")
        assert(all.count() === 494L)
        assert(all.columns.contains("change_status"))
        val cur = spark.sql(
          s"SELECT * FROM graft_scd_employee_current('$inp')")
        assert(cur.count() === 50L)
      }
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
