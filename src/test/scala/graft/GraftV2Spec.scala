package graft

import org.apache.spark.sql.execution.RowDataSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** The DataSourceV2 connector ([[graft.sources.v2.GraftDataSource]]):
  * `format("graft")` reads with pushdown-driven zone-map pruning that
  * PLANS the same file list as the native `readWhere`, writes as
  * stats-on commits, and registers in the session catalog via
  * `CREATE TABLE ... USING graft`.
  */
class GraftV2Spec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_v2").toString + "/t"

  private def clusteredTable(): String = {
    val root = freshRoot()
    VersionedTable.commit(
      (0L until 800L).map(i => (i, s"k$i", i * 2.0)).toDF("id", "k", "v")
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"),
      root, statsColumns = Seq("*"))
    root
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // finalize
    df.queryExecution.executedPlan.collectFirst {
      case r: RowDataSourceScanExec => r
    }.getOrElse(fail("no RowDataSourceScanExec in plan"))
  }

  test("pushdown prunes the SAME files as the native readWhere") {
    val root = clusteredTable()
    val pred = col("id") >= 100L && col("id") < 300L
    val df = spark.read.format("graft").load(root).filter(pred)
    val scan = scanOf(df)
    val rel = scan.relation.asInstanceOf[graft.sources.v2.GraftRelation]
    val (native, _) = VersionedTable.pruneFiles(spark, root, pred)
    assert(rel.plannedFiles.sorted === native.sorted,
      "V2 path planned a different file list than readWhere")
    assert(rel.plannedFiles.size < VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get).files.size,
      "the predicate pruned nothing — the parity assertion is vacuous")
    // and the filters surface in the scan node for explain readers
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual"),
      scan.metadata("PushedFilters"))
    // results equal the native read
    assert(df.orderBy("id").collect().toSeq ===
      VersionedTable.readWhere(spark, root, pred).orderBy("id")
        .collect().toSeq)
  }

  test("column pruning reaches the relation; unsupported filters stay") {
    val root = clusteredTable()
    val df = spark.read.format("graft").load(root)
      .filter(length(col("k")) > 2) // not lowerable -> Spark residual
      .select("id")
    val scan = scanOf(df)
    val rel = scan.relation.asInstanceOf[graft.sources.v2.GraftRelation]
    assert(rel.plannedFiles.size === VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get).files.size,
      "an unlowered filter must not prune")
    // `k` stays in the scan output — the RESIDUAL filter needs it
    assert(scan.output.map(_.name) === Seq("id", "k"))
    assert(df.count() === 790L) // k10..k799 have len > 2
    // without a residual, the projection reaches the relation
    val narrow = scanOf(spark.read.format("graft").load(root).select("id"))
    assert(narrow.output.map(_.name) === Seq("id"))
  }

  test("count(*) and full-scan parity") {
    val root = clusteredTable()
    assert(spark.read.format("graft").load(root).count() === 800L)
  }

  test("versionAsOf time travel") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "k"), root)
    VersionedTable.commit(Seq((2L, "b")).toDF("id", "k"), root)
    assert(spark.read.format("graft").option("versionAsOf", 0)
      .load(root).count() === 1L)
    assert(spark.read.format("graft").load(root).count() === 2L)
  }

  test("writes are stats-on commits; overwrite truncates") {
    val root = freshRoot()
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .write.format("graft").save(root)
    assert(VersionedTable.rowCount(spark, root) === Some(2L),
      "V2 write skipped stats")
    Seq((3L, 3.0)).toDF("id", "v")
      .write.format("graft").mode("append").save(root)
    assert(spark.read.format("graft").load(root).count() === 3L)
    Seq((9L, 9.0)).toDF("id", "v")
      .write.format("graft").mode("overwrite").save(root)
    assert(spark.read.format("graft").load(root)
      .as[(Long, Double)].collect().toSeq === Seq((9L, 9.0)))
  }

  test("session-catalog registration: CREATE TABLE USING graft") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"),
      root, statsColumns = Seq("*"))
    spark.sql("DROP TABLE IF EXISTS graft_v2_cat")
    spark.sql(
      s"CREATE TABLE graft_v2_cat USING graft OPTIONS (path '$root')")
    try {
      assert(spark.sql(
        "SELECT sum(v) FROM graft_v2_cat WHERE id = 2").head.getDouble(0)
        === 20.0)
      // writes through the catalog table reach the version log
      spark.sql("INSERT INTO graft_v2_cat VALUES (3, 30.0)")
      assert(spark.sql("SELECT count(*) FROM graft_v2_cat").head.getLong(0)
        === 3L)
      assert(VersionedTable.latestVersion(spark, root) === Some(1L))
    } finally spark.sql("DROP TABLE IF EXISTS graft_v2_cat")
  }
}
