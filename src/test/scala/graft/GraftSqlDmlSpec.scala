package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** The SQL DML write surface ([[graft.plans.GraftSqlDml]]): a PySpark
  * user mutates graft tables through `spark.sql` alone. The session
  * under test carries the production extensions line (SparkSpec), so
  * every statement here runs exactly as deployed.
  */
class GraftSqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_dml").toString

  private def snap(root: String) =
    spark.sql(s"SELECT * FROM graft_table_snapshot('$root')")

  test("INSERT INTO appends with stats; INSERT OVERWRITE replaces") {
    val root = freshRoot()
    Seq((1L, "a", 10.0), (2L, "b", 5.0), (3L, "a", 7.0))
      .toDF("id", "k", "price").createOrReplaceTempView("dml_src")
    val r1 = spark.sql(
      s"INSERT INTO graft.`$root` SELECT * FROM dml_src").collect()
    assert(r1.head.getString(0) === "INSERT" && r1.head.getLong(1) === 0L)
    assert(snap(root).count() === 3L)
    // the SQL writer collected stats: the metadata count path works
    assert(VersionedTable.rowCount(spark, root) === Some(3L))
    spark.sql(s"INSERT INTO graft.`$root` " +
      "SELECT id + 10 AS id, k, price FROM dml_src")
    assert(snap(root).count() === 6L)
    spark.sql(s"INSERT OVERWRITE graft.`$root` " +
      "SELECT * FROM dml_src WHERE k = 'a'")
    assert(snap(root).count() === 2L)
  }

  test("DELETE FROM with and without WHERE") {
    val root = freshRoot()
    VersionedTable.commit(
      (1L to 10L).map(i => (i, i * 1.5)).toDF("id", "v"),
      root, statsColumns = Seq("*"))
    val r = spark.sql(
      s"DELETE FROM graft.`$root` WHERE id > 7").collect()
    assert(r.head.getString(0) === "DELETE")
    assert(snap(root).count() === 7L)
    spark.sql(s"DELETE FROM graft.`$root`")
    assert(snap(root).count() === 0L)
  }

  test("MERGE matches the DataFrame-API merge exactly") {
    val sqlRoot = freshRoot()
    val apiRoot = freshRoot()
    val base = Seq((1L, "keep", 10.0), (2L, "upd", 20.0),
      (3L, "del", 30.0)).toDF("id", "k", "price")
    val src = Seq((2L, "updated", 21.0), (3L, "gone", 250000.0),
      (4L, "new", 40.0), (5L, "tomb", 300000.0))
      .toDF("id", "k", "price")
    Seq(sqlRoot, apiRoot).foreach(r =>
      VersionedTable.commit(base, r, statsColumns = Seq("*")))
    src.createOrReplaceTempView("dml_merge_src")
    spark.sql(
      s"""MERGE INTO graft.`$sqlRoot` AS t
         |USING (SELECT * FROM dml_merge_src) AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.price > 100000.0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    VersionedTable.merge(spark, apiRoot, src, Seq("id"),
      deleteMatched = Some(col("price") > 100000.0))
    val got = snap(sqlRoot).orderBy("id").collect().toSeq
    val want = VersionedTable.read(spark, apiRoot)
      .orderBy("id").collect().toSeq
    assert(got === want)
    // id 2 updated, 3 deleted (matched tombstone), 4 inserted,
    // 5 skipped (unmatched tombstone inserts nothing)
    assert(got.map(_.getLong(0)) === Seq(1L, 2L, 4L))
  }

  test("MERGE with a bare table source and unqualified ON") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, 1.0)).toDF("id", "v"), root)
    Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
      .createOrReplaceTempView("dml_merge_bare")
    spark.sql(s"MERGE INTO graft.`$root` USING dml_merge_bare ON id = id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(snap(root).orderBy("id").as[(Long, Double)].collect().toSeq
      === Seq((1L, 2.0), (2L, 3.0)))
  }

  test("OPTIMIZE bin-packs; OPTIMIZE ZORDER BY re-clusters and prunes") {
    val root = freshRoot()
    // five trickle appends -> five small files
    (1 to 5).foreach(i => VersionedTable.commit(
      Seq((i.toLong, i * 1.0)).toDF("id", "v"), root,
      statsColumns = Seq("*")))
    val before = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get).files.size
    assert(before === 5)
    spark.sql(s"OPTIMIZE graft.`$root`")
    val after = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get).files.size
    assert(after === 1, s"bin-pack left $after files")
    assert(snap(root).count() === 5L)

    // z-order: cluster on two dims, then prove pruning on both
    val zroot = freshRoot()
    val rows = for (x <- 0L until 64L; y <- 0L until 8L)
      yield (x, y, x * 100 + y)
    VersionedTable.commit(rows.toDF("x", "y", "payload")
      .repartition(8), zroot, statsColumns = Seq("*"))
    spark.sql(s"OPTIMIZE graft.`$zroot` ZORDER BY (x, y) INTO 8 FILES")
    assert(snap(zroot).count() === 512L)
    val m = VersionedTable.manifest(spark, zroot,
      VersionedTable.latestVersion(spark, zroot).get)
    // a tight 2-D predicate must not need every file
    val (kept, _) = VersionedTable.pruneFiles(spark, zroot,
      col("x") < 8L && col("y") < 2L)
    assert(kept.size < m.files.size,
      s"z-order left no pruning: ${kept.size} of ${m.files.size}")
    assert(VersionedTable.readWhere(spark, zroot,
      col("x") < 8L && col("y") < 2L).count() === 16L)
  }

  test("OPTIMIZE WHERE scopes; WHERE plus ZORDER refuses") {
    val root = freshRoot()
    (1 to 4).foreach(i => VersionedTable.commit(
      Seq((i.toLong, i * 1.0)).toDF("id", "v"), root,
      statsColumns = Seq("*")))
    spark.sql(s"OPTIMIZE graft.`$root` WHERE id <= 2")
    val m = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m.files.size === 3, "two selected files pack into one")
    assert(snap(root).count() === 4L)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft.`$root` WHERE id <= 2 ZORDER BY (id)")
    }
    assert(e.getMessage.contains("not both"))
  }

  test("VACUUM RETAIN destroys old versions' time travel") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "k"), root)
    VersionedTable.commit(Seq((2L, "b")).toDF("id", "k"), root)
    val r = spark.sql(
      s"VACUUM graft.`$root` RETAIN 1 VERSIONS").collect()
    assert(r.head.getString(0) === "VACUUM" && r.head.isNullAt(1))
    assert(snap(root).count() === 2L)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table_snapshot('$root', 0)").collect()
    }
  }

  test("string literals are opaque to the MERGE grammar surgery") {
    val root = freshRoot()
    Seq((1L, "per s. smith"), (2L, "keep :-)"), (3L, "x"))
      .toDF("id", "note").createOrReplaceTempView("lit_base")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM lit_base")
    // (a) parens inside a source-subquery literal must not unbalance
    // the scanner; (b) the delete condition's literal containing
    // "s. " must survive the source-alias strip AND "t." inside a
    // literal must not trip the target-alias refusal
    Seq((1L, "per s. smith"), (2L, "t. still here"), (9L, "new"))
      .toDF("id", "note").createOrReplaceTempView("lit_src")
    spark.sql(
      s"MERGE INTO graft.`$root` AS t USING " +
        "(SELECT id, note FROM lit_src WHERE note <> ':-)' AND id < 10) " +
        "AS s ON t.id = s.id " +
        "WHEN MATCHED AND s.note = 'per s. smith' THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    val got = snap(root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 1 deleted (its literal matched EXACTLY), id 2 updated to the
    // "t. still here" note, id 9 inserted, id 3 untouched
    assert(got === Map(2L -> "t. still here", 3L -> "x", 9L -> "new"),
      s"literal-blind grammar surgery corrupted the merge: $got")
  }

  test("OPTIMIZE INTO n FILES without WHERE honors the pinned count") {
    val root = freshRoot()
    (0 until 6).foreach(k => spark.sql(
      s"INSERT INTO graft.`$root` SELECT id, id * 2 AS v " +
        s"FROM range(${k * 10}, ${k * 10 + 10})"))
    spark.sql(s"OPTIMIZE graft.`$root` INTO 3 FILES")
    val m = VersionedTable.manifest(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(m.files.size === 3,
      s"INTO 3 FILES must yield exactly 3 files, got ${m.files.size}")
    assert(snap(root).count() === 60L)
  }

  test("CREATE TABLE ... SHALLOW CLONE branches through pure SQL") {
    val src = freshRoot()
    spark.sql(s"INSERT INTO graft.`$src` SELECT id, id * 10 AS v " +
      "FROM range(0, 20)")
    spark.sql(s"INSERT INTO graft.`$src` SELECT id, id * 10 AS v " +
      "FROM range(100, 120)")
    val dst = freshRoot() + "/branch"
    val r = spark.sql(
      s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src`").collect()
    assert(r.head.getString(0) === "CLONE" && r.head.getLong(1) === 0L)
    assert(snap(dst).count() === 40L)
    // the branch diverges via SQL DML; the source must not move
    spark.sql(s"DELETE FROM graft.`$dst` WHERE id >= 100")
    assert(snap(dst).count() === 20L)
    assert(snap(src).count() === 40L)
    // VERSION AS OF clones the pinned history point
    val dst0 = freshRoot() + "/b0"
    spark.sql(s"CREATE TABLE graft.`$dst0` SHALLOW CLONE graft.`$src` " +
      "VERSION AS OF 0").collect()
    assert(snap(dst0).count() === 20L)
    // ordinary CREATE TABLE statements still delegate to Spark
    intercept[Exception] {
      spark.sql("CREATE TABLE not_graft_definitely_missing_loc " +
        "SHALLOW CLONE whatever")
    }
  }

  test("the engine-faithful subset refuses loudly, with the shape") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, 1.0)).toDF("id", "v"), root)
    Seq((1L, 2.0)).toDF("id", "v").createOrReplaceTempView("dml_bad_src")
    def msg(sql: String): String =
      intercept[IllegalArgumentException](spark.sql(sql)).getMessage
    // conditional UPDATE is outside the upsert contract
    assert(msg(s"MERGE INTO graft.`$root` USING dml_bad_src ON id = id " +
      "WHEN MATCHED AND v > 0 THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *").contains("unconditionally"))
    // non-equality ON
    assert(msg(s"MERGE INTO graft.`$root` USING dml_bad_src ON id > id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      .contains("key equality"))
    // target-alias reference in the DELETE condition
    assert(msg(s"MERGE INTO graft.`$root` AS t USING dml_bad_src AS s " +
      "ON t.id = s.id WHEN MATCHED AND t.v > 0 THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      .contains("SOURCE columns"))
    // missing INSERT leg
    assert(msg(s"MERGE INTO graft.`$root` USING dml_bad_src ON id = id " +
      "WHEN MATCHED THEN UPDATE SET *").contains("keyed upsert"))
  }

  test("non-graft statements delegate to Spark untouched") {
    assert(spark.sql("SELECT 1 + 1 AS x").collect().head.getInt(0) === 2)
    // Spark's own error surface, not graft's
    val e = intercept[Exception] {
      spark.sql("DELETE FROM some_missing_table WHERE x = 1")
    }
    assert(!e.getMessage.contains("graft SQL DML"))
  }
}
