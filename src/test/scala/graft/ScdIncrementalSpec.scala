package graft

import java.sql.Date
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.{Scd, ScdIncremental}
import graft.sources.CsvSnapshots
import graft.scd.EmployeeTables

/** Incremental SCD must equal the full recompute — on the reference
  * corpus split at every possible day boundary, and on randomized
  * histories. (Corrected-islands mode: the legacy cross-entity quirk is
  * not incrementally maintainable.)
  */
class ScdIncrementalSpec extends SparkSpec {

  private def classifyFull(snapshots: DataFrame): DataFrame =
    snapshots
      .transform(Scd.addRowHash(exclude = Seq("snapshot_date")))
      .transform(Scd.changeStatus(entityCols = Seq("employee_number")))
      .drop(Scd.RowHash)

  private def canon(df: DataFrame): Seq[Row] =
    df.orderBy("snapshot_date", "employee_number").collect().toSeq

  private lazy val refSnapshots: DataFrame = {
    val (df, _) = CsvSnapshots.read(
      spark,
      EmployeeTables.empSnapshots("/root/reference/data/input")
        .copy(inputGlob = "/root/reference/data/input/*.csv"))
    // one row per (date, entity) — the reference corpus has one exact
    // duplicate which full/incremental may tie-break differently
    df.dropDuplicates("snapshot_date", "employee_number").cache()
  }

  test("incremental equals full recompute at every reference split day") {
    val days = refSnapshots.select("snapshot_date").distinct()
      .collect().map(_.getDate(0)).sortBy(_.toLocalDate.toEpochDay)
    for (splitIdx <- 1 until days.length) {
      val boundary = days(splitIdx)
      val base = refSnapshots.filter(col("snapshot_date") < lit(boundary))
      val batch = refSnapshots.filter(col("snapshot_date") >= lit(boundary))
      val incremental = ScdIncremental.mergeBatch(
        classifyFull(base), batch, entityCols = Seq("employee_number"))
      val full = classifyFull(refSnapshots)
      val got = canon(incremental)
      val want = canon(full)
      assert(got.size == want.size, s"split at $boundary: row count")
      got.zip(want).foreach { case (a, b) =>
        assert(a == b, s"split at $boundary differs:\n  inc:  $a\n  full: $b")
      }
    }
  }

  test("incremental equals full recompute on randomized histories") {
    import spark.implicits._
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val dates = (1 to 2 + rnd.nextInt(6)).map(d => Date.valueOf(f"2023-02-$d%02d"))
      val rows = for {
        e <- 1 to (2 + rnd.nextInt(12))
        d <- dates if rnd.nextDouble() < 0.8
      } yield (d, e, s"v${rnd.nextInt(3)}")
      val all = rows.toDF("snapshot_date", "employee_number", "value")
      val split = dates(1 + rnd.nextInt(dates.size - 1))
      val base = all.filter($"snapshot_date" < lit(split))
      val batch = all.filter($"snapshot_date" >= lit(split))
      if (base.count() > 0 && batch.count() > 0) {
        val incremental = ScdIncremental.mergeBatch(
          classifyFull(base), batch, entityCols = Seq("employee_number"))
        val got = canon(incremental.select("snapshot_date", "employee_number",
          "value", "change_status", "changed_status_date"))
        val want = canon(classifyFull(all).select("snapshot_date", "employee_number",
          "value", "change_status", "changed_status_date"))
        assert(got == want, s"seed=$seed split=$split mismatch")
      }
    }
  }

  test("absent entities flip to Deleted only on their last row") {
    import spark.implicits._
    val base = Seq(
      (Date.valueOf("2023-03-01"), 1, "a"),
      (Date.valueOf("2023-03-02"), 1, "a"),
      (Date.valueOf("2023-03-01"), 2, "x"))
      .toDF("snapshot_date", "employee_number", "value")
    val batch = Seq((Date.valueOf("2023-03-03"), 2, "y"))
      .toDF("snapshot_date", "employee_number", "value")
    val out = ScdIncremental.mergeBatch(
      classifyFull(base), batch, Seq("employee_number"))
      .orderBy("employee_number", "snapshot_date")
      .select("employee_number", "snapshot_date", "change_status")
      .as[(Int, Date, String)].collect().toSeq
    assert(out == Seq(
      (1, Date.valueOf("2023-03-01"), "New"),
      (1, Date.valueOf("2023-03-02"), "Deleted"),
      (2, Date.valueOf("2023-03-01"), "New"),
      (2, Date.valueOf("2023-03-03"), "Changed")))
  }

  test("correction replay: a re-delivered old date replaces the stored row") {
    import spark.implicits._
    // entity 1: days 1-3 with a bad value on day 2; the correction
    // makes day 2 equal day 1, healing day 2 to "No Change" and
    // re-classifying day 3
    val base = Seq(
      (Date.valueOf("2023-03-01"), 1, "a"),
      (Date.valueOf("2023-03-02"), 1, "BAD"),
      (Date.valueOf("2023-03-03"), 1, "a"),
      (Date.valueOf("2023-03-01"), 2, "x"))
      .toDF("snapshot_date", "employee_number", "value")
    val correction = Seq((Date.valueOf("2023-03-02"), 1, "a"))
      .toDF("snapshot_date", "employee_number", "value")

    val replayed = ScdIncremental.mergeBatch(
      classifyFull(base), correction, Seq("employee_number"),
      preferIncoming = true)
    val corrected = Seq(
      (Date.valueOf("2023-03-01"), 1, "a"),
      (Date.valueOf("2023-03-02"), 1, "a"),
      (Date.valueOf("2023-03-03"), 1, "a"),
      (Date.valueOf("2023-03-01"), 2, "x"))
      .toDF("snapshot_date", "employee_number", "value")
    assert(canon(replayed) == canon(classifyFull(corrected)),
      "correction replay must equal a full recompute over corrected data")
    // corrected day 2 heals to No Change; day 3 holds the global max
    // so it is live (No Change), not Deleted
    val statuses = replayed.filter(col("employee_number") === 1)
      .orderBy("snapshot_date").select("change_status")
      .as[String].collect().toSeq
    assert(statuses == Seq("New", "No Change", "No Change"), statuses.toString)
  }
}
