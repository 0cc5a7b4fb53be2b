package graft

import java.sql.Date
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.scd.{EmployeeDimJob, EmployeeTables}
import graft.streaming.ScdStateStore

/** Case-class mirror of the 10-column snapshot schema (MemoryStream
  * needs a product encoder; must be top-level for the encoder to
  * instantiate it).
  */
case class EmpSnap(
    snapshot_date: Date, employee_number: Int, status: String,
    first_name: String, last_name: String, gender: String, email: String,
    phone_number: String, salary: Option[Int], termination_date: Option[Date])

class ScdStateStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val refSnaps: Seq[EmpSnap] = {
    val (df, _) = graft.sources.CsvSnapshots.read(
      spark,
      EmployeeTables.empSnapshots("/root/reference/data/input")
        .copy(inputGlob = "/root/reference/data/input/*.csv"))
    // unique per (entity, date): the corpus has one exact duplicate;
    // the processor drops dup dates first-wins, the recompute dedups
    // up front — align them here so both sides see the same rows
    df.dropDuplicates("snapshot_date", "employee_number")
      .as[EmpSnap].collect().toSeq
  }

  test("state-store SCD converges to the corrected-mode full recompute") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sql = spark.sqlContext
      val mem = MemoryStream[EmpSnap]
      val out = ScdStateStore.classifiedStream(mem.toDF())
      val q = out.writeStream.format("memory").queryName("scd_tws")
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tws_ckpt").toString)
        .start()
      try {
        val byDate = refSnaps.groupBy(_.snapshot_date).toSeq
          .sortBy(_._1.getTime)
        // per-entity in-order arrival: feed one snapshot date per batch
        var fed = 0
        val countsAfterBatch = byDate.map { case (_, rows) =>
          mem.addData(rows)
          q.processAllAvailable()
          fed += rows.size
          val n = spark.table("scd_tws").count()
          // append-only: exactly one output row per input row, no rewrites
          assert(n == fed, s"expected $fed appended rows, got $n")
          n
        }
        assert(countsAfterBatch.size == 10)

        val got = ScdStateStore.withDeletedFlips(spark.table("scd_tws"))
          .orderBy("snapshot_date", "employee_number").collect().toSeq

        val cfg = EmployeeDimJob.Config(
          inputDir = "", outputDir = "", legacyChangedStatusDate = false)
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], EmployeeTables.scdSchema)
        val want = EmployeeDimJob.stageEmployeeAll(
          empty, refSnaps.toDF(), cfg)
          .orderBy("snapshot_date", "employee_number").collect().toSeq

        assert(got.size == want.size, s"rows ${got.size} != ${want.size}")
        got.zip(want).foreach { case (a, b) => assert(a == b, s"differs: $a vs $b") }
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("out-of-order snapshots for an entity are rejected, not misclassified") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sql = spark.sqlContext
      val mem = MemoryStream[EmpSnap]
      val out = ScdStateStore.classifiedStream(mem.toDF())
      val q = out.writeStream.format("memory").queryName("scd_tws_ooo")
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tws_ckpt2").toString)
        .start()
      try {
        def snap(d: String, e: Int) = EmpSnap(
          Date.valueOf(d), e, "Active", null, null, null, null, null, Some(1), None)
        mem.addData(snap("2023-01-02", 1))
        q.processAllAvailable()
        mem.addData(snap("2023-01-01", 1)) // older than state: must fail
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        def causes(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ causes(t.getCause)
        assert(causes(ex).exists(_.contains("out-of-order snapshot")),
          s"unexpected failure: ${causes(ex)}")
      } finally if (q.isActive) q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
