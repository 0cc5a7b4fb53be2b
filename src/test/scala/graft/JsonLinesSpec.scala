package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.sources.JsonLines

class JsonLinesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("valid rows parse, corrupt lines land verbatim in quarantine") {
    val dir = Files.createTempDirectory("jsonl").toString
    val in = s"$dir/in.jsonl"
    val qdir = s"$dir/quarantine"
    Files.writeString(java.nio.file.Paths.get(in),
      """{"doc_id": 1, "text": "hello"}
        |{"doc_id": 2 "text": "missing comma"}
        |{"doc_id": 3, "text": "ok"}
        |not json at all
        |""".stripMargin)

    val r = JsonLines.readWithQuarantine(spark, in, schema, qdir)
    assert(r.quarantined == 2)
    val good = r.good.orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(good == Seq((1L, "hello"), (3L, "ok")))
    val q = spark.read.parquet(qdir).select("raw_line").as[String].collect().toSet
    assert(q == Set("""{"doc_id": 2 "text": "missing comma"}""", "not json at all"))
    assert(spark.read.parquet(qdir).columns.toSeq == Seq("raw_line", "source_file"))
  }

  test("repeated batches append to the quarantine audit trail") {
    val dir = Files.createTempDirectory("jsonl2").toString
    val qdir = s"$dir/quarantine"
    for (i <- 1 to 2) {
      val in = s"$dir/in$i.jsonl"
      Files.writeString(java.nio.file.Paths.get(in),
        s"""{"doc_id": $i, "text": "ok"}
           |bad line $i
           |""".stripMargin)
      val r = JsonLines.readWithQuarantine(spark, in, schema, qdir)
      assert(r.quarantined == 1)
    }
    assert(spark.read.parquet(qdir).count() == 2)
  }

  test("a fully clean file quarantines nothing and writes no side output") {
    val dir = Files.createTempDirectory("jsonl3").toString
    val in = s"$dir/in.jsonl"
    Files.writeString(java.nio.file.Paths.get(in),
      """{"doc_id": 1, "text": "a"}
        |""".stripMargin)
    val r = JsonLines.readWithQuarantine(spark, in, schema, s"$dir/quarantine")
    assert(r.quarantined == 0 && r.good.count() == 1)
    assert(!new java.io.File(s"$dir/quarantine").exists())
  }
}
