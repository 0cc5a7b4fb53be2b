package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Scd, SchemaEvolution}

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("union by name with null-fill and first-seen column order") {
    val v1 = Seq((1L, "ann")).toDF("id", "name")
    val v2 = Seq((2L, "bob", "b@x.io")).toDF("id", "name", "email")
    val out = SchemaEvolution.unionEvolved(Seq(v1, v2))
    assert(out.columns.toSeq == Seq("id", "name", "email"))
    val rows = out.orderBy("id").collect().map(_.toSeq)
    assert(rows(0) == Seq(1L, "ann", null))
    assert(rows(1) == Seq(2L, "bob", "b@x.io"))
  }

  test("integral and fractional types widen; conflicts fail loudly") {
    val a = Seq((1, 1.0f)).toDF("n", "x")
    val b = Seq((2L, 2.0d)).toDF("n", "x")
    val s = SchemaEvolution.evolvedSchema(Seq(a, b))
    assert(s("n").dataType == LongType && s("x").dataType == DoubleType)
    val bad = Seq(("oops", 1)).toDF("n", "y")
    val ex = intercept[IllegalArgumentException] {
      SchemaEvolution.evolvedSchema(Seq(a, bad))
    }
    assert(ex.getMessage.contains("irreconcilable"))
  }

  test("a column addition does NOT stampede SCD statuses to Changed") {
    // day 1 on the old schema, day 2 adds `email` (null for everyone
    // except one genuinely changed row). The concat_ws null-skip means
    // untouched entities keep their hash and classify No Change.
    val d1 = Seq(
      (java.sql.Date.valueOf("2020-01-01"), 1L, "ann"),
      (java.sql.Date.valueOf("2020-01-01"), 2L, "bob"))
      .toDF("snapshot_date", "employee_id", "name")
    val d2raw = Seq(
      (java.sql.Date.valueOf("2020-01-02"), 1L, "ann", Option.empty[String]),
      (java.sql.Date.valueOf("2020-01-02"), 2L, "bob", Some("bob@x.io")))
      .toDF("snapshot_date", "employee_id", "name", "email")

    val target = SchemaEvolution.evolvedSchema(Seq(d1, d2raw))
    val snaps = SchemaEvolution.unionEvolved(Seq(d1, d2raw))
    val hashed = Scd.addRowHash()(snaps)
    val statuses = Scd.changeStatus(Seq("employee_id"))(hashed)
      .filter(col("snapshot_date") === "2020-01-02")
      .select("employee_id", Scd.ChangeStatus)
      .as[(Long, String)].collect().toMap
    assert(statuses(1L) == "No Change",
      s"null-filled new column must not change entity 1's hash: $statuses")
    assert(statuses(2L) == "Changed",
      s"entity 2 genuinely gained a value: $statuses")
    assert(target("email").nullable)
  }
}
