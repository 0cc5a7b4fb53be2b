package graft

import org.apache.spark.sql.types._
import graft.scd.{DataQualityException, Quality, TableProfile}

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def profile = TableProfile(
    inputGlob = "", outputPath = "", archivePath = None,
    schema = schema, keys = Seq("k"))

  private def df(rows: (Int, String)*) = {
    val data = rows.map { case (k, v) => org.apache.spark.sql.Row(k, v) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data), schema)
  }

  test("happy path passes all three gates") {
    Quality.check(df(1 -> "a", 2 -> "b"), profile)
  }

  test("schema mismatch fails, including nullability-only differences") {
    val nullableK = StructType(Seq(
      StructField("k", IntegerType, nullable = true),
      StructField("v", StringType, nullable = true)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1, "a"))),
      nullableK)
    val e = intercept[DataQualityException](Quality.check(d, profile))
    assert(e.getMessage.contains("Schemas don't match"))
  }

  test("zero rows fails") {
    val e = intercept[DataQualityException](Quality.check(df(), profile))
    assert(e.getMessage.contains("Zero rows"))
  }

  test("duplicate keys fail with the violating count") {
    val e = intercept[DataQualityException](
      Quality.check(df(1 -> "a", 1 -> "b", 2 -> "c"), profile))
    assert(e.getMessage.contains("Key uniqueness violated"))
    assert(e.getMessage.contains("1 duplicate keys"))
  }

  test("composite keys are checked as a tuple, not independently") {
    val s2 = StructType(Seq(
      StructField("a", IntegerType, nullable = true),
      StructField("b", IntegerType, nullable = true)))
    val p2 = profile.copy(schema = s2, keys = Seq("a", "b"))
    val ok = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1, 1), org.apache.spark.sql.Row(1, 2),
        org.apache.spark.sql.Row(2, 1))),
      s2)
    Quality.check(ok, p2) // shared prefixes are fine; tuples unique
  }
}
