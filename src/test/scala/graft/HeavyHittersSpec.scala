package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.HeavyHitters
import graft.plans.NativeSketch

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def words = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(explode(split(TextFunctions.normalizeText(col("text")), " ")).as("word"))

  test("cms estimates satisfy the one-sided guarantee on every token") {
    val w = words
    val exact = w.groupBy("word").agg(count(lit(1)).as("n_exact"))
    val checked = HeavyHitters.withEstimates(exact, "word", w, "word",
      eps = 0.001, confidence = 0.99, seed = 17)
    // overestimate-only, within eps*N: check EVERY distinct token, not
    // just heavy ones — underestimates are impossible by construction
    val bad = checked.filter(col("cms_est") < col("n_exact") ||
      col("cms_est") > col("n_exact") + col("cms_slack"))
    assert(bad.count() == 0L, bad.limit(5).collect().mkString(", "))
  }

  test("estimates are deterministic for a fixed seed") {
    val w = words
    val exact = w.groupBy("word").agg(count(lit(1)).as("n_exact")).limit(50)
    def run() = HeavyHitters.withEstimates(exact, "word", w, "word", seed = 17)
      .select("word", "cms_est").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run() == run())
  }

  test("codegen and interpreted evaluation agree") {
    val w = Seq("a", "b", "a", "c", "a", "b").toDF("word")
    val sketch = w.agg(count_min_sketch(col("word"), lit(0.01), lit(0.99), lit(1)))
      .head().getAs[Array[Byte]](0)
    val df = Seq("a", "b", "c", "missing").toDF("word")
      .withColumn("est", NativeSketch.cmsEstimate(sketch, col("word")))
    val viaCodegen = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tiny sketch (eps 0.01 on 6 items): estimates are exact here
    assert(viaCodegen == Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "missing" -> 0L))
    // interpreted path: evaluate the expression directly
    import org.apache.spark.sql.classic.GraftPlanApi
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val e = graft.plans.CmsEstimate(Literal(sketch),
      Literal(UTF8String.fromString("a"), org.apache.spark.sql.types.StringType))
    assert(e.eval(null) == 3L)
    assert(GraftPlanApi.expression(lit(1)) != null) // bridge stays importable
  }

  test("a non-literal sketch column is rejected at analysis time") {
    val w = Seq("a").toDF("word")
    val sketchDf = w.agg(count_min_sketch(col("word"), lit(0.01), lit(0.99), lit(1)).as("sk"))
    val joined = w.crossJoin(sketchDf)
    import org.apache.spark.sql.classic.GraftPlanApi
    val bad = GraftPlanApi.column(graft.plans.CmsEstimate(
      GraftPlanApi.expression(col("sk")), GraftPlanApi.expression(col("word"))))
    val err = intercept[Exception] { joined.select(bad).collect() }
    assert(err.getMessage.toLowerCase.contains("literal"),
      s"expected literal-sketch rejection, got: ${err.getMessage}")
  }

  test("null items and empty corpora degrade to null, not crashes") {
    val w = Seq(Some("a"), None).toDF("word")
    val sketch = Seq("a").toDF("word")
      .agg(count_min_sketch(col("word"), lit(0.01), lit(0.99), lit(1)))
      .head().getAs[Array[Byte]](0)
    val out = w.withColumn("est", NativeSketch.cmsEstimate(sketch, col("word")))
      .orderBy(col("word").asc_nulls_last).collect()
    assert(out(0).getLong(1) == 1L && out(1).isNullAt(1))
  }
}
