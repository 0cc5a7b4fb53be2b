package graft

import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Spark's DataSketches HLL
  * surface): the scale-native pattern for "distinct users per
  * day/week/month" over 100 TB — store one small sketch per partition,
  * MERGE sketches instead of re-scanning rows for every rollup scope.
  * Exact distinct (q_count_distinct) stays the oracled truth; this
  * pins the sketch workflow: per-group sketches union to the same
  * estimate as sketching the whole input, and the estimate lands
  * within HLL's error envelope of the exact count.
  */
class SketchSpec extends SparkSpec {

  private lazy val events = Queries.t(spark, "/root/testdata/sf0.001", "events")

  test("per-day sketches merge to the global estimate") {
    val daily = events
      .groupBy(expr("CAST(ts AS DATE)").as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head().getLong(0)
    assert(merged == direct,
      s"merged daily sketches ($merged) must equal the direct sketch ($direct)")
  }

  test("the estimate is within the HLL error envelope of the exact count") {
    val exact = events.select("user_id").distinct().count()
    val est = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    val relErr = math.abs(est - exact).toDouble / exact
    // default lgK=12 → ~1.6% standard error; allow 4 sigma
    assert(relErr < 0.07, s"estimate $est vs exact $exact (relErr $relErr)")
  }
}
