package graft

import org.apache.spark.sql.functions._

/** The sketch percentile variant (q_group_percentiles_approx) against
  * the exact form: value-level error bound, not just the rank-interval
  * verdict the oracle hashes.
  *
  * GK guarantees rank error <= εn; in value space that means the
  * approximate percentile must lie between the exact values at ranks
  * target ± (εn + 1). Checked per group per percentile against the
  * fully sorted data (test scale only — the whole point of the sketch
  * is that production never materializes this sort).
  */
class ApproxPercentileSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val acc = 1000

  test("approximate percentiles stay inside the exact rank-error band") {
    val li = Queries
      .groupPercentilesApprox(spark, sf) // force same registration path
    val approx = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(acc)).as("a50"),
        percentile_approx(col("l_quantity"), lit(0.9), lit(acc)).as("a90"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(acc)).as("a99"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap

    val byGroup = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .collect()
      .groupBy(_.getString(0))

    def bandCheck(sorted: Array[Double], p: Double, v: Double, label: String): Unit = {
      val n = sorted.length
      val slack = n.toDouble / acc + 1
      val lo = math.max(0, math.floor(p * n - slack).toInt)
      val hi = math.min(n - 1, math.ceil(p * n + slack).toInt)
      assert(v >= sorted(lo) && v <= sorted(hi),
        s"$label: approx $v outside exact band [${sorted(lo)}, ${sorted(hi)}] " +
          s"(n=$n, ranks $lo..$hi)")
    }

    assert(approx.nonEmpty)
    approx.foreach { case (flag, (a50, a90, a99)) =>
      val rows = byGroup(flag)
      val qty = rows.map(_.getDouble(1)).sorted
      val price = rows.map(_.getDouble(2)).sorted
      bandCheck(qty, 0.5, a50, s"$flag p50 qty")
      bandCheck(qty, 0.9, a90, s"$flag p90 qty")
      bandCheck(price, 0.99, a99, s"$flag p99 price")
    }
  }

  test("the oracled bound-check query reports all groups in bound") {
    val out = Queries.groupPercentilesApprox(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"group ${r.getString(0)} out of bound: $r")
    }
  }
}
