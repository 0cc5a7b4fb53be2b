package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def naive(points: DataFrame, intervals: DataFrame): DataFrame =
    points.join(intervals,
      points("k") === intervals("k") &&
        points("p") >= intervals("lo") && points("p") <= intervals("hi"))
      .select(points("k"), col("p"), col("iid"), col("lo"), col("hi"))

  private def bucketed(points: DataFrame, intervals: DataFrame, w: Long): DataFrame =
    RangeJoin.pointInInterval(points, intervals, Seq("k"), "p", "lo", "hi", w)
      .select("k", "p", "iid", "lo", "hi")

  private def randomCase(seed: Int): (DataFrame, DataFrame) = {
    val rnd = new Random(seed)
    // negative values included: bucket arithmetic must floor, not truncate
    val pts = Seq.fill(400)((rnd.nextInt(8).toLong, rnd.nextInt(2000).toLong - 1000L))
      .toDF("k", "p")
    val ivs = Seq.tabulate(120) { i =>
      val lo = rnd.nextInt(2000).toLong - 1000L
      // mix of empty (lo > hi), tiny, and multi-bucket spans
      val hi = lo + rnd.nextInt(300) - 20L
      (rnd.nextInt(8).toLong, i.toLong, lo, hi)
    }.toDF("k", "iid", "lo", "hi")
    (pts, ivs)
  }

  test("bucketed range join equals the naive non-equi join") {
    for (seed <- Seq(11, 12, 13); w <- Seq(1L, 64L, 100L, 5000L)) {
      val (pts, ivs) = randomCase(seed)
      val expect = naive(pts, ivs).collect().map(_.toSeq)
      val got = bucketed(pts, ivs, w).collect().map(_.toSeq)
      // multiset compare: a pair must appear exactly once
      assert(got.groupBy(identity).view.mapValues(_.length).toMap ==
        expect.groupBy(identity).view.mapValues(_.length).toMap,
        s"seed $seed width $w: got ${got.length} rows, expected ${expect.length}")
    }
  }

  test("points on bucket boundaries join exactly once") {
    val pts = Seq((1L, 100L), (1L, 200L)).toDF("k", "p")
    val ivs = Seq((1L, 1L, 100L, 200L)).toDF("k", "iid", "lo", "hi")
    val out = bucketed(pts, ivs, 100L)
    assert(out.count() == 2)
  }

  test("bucket arithmetic is exact past 2^53 (nanosecond-epoch axis)") {
    // double division corrupts low bits at this magnitude: a point one
    // unit inside the interval must still land in a matching bucket
    val base = 1700000000000000000L // ~2024 in ns-epoch, > 2^60
    val pts = Seq((1L, base + 1L), (1L, base + 999L), (1L, base - 1L))
      .toDF("k", "p")
    val ivs = Seq((1L, 1L, base, base + 1000L)).toDF("k", "iid", "lo", "hi")
    for (w <- Seq(1L, 7L, 1000L, 1000000007L)) {
      val expect = naive(pts, ivs).collect().map(_.toSeq).toSet
      val got = bucketed(pts, ivs, w).collect().map(_.toSeq).toSet
      assert(got == expect, s"width $w at ns-epoch magnitude")
    }
  }

  test("the plan is an equi join, not a nested loop") {
    val (pts, ivs) = randomCase(14)
    val df = bucketed(pts, ivs, 100L)
    df.collect()
    val bnl = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: BroadcastNestedLoopJoinExec => e
    }
    assert(bnl.isEmpty, "range join must plan as an equi join on (key, bucket)")
  }
}
