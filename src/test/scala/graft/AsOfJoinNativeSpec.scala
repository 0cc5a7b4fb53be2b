package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.AsOfJoinExec

/** The native merge-based as-of join ([[graft.plans.AsOfJoinExec]])
  * must agree with the independently implemented union + window
  * composition on every input, and its physical plan must be the
  * minimal one: exactly one exchange per side, no union, no window.
  */
class AsOfJoinNativeSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 15L, "e3"), (3L, 5L, "e4"))
    .toDF("k", "t", "name")
  private def right = Seq(
    (1L, 5L, "a", 100.0), (1L, 18L, "b", 200.0), (2L, 20L, "c", 300.0),
    (2L, 15L, "d", 400.0))
    .toDF("k", "rt", "v", "amt")

  test("native matches the hand-checked fixture") {
    val out = AsOfJoin.asOfJoinNative(
      left, right, Seq("k"), "t", "rt", Seq("v", "amt"))
      .orderBy("k", "t")
      .as[(Long, Long, String, String, Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, 10L, "e1", "a", Some(100.0)),
      (1L, 20L, "e2", "b", Some(200.0)),
      (2L, 15L, "e3", "d", Some(400.0)),
      (3L, 5L, "e4", null, None)))
  }

  private def randomSides(seed: Int): (DataFrame, DataFrame) = {
    val rnd = new Random(seed)
    // dense key space so keys collide; right-only and left-only keys;
    // duplicate times on both sides; some null right times
    val l = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000)))
      .zipWithIndex.map { case ((k, t, p), i) => (k, t, p, i.toLong) }
      .toDF("k", "t", "payload", "lid")
    val r = Seq.fill(250) {
      val t: Option[Long] = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(50).toLong)
      (rnd.nextInt(25).toLong, t, rnd.nextDouble(), rnd.nextInt(100000).toLong)
    }.toDF("k", "rt", "amt", "rid")
    (l, r)
  }

  private def canon(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("native equals composed on randomized inputs (ties broken identically)") {
    for (seed <- Seq(1, 2, 3)) {
      val (l, r) = randomSides(seed)
      // rid is unique, so (rt, rid) totally orders right rows: both
      // formulations must pick the identical survivor
      val composed = AsOfJoin.asOfJoin(
        l, r, Seq("k"), "t", "rt", Seq("amt", "rid"), tieBreak = Seq("rid"))
      val native = AsOfJoin.asOfJoinNative(
        l, r, Seq("k"), "t", "rt", Seq("amt", "rid"), tieBreak = Seq("rid"))
      assert(canon(native) == canon(composed), s"seed $seed")
      assert(native.count() == l.count(), s"seed $seed: left-outer cardinality")
    }
  }

  test("native equals composed in strict mode") {
    for (seed <- Seq(4, 5)) {
      val (l, r) = randomSides(seed)
      val composed = AsOfJoin.asOfJoin(
        l, r, Seq("k"), "t", "rt", Seq("amt", "rid"), tieBreak = Seq("rid"),
        strict = true)
      val native = AsOfJoin.asOfJoinNative(
        l, r, Seq("k"), "t", "rt", Seq("amt", "rid"), tieBreak = Seq("rid"),
        strict = true)
      assert(canon(native) == canon(composed), s"seed $seed")
    }
  }

  test("self-join (same source both sides) resolves via fresh right exprIds") {
    val e = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 5L, 3.0))
      .toDF("k", "t", "x")
    val out = AsOfJoin.asOfJoinNative(
      e, e.withColumnRenamed("t", "rt").withColumnRenamed("x", "prev_x"),
      Seq("k"), "t", "rt", Seq("prev_x"), strict = true)
    // for each row: latest strictly-earlier own value
    val got = out.select("k", "t", "prev_x").orderBy("k", "t")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq((1L, 10L, None), (1L, 20L, Some(1.0)), (2L, 5L, None)))
  }

  test("physical plan is exec + one exchange per side, no window/union/SMJ") {
    val df = AsOfJoin.asOfJoinNative(
      left, right, Seq("k"), "t", "rt", Seq("v", "amt"))
    df.collect() // finalize any adaptive plan
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: AsOfJoinExec => e }.length == 1)
    assert(collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }.length == 2)
    val s = plan.toString
    assert(!s.contains("Window"), "native plan must not contain a Window")
    assert(!s.contains("Union"), "native plan must not contain a Union")
    assert(!s.contains("SortMergeJoin"), "native plan must not contain an SMJ")
  }

  test("pre-partitioned inputs plan ZERO exchanges (bucketed-storage path)") {
    // both sides already hash-clustered on the key with the same
    // partition count: EnsureRequirements must only add sorts
    val lp = left.repartition(4, $"k")
    val rp = right.repartition(4, $"k")
    val df = AsOfJoin.asOfJoinNative(lp, rp, Seq("k"), "t", "rt", Seq("v"))
    df.collect()
    val exchanges = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    // the two repartition exchanges are the inputs themselves; the JOIN
    // must not add any beyond them
    assert(exchanges.length == 2,
      s"expected only the input repartitions, got ${exchanges.length}:\n" +
        df.queryExecution.executedPlan)
  }

  test("mixed NTZ/LTZ timestamp sides coerce and join (fixture-regen seam)") {
    // one side read from parquet written without isAdjustedToUTC arrives
    // as TIMESTAMP_NTZ; the other as TIMESTAMP. The native join must
    // coerce rather than fail resolution (this exact mix crashed
    // q_asof_join_native when the events fixture was regenerated).
    val l = left.withColumn("t", to_timestamp(from_unixtime($"t" * 3600)))
    val rLtz = right.withColumn("rt", to_timestamp(from_unixtime($"rt" * 3600)))
    val rNtz = rLtz.withColumn("rt", $"rt".cast("timestamp_ntz"))
    assert(rNtz.schema("rt").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val expected = canon(AsOfJoin.asOfJoinNative(
      l, rLtz, Seq("k"), "t", "rt", Seq("v", "amt")))
    // NTZ on the right, LTZ on the left — and the reverse
    assert(canon(AsOfJoin.asOfJoinNative(
      l, rNtz, Seq("k"), "t", "rt", Seq("v", "amt"))) == expected)
    val lNtz = l.withColumn("t", $"t".cast("timestamp_ntz"))
    assert(canon(AsOfJoin.asOfJoinNative(
      lNtz, rLtz, Seq("k"), "t", "rt", Seq("v", "amt"))) == expected)
  }

  test("mismatched time types fail fast with a clear message") {
    val badRight = right.withColumn("rt", $"rt".cast("int"))
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoinNative(left, badRight, Seq("k"), "t", "rt", Seq("v"))
    }
    assert(ex.getMessage.contains("types match"))
  }
}
