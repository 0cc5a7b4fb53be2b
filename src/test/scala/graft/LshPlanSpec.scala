package graft

import graft.operators.Dedup

/** Closed-form checks of the MMDS banding design table. */
class LshPlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(sigLen: Int = 128, t: Double = 0.5) =
    Dedup.lshPlan(spark, sigLen, t)
      .orderBy("bands")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq

  test("exactly the divisor factorizations appear, b·r = sigLen") {
    val rows = plan()
    assert(rows.map(_._1) ==
      Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L))
    rows.foreach { case (b, r, _, _, _, _) => assert(b * r == 128L) }
  }

  test("candidate probability matches the closed form 1-(1-j^r)^b") {
    val rows = plan()
    rows.foreach { case (b, r, _, pAtT, fp, miss) =>
      def p(j: Double) = 1.0 - math.pow(1.0 - math.pow(j, r.toDouble), b.toDouble)
      assert(math.abs(pAtT - p(0.5)) < 1e-5, s"b=$b")
      assert(math.abs(fp - p(0.375)) < 1e-5, s"b=$b")
      assert(math.abs(miss - (1.0 - p(0.625))) < 1e-5, s"b=$b")
    }
  }

  test("the S-curve steepens: more bands raise FP, fewer raise misses") {
    val rows = plan()
    // extremes: 128 bands of 1 row accepts nearly everything (fp -> 1);
    // 1 band of 128 rows accepts nearly nothing (miss -> 1)
    val most = rows.last; val least = rows.head
    assert(most._1 == 128L && most._5 > 0.99)
    assert(least._1 == 1L && least._6 > 0.99)
    // est_threshold decreases as bands increase
    val est = rows.map(_._3)
    assert(est == est.sorted.reverse, s"est_threshold not monotone: $est")
  }

  test("the planner's sweet spot for t=0.5 is 32 bands x 4 rows") {
    // inflections: 16x8 -> 0.707, 32x4 -> 0.420 — 32 bands sits
    // nearest the 0.5 target (slightly recall-leaning, as a dedup
    // pipeline wants)
    val rows = plan()
    val best = rows.minBy { case (_, _, est, _, _, _) => math.abs(est - 0.5) }
    assert(best._1 == 32L, s"expected 32 bands nearest t=0.5, got ${best._1}")
  }

  test("registered query emits the table") {
    val r = Queries.all("q_lsh_plan")(spark, "/root/testdata/sf0.001")
    assert(r.count() == 8L)
  }
}
