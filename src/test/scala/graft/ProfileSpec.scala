package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some("a"), Some(2.5)),
    (Some(2L), None, Some(2.5)),
    (Some(2L), Some("c"), None),
    (None, Some("a"), Some(-1.0))).toDF("id", "tag", "score")

  private def rows(got: org.apache.spark.sql.DataFrame) =
    got.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap

  test("exact profile counts rows, nulls, distincts and casts min/max") {
    val m = rows(Profile.profile(df, Seq("id", "tag", "score")))
    assert(m("id") == ((4L, 1L, 2L, "1", "2")))
    assert(m("tag") == ((4L, 1L, 2L, "a", "c")))
    assert(m("score") == ((4L, 1L, 2L, "-1.0", "2.5")))
  }

  test("an all-null column profiles with null min/max and zero distinct") {
    val allNull = Seq((None: Option[Long]), None).toDF("v")
    val r = Profile.profile(allNull, Seq("v")).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("approx profile matches exact on everything but n_distinct, which stays within rsd") {
    val big = (1L to 5000L).map(i => (i, s"t${i % 997}")).toDF("id", "tag")
    val exact = rows(Profile.profile(big, Seq("id", "tag")))
    val approx = rows(Profile.approxProfile(big, Seq("id", "tag"), rsd = 0.05))
    for (c <- Seq("id", "tag")) {
      val (er, en, ed, emin, emax) = exact(c)
      val (ar, an, ad, amin, amax) = approx(c)
      assert((er, en, emin, emax) == ((ar, an, amin, amax)))
      assert(math.abs(ad.toDouble - ed.toDouble) / ed.toDouble < 0.15,
        s"$c: approx $ad vs exact $ed")
    }
  }

  test("approx profile plans without Expand; exact uses it") {
    val approxPlan = Profile.approxProfile(df, Seq("id", "tag")).queryExecution
      .executedPlan.toString
    val exactPlan = Profile.profile(df, Seq("id", "tag")).queryExecution
      .executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan)
    assert(exactPlan.contains("Expand"), exactPlan)
  }
}
