package graft

import graft.operators.Curation

/** Hand-computed oracles for the temperature-scaled mixture planner. */
class MixturePlanSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, Long)*) =
    rows.zipWithIndex
      .map { case ((src, mass), i) => (i.toLong, src, mass) }
      .toDF("doc_id", "source", "n_chars")

  private def plan(df: org.apache.spark.sql.DataFrame, t: Double, n: Long) =
    Curation.mixturePlan(df, "source", "n_chars", t, n)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
      .sortBy(_._1)

  test("quotas always sum exactly to the budget") {
    val df = docs(("a", 97L), ("b", 31L), ("b", 5L), ("c", 701L), ("d", 13L))
    for (t <- Seq(1.0, 2.0, 5.0); n <- Seq(7L, 100L, 999L)) {
      val quotas = plan(df, t, n).map(_._5)
      assert(quotas.sum == n, s"T=$t N=$n: ${quotas.mkString(",")}")
      assert(quotas.forall(_ >= 0))
    }
  }

  test("T=1 keeps natural proportions") {
    // masses 300 / 100: weights 0.75 / 0.25 → quotas 75 / 25 exactly
    val r = plan(docs(("a", 300L), ("b", 100L)), 1.0, 100L)
    assert(r.toSeq == Seq(("a", 1L, 300L, 0.75, 75L), ("b", 1L, 100L, 0.25, 25L)))
  }

  test("T=2 rebalances toward the small source (XLM-style)") {
    // sqrt(400)=20, sqrt(100)=10 → weights 2/3, 1/3 of the budget
    val r = plan(docs(("a", 400L), ("b", 100L)), 2.0, 90L)
    assert(r.map(_._5).toSeq == Seq(60L, 30L))
    assert(math.abs(r.head._4 - 2.0 / 3) < 1e-6)
  }

  test("largest remainder breaks ties by source, and a high T flattens") {
    // equal masses, budget not divisible: 3 sources × N=10 → 4,3,3
    // with the extra unit going to the lexicographically first source
    val r = plan(docs(("x", 50L), ("y", 50L), ("z", 50L)), 1.0, 10L)
    assert(r.map(_._5).toSeq == Seq(4L, 3L, 3L))
    // T → large: weights approach uniform even with skewed masses
    val flat = plan(docs(("a", 1000000L), ("b", 1L)), 1000.0, 100L)
    assert(flat.map(_._5).forall(q => q >= 49 && q <= 51), flat.mkString(","))
  }

  test("the registered query apportions the fixture budget exactly") {
    val rows = Queries.all("q_mixture_plan")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getLong(4)).sum == 1000L)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }
}
