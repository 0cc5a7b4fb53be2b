package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 15L, "e3"), (3L, 5L, "e4"))
    .toDF("k", "t", "name")
  private def right = Seq(
    (1L, 5L, "a", 100.0), (1L, 18L, "b", 200.0), (2L, 20L, "c", 300.0),
    (2L, 15L, "d", 400.0))
    .toDF("k", "rt", "v", "amt")

  test("asOfJoin picks the latest right row at or before each left time") {
    val out = AsOfJoin.asOfJoin(
      left, right, Seq("k"), "t", "rt", Seq("v", "amt"))
      .orderBy("k", "t")
      .as[(Long, Long, String, String, Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, 10L, "e1", "a", Some(100.0)),   // rt=5 <= 10
      (1L, 20L, "e2", "b", Some(200.0)),   // rt=18 <= 20
      (2L, 15L, "e3", "d", Some(400.0)),   // rt=15 <= 15 (inclusive)
      (3L, 5L, "e4", null, None)))         // no right rows for k=3
  }

  test("strict mode excludes equal-time right rows") {
    val out = AsOfJoin.asOfJoin(
      left, right, Seq("k"), "t", "rt", Seq("v"), strict = true)
      .orderBy("k", "t")
      .as[(Long, Long, String, String)].collect().toSeq
    assert(out.find(r => r._1 == 2L && r._2 == 15L).get._4 == null,
      "strict as-of must not see the rt=15 row for t=15")
  }

  test("tieBreak resolves equal-time right duplicates deterministically") {
    val dup = Seq((1L, 10L, "x", 1.0), (1L, 10L, "y", 2.0)).toDF("k", "rt", "v", "amt")
    val out = AsOfJoin.asOfJoin(
      left.filter($"k" === 1 && $"t" === 20), dup, Seq("k"), "t", "rt",
      Seq("v", "amt"), tieBreak = Seq("v"))
      .as[(Long, Long, String, String, Double)].collect().toSeq
    assert(out.head._4 == "y", "last in tieBreak order must win")
  }

  test("every left row survives exactly once (left-join semantics)") {
    val out = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
    assert(out.count() == left.count())
  }
}
