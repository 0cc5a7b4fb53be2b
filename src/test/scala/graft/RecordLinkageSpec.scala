package graft

import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.LinkField

/** Hand-computed Fellegi–Sunter fixtures: weight arithmetic, the
  * three-way verdict split, blocking containment, the Levenshtein
  * tolerance boundary, null-as-disagreement, and the oversized-block
  * guard's drop report.
  */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    LinkField("l_name", "r_name", m = 0.9, u = 0.1, maxDist = 1),
    LinkField("l_city", "r_city", m = 0.8, u = 0.2))
  // ln(9)=2.197225, ln(.1/.9)=-2.197225, ln(4)=1.386294, ln(.2/.8)=-1.386294
  private val wNameA = 2.197225
  private val wCityA = 1.386294

  private lazy val left = Seq(
    (1L, "b1", "alice", "rome"),
    (2L, "b1", "bobby", "oslo"),
    (3L, "b2", "carol", "lima")).toDF("l_id", "l_block", "l_name", "l_city")
  private lazy val right = Seq(
    (11L, "b1", "alice", "rome"),  // both agree        -> +3.583519 match
    (12L, "b1", "bobbz", "kiev"),  // name d=1, city no  ->  0.810931 possible
    (13L, "b2", "xxxxx", "lima"),  // name no, city yes  -> -0.810931 non_match
    (14L, "b3", "carol", "lima")   // blocked away from 3
  ).toDF("r_id", "r_block", "r_name", "r_city")

  private def run(l: org.apache.spark.sql.DataFrame = left,
      maxBlock: Long = 0L) =
    RecordLinkage.link(l, right, Seq(("l_block", "r_block")), fields,
      keep = Seq("l_id", "r_id"), upper = 2.0, lower = -0.5,
      maxBlock = maxBlock)

  test("weights and verdicts are the hand-computed F-S sums") {
    val got = run()._1.orderBy("l_id", "r_id")
      .select("l_id", "r_id", "weight", "verdict")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    val e = (x: Double) => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(
      (1L, 11L, e(wNameA + wCityA), "match"),       // both agree
      (1L, 12L, e(-wNameA - wCityA), "non_match"),  // both disagree
      (2L, 11L, e(-wNameA - wCityA), "non_match"),
      (2L, 12L, e(wNameA - wCityA), "possible"),    // bobby~bobbz d=1
      (3L, 13L, e(-wNameA + wCityA), "non_match")))
  }

  test("candidates only form inside blocks") {
    val pairs = run()._1.select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (3, 14) agrees on every field but sits in another block
    assert(!pairs.contains((3L, 14L)))
    assert(pairs.forall { case (l, r) => !(l == 3L && r == 14L) })
  }

  test("levenshtein tolerance boundary is inclusive") {
    val l = Seq((1L, "b", "abcd")).toDF("l_id", "l_block", "l_name")
    val r = Seq((2L, "b", "abcx"), (3L, "b", "abxx")).toDF("r_id", "r_block", "r_name")
    val (scored, _) = RecordLinkage.link(l, r, Seq(("l_block", "r_block")),
      Seq(LinkField("l_name", "r_name", m = 0.9, u = 0.1, maxDist = 1)),
      keep = Seq("l_id", "r_id"), upper = 1.0, lower = 0.0)
    val m = scored.collect().map(x => x.getLong(1) -> x.getBoolean(2)).toMap
    assert(m == Map(2L -> true, 3L -> false)) // d=1 agrees, d=2 doesn't
  }

  test("null field values count as disagreement, not null verdicts") {
    val l = Seq((1L, "b1", null.asInstanceOf[String], "rome"))
      .toDF("l_id", "l_block", "l_name", "l_city")
    val (scored, _) = RecordLinkage.link(l, right, Seq(("l_block", "r_block")),
      fields, keep = Seq("l_id", "r_id"), upper = 2.0, lower = -0.5)
    val rows = scored.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[Boolean]("agree_l_name"))
      assert(r.getAs[String]("verdict") != null)
    }
  }

  test("maxBlock drops oversized blocks and reports them") {
    // block b1 would produce 2x2=4 candidate pairs; cap at 3
    val (scored, dropped) = run(maxBlock = 3L)
    assert(dropped.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq == Seq(("b1", 2L, 2L)))
    // only the surviving block's pair remains
    assert(scored.select("l_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("argument guards") {
    intercept[IllegalArgumentException](LinkField("a", "b", m = 0.1, u = 0.5))
    intercept[IllegalArgumentException](LinkField("a", "b", m = 1.0, u = 0.5))
    intercept[IllegalArgumentException](
      RecordLinkage.link(left, right, Seq.empty, fields,
        keep = Seq("l_id"), upper = 1.0, lower = 0.0))
    intercept[IllegalArgumentException](
      RecordLinkage.link(left, right, Seq(("l_block", "r_block")), Seq.empty,
        keep = Seq("l_id"), upper = 1.0, lower = 0.0))
    intercept[IllegalArgumentException](
      RecordLinkage.link(left, right, Seq(("l_block", "r_block")), fields,
        keep = Seq("l_id"), upper = 0.0, lower = 1.0))
  }
}
