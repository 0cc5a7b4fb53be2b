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

  test("estimateMU recovers planted mixture parameters from unlabeled pairs") {
    import graft.operators.Sampling
    // 20k synthetic candidate pairs: 20% matches; matches agree with
    // prob (0.95, 0.80, 0.90), non-matches with (0.05, 0.20, 0.10) —
    // deterministic hash draws, so the fixture never flakes. THREE
    // fields because the two-field mixture is not identifiable
    // (2^2−1 = 3 pattern dof < 5 parameters — the textbook F-S EM
    // minimum is three comparators)
    val n = 20000
    val base = spark.range(n)
    def h(seed: Long) = Sampling.hashUnit(col("id"), seed)
    val isMatch = h(1) < 0.2
    val pairs = base.select(
      when(isMatch, h(2) < 0.95).otherwise(h(2) < 0.05).as("agree_name"),
      when(isMatch, h(3) < 0.80).otherwise(h(3) < 0.20).as("agree_city"),
      when(isMatch, h(4) < 0.90).otherwise(h(4) < 0.10).as("agree_zip"))
    val (p, params) = RecordLinkage.estimateMU(
      pairs, Seq("agree_name", "agree_city", "agree_zip"))
    assert(math.abs(p - 0.2) < 0.05, s"p=$p")
    val byCol = params.map(t => t._1 -> (t._2, t._3)).toMap
    val (mName, uName) = byCol("agree_name")
    val (mCity, uCity) = byCol("agree_city")
    val (mZip, uZip) = byCol("agree_zip")
    assert(math.abs(mName - 0.95) < 0.05, s"mName=$mName")
    assert(math.abs(uName - 0.05) < 0.05, s"uName=$uName")
    assert(math.abs(mCity - 0.80) < 0.07, s"mCity=$mCity")
    assert(math.abs(uCity - 0.20) < 0.07, s"uCity=$uCity")
    assert(math.abs(mZip - 0.90) < 0.07, s"mZip=$mZip")
    assert(math.abs(uZip - 0.10) < 0.07, s"uZip=$uZip")
    // the learned parameters make valid LinkFields (m > u), i.e. they
    // can feed straight back into link()'s scoring pass
    params.foreach { case (c, m, u) =>
      val f = LinkField(c, c, m = m, u = u)
      assert(RecordLinkage.agreeWeight(f) > 0 && RecordLinkage.disagreeWeight(f) < 0)
    }
  }

  test("estimateMU is deterministic and clamps degenerate corpora") {
    val allAgree = Seq.fill(50)((true, true)).toDF("a1", "a2")
    val (p1, e1) = RecordLinkage.estimateMU(allAgree, Seq("a1", "a2"))
    val (p2, e2) = RecordLinkage.estimateMU(allAgree, Seq("a1", "a2"))
    assert(p1 == p2 && e1 == e2)
    // every estimate stays inside (0, 1) even when every pair agrees
    e1.foreach { case (_, m, u) =>
      assert(m > 0.0 && m < 1.0 && u > 0.0 && u < 1.0)
    }
    // nulls count as disagreement, like link()'s comparators
    val withNulls = Seq((Some(true), Some(true)), (None, Some(false)))
      .toDF("a1", "a2")
    val (_, e3) = RecordLinkage.estimateMU(withNulls, Seq("a1", "a2"), iters = 5)
    assert(e3.size == 2)
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
    intercept[IllegalArgumentException](
      RecordLinkage.estimateMU(left.select(lit(true).as("a")), Seq.empty))
    intercept[IllegalArgumentException](
      RecordLinkage.estimateMU(left.select(lit(true).as("a")), Seq("a"), iters = 0))
    intercept[IllegalArgumentException](
      RecordLinkage.estimateMU(left.limit(0).select(lit(true).as("a")), Seq("a")))
  }
}
