package graft

import org.apache.spark.sql.functions._

import graft.operators.Divergence

/** Hand-computed oracles for the source-distribution signals. */
class DivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("identical sources have zero JS divergence") {
    val docs = Seq(
      ("a", "x y z x"), ("a", "y z"),
      ("b", "x y z x"), ("b", "y z")).toDF("source", "text")
    val r = Divergence.jsDivergence(docs, "source", "text")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(("a", "b", 3L, 0.0)))
  }

  test("disjoint vocabularies reach the ln 2 bound") {
    val docs = Seq(
      ("a", "x x y"), ("b", "p q q q")).toDF("source", "text")
    val r = Divergence.jsDivergence(docs, "source", "text").collect().head
    // every term is one-sided: JS = 0.5·ln2·(Σp + Σq) = ln 2
    assert(r.getLong(2) == 4L)
    assert(math.abs(r.getDouble(3) - math.log(2.0)) < 1e-5, r.getDouble(3))
  }

  test("JS divergence matches a hand-computed mixed case") {
    // a: {x: 2/3, y: 1/3}   b: {x: 1/3, y: 2/3} — symmetric by design
    val docs = Seq(("a", "x x y"), ("b", "x y y")).toDF("source", "text")
    val r = Divergence.jsDivergence(docs, "source", "text").collect().head
    val p = 2.0 / 3; val q = 1.0 / 3
    val js = 0.5 * (p * math.log(2 * p / (p + q)) + q * math.log(2 * q / (p + q))) +
      0.5 * (q * math.log(2 * q / (p + q)) + p * math.log(2 * p / (p + q)))
    assert(math.abs(r.getDouble(3) - js) < 1e-5, s"got ${r.getDouble(3)}, want $js")
  }

  test("pairs are unordered and every pair appears once") {
    val docs = Seq(
      ("c", "x"), ("a", "x"), ("b", "x")).toDF("source", "text")
    val pairs = Divergence.jsDivergence(docs, "source", "text")
      .select("source_a", "source_b").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("an exact power law recovers its exponent as the Zipf slope") {
    // counts c(rank) = floor(1000 / rank): close to slope -1 over 10 ranks
    val words = (1 to 10).flatMap(rank =>
      Seq.fill(1000 / rank)(s"w$rank%02d".format(rank)))
    val docs = Seq(("s", words.mkString(" "))).toDF("source", "text")
    val r = Divergence.zipfSlope(docs, "source", "text").collect().head
    assert(r.getLong(1) == 10L)
    assert(math.abs(r.getDouble(2) - (-1.0)) < 0.02, s"slope ${r.getDouble(2)}")
  }

  test("uniform frequencies give a flat (zero) slope") {
    val docs = Seq(("s", "a b c d e a b c d e")).toDF("source", "text")
    val r = Divergence.zipfSlope(docs, "source", "text").collect().head
    assert(r.getLong(1) == 5L)
    assert(math.abs(r.getDouble(2)) < 1e-9, s"slope ${r.getDouble(2)}")
  }

  test("rank ties break on the term, deterministically") {
    // equal counts: ranks assigned in term order on both engines
    val docs = Seq(("s", "b a c b a c")).toDF("source", "text")
    val r1 = Divergence.zipfSlope(docs, "source", "text").collect().head.getDouble(2)
    val r2 = Divergence.zipfSlope(
      docs.repartition(3), "source", "text").collect().head.getDouble(2)
    assert(r1 == r2, "slope must not depend on partitioning")
  }

  test("registered queries produce rows on the fixture") {
    val div = Queries.all("q_source_divergence")(spark, "/root/testdata/sf0.001")
    val zipf = Queries.all("q_zipf_slope")(spark, "/root/testdata/sf0.001")
    assert(div.count() > 0)
    val slopes = zipf.select("zipf_slope").as[Double].collect()
    assert(slopes.nonEmpty && slopes.forall(s => s <= 0.0 && s > -3.0),
      s"implausible Zipf slopes: ${slopes.mkString(",")}")
  }
}
