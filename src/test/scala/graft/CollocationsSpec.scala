package graft

import graft.operators.Collocations

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  // 6 bigram events total: (a,b) x2, (c,d) x2, (b,c), (d,a)
  private val docs = Seq("a b c d a b", "c d").toDF("text")

  test("lift reproduces the hand-computed count ratios") {
    val out = Collocations.mine(docs, "text", minCount = 2L, minLift = 0.0)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // (a,b): c12=2, prefix a=2 ((a,b)x2), suffix b=2, N=6 -> 2*6/(2*2)=3
    assert(out(("a", "b")) === ((2L, 2L, 2L, 3.0)))
    // (c,d): c12=2, prefix c=2, suffix d=2 -> 3.0
    assert(out(("c", "d")) === ((2L, 2L, 2L, 3.0)))
    assert(out.keySet === Set(("a", "b"), ("c", "d")))
  }

  test("minCount and minLift prune support and weak pairs") {
    val all = Collocations.mine(docs, "text", minCount = 1L, minLift = 0.0)
    assert(all.count() === 4) // (a,b) (c,d) (b,c) (d,a)
    // singletons (b,c) and (d,a) have lift 1*6/(1*1) = 6.0 — a lift
    // filter alone keeps rare flukes, which is why minCount exists
    val strong = Collocations.mine(docs, "text", minCount = 1L, minLift = 4.0)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(strong === Set(("b", "c"), ("d", "a")))
    val supported = Collocations.mine(docs, "text", minCount = 2L, minLift = 4.0)
    assert(supported.count() === 0)
  }
}
