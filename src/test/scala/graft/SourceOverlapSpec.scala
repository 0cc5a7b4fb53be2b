package graft

import graft.operators.SourceOverlap

class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("shared shingles and Jaccard per source pair, src_a < src_b") {
    val nine = (1 to 9).map(i => s"t$i").mkString(" ") // 2 shingles
    val docs = Seq(
      ("srcA", nine),                          // shingles {g1, g2}
      ("srcB", (1 to 8).map(i => s"t$i").mkString(" ")), // {g1}
      ("srcC", (1 to 8).map(i => s"z$i").mkString(" "))  // disjoint
    ).toDF("source", "text")
    val out = SourceOverlap.matrix(docs, "source", "text")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(("srcA", "srcB", 1L, 2L, 1L, 0.5)))
  }

  test("duplicate shingles within a source count once") {
    val eight = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      ("srcA", eight), ("srcA", eight), // same shingle twice in srcA
      ("srcB", eight)
    ).toDF("source", "text")
    val Array((a, b, shared, na, nb, j)) =
      SourceOverlap.matrix(docs, "source", "text")
        .as[(String, String, Long, Long, Long, Double)].collect()
    assert((a, b, shared, na, nb, j) === (("srcA", "srcB", 1L, 1L, 1L, 1.0)))
  }

  test("three-way shared shingle expands to all three pairs") {
    val eight = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq(("s1", eight), ("s2", eight), ("s3", eight))
      .toDF("source", "text")
    val pairs = SourceOverlap.matrix(docs, "source", "text")
      .select("src_a", "src_b").as[(String, String)].collect().toSet
    assert(pairs === Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
  }
}
