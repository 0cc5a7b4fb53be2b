package graft

import scala.util.Random

import graft.operators.ThetaSketch
import graft.operators.ThetaSketch.KmvAggregator

class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(values: Seq[Long], k: Int): Seq[Long] = {
    val agg = new KmvAggregator(k)
    values.foldLeft(agg.zero)(agg.reduce)
  }

  test("aggregator keeps the k smallest distinct values, sorted") {
    val vs = Seq(9L, 3L, 3L, 7L, 1L, 9L, 5L, 2L)
    assert(sketchOf(vs, 3) == Seq(1L, 2L, 3L))
    assert(sketchOf(vs, 100) == Seq(1L, 2L, 3L, 5L, 7L, 9L))
    assert(sketchOf(Seq.empty, 4) == Seq.empty)
  }

  test("merge is order-independent and equals the single-pass sketch") {
    val rnd = new Random(7)
    val vs = Seq.fill(500)(rnd.nextLong(1L << 32))
    val agg = new KmvAggregator(16)
    val whole = sketchOf(vs, 16)
    val (l, r) = vs.splitAt(137)
    assert(agg.merge(sketchOf(l, 16), sketchOf(r, 16)) == whole)
    assert(agg.merge(sketchOf(r, 16), sketchOf(l, 16)) == whole)
    assert(agg.merge(whole, whole) == whole) // idempotent
  }

  test("distinct estimate is exact below k and ~1/sqrt(k) accurate above") {
    val rnd = new Random(11)
    val small = Seq.fill(40)(rnd.nextLong(1L << 32)).distinct
    assert(ThetaSketch.estimateDistinct(sketchOf(small, 256), 256)
      == small.size.toDouble)
    val n = 50000
    val big = (0 until n).map(i =>
      graft.plans.NativeText.hash32(s"item$i".getBytes("UTF-8")))
    val est = ThetaSketch.estimateDistinct(sketchOf(big, 256), 256)
    // 3 standard errors at k=256 is ~19%
    assert(math.abs(est - n) / n < 0.19, s"estimate $est for $n distinct")
  }

  test("overlap estimate tracks true jaccard on synthetic sets") {
    def h(s: String) = graft.plans.NativeText.hash32(s.getBytes("UTF-8"))
    val shared = (0 until 6000).map(i => h(s"shared$i"))
    val onlyA = (0 until 4000).map(i => h(s"a$i"))
    val onlyB = (0 until 2000).map(i => h(s"b$i"))
    val k = 512
    val ska = sketchOf(shared ++ onlyA, k)
    val skb = sketchOf(shared ++ onlyB, k)
    val (inter, union, jacc) = ThetaSketch.estimateOverlap(ska, skb, k)
    assert(math.abs(inter - 6000) / 6000.0 < 0.25, s"inter $inter")
    assert(math.abs(union - 12000) / 12000.0 < 0.25, s"union $union")
    val trueJ = 6000.0 / 12000.0
    assert(math.abs(jacc - trueJ) < 0.1, s"jaccard $jacc vs $trueJ")
  }

  test("below-k pairs estimate overlap exactly") {
    val a = Seq(1L, 2L, 3L, 4L)
    val b = Seq(3L, 4L, 5L)
    val (inter, union, jacc) = ThetaSketch.estimateOverlap(a, b, 256)
    assert(inter == 2.0 && union == 5.0 && jacc == 0.4)
  }

  test("overlapMatrix agrees with the exact matrix where sketches are exhaustive") {
    // sf0.001 sources hold ~1.4k distinct 8-gram shingles each, so
    // k=4096 makes every sketch exhaustive (θ=1) and est_shared must
    // equal the exact count
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val est = ThetaSketch.overlapMatrix(docs, "source", "text", n = 8, k = 4096)
      .select("src_a", "src_b", "est_shared")
      .as[(String, String, Double)].collect()
      .map { case (a, b, v) => ((a, b), v) }.toMap
    val exact = graft.operators.SourceOverlap
      .matrix(docs, "source", "text", n = 8)
      .select("src_a", "src_b", "shared_shingles")
      .as[(String, String, Long)].collect()
      .map { case (a, b, v) => ((a, b), v.toDouble) }.toMap
    assert(est.nonEmpty)
    // exact matrix omits zero-overlap pairs; est covers all pairs
    exact.foreach { case (pair, v) =>
      assert(est(pair) == v, s"pair $pair: est ${est(pair)} vs exact $v")
    }
    est.filterNot { case (p, _) => exact.contains(p) }.foreach {
      case (p, v) => assert(v == 0.0, s"pair $p should be zero, got $v")
    }
  }

  test("sourceSketches runs distributed with bounded per-group state") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sk = ThetaSketch.sourceSketches(docs, "source", "text", n = 8, k = 8)
      .as[(String, Seq[Long])].collect()
    assert(sk.nonEmpty)
    sk.foreach { case (_, s) =>
      assert(s.size <= 8)
      assert(s == s.sorted && s.distinct == s)
    }
  }
}
