package graft

import org.apache.spark.sql.Row

import graft.operators.SimilaritySearch

/** Greedy k-center (farthest-point) selection — hand-computable
  * geometry oracles.
  */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  private def select(rows: Seq[(Long, Seq[Float])], k: Int) =
    SimilaritySearch.kCenterSelect(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding", k)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))

  test("seed is the smallest id; each round picks the farthest point") {
    // unit circle at angles 0°, 5°, 90°, 180°: from seed 0° the
    // farthest is 180° (cos −1 → dist 2), then 90° (min-dist 1), then
    // the 5° point last (nearly duplicates the seed)
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val got = select(Seq(
      (10L, at(0)), (11L, at(5)), (12L, at(90)), (13L, at(180))), 4)
    assert(got.map(_._2).toSeq == Seq(10L, 13L, 12L, 11L))
    assert(got.head._3.isEmpty, "seed has no selection distance")
    val dists = got.tail.flatMap(_._3)
    assert(math.abs(dists(0) - 2.0) < 1e-5)
    assert(math.abs(dists(1) - 1.0) < 1e-5)
    assert(dists(2) < 0.01, s"near-dup of the seed must come last: ${dists(2)}")
    // coverage radius is non-increasing along the greedy trajectory
    assert(dists.sliding(2).forall(w => w(0) >= w(1) - 1e-12))
  }

  test("distance ties break on the smaller id") {
    // two points both orthogonal to the seed: equal distance 1
    val got = select(Seq(
      (1L, Seq(1f, 0f, 0f)), (5L, Seq(0f, 0f, 1f)), (3L, Seq(0f, 1f, 0f))), 2)
    assert(got.map(_._2).toSeq == Seq(1L, 3L))
  }

  test("a corpus smaller than k stops early instead of failing") {
    val got = select(Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))), 5)
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
  }

  test("zero vectors are excluded from selection") {
    val got = select(Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))), 2)
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
  }

  test("incremental min-dist column matches the naive all-centers form") {
    // driver-side replay of the O(k²·n) formulation (every round
    // re-evaluates 1 − max over ALL centers of the 6-dp-rounded
    // cosine): the incremental least()-fold must follow the exact same
    // trajectory, distances included
    val rnd = new scala.util.Random(42)
    val rows = (0L until 60L).map { i =>
      (i, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val k = 12
    def norm(v: Seq[Float]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      v.map(_.toDouble / n)
    }
    val nv = rows.map { case (id, v) => id -> norm(v) }.toMap
    def rdot(a: Seq[Double], b: Seq[Double]): Double =
      BigDecimal(a.zip(b).map { case (x, y) => x * y }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var naive = Vector((1, 0L, Option.empty[Double]))
    while (naive.size < k) {
      val chosen = naive.map(_._2).toSet
      val (id, d) = rows.map(_._1).filterNot(chosen)
        .map(id => id -> (1.0 - naive.map(c => rdot(nv(id), nv(c._2))).max))
        .maxBy { case (id, d) => (d, -id) }
      naive :+= ((naive.size + 1, id, Some(d)))
    }
    val got = select(rows, k)
    assert(got.map(_._2).toSeq == naive.map(_._2))
    got.zip(naive).foreach { case ((_, _, gd), (_, _, nd)) =>
      (gd, nd) match {
        case (Some(g), Some(n)) => assert(math.abs(g - n) < 1e-6, s"$g vs $n")
        case (a, b) => assert(a == b)
      }
    }
  }

  test("the registered query returns k deterministic centers") {
    val a = Queries.all("q_diverse_subset")(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    val b = Queries.all("q_diverse_subset")(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    assert(a.size == 8)
    assert(a == b, "greedy trajectory must be deterministic")
    val ids = a.map { case Row(_, id: Long, _*) => id }
    assert(ids.distinct.size == 8, "centers must be distinct")
  }
}
