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

  private def selectBatch(rows: Seq[(Long, Seq[Float])], k: Int,
      maxCandidates: Int = 100000, shards: Int = 0) =
    SimilaritySearch.kCenterSelectBatch(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding", k,
      maxCandidates, shards)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))

  test("batch selection in one shard matches the sequential operator exactly") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 80L).map { i =>
      (i, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val seq = select(rows, 15).toSeq
    val bat = selectBatch(rows, 15).toSeq // corpus fits: zero levels
    assert(bat == seq, "single-shard batch must follow the exact greedy trajectory")
  }

  test("sharded batch selection replays the two-phase reference trajectory") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 90L).map { i =>
      (i, Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val k = 5
    val l = 4
    def norm(v: Seq[Float]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      v.map(_.toDouble / n)
    }
    val nv = rows.map { case (id, v) => id -> norm(v) }.toMap
    def rdist(a: Long, b: Long): Double =
      1.0 - BigDecimal(nv(a).zip(nv(b)).map { case (x, y) => x * y }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // reference: exact Gonzalez inside each id%l shard, then exact
    // Gonzalez over the union of shard candidates
    def greedy(ids: Seq[Long], kk: Int): Seq[(Long, Option[Double])] = {
      var sel = Vector((ids.min, Option.empty[Double]))
      while (sel.size < math.min(kk, ids.size)) {
        val chosen = sel.map(_._1).toSet
        val (id, d) = ids.filterNot(chosen)
          .map(id => id -> sel.map(c => rdist(id, c._1)).min)
          .maxBy { case (id, d) => (d, -id) }
        sel :+= ((id, Some(d)))
      }
      sel
    }
    val cand = (0L until l).flatMap(s =>
      greedy(rows.map(_._1).filter(_ % l == s), k).map(_._1))
    val want = greedy(cand, k)
    val got = selectBatch(rows, k, maxCandidates = 2 * k, shards = l)
    assert(got.map(_._2).toSeq == want.map(_._1),
      s"got ${got.map(_._2).toSeq}, want ${want.map(_._1)}")
    got.zip(want).foreach { case ((_, _, gd), (_, wd)) =>
      (gd, wd) match {
        case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-6, s"$g vs $w")
        case (a, b) => assert(a == b)
      }
    }
    // determinism across runs (shuffle order must not leak through)
    assert(selectBatch(rows, k, maxCandidates = 2 * k, shards = l).toSeq
      == got.toSeq)
  }

  test("batch selection reaches k=5000 (the sequential wall) in bounded rounds") {
    // 12 000 deterministic unit vectors; the sequential operator would
    // need 5 000 driver round-trips here — the batch path does 1 level
    // (2 shards) plus one driver finish
    val rnd = new scala.util.Random(3)
    val rows = (0L until 12000L).map { i =>
      (i, Seq.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val got = selectBatch(rows, k = 5000, maxCandidates = 10000)
    assert(got.length == 5000)
    assert(got.map(_._2).distinct.length == 5000, "centers must be distinct")
    // greedy coverage radius is non-increasing along the trajectory
    val ds = got.toSeq.sortBy(_._1).tail.flatMap(_._3)
    assert(ds.sliding(2).forall(w => w(0) >= w(1) - 1e-12),
      "selection distances must be non-increasing")
  }

  test("batch selection: corpus smaller than k stops early; zero vectors drop") {
    val got = selectBatch(Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))), 5)
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      selectBatch(Seq((0L, Seq(0f, 0f))), 2)
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
