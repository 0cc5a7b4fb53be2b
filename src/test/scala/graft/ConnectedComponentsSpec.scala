package graft

import scala.collection.mutable
import scala.util.Random

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference union-find for truth. */
  private def truth(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.resolve(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("matches union-find on random graphs") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      val pairs = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter(p => p._1 != p._2)
      assert(run(pairs) == truth(pairs), s"seed $seed")
    }
  }

  test("long chains converge (propagation crosses the whole path)") {
    // a path graph of 40 nodes: worst-case diameter for the iteration
    val chain = (0L until 39L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.values.toSet == Set(0L), s"all chain nodes must label 0, got $got")
  }

  test("self-pairs and duplicate edges are harmless") {
    val pairs = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L))
    val got = run(pairs)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("empty pair set resolves to empty labels (no NPE)") {
    // a clean corpus produces zero near-dup candidate pairs; the
    // curation pipeline calls resolve unconditionally
    assert(run(Seq.empty) == Map.empty[Long, Long])
  }
}
