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

  test("one action per round: the checksum rides the checkpoint job") {
    // the convergence metric is observe()d during each round's eager
    // localCheckpoint — no separate aggregate action and no separate
    // checkpoint for the propagate step, so the whole resolve runs
    // rounds + 1 actions (the +1 is the seed checkpoint). The
    // pre-observe() shape ran 3 actions per round. Counted with a
    // QueryExecutionListener: broadcast-exchange jobs and AQE stage
    // jobs don't fire it, only real actions do.
    val actions = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = actions.incrementAndGet()
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = actions.incrementAndGet()
    }
    spark.listenerManager.register(listener)
    try {
      val rnd = new Random(7)
      val pairs = Seq.fill(200)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
        .filter(p => p._1 != p._2)
      val (_, converged, rounds) = ConnectedComponents
        .resolveWithRounds(pairs.toDF("a", "b"), "a", "b", 20)
      assert(converged)
      // the listener bus is async — poll until the count stops moving
      val deadline = System.currentTimeMillis() + 10000
      var n = actions.get()
      while (System.currentTimeMillis() < deadline && {
        Thread.sleep(200); val m = actions.get(); val grew = m != n; n = m; grew
      }) ()
      assert(n == rounds + 1,
        s"expected ${rounds + 1} actions ($rounds rounds + seed), got $n")
    } finally spark.listenerManager.unregister(listener)
  }

  test("star contraction matches union-find on random graphs") {
    for (seed <- Seq(11, 12)) {
      val rnd = new Random(seed)
      val pairs = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter(p => p._1 != p._2)
      val got = ConnectedComponents
        .resolveStars(pairs.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == truth(pairs), s"seed $seed")
    }
  }

  test("10k-node path: star contraction converges where pointer jumping's budget fails") {
    // adversarial diameter: label propagation needs ~log2(n) rounds
    // (14 for n=10000), so a budget of 8 exhausts without converging;
    // star contraction is the bound-convergence path (measured 15
    // rounds, asserted <= 25) and resolve() reaches it as the fallback
    // instead of failing the job.
    val chain = (0L until 9999L).map(i => (i, i + 1)).toDF("a", "b")
    val (_, pjConverged, _) = ConnectedComponents
      .resolveWithRounds(chain, "a", "b", 8)
    assert(!pjConverged, "8 rounds must not close a 10k-diameter path")

    val (starLabels, starConverged, starRounds) = ConnectedComponents
      .resolveStarsWithRounds(chain, "a", "b", 50)
    assert(starConverged && starRounds <= 25, s"star rounds: $starRounds")
    assert(starLabels.as[(Long, Long)].collect().forall(_._2 == 0L))

    val viaFallback = ConnectedComponents
      .resolve(chain, "a", "b", maxIters = 8)
      .as[(Long, Long)].collect()
    assert(viaFallback.length == 10000 && viaFallback.forall(_._2 == 0L))
  }
}
