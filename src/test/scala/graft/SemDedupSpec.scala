package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, SemDedup}

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("keep rule matches a brute-force within-cell check") {
    val e = embeddings
    val model = IvfIndex.train(e, "vec_id", "embedding", k = 8, iters = 0)
    val pruned = SemDedup.prune(e, "vec_id", "embedding", model, tau = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // brute force from the same assignment
    val assigned = IvfIndex.assign(e, "vec_id", "embedding", model)
      .select($"id", $"cell", $"nv").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assigned.foreach { case (id, cell, nv) =>
      val earlier = assigned.filter(o => o._2 == cell && o._1 < id &&
        cos(nv, o._3) >= 0.95)
      val expectDup = if (earlier.isEmpty) -1L else earlier.map(_._1).min
      val (gotCell, gotDup, gotKept) = pruned(id)
      assert(gotCell == cell.toLong && gotDup == expectDup &&
        gotKept == (expectDup == -1L), s"vec $id: got $gotDup want $expectDup")
    }
  }

  test("identical vectors in one cell keep exactly the lowest id") {
    val e = (0L until 6L).map(i => (i, Array.fill(4)(0.5f))).toDF("vec_id", "embedding")
    val model = IvfIndex.train(e, "vec_id", "embedding", k = 1, iters = 0)
    val out = SemDedup.prune(e, "vec_id", "embedding", model, tau = 0.999)
      .orderBy("id").collect()
    assert(out.head.getBoolean(3) && out.head.getLong(2) == -1L)
    assert(out.tail.forall(r => !r.getBoolean(3) && r.getLong(2) == 0L))
  }

  test("prune is deterministic across partitionings") {
    val e = embeddings
    val model = IvfIndex.train(e, "vec_id", "embedding", k = 8, iters = 0)
    val a = SemDedup.prune(e, "vec_id", "embedding", model, tau = 0.9)
      .collect().map(_.toSeq).toSet
    val b = SemDedup.prune(e.repartition(7), "vec_id", "embedding", model, tau = 0.9)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("oversized cells fail loudly instead of going quadratic") {
    val e = embeddings
    val model = IvfIndex.train(e, "vec_id", "embedding", k = 2, iters = 0)
    val err = intercept[IllegalArgumentException] {
      SemDedup.prune(e, "vec_id", "embedding", model, tau = 0.9, maxCell = 3L)
    }
    assert(err.getMessage.contains("maxCell"))
  }
}
