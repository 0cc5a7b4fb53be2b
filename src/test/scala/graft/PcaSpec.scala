package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca
import graft.plans.NativeAgg

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("vector_sum_long sums element-wise with partial aggregation") {
    val df = spark.range(1000).repartition(7)
      .select(array(col("id"), col("id") * 2, lit(1L)).as("v"))
    val s = df.agg(NativeAgg.vectorSumLong(col("v"))).collect()(0)
      .getSeq[Long](0)
    val n = 999L * 1000L / 2L
    assert(s === Seq(n, 2 * n, 1000L))
  }

  test("vector_sum_long skips nulls and fails loudly on ragged input") {
    val withNulls = spark.range(10)
      .select(when(col("id") % 2 === 0, array(lit(1L))).as("v"))
    val s = withNulls.agg(NativeAgg.vectorSumLong(col("v"))).collect()(0)
      .getSeq[Long](0)
    assert(s === Seq(5L))
    val ragged = spark.range(10).select(
      when(col("id") < 5, array(lit(1L))).otherwise(array(lit(1L), lit(2L))).as("v"))
    val e = intercept[Exception] {
      ragged.coalesce(1).agg(NativeAgg.vectorSumLong(col("v"))).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      e.getCause != null && e.getCause.getMessage.contains("ragged"))
  }

  test("vector_sum_long overflows loudly, never wraps") {
    val big = spark.range(4).select(array(lit(Long.MaxValue / 2)).as("v"))
    intercept[Exception] {
      big.coalesce(1).agg(NativeAgg.vectorSumLong(col("v"))).collect()
    }
  }

  // small deterministic float vectors with a known dominant direction:
  // x ~ (t, 2t, -t) + per-coord jitter, so PC1 ∝ (1, 2, -1)/sqrt(6)
  private def vecs = {
    val rows = (0 until 200).map { i =>
      val t = (i % 21 - 10).toDouble
      val j1 = (i * 7 % 5 - 2) * 0.01
      val j2 = (i * 13 % 5 - 2) * 0.01
      val j3 = (i * 3 % 5 - 2) * 0.01
      (i.toLong, Array((t + j1).toFloat, (2 * t + j2).toFloat, (-t + j3).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("covariance matches a brute-force computation on the grid") {
    val cov = Pca.covariance(vecs, "embedding", 3)
    // half-AWAY-FROM-ZERO to match Spark round()/DuckDB round() —
    // small-magnitude floats land exactly on .5 grid ties, where
    // math.round (half-toward-+inf) diverges on negatives
    val local = vecs.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map { f =>
        val g = f.toDouble * Pca.Grid
        math.signum(g) * math.floor(math.abs(g) + 0.5) / Pca.Grid
      })
    val n = local.length
    val mean = Array.tabulate(3)(d => local.map(_(d)).sum / n)
    for (i <- 0 until 3; j <- 0 until 3) {
      val exp = local.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / (n - 1)
      assert(math.abs(cov(i)(j) - exp) < 1e-6, s"cov($i)($j)")
    }
  }

  test("covarianceDf matches the driver-side covariance after rounding") {
    val cov = Pca.covariance(vecs, "embedding", 3)
    val rows = Pca.covarianceDf(vecs, "embedding", 3).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val (i, j) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1)
      assert(math.abs(r.getDouble(2) - cov(i)(j)) <= 5e-7, s"($i,$j)")
    }
  }

  test("fit finds the dominant direction; components orthonormal") {
    val m = Pca.fit(vecs, "embedding", 3, 3)
    // eigenvalues descending, PC1 ∝ (1,2,-1)/sqrt(6) with pinned sign
    assert(m.eigenvalues(0) >= m.eigenvalues(1) &&
      m.eigenvalues(1) >= m.eigenvalues(2))
    val pc1 = m.components(0)
    val want = Array(1.0, 2.0, -1.0).map(_ / math.sqrt(6.0))
    pc1.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 0.01) }
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = m.components(a).zip(m.components(b)).map(t => t._1 * t._2).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"($a,$b)")
    }
    // A v = λ v residual against the driver covariance
    val cov = Pca.covariance(vecs, "embedding", 3)
    for (c <- 0 until 3) {
      val v = m.components(c)
      for (r <- 0 until 3) {
        val av = (0 until 3).map(k => cov(r)(k) * v(k)).sum
        assert(math.abs(av - m.eigenvalues(c) * v(r)) < 1e-9, s"comp $c row $r")
      }
    }
    assert(math.abs(m.varianceExplained.sum - 1.0) < 1e-9)
    assert(m.varianceExplained(0) > 0.99) // jitter is tiny vs the line
  }

  test("project reproduces driver-side dot products") {
    val m = Pca.fit(vecs, "embedding", 3, 2)
    val out = Pca.project(m, vecs, "embedding")
      .select("vec_id", "pc_0", "pc_1").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val local = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    local.foreach { case (id, v) =>
      var d0 = 0.0; var d1 = 0.0
      for (k <- 0 until 3) {
        d0 += v(k).toDouble * m.components(0)(k)
        d1 += v(k).toDouble * m.components(1)(k)
      }
      assert(math.abs(out(id)._1 - d0) < 1e-9)
      assert(math.abs(out(id)._2 - d1) < 1e-9)
    }
  }

  test("projection variance equals the eigenvalue (whitening contract)") {
    val m = Pca.fit(vecs, "embedding", 3, 1)
    val p = Pca.project(m, vecs, "embedding")
    val v = p.agg(variance(col("pc_0"))).as[Double].head()
    // grid quantization perturbs the covariance at ~1e-6 relative
    assert(math.abs(v - m.eigenvalues(0)) < 1e-2)
  }

  test("vector_sum_long: zero-length rows are a real width, not 'uninitialized'") {
    // all-empty input -> an empty vector (not SQL NULL)
    val empties = spark.range(5).select(array().cast("array<long>").as("v"))
    val r = empties.agg(NativeAgg.vectorSumLong(col("v"))).collect()(0)
    assert(!r.isNullAt(0) && r.getSeq[Long](0).isEmpty)
    // empty mixed with 2-wide is ragged and fails loudly
    val mixed = spark.range(4).select(
      when(col("id") === 0, array().cast("array<long>"))
        .otherwise(array(lit(1L), lit(2L))).as("v"))
    intercept[Exception] {
      mixed.coalesce(1).agg(NativeAgg.vectorSumLong(col("v"))).collect()
    }
  }
}
