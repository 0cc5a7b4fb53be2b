package graft

import org.apache.spark.sql.functions._

import graft.operators.Evaluation

/** Hand-computed AUC fixtures (pairwise wins + half-credit ties),
  * boundary cases (perfect / inverted / constant scorer), monotone
  * invariance, and the reliability-bin arithmetic.
  */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  // pos: 0.9, 0.8, 0.8   neg: 0.8, 0.5
  // U = 1 + 1 + (0.5 + 1) + (0.5 + 1) = 5  ->  AUC = 5/6
  private lazy val mixed = Seq(
    (0.9, true), (0.8, true), (0.8, true), (0.8, false), (0.5, false))
    .toDF("s", "y")

  private def auc(df: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
    val r = Evaluation.rocAuc(df, col("s"), col("y")).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("AUC matches the pairwise count with half-credit ties") {
    assert(auc(mixed) === ((3L, 2L, 0.833333)))
  }

  test("AUC boundary cases: perfect, inverted, constant") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false)).toDF("s", "y")
    assert(auc(perfect)._3 === 1.0)
    val inverted = perfect.withColumn("y", !col("y"))
    assert(auc(inverted)._3 === 0.0)
    val constant = Seq((0.5, true), (0.5, true), (0.5, false)).toDF("s", "y")
    assert(auc(constant)._3 === 0.5)
  }

  test("AUC is invariant under a monotone score transform") {
    val scaled = mixed.withColumn("s", col("s") / 2.0 + 0.1)
    assert(auc(scaled)._3 === auc(mixed)._3)
  }

  test("AUC skips null scores/labels and discretizes at the stated precision") {
    val withNulls = mixed
      .union(Seq((Double.NaN, true)).toDF("s", "y")
        .withColumn("s", lit(null).cast("double")))
      .union(Seq((0.7, true)).toDF("s", "y")
        .withColumn("y", lit(null).cast("boolean")))
    assert(auc(withNulls) === auc(mixed))
    // scores closer than the grid collapse into one (tied) cell
    val fine = Seq((0.5000001, true), (0.5000002, false)).toDF("s", "y")
    assert(Evaluation.rocAuc(fine, col("s"), col("y"), precision = 6)
      .collect().head.getDouble(2) === 0.5)
  }

  test("property: AUC equals the brute-force pairwise statistic (6 seeds)") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919L)
      // small score grid forces heavy ties — the half-credit path
      // (grid stays inside the default declared [-1, 1] range)
      val rows = Seq.fill(80)((rnd.nextInt(11) / 10.0, rnd.nextBoolean()))
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        val u = (for { p <- pos; n <- neg } yield
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        val want = BigDecimal(u / (pos.size.toDouble * neg.size.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val got = auc(rows.toDF("s", "y"))
        assert(got === ((pos.size.toLong, neg.size.toLong, want)), s"seed $seed")
      }
    }
  }

  test("property: calibration bins partition the corpus, rates bounded (6 seeds)") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729L)
      val rows = Seq.fill(120)((rnd.nextInt(101) / 100.0, rnd.nextBoolean()))
      val got = Evaluation.calibrationBins(
        rows.toDF("s", "y"), col("s"), col("y"), bins = 10).collect()
      assert(got.map(_.getLong(1)).sum === 120L, s"seed $seed: rows lost")
      got.foreach { r =>
        val bin = r.getLong(0)
        assert(bin >= 0 && bin <= 9)
        val (ms, pr, gap) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
        assert(ms >= bin / 10.0 - 1e-9 &&
          (ms <= (bin + 1) / 10.0 + 1e-9 || bin == 9), s"seed $seed mean outside bin")
        assert(pr >= 0.0 && pr <= 1.0)
        assert(math.abs(gap - BigDecimal(math.abs(ms - pr))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
      }
    }
  }

  test("calibration bins: means, rates, gaps, and the 1.0 clamp") {
    val df = Seq(
      (0.05, false), (0.05, false), (0.95, true), (1.0, true))
      .toDF("s", "y")
    val got = Evaluation.calibrationBins(df, col("s"), col("y"), bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (0L, 2L, 0.05, 0.0, 0.05),
      (9L, 2L, 0.975, 1.0, 0.025)))
  }

  test("calibration guard") {
    intercept[IllegalArgumentException](
      Evaluation.calibrationBins(mixed, col("s"), col("y"), bins = 1))
  }

  test("calibration clamps out-of-range scores SYMMETRICALLY") {
    val df = Seq((-0.3, false), (1.4, true), (0.55, true)).toDF("s", "y")
    val got = Evaluation.calibrationBins(df, col("s"), col("y"), bins = 10)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
    // below-range lands in bin 0 (not a negative bin id), above in 9
    assert(got.toSeq === Seq((0L, 1L), (5L, 1L), (9L, 1L)))
  }

  test("AUC enforces the declared score range loudly") {
    val oob = Seq((0.5, true), (7.0, false)).toDF("s", "y")
    val e = intercept[Exception] {
      Evaluation.rocAuc(oob, col("s"), col("y")).collect()
    }
    assert(e.getMessage.contains("bounded") ||
      Option(e.getCause).exists(_.getMessage.contains("bounded")), e.getMessage)
    // a wider declared range admits the same data
    assert(Evaluation.rocAuc(oob, col("s"), col("y"), maxAbs = 8.0)
      .collect().head.getDouble(2) === 0.0)
  }

  test("single-class input reports counts with a NULL auc by contract") {
    val onlyPos = Seq((0.9, true), (0.2, true)).toDF("s", "y")
    val r = Evaluation.rocAuc(onlyPos, col("s"), col("y")).collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 0L)))
    assert(r.isNullAt(2))
  }
}
