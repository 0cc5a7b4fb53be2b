package graft

import org.apache.spark.sql.functions._

import graft.operators.Regression

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  // exact-plane fixture: y = 3 + 2*x1 - 5*x2 on a cents grid, no noise
  private def plane = {
    val rows = for {
      x1 <- 0 until 20
      x2 <- 0 until 5
    } yield (x1.toDouble, x2 * 0.25, 3.0 + 2.0 * x1 - 5.0 * (x2 * 0.25))
    rows.toDF("x1", "x2", "y")
  }

  test("fit2 recovers an exact linear model with r2 = 1") {
    val m = Regression.fit2(plane, "y", "x1", "x2")
    assert(math.abs(m.coefficients(0) - 3.0) < 1e-9)
    assert(math.abs(m.coefficients(1) - 2.0) < 1e-9)
    assert(math.abs(m.coefficients(2) + 5.0) < 1e-9)
    assert(math.abs(m.r2 - 1.0) < 1e-12)
  }

  test("generic fit matches fit2 on two features") {
    val a = Regression.fit2(plane, "y", "x1", "x2")
    val b = Regression.fit(plane, "y", Seq("x1", "x2"))
    a.coefficients.zip(b.coefficients).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"$x vs $y")
    }
    assert(math.abs(a.r2 - b.r2) < 1e-12)
  }

  test("fit2Df agrees with the driver-side fit2 after rounding") {
    val df = plane
    val m = Regression.fit2(df, "y", "x1", "x2")
    val byStat = Regression.fit2Df(df, "y", "x1", "x2")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byStat("intercept") === math.rint(m.coefficients(0) * 1e6) / 1e6)
    assert(byStat("x1") === math.rint(m.coefficients(1) * 1e6) / 1e6)
    assert(byStat("x2") === math.rint(m.coefficients(2) * 1e6) / 1e6)
    assert(math.abs(byStat("r2") - 1.0) < 1e-6)
  }

  test("noisy data: residuals orthogonal to features, r2 in (0,1)") {
    // deterministic pseudo-noise from the row index (no Math.random)
    val noisy = plane.withColumn("y",
      col("y") + (pmod(hash(col("x1"), col("x2")), lit(100)) - lit(50)) / 100.0)
    val m = Regression.fit(noisy, "y", Seq("x1", "x2"))
    assert(m.r2 > 0.9 && m.r2 < 1.0)
    val res = Regression.predict(m, noisy, Some("y"))
    // normal equations force sum(residual) ~ 0 and sum(residual*x) ~ 0
    val r = res.agg(
      sum("residual").as("s0"),
      sum(col("residual") * col("x1")).as("s1"),
      sum(col("residual") * col("x2")).as("s2")).collect()(0)
    assert(math.abs(r.getDouble(0)) < 1e-6)
    assert(math.abs(r.getDouble(1)) < 1e-5)
    assert(math.abs(r.getDouble(2)) < 1e-6)
  }

  test("collinear features fail loudly") {
    val bad = plane.withColumn("x3", col("x1") * 2.0)
    val e = intercept[IllegalArgumentException] {
      Regression.fit(bad, "y", Seq("x1", "x3"))
    }
    assert(e.getMessage.contains("singular"))
  }

  test("predict appends prediction without residual when no label") {
    val m = Regression.fit2(plane, "y", "x1", "x2")
    val out = Regression.predict(m, plane.select("x1", "x2"))
    assert(out.columns.toSeq === Seq("x1", "x2", "prediction"))
    val worst = out.join(plane, Seq("x1", "x2"))
      .select(max(abs(col("prediction") - col("y")))).as[Double].head()
    assert(worst < 1e-9)
  }

  test("constant label fails loudly instead of returning NaN r2") {
    val const = plane.withColumn("y", lit(7.0))
    val e = intercept[IllegalArgumentException] {
      Regression.fit(const, "y", Seq("x1", "x2"))
    }
    assert(e.getMessage.contains("constant label"))
  }
}
