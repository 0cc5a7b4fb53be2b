package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine ordinary least squares by normal equations — the
  * "learned scorer" counterpart to the rule gates: fit a linear model
  * over table columns with ONE aggregation pass, solve the tiny
  * system on the driver, and score rows map-only. (Same
  * state-in-the-plan contract as [[TextClassifier]] and
  * [[Dsir]]: model state is a literal, data never leaves the
  * executors twice.)
  *
  * Scale shape: the whole fit is one job — a single `agg` producing
  * the (d+1)×(d+1) normal matrix XᵀX and the vector Xᵀy as
  * O(d²) decimal sums (map-side combined: every partition folds its
  * rows into one partial, the reduce moves d² numbers per partition,
  * never a row). d is the column count you regress on — tens at most
  * — so the driver solve is microseconds and nothing about the pass
  * changes at 100 TB. Prediction/residuals are a zero-shuffle
  * projection with the coefficients inlined as literals.
  *
  * Determinism / oracle parity: inputs are scaled to exact integers
  * (fixed-point cents grid — the repo-wide trick for
  * order-independent sums: integer addition commutes, doubles don't),
  * accumulated as DECIMAL(38,0) so no magnitude ever rounds or
  * overflows, and only the final solve runs in doubles. For the
  * 2-feature fit the solve is Cramer's rule with a pinned operation
  * order, so a SQL oracle replaying the same formula sees
  * bit-identical doubles.
  */
object Regression {

  /** Fitted model: `coefficients(0)` is the intercept, then one slope
    * per feature column (all in the UNSCALED data space); `r2` the
    * coefficient of determination.
    */
  final case class Model(features: Seq[String], coefficients: Array[Double], r2: Double)

  /** The exact fixed-point sums for `y ~ 1 + xs` at `scale` (inputs
    * multiplied by `scale` and rounded to integers first — exact for
    * data that IS fixed-point at that scale, e.g. money in cents).
    * Returns (n, S[x_i] sums, S[x_i*x_j] upper triangle, S[x_i*y],
    * S[y], S[y*y]) as BigDecimal — one aggregation job.
    */
  private def moments(
      df: DataFrame, yCol: String, xCols: Seq[String], scale: Long)
      : (Long, Array[BigDecimal], Array[Array[BigDecimal]], Array[BigDecimal], BigDecimal, BigDecimal) = {
    val d = xCols.length
    def fp(c: String): Column =
      round(col(c) * scale, 0).cast("decimal(38,0)")
    val xs = xCols.map(fp)
    val y = fp(yCol)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        xs.zipWithIndex.map { case (x, i) => sum(x).as(s"sx$i") } ++
        (for { i <- 0 until d; j <- i until d }
          yield sum(xs(i) * xs(j)).as(s"sxx_${i}_$j")) ++
        xs.zipWithIndex.map { case (x, i) => sum(x * y).as(s"sxy$i") } ++
        Seq(sum(y).as("sy"), sum(y * y).as("syy"))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def dec(name: String): BigDecimal = BigDecimal(r.getAs[java.math.BigDecimal](name))
    val sxx = Array.tabulate(d, d)((i, j) =>
      if (i <= j) dec(s"sxx_${i}_$j") else dec(s"sxx_${j}_$i"))
    (r.getAs[Long]("n"), Array.tabulate(d)(i => dec(s"sx$i")), sxx,
      Array.tabulate(d)(i => dec(s"sxy$i")), dec("sy"), dec("syy"))
  }

  /** R² from the solved scaled-space coefficients and the exact sums —
    * SSE/SST by the algebraic identity (no second data pass):
    * SSE = Syy − b·[Sy, Sxy…], SST = Syy − Sy²/n.
    */
  private def rsquared(
      n: Long, sy: BigDecimal, syy: BigDecimal,
      sxy: Array[BigDecimal], bScaled: Array[Double]): Double = {
    val rhs = (sy +: sxy.toSeq).map(_.toDouble)
    val sse = syy.toDouble - bScaled.zip(rhs).map { case (b, s) => b * s }.sum
    val sst = syy.toDouble - sy.toDouble * sy.toDouble / n
    // exact moments make SST exactly 0 for a constant label — fail
    // loudly (repo convention, cf. the singular-matrix require) rather
    // than returning a silent NaN that false-fails r2 thresholds
    require(sst != 0.0, "constant label (zero variance): r2 undefined")
    1.0 - sse / sst
  }

  /** Exact-parity 2-feature fit: Cramer's rule on the 3×3 normal
    * system with a pinned operation order (see [[graft.Queries]]'
    * `q_ols_coeffs` oracle, which replays it token for token).
    */
  def fit2(
      df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      scale: Long = 100L): Model = {
    val (n0, sx, sxx, sxy, syBd, syy) =
      moments(df, yCol, Seq(x1Col, x2Col), scale)
    val n = n0.toDouble
    val (s1, s2) = (sx(0).toDouble, sx(1).toDouble)
    val (s11, s12, s22) = (sxx(0)(0).toDouble, sxx(0)(1).toDouble, sxx(1)(1).toDouble)
    val (sy, s1y, s2y) = (syBd.toDouble, sxy(0).toDouble, sxy(1).toDouble)
    // dets in pinned order; each is a*(ei - fh) - b*(di - fg) + c*(dh - eg)
    def det3(a: Double, b: Double, c: Double, d0: Double, e: Double,
        f: Double, g: Double, h: Double, i: Double): Double =
      a * (e * i - f * h) - b * (d0 * i - f * g) + c * (d0 * h - e * g)
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val b0s = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det
    val b1s = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / det
    val b2s = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / det
    val r2 = rsquared(n0, syBd, syy, sxy, Array(b0s, b1s, b2s))
    // scaled space -> data space: slopes carry over, intercept divides
    Model(Seq(x1Col, x2Col), Array(b0s / scale, b1s, b2s), r2)
  }

  /** General d-feature fit: same one-pass exact moments, driver-side
    * Gaussian elimination with partial pivoting (op order NOT pinned
    * to a SQL oracle — spec-gated against [[fit2]] and known-model
    * recovery instead).
    */
  def fit(
      df: DataFrame, yCol: String, xCols: Seq[String],
      scale: Long = 100L): Model = {
    require(xCols.nonEmpty, "need at least one feature column")
    val d = xCols.length
    val (n0, sx, sxx, sxy, syBd, syy) = moments(df, yCol, xCols, scale)
    val m = d + 1
    val a = Array.ofDim[Double](m, m + 1)
    a(0)(0) = n0.toDouble
    for (i <- 0 until d) { a(0)(i + 1) = sx(i).toDouble; a(i + 1)(0) = sx(i).toDouble }
    for (i <- 0 until d; j <- 0 until d) a(i + 1)(j + 1) = sxx(i)(j).toDouble
    a(0)(m) = syBd.toDouble
    for (i <- 0 until d) a(i + 1)(m) = sxy(i).toDouble
    for (k <- 0 until m) {
      val p = (k until m).maxBy(r => math.abs(a(r)(k)))
      require(math.abs(a(p)(k)) > 0, "singular normal matrix (collinear features)")
      val t = a(k); a(k) = a(p); a(p) = t
      for (r <- k + 1 until m) {
        val f = a(r)(k) / a(k)(k)
        for (c <- k to m) a(r)(c) -= f * a(k)(c)
      }
    }
    val b = new Array[Double](m)
    for (k <- m - 1 to 0 by -1)
      b(k) = (a(k)(m) - (k + 1 until m).map(c => a(k)(c) * b(c)).sum) / a(k)(k)
    val r2 = rsquared(n0, syBd, syy, sxy, b)
    b(0) = b(0) / scale
    Model(xCols, b, r2)
  }

  /** [[fit2]] entirely in-plan: the same one-pass exact moments, with
    * Cramer's rule and R² selected as expressions over the single
    * aggregate row and unpivoted to (stat, value) — so the whole fit
    * is ONE Spark job whose output a SQL oracle replays token for
    * token. Stats: 'intercept', the two feature names (slopes in data
    * space), 'r2'; values rounded to 6 dp.
    */
  def fit2Df(
      df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      scale: Long = 100L): DataFrame = {
    def fp(c: String): Column =
      round(col(c) * scale, 0).cast("decimal(38,0)")
    val (x1, x2, y) = (fp(x1Col), fp(x2Col), fp(yCol))
    val agg = df.agg(
      count(lit(1)).as("n"), sum(x1).as("s1"), sum(x2).as("s2"),
      sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x2 * x2).as("s22"),
      sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"),
      sum(y).as("sy"), sum(y * y).as("syy"))
    def d(c: String): Column = col(c).cast("double")
    val (n, s1, s2) = (d("n"), d("s1"), d("s2"))
    val (s11, s12, s22) = (d("s11"), d("s12"), d("s22"))
    val (sy, s1y, s2y, syy) = (d("sy"), d("s1y"), d("s2y"), d("syy"))
    def det3(a: Column, b: Column, c: Column, d0: Column, e: Column,
        f: Column, g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (d0 * i - f * g) + c * (d0 * h - e * g)
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val b0s = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det
    val b1s = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / det
    val b2s = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / det
    val sse = syy - (b0s * sy + b1s * s1y + b2s * s2y)
    val sst = syy - sy * sy / n
    val r2 = lit(1.0) - sse / sst
    agg.select(explode(array(
      struct(lit("intercept").as("stat"), round(b0s / scale, 6).as("value")),
      struct(lit(x1Col).as("stat"), round(b1s, 6).as("value")),
      struct(lit(x2Col).as("stat"), round(b2s, 6).as("value")),
      struct(lit("r2").as("stat"), round(r2, 6).as("value")))).as("t"))
      .select(col("t.stat").as("stat"), col("t.value").as("value"))
  }

  /** Map-only scoring: appends `prediction` (and `residual` when the
    * label is present) with the coefficients inlined as literals.
    */
  def predict(model: Model, df: DataFrame, yCol: Option[String] = None): DataFrame = {
    val pred = model.features.zipWithIndex.foldLeft(
      lit(model.coefficients(0))) { case (acc, (c, i)) =>
        acc + col(c) * lit(model.coefficients(i + 1)) }
    val withPred = df.withColumn("prediction", pred)
    yCol.fold(withPred)(y =>
      withPred.withColumn("residual", col(y) - col("prediction")))
  }
}
