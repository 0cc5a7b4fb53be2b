package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.NativeAgg

/** Principal component analysis over an embedding column — the dense
  * linear-algebra pattern at corpus scale: ONE pass folds every row
  * into a d×d moment accumulator, the d×d eigenproblem is solved on
  * the driver (microseconds for embedding-sized d), and projection to
  * the top-k components is a zero-shuffle literal-matrix fold. Used
  * for embedding whitening/compaction before clustering or ANN — the
  * k-dimensional output feeds [[IvfIndex]]/[[PqIndex]] directly.
  *
  * Scale shape: the moment pass is a [[graft.plans.VectorSumLong]]
  * aggregate — each partition folds its rows into one
  * d + d(d+1)/2 + 1 vector, the shuffle moves one such vector per
  * partition, and NOTHING row-shaped crosses a stage boundary. That is
  * the same shape at 60k rows and at 100 TB; d (not n) bounds all
  * driver work. Projection inlines the component matrix as literals —
  * no broadcast table, no join.
  *
  * Determinism / oracle parity: inputs are quantized to an exact
  * integer grid (`round(x · 2^20)` — float32s are dyadic, so the grid
  * loses ~1e-7 relative, far below embedding noise) and the moment
  * sums are exact longs, so the covariance matrix is a pure function
  * of the data on ANY engine: `q_pca_cov` replays it entry-for-entry
  * in DuckDB. The eigensolve (cyclic Jacobi) is deterministic but not
  * SQL-expressible; components are spec-gated instead (orthonormality,
  * captured-variance ordering, brute-force residual parity) with the
  * sign pinned by each component's largest-|loading| coordinate.
  */
object Pca {

  /** Quantization grid: float32 inputs scaled by 2^20 and rounded —
    * element products stay under 2^41, so exact long sums hold ~4M
    * rows per partition-fold before [[graft.plans.VectorSumLong]]'s
    * overflow guard trips (chunk-and-merge beyond; the guard is loud,
    * never silent).
    */
  val Grid: Double = 1048576.0

  /** (count, first-moment sums S_i, product sums S_ij upper triangle)
    * of the quantized vectors — one aggregation job. The per-row
    * flattened vector is [q_0..q_{d-1}, q_i·q_j for i≤j].
    */
  def moments(df: DataFrame, vecCol: String, dim: Int): (Long, Array[Long], Array[Array[Long]]) = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val q = transform(slice(col(vecCol), 1, dim),
      x => round(x.cast("double") * lit(Grid), 0).cast("long"))
    val flat = concat(col("__q"), flatten(transform(col("__q"), (xi, i) =>
      transform(slice(col("__q"), i + 1, lit(dim)), xj => xi * xj))))
    val r = df
      .withColumn("__q", q)
      .agg(count(lit(1)).as("n"), NativeAgg.vectorSumLong(flat).as("s"))
      .collect()(0)
    val s = r.getSeq[Long](1).toArray
    val lin = s.slice(0, dim)
    val quad = Array.ofDim[Long](dim, dim)
    var idx = dim
    for (i <- 0 until dim; j <- i until dim) {
      quad(i)(j) = s(idx); quad(j)(i) = s(idx); idx += 1
    }
    (r.getLong(0), lin, quad)
  }

  /** The sample covariance matrix on the quantization grid, descaled
    * back to data units: (S_ij − S_i·S_j/n) / (n−1) / Grid².
    */
  def covariance(df: DataFrame, vecCol: String, dim: Int): Array[Array[Double]] = {
    val (n, lin, quad) = moments(df, vecCol, dim)
    require(n >= 2, s"covariance needs >= 2 rows, got $n")
    Array.tabulate(dim, dim) { (i, j) =>
      (quad(i)(j).toDouble - lin(i).toDouble * lin(j).toDouble / n) /
        (n - 1) / (Grid * Grid)
    }
  }

  /** [[covariance]] as a DataFrame — (i, j, cov) for the upper
    * triangle (1-based, i ≤ j), entirely in-plan: the moment vector
    * aggregates to ONE row, explodes back to its d + d(d+1)/2
    * entries, and the covariance formula joins linear and quadratic
    * entries through a literal d²-row pair index (broadcast — plan
    * metadata, not data). This is the oracle surface: every float op
    * after the exact integer sums is pinned to
    * `(S_ij − S_i·S_j/n) / (n−1) / Grid²` and replayable in SQL.
    */
  def covarianceDf(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val s = df.sparkSession
    val q = transform(slice(col(vecCol), 1, dim),
      x => round(x.cast("double") * lit(Grid), 0).cast("long"))
    val flat = concat(col("__q"), flatten(transform(col("__q"), (xi, i) =>
      transform(slice(col("__q"), i + 1, lit(dim)), xj => xi * xj))))
    // ONE row, materialized executor-side: both the quadratic and the
    // linear branch below read it — without the checkpoint each
    // consumer re-runs the full moment pass over the data
    val m = df
      .withColumn("__q", q)
      .agg(count(lit(1)).as("__n"), NativeAgg.vectorSumLong(flat).as("__s"))
      .localCheckpoint(true)
    val entries = m.select(col("__n"),
      posexplode(col("__s")).as(Seq("__pos", "__v")))
    val lin = entries.filter(col("__pos") < dim)
      .select((col("__pos") + 1).as("__i"), col("__v").as("__si"))
    // flat quad index -> (i, j): row i starts at dim + i*dim - i(i-1)/2;
    // built from range (plan metadata, d² rows, no driver rows)
    val pairs = s.range(dim.toLong * dim)
      .select(expr(s"CAST(id DIV $dim AS INT) + 1").as("i"),
        expr(s"CAST(id % $dim AS INT) + 1").as("j"))
      .filter(col("j") >= col("i"))
      .withColumn("__idx",
        expr(s"$dim + (i - 1) * $dim - ((i - 1) * (i - 2)) DIV 2 + (j - i)"))
    entries.filter(col("__pos") >= dim)
      .join(broadcast(pairs), col("__pos") === col("__idx"))
      .join(broadcast(lin), col("i") === col("__i"))
      .withColumnRenamed("__si", "__s_i").drop("__i")
      .join(broadcast(lin), col("j") === col("__i"))
      .withColumnRenamed("__si", "__s_j")
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        round((col("__v").cast("double") -
          col("__s_i").cast("double") * col("__s_j").cast("double") /
            col("__n")) /
          (col("__n") - 1) / lit(Grid * Grid), 6).as("cov"))
  }

  /** Fitted basis: `components(c)` is the c-th eigenvector (descending
    * eigenvalue), `varianceExplained(c)` its share of total variance.
    */
  final case class Model(
      components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def varianceExplained: Array[Double] = {
      val tot = eigenvalues.sum
      eigenvalues.map(_ / tot)
    }
  }

  /** Fit the top-`k` components: one data pass for [[covariance]],
    * then cyclic Jacobi on the driver (d ≤ a few hundred; O(d³) per
    * sweep, converges quadratically). Component sign is pinned so the
    * largest-|loading| coordinate is positive — eigenvectors are
    * otherwise sign-ambiguous across runs/engines.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val a = covariance(df, vecCol, dim)
    val (values, vectors) = jacobi(a)
    val order = values.indices.sortBy(i => -values(i))
    val comps = order.take(k).map { c =>
      val v = Array.tabulate(dim)(r => vectors(r)(c))
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    Model(comps, order.take(k).map(values).toArray)
  }

  /** Zero-shuffle projection: appends `pc_0..pc_{k-1}`, each a
    * fixed-order fold of the row's vector against a literal component
    * (same contract as [[graft.plans.NativeVector.dot]] — index-major
    * order, bit-stable on re-runs).
    */
  def project(model: Model, df: DataFrame, vecCol: String): DataFrame = {
    val dim = model.components(0).length
    model.components.zipWithIndex.foldLeft(df) { case (d, (comp, c)) =>
      val dot = aggregate(
        zip_with(slice(col(vecCol), 1, dim).cast("array<double>"),
          lit(comp), (x, w) => x * w),
        lit(0.0), (acc, t) => acc + t)
      d.withColumn(s"pc_$c", dot)
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). Deterministic sweep
    * order; converges when every off-diagonal is below tolerance.
    */
  private def jacobi(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val tol = 1e-12 * math.max(1.0, a.map(r => r.map(math.abs).max).max)
    var sweep = 0
    var off = Double.MaxValue
    while (off > tol && sweep < 100) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > tol) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          // sign(0) must be +1: equal diagonal entries (theta == 0)
          // need the full 45-degree rotation, not a zero rotation
          // that would stall the sweep on a still-nonzero off-diagonal
          val sgn = if (theta >= 0.0) 1.0 else -1.0
          val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (j <- 0 until d) {
            val apj = a(p)(j); val aqj = a(q)(j)
            a(p)(j) = c * apj - s * aqj
            a(q)(j) = s * apj + c * aqj
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
