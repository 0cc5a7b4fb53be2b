package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` / `array<double>`
  * embedding columns, built from Catalyst higher-order functions
  * (`zip_with` / `aggregate`) — codegen-friendly, per-row, no UDFs.
  *
  * All math is done in double after an explicit cast, with a fixed
  * left-to-right fold order, so results are bit-stable and reproducible
  * by external engines (the DuckDB oracle computes the same fold).
  */
object VectorFunctions {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Dot product: sequential fold over zip_with products. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe for zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(lit(null).cast("double"))
  }

  /** Squared L2 distance. */
  def l2Squared(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x)

  /** Scalar int8 quantization of an embedding against a [lo, hi] range:
    * 255 levels, `q = clamp(floor((x - lo) / (hi - lo) * 255), 0, 255) - 128`
    * stored as `array<tinyint>` — 4× smaller than float32, 8× smaller
    * than the double working form; at 100 TB of embeddings that is the
    * difference between one storage tier and the next. `floor` (not
    * `round`) on purpose: half-way rounding ties are engine-dependent,
    * flooring is bit-deterministic everywhere, so the DuckDB oracle
    * replays quantized values exactly.
    *
    * The range is a MODEL PARAMETER (compute lo/hi once over a sample,
    * store with the table); per-batch ranges would make quantized
    * vectors incomparable across batches.
    */
  def quantizeInt8(vec: Column, lo: Double, hi: Double): Column = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val scale = 255.0 / (hi - lo)
    transform(asDouble(vec), x =>
      (least(greatest(floor((x - lit(lo)) * lit(scale)), lit(0.0)), lit(255.0))
        - lit(128.0)).cast("byte"))
  }

  /** Reconstruction to the level midpoint: `(q + 128 + 0.5) / 255 *
    * (hi - lo) + lo` — the midpoint halves the worst-case error vs the
    * level floor. Max absolute error = (hi - lo) / 510.
    */
  def dequantizeInt8(vec: Column, lo: Double, hi: Double): Column = {
    val step = (hi - lo) / 255.0
    transform(vec, q =>
      (q.cast("double") + lit(128.5)) * lit(step) + lit(lo))
  }

  /** Random-hyperplane (sign) LSH signature of `numBits` bits packed into
    * a long. Hyperplane component (b, j) is a deterministic pseudo-random
    * value in [-1, 1): the first 4 bytes of sha-256("srp:seed:b:j") as an
    * unsigned 32-bit int over 2^31, minus 1 — every executor computes
    * identical planes with zero driver-side state or broadcast, and any
    * engine with string sha256 reproduces them (the DuckDB oracle does).
    * Cosine-similar vectors collide with high probability.
    * Bit-compatible with [[graft.plans.HyperplaneSig]].
    */
  def hyperplaneSignature(vec: Column, numBits: Int, seed: Long = 42L): Column = {
    val v = asDouble(vec)
    val bits = (0 until numBits).map { b =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, j) => {
          val hhex = substring(
            sha2(concat_ws(":", lit("srp"), lit(seed.toString), lit(b.toString),
              j.cast("string")), 256), 1, 8)
          val u = conv(hhex, 16, 10).cast("long")
          x * (u.cast("double") / lit(2147483648.0) - lit(1.0))
        }),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
