package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: match each point row to every
  * interval row with the same key whose `[lo, hi]` contains the point.
  *
  * Spark plans the direct formulation (`p BETWEEN lo AND hi` as a join
  * condition) as a broadcast-nested-loop or cartesian product — its
  * equi-join machinery cannot use range predicates. This operator
  * restores an equi-join by discretizing the range axis into buckets of
  * `bucketWidth`: an interval is exploded to every bucket it overlaps,
  * a point maps to exactly one bucket, and the join key becomes
  * `(keys..., bucket)` with the exact `BETWEEN` applied as a
  * post-filter. A (point, interval) pair can only meet in the point's
  * single bucket, so no dedup pass is needed.
  *
  * Scale shape: one hash shuffle per side on `(keys, bucket)` — the
  * standard sort-merge/hash equi path, AQE-skew-splittable like any
  * other join. The interval side grows by `avg_span / bucketWidth + 1`;
  * pick `bucketWidth` near the typical interval span so the blow-up
  * stays ~2× (a width far below the span explodes rows; far above it
  * degrades the post-filter selectivity, not correctness).
  *
  * The range axis must be integral (cast timestamps with
  * `unix_micros`) so bucket arithmetic is exact — double division on
  * ns-scale epochs would corrupt low bits.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = lit(bucketWidth)
    // floorDiv semantics for negative values too: pmod is always >= 0.
    // `div` is Spark's IntegralDivide — exact over the full long range
    // (Column `/` is double division, which corrupts low bits past
    // 2^53, e.g. nanosecond-epoch axes). c - pmod(c, w) is an exact
    // multiple of w, so truncating division == floor division here.
    def bucketOf(c: org.apache.spark.sql.Column) =
      call_function("div", (c - pmod(c, w)).cast("long"), w)

    val ip = intervals
      .filter(col(loCol) <= col(hiCol)) // empty intervals match nothing
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val pp = points.withColumn("__bucket", bucketOf(col(pointCol)))

    pp.join(ip, keyCols :+ "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
