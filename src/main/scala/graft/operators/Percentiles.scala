package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles by distinct-value histogram — the
  * scale form of `percentile(col, p)`.
  *
  * Spark's exact `Percentile` aggregate carries a per-group
  * value→count OpenHashMap in EVERY partial buffer: each map-side
  * task materializes (and serializes, and the merge phase
  * deserializes and re-merges) the full distinct-value map, once per
  * aggregate expression. This operator computes the same histogram
  * ONCE as an ordinary hash aggregate on (group, value) — partials
  * are plain codegen'd rows with map-side combine, the shuffle
  * carries one row per distinct (group, value) — then turns counts
  * into exact interpolated percentiles with one per-group cumulative
  * window over DISTINCT VALUES (not rows) and a final per-group
  * reduction. All requested percentiles of a column share the single
  * histogram.
  *
  * Semantics match `percentile` / DuckDB `quantile_cont` exactly:
  * the p-quantile is the value at 0-based rank r = (n-1)·p of the
  * sorted multiset, linearly interpolated between ranks ⌊r⌋ and
  * ⌊r⌋+1 when r is fractional. Value at rank i = first distinct
  * value whose cumulative count exceeds i (values ascend, so a
  * conditional min over the windowed rows selects it). Nulls are
  * excluded, as in both engines.
  *
  * Scale: state ∝ distinct values per group (a bounded domain for
  * measures like quantities/prices), and the value-domain sort is a
  * per-group window over the histogram, not a sort of the data.
  */
object Percentiles {

  /** `ps` maps output column name -> percentile in [0, 1]. Appends
    * `n_<valueCol>` with the group's non-null row count.
    */
  def exactByHistogram(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(ps.nonEmpty, "need at least one percentile")
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"percentiles must be in [0,1]: $ps")
    val g = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val hist = df.filter(v.isNotNull)
      .groupBy(g :+ v.as("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(g: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(g: _*)
    // rank r = (n-1)p and its split into ⌊r⌋/frac are per-group
    // constants; compute them as row-level columns here so the final
    // aggregation never nests an aggregate inside an aggregate
    var cum = hist
      .withColumn("__cum", sum("__cnt").over(w))
      .withColumn("__n", sum("__cnt").over(wAll))
    ps.foreach { case (name, p) =>
      val r = (col("__n") - 1L).cast("double") * p
      val lo = floor(r)
      cum = cum
        .withColumn(s"__lo_$name", lo)
        .withColumn(s"__frac_$name", r - lo)
    }
    // value at 0-based rank i = first value with cumulative count > i
    // (values ascend within the group, so conditional min selects it);
    // interpolate between ranks ⌊r⌋ and ⌊r⌋+1
    val aggs = ps.flatMap { case (name, _) =>
      Seq(
        min(when(col("__cum") > col(s"__lo_$name"), col("__v")))
          .as(s"__vlo_$name"),
        min(when(col("__cum") > col(s"__lo_$name") + 1d, col("__v")))
          .as(s"__vhi_$name"),
        max(col(s"__frac_$name")).as(s"__f_$name"))
    } :+ max("__n").as(s"n_$valueCol")
    val out = ps.map { case (name, _) =>
      // top rank: frac = 0 and vHi is null; take vLo exactly
      when(col(s"__f_$name") === 0.0, col(s"__vlo_$name"))
        .otherwise(col(s"__vlo_$name") +
          (col(s"__vhi_$name") - col(s"__vlo_$name")) * col(s"__f_$name"))
        .as(name)
    }
    cum.groupBy(g: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(g ++ out :+ col(s"n_$valueCol"): _*)
  }
}
