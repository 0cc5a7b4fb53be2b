package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: interleave the bits of several
  * dimension columns so that range-partitioning on ONE value preserves
  * locality in ALL of them. The write-side layout trick behind
  * multi-dimensional data skipping — after clustering, parquet
  * file/row-group min-max stats are tight in every interleaved
  * dimension, so a predicate on ANY of them prunes most of a 100 TB
  * table's files, where a single-column sort only ever prunes its one
  * leading dimension.
  *
  * The z-value is composed entirely from built-in codegen'd
  * expressions (shiftright / bitwiseAND / multiply / sum) — no custom
  * Catalyst node, no UDF — and the identical arithmetic replays in any
  * SQL engine, so the mapping itself is oracle-verifiable.
  */
object ZOrder {

  /** Bit-interleaved z-value of already-bucketed dimensions: each
    * column must be integral in [0, 2^bits). Bit i of column c lands
    * at output position `i * n + c` (LSB-first round-robin), the
    * standard Morton layout generalized to n dimensions.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * dims must fit a positive long, got $bits * ${cols.size}")
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      i <- 0 until bits
    } yield (shiftright(c.cast("long"), i).bitwiseAND(lit(1L)) *
      lit(1L << (i * n + ci)))
    terms.reduce(_ + _)
  }

  /** The equivalent ANSI SQL expression (for oracles / external
    * engines): same term set, same constants.
    */
  def zValueSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    (for {
      (c, ci) <- cols.zipWithIndex
      i <- 0 until bits
    } yield s"(($c >> $i) & 1) * ${1L << (i * n + ci)}").mkString(" + ")
  }

  /** Cluster `df` for multi-dimensional pruning: min-max normalize
    * each dimension into [0, 2^bits) cells (one broadcast 1-row
    * aggregate — the audited scalar-broadcast pattern, never a driver
    * collect), range-partition on the interleaved z-value into
    * `numFiles` output partitions and sort within each. Writing the
    * result produces files whose min-max envelopes are tight in every
    * clustered dimension.
    *
    * Scale shape: one grand aggregate + one range exchange (with its
    * sampling pass) — the same cost as a plain global sort, buying
    * pruning in all dimensions instead of one.
    */
  def cluster(
      df: DataFrame,
      dims: Seq[String],
      bits: Int = 8,
      numFiles: Int = 64): DataFrame = {
    require(dims.nonEmpty, "cluster needs at least one dimension")
    val cells = BigInt(1) << bits
    val aggs = dims.flatMap(d => Seq(
      min(col(d).cast("double")).as(s"__min_$d"),
      max(col(d).cast("double")).as(s"__max_$d")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val bucketed = dims.map { d =>
      val lo = col(s"__min_$d")
      val span = col(s"__max_$d") - lo
      // degenerate span (constant column) -> every row in cell 0
      least(
        when(span > 0.0,
          floor((col(d).cast("double") - lo) / span * cells.toLong).cast("long"))
          .otherwise(lit(0L)),
        lit(cells.toLong - 1))
    }
    joined
      .withColumn("__z", zValue(bucketed, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop(dims.map(d => s"__min_$d") ++ dims.map(d => s"__max_$d"): _*)
      .drop("__z")
  }
}
