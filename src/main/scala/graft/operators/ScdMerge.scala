package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join/aggregation-based alternatives to the reference's window-only
  * SCD formulation (/root/reference/README.md:99 keeps joins out for
  * byte-compatibility; these are the idiomatic scalable forms).
  *
  * Why they matter at 100 TB:
  *   - `row_number().over(entity) === 1` (the reference's top-1-per-group,
  *     W8) must materialize and sort every entity's full history in one
  *     task before discarding all but one row;
  *   - [[latestSnapshotAgg]] computes the same result with a hash
  *     aggregate using `max_by`, which combines map-side — each input
  *     partition contributes at most one candidate row per entity to the
  *     shuffle, typically orders of magnitude less shuffle volume;
  *   - [[mergeCurrent]] avoids recomputing history entirely: it merges an
  *     incoming batch into the existing current view with one co-located
  *     join — the incremental path a Delta-style `MERGE INTO` would take.
  */
object ScdMerge {

  /** Latest row per entity via map-side-combining aggregation. `orderCols`
    * must form a total order (add a unique tie-break column) or survivor
    * choice is undefined for ties.
    */
  def latestSnapshotAgg(
      df: DataFrame,
      entityCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val all = struct(df.columns.map(col).toSeq: _*)
    val ord = struct(orderCols.map(col): _*)
    df.groupBy(entityCols.map(col): _*)
      .agg(max_by(all, ord).as("__row"))
      .select(df.columns.map(c => col(s"__row.$c")).toSeq: _*)
  }

  /** Merge an incoming snapshot batch into an existing current view:
    * full-outer join on the entity key, newest date wins per entity.
    * Both sides are first reduced to one row per entity. The join keys
    * are the entity columns, so pre-bucketed/partitioned storage makes
    * this shuffle-free.
    */
  def mergeCurrent(
      current: DataFrame,
      incoming: DataFrame,
      entityCols: Seq[String],
      dateCol: String,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(current.columns.sameElements(incoming.columns),
      "current and incoming must share a schema")
    val ord = dateCol +: tieBreakCols
    // Explicit presence markers: testing side-absence via a data column
    // (e.g. dateCol IS NULL) would misread a genuinely-null date in an
    // existing row as "no row" and replace the entity with all-nulls.
    val cur = latestSnapshotAgg(current, entityCols, ord)
      .withColumn("__present", lit(true))
    val inc = latestSnapshotAgg(incoming, entityCols, ord)
      .withColumn("__present", lit(true))
    val joinCond: Column = entityCols
      .map(k => col(s"c.$k") <=> col(s"i.$k"))
      .reduce(_ && _)
    val curRow = struct(current.columns.map(c => col(s"c.$c")).toSeq: _*)
    val incRow = struct(current.columns.map(c => col(s"i.$c")).toSeq: _*)
    val winner = when(col("c.__present").isNull, incRow)
      .when(col("i.__present").isNotNull &&
        (col(s"c.$dateCol").isNull || col(s"i.$dateCol") >= col(s"c.$dateCol")),
        incRow)
      .otherwise(curRow)
    cur.as("c")
      .join(inc.as("i"), joinCond, "full_outer")
      .select(winner.as("__row"))
      .select(current.columns.map(c => col(s"__row.$c")).toSeq: _*)
  }
}
