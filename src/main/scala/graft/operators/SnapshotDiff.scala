package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the CDC/"table diff" operator every
  * warehouse migration and SCD pipeline needs: given two snapshots of
  * the same logical table, classify every key as `added`, `removed`,
  * or `changed`, and for changed keys name exactly which columns
  * moved. (The reference's SCD jobs rebuild history from full
  * snapshots — see `/root/reference/jobs/create_employee_all.py` —
  * and this is the companion audit: what actually changed between two
  * of those rebuilds.)
  *
  * Scale shape: ONE full-outer sort-merge join on the key — each side
  * shuffles exactly once on the same key, which is the floor for
  * comparing two unsorted 100 TB snapshots (with both sides bucketed
  * on the key by [[graft.sources.ScdStorage]] even that exchange
  * disappears). Per-row work after the join is a fixed-width
  * null-safe column compare — no window, no second pass, no
  * per-column joins. Unchanged keys are dropped INSIDE the same
  * projection, so the operator's output is proportional to the drift,
  * not the table.
  *
  * Determinism / oracle parity: column comparison is null-safe
  * equality (`<=>`; a value appearing or disappearing counts as a
  * change), and `changed_cols` lists columns in a fixed order (the
  * old snapshot's column order), comma-joined — replayable verbatim
  * in any SQL engine.
  */
object SnapshotDiff {

  /** Diff `newDf` against `oldDf` on `keyCols`. Compared columns are
    * the non-key columns PRESENT IN BOTH snapshots (a column added or
    * dropped between snapshots is a schema change, not row drift);
    * pass `compareCols` to restrict further. Keys present in both
    * with no differing column are omitted.
    *
    * Output: keyCols ++ (change_type: 'added'|'removed'|'changed',
    * changed_cols: comma-joined differing columns — empty for
    * added/removed rows).
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Option[Seq[String]] = None): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val shared = compareCols.getOrElse(
      oldDf.columns.filter(c =>
        !keyCols.contains(c) && newDf.columns.contains(c)).toSeq)
    require(shared.nonEmpty, "no non-key columns shared between snapshots")

    val o = oldDf.select((keyCols ++ shared).map(col): _*)
      .withColumn("__old", lit(true))
    val n = newDf.select((keyCols ++ shared).map(col): _*)
      .withColumn("__new", lit(true))
    // one join, both sides renamed apart; key columns coalesce back
    val oo = shared.foldLeft(o)((d, c) => d.withColumnRenamed(c, s"__o_$c"))
    val nn = shared.foldLeft(n)((d, c) => d.withColumnRenamed(c, s"__n_$c"))
    val joined = oo.join(nn, keyCols, "full_outer")

    val diffs = shared.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c)))
    val changedCols = concat_ws(",", diffs: _*)
    val changeType = when(col("__old").isNull, "added")
      .when(col("__new").isNull, "removed")
      .when(changedCols =!= "", "changed")

    joined
      .select(keyCols.map(col) :+ changeType.as("change_type")
        :+ when(changeType === "changed", changedCols)
          .otherwise("").as("changed_cols"): _*)
      .filter(col("change_type").isNotNull)
  }
}
