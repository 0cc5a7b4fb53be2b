package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension operators, generic over entity/date columns.
  *
  * Re-expresses the reference pipeline's transform chain
  * (/root/reference/jobs/create_employee_all.py:51-153) as pure
  * `DataFrame => DataFrame` Scala functions. The formulation is
  * deliberately join-free — union + window functions only — matching the
  * reference's design choice (/root/reference/README.md:99,:102); a
  * join-based merge variant lives in [[ScdMerge]].
  *
  * Scale notes (the reference runs these on 495 rows; we target 100 TB):
  *   - every window below partitions by the entity key (or
  *     entity+snapshot key), so state per task is one entity's history —
  *     shuffles hash-partition on high-cardinality keys and parallelize
  *     across the cluster;
  *   - the two places the reference uses a single-partition window
  *     (`Window.partitionBy(lit(1))`, create_employee_all.py:58,:118) are
  *     a scalability cliff: all rows flow through ONE task. The default
  *     here computes the same scalar via `agg(max)` + broadcast cross
  *     join (one extra tiny job, zero single-partition shuffles);
  *     `useSinglePartitionWindow=true` reproduces the reference plan
  *     shape exactly for golden/plan-compat tests.
  */
object Scd {

  /** Column names this module derives. */
  val RowHash = "row_hash"
  val ChangeStatus = "change_status"
  val ChangedStatusDate = "changed_status_date"

  private def cols(names: Seq[String]): Seq[Column] = names.map(col)

  /** D1/U1/W1: append `incoming` to `existing` and keep one row per
    * (dateCol, entity) key (create_employee_all.py:68-83).
    *
    * `existing` is first projected down to `incoming`'s columns (P1) —
    * derived columns are dropped, so SCD history is recomputed from
    * scratch each run; this is what makes a `Deleted` row re-labelable if
    * the entity later re-appears.
    *
    * The reference's window orders by the partition key itself, so its
    * survivor choice is arbitrary; it only works because same-key rows
    * are exact duplicates. We keep identical semantics (and add an
    * optional deterministic tie-break for callers that need one).
    */
  def importNewFiles(
      existing: DataFrame,
      incoming: DataFrame,
      entityCols: Seq[String],
      dateCol: String = "snapshot_date",
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val keyCols = dateCol +: entityCols
    val w = Window
      .partitionBy(cols(keyCols): _*)
      .orderBy((col(dateCol).desc +: tieBreak): _*)
    existing
      .select(incoming.columns.map(col).toSeq: _*)
      .union(incoming)
      .withColumn("row_number", row_number().over(w))
      .filter(col("row_number") === 1)
      .drop("row_number")
  }

  /** P2: configurable column-removal hook (reference's disabled PII
    * stripper, create_employee_all.py:85-97).
    */
  def removeColumns(drop: Seq[String])(df: DataFrame): DataFrame = {
    val dropSet = drop.toSet
    df.select(df.columns.filterNot(dropSet).map(col).toSeq: _*)
  }

  /** F1/F2: fingerprint each row with sha2-256 over `concat_ws("||")` of
    * every column except `exclude` (create_employee_all.py:99-109).
    *
    * Caveat preserved for hash-compat: `concat_ws` SKIPS nulls (no empty
    * slot), so ("a", null, "b") and ("a", "b", null) collide. Dates
    * render as yyyy-MM-dd inside concat_ws (UTC session), matching the
    * reference byte-for-byte.
    */
  def addRowHash(exclude: Seq[String] = Seq("snapshot_date"))(df: DataFrame): DataFrame = {
    val excludeSet = exclude.toSet
    val hashCols = df.columns.filterNot(excludeSet).map(col)
    df.withColumn(RowHash, sha2(concat_ws("||", hashCols.toSeq: _*), 256))
  }

  /** W2-W6 + the when-chain: classify every (entity, date) row as
    * New / Deleted / Changed / No Change (create_employee_all.py:111-153)
    * and date the start of its constant-hash run (gaps-and-islands).
    *
    * Input must already carry [[RowHash]] and be unique per
    * (entity, date). Output adds non-nullable [[ChangeStatus]] and
    * nullable [[ChangedStatusDate]]; all helper columns are dropped.
    *
    * @param legacyChangedStatusDate reproduce the reference's W6 quirk:
    *   its island window partitions by `gap_grp` ALONE
    *   (create_employee_all.py:138), pooling runs from different entities
    *   that share a gap_grp value — the golden outputs encode this.
    *   `false` (default) partitions by (entity, row_hash, gap_grp), the
    *   correct islands grouping.
    * @param useSinglePartitionWindow reproduce the reference's
    *   `partitionBy(lit(1))` global-max window (W3); default computes the
    *   scalar with agg + broadcast cross join instead.
    * @param globalMaxOf compute the broadcast global-max date from THIS
    *   frame instead of the input. The default re-executes the input's
    *   lineage (dedup windows included) for a single max; when the input
    *   is derived from a raw source by transforms that cannot change
    *   max(dateCol) — dedup, projection — passing the raw source here
    *   turns that branch into a bare scan + partial/final max.
    */
  def changeStatus(
      entityCols: Seq[String],
      dateCol: String = "snapshot_date",
      legacyChangedStatusDate: Boolean = false,
      useSinglePartitionWindow: Boolean = false,
      globalMaxOf: Option[DataFrame] = None)(df: DataFrame): DataFrame = {

    val entityW = Window.partitionBy(cols(entityCols): _*).orderBy(col(dateCol))

    // Running-frame min/max exactly as the reference (W2). With ascending
    // order the running min equals the partition min on every row; the
    // running max equals the row's own date — consumed only on each
    // entity's last row (next_row_hash null), where it equals the true
    // partition max. See SURVEY.md §2.7 W2.
    val withHelpers = df
      .withColumn("min_snapshot", min(dateCol).over(entityW))
      .withColumn("max_snapshot", max(dateCol).over(entityW))
      .withColumn("prev_row_hash", lag(RowHash, 1).over(entityW))
      .withColumn("next_row_hash", lead(RowHash, 1).over(entityW))

    val withGlobalMax =
      if (useSinglePartitionWindow) {
        val constW = Window.partitionBy(lit(1)).orderBy(col(dateCol).desc)
        withHelpers.withColumn("global_max_snapshot", max(dateCol).over(constW))
      } else {
        val maxDf = globalMaxOf.getOrElse(df)
          .agg(max(dateCol).as("global_max_snapshot"))
        withHelpers.crossJoin(broadcast(maxDf))
      }

    // All-literal when/otherwise => change_status is non-nullable, which
    // the declared output schema requires (config.py:37).
    val classified = withGlobalMax.withColumn(
      ChangeStatus,
      when(col("min_snapshot") === col(dateCol), "New")
        .when(col("next_row_hash").isNull &&
          col("max_snapshot") =!= col("global_max_snapshot"), "Deleted")
        .when(col("prev_row_hash") =!= col(RowHash), "Changed")
        .when(col("prev_row_hash") === col(RowHash), "No Change")
        .otherwise("Unknown"))

    // Gaps-and-islands: two row_number streams whose difference is
    // constant within a run of identical hashes (W4/W5).
    val rn1W = Window.partitionBy(cols(entityCols): _*).orderBy(col(dateCol).desc)
    val rn2W = Window.partitionBy(cols(entityCols :+ RowHash): _*).orderBy(col(dateCol).desc)
    val islandCols =
      if (legacyChangedStatusDate) Seq("gap_grp")
      else entityCols ++ Seq(RowHash, "gap_grp")
    val islandW = Window.partitionBy(cols(islandCols): _*).orderBy(col(dateCol))

    val helperCols = Seq(
      "min_snapshot", "max_snapshot", "prev_row_hash", "next_row_hash",
      "global_max_snapshot", "gap_row_num_1", "gap_row_num_2", "gap_grp",
      RowHash)

    classified
      .withColumn("gap_row_num_1", row_number().over(rn1W))
      .withColumn("gap_row_num_2", row_number().over(rn2W))
      .withColumn("gap_grp", col("gap_row_num_1") - col("gap_row_num_2"))
      .withColumn(ChangedStatusDate, min(dateCol).over(islandW))
      .withColumn(
        ChangedStatusDate,
        when(col(ChangeStatus) === "Deleted", col(dateCol))
          .otherwise(col(ChangedStatusDate)))
      .drop(helperCols: _*)
  }

  /** W7/W8: current view — latest row per entity, with the date column
    * overwritten to the global max date (create_employee_all.py:51-66).
    * Deleted entities are retained, marked Deleted.
    */
  def latestSnapshot(
      entityCols: Seq[String],
      dateCol: String = "snapshot_date",
      useSinglePartitionWindow: Boolean = false)(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(cols(entityCols): _*).orderBy(col(dateCol).desc)
    val latest = df
      .withColumn("row_number", row_number().over(w))
      .filter(col("row_number") === 1)
    if (useSinglePartitionWindow) {
      val constW = Window.partitionBy(lit(1))
      latest
        .withColumn(dateCol, max(dateCol).over(constW))
        .drop("row_number")
    } else {
      val maxDf = df.agg(max(dateCol).as("__global_max__"))
      latest
        .crossJoin(broadcast(maxDf))
        .withColumn(dateCol, col("__global_max__"))
        .drop("__global_max__", "row_number")
    }
  }
}
