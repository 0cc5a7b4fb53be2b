package graft.streaming

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}
import org.apache.spark.sql.types.StructType
import graft.operators.Scd
import graft.scd.EmployeeTables

/** Fully incremental streaming SCD on a per-entity STATE STORE
  * (`transformWithState` + RocksDB) — the end state of the scale
  * progression:
  *
  *   - reference / [[ScdStreaming.mergeBatch]]: recompute O(history),
  *     rewrite O(history);
  *   - `incremental=true`: recompute O(touched), rewrite O(history);
  *   - `partitionedStorage=true`: recompute O(touched), rewrite
  *     O(changed partitions) — but still re-READS touched entities'
  *     parquet history every batch;
  *   - HERE: per batch, touch ONLY the batch's rows. Each entity's
  *     classification context lives in the state store as three values
  *     (last snapshot date, last row hash, current island start), so a
  *     row is classified by one state lookup — no history scan, no
  *     join, and the sink is append-only (a row's NATURAL status never
  *     changes once written; see below).
  *
  * The trick that makes append-only possible: `Deleted` is not a
  * property of a row — it is a property of (an entity's LAST row, the
  * global max snapshot date), and it changes as the global max
  * advances. Persisting it would mean rewriting old rows. Instead the
  * store holds only natural statuses (New / Changed / No Change, which
  * are final the moment the row is seen: they depend only on the
  * entity's PRIOR rows) and [[withDeletedFlips]] derives Deleted at
  * read time with one per-entity window + a broadcast global max —
  * exactly the corrected-mode semantics
  * ([[graft.operators.ScdIncremental]] applies the same flip rule).
  *
  * Constraints (asserted at runtime):
  *   - corrected-islands mode only (the legacy cross-entity
  *     `changed_status_date` quirk pools islands across entities and
  *     cannot live in per-entity state);
  *   - per-entity IN-ORDER arrival: a snapshot date older than the
  *     entity's state is rejected (the state machine is forward-only —
  *     by-value late-data placement needs the [[ScdStreaming]]
  *     foreachBatch path). Duplicate (entity, date) rows are dropped
  *     first-wins, preserving the unique-key invariant.
  */
object ScdStateStore {

  /** Per-entity classification context — the WHOLE state for one key. */
  final case class EntityState(lastDate: Date, lastHash: String, islandMin: Date)

  /** Classifies snapshot rows for one entity as they stream in. Input
    * rows carry the snapshot columns plus [[Scd.RowHash]]; output rows
    * are in [[EmployeeTables.scdSchema]] order.
    */
  private final class ScdProcessor(inputSchema: StructType)
      extends StatefulProcessor[String, Row, Row] {

    private val dateIdx = inputSchema.fieldIndex("snapshot_date")
    private val hashIdx = inputSchema.fieldIndex(Scd.RowHash)

    @transient private var state: ValueState[EntityState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[EntityState](
        "scd", Encoders.product[EntityState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Row],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Row] = {
      var st = if (state.exists()) state.get() else null
      val sorted = rows.toVector.sortBy(_.getDate(dateIdx).getTime)
      val out = Vector.newBuilder[Row]
      sorted.foreach { r =>
        val d = r.getDate(dateIdx)
        val h = r.getString(hashIdx)
        if (st != null && d.getTime < st.lastDate.getTime)
          throw new IllegalStateException(
            s"out-of-order snapshot for entity $key: $d after ${st.lastDate} — " +
              "the state-store SCD requires per-entity in-order arrival; " +
              "use ScdStreaming's foreachBatch path for by-value late data")
        if (st == null || d.getTime != st.lastDate.getTime) {
          val (status, islandMin) =
            if (st == null) ("New", d)
            else if (h != st.lastHash) ("Changed", d)
            else ("No Change", st.islandMin)
          st = EntityState(d, h, islandMin)
          val base = r.toSeq.toArray
          out += Row.fromSeq(
            base.take(hashIdx).toSeq ++ base.drop(hashIdx + 1).toSeq ++
              Seq(status, islandMin))
        } // equal date: duplicate (entity, date) row — first wins, drop
      }
      if (st != null) state.update(st)
      out.result().iterator
    }
  }

  /** Streaming transform: snapshot rows → classified SCD rows with
    * NATURAL statuses, append-mode; output schema = the input columns
    * (minus the internal row hash) plus
    * (`change_status`, `changed_status_date`) — identical to
    * [[EmployeeTables.scdSchema]] for the employee shape, and the
    * generic construction serves any snapshot table keyed by
    * `entityCol` (the key is state-keyed by its string form, so int
    * and long entity ids both work).
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`); `transformWithState`
    * rejects the default HDFS-backed provider.
    */
  def classifiedStream(
      snapshots: DataFrame,
      entityCol: String = "employee_number"): DataFrame = {
    import org.apache.spark.sql.types.{DateType, StringType, StructField}
    val hashed = snapshots.transform(Scd.addRowHash(exclude = Seq("snapshot_date")))
    val keyIdx = hashed.schema.fieldIndex(entityCol)
    val outSchema = StructType(
      hashed.schema.fields.filterNot(_.name == Scd.RowHash).toSeq ++ Seq(
        StructField(Scd.ChangeStatus, StringType, nullable = false),
        StructField(Scd.ChangedStatusDate, DateType, nullable = true)))
    val outEnc = Encoders.row(outSchema)
    hashed
      .groupByKey(r => String.valueOf(r.get(keyIdx)))(Encoders.STRING)
      .transformWithState(
        new ScdProcessor(hashed.schema), TimeMode.None(), OutputMode.Append())(outEnc)
      .toDF()
  }

  /** Read-time Deleted derivation over a natural-status history: the
    * last row of each entity flips to Deleted when the global max
    * snapshot date has advanced past it (New rows stay New — the
    * reference's when-chain tests New first; Deleted overrides
    * changed_status_date with the row's own date). One per-entity
    * window pass + a broadcast 1-row aggregate — never a single-
    * partition window.
    */
  def withDeletedFlips(
      history: DataFrame,
      entityCols: Seq[String] = Seq("employee_number"),
      dateCol: String = "snapshot_date"): DataFrame = {
    val lastW = Window.partitionBy(entityCols.map(col): _*).orderBy(col(dateCol).desc)
    val gmax = history.agg(max(dateCol).as("__gmax"))
    history
      .withColumn("__rn", row_number().over(lastW))
      .crossJoin(broadcast(gmax))
      .withColumn(
        Scd.ChangeStatus,
        when(col("__rn") === 1 && col(dateCol) < col("__gmax") &&
          col(Scd.ChangeStatus).isin("Changed", "No Change"), "Deleted")
          .otherwise(col(Scd.ChangeStatus)))
      .withColumn(
        Scd.ChangedStatusDate,
        when(col(Scd.ChangeStatus) === "Deleted", col(dateCol))
          .otherwise(col(Scd.ChangedStatusDate)))
      .withColumn(Scd.ChangeStatus, coalesce(col(Scd.ChangeStatus), lit("Unknown")))
      .drop("__rn", "__gmax")
  }
}
