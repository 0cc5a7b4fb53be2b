package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survivorship — the step AFTER entity resolution that classic MDM
  * calls the "golden record": every entity's member records (the
  * clean row plus each matched dirty variant, labelled by
  * [[ConnectedComponents]] over the [[RecordLinkage]] match pairs)
  * collapse to ONE canonical row, attribute by attribute, under an
  * explicit per-attribute rule. Without this step a resolved cluster
  * is just a bag of conflicting variants; with it the pipeline ships
  * a deduplicated dimension.
  *
  * Every rule is a single aggregate expression, so the whole golden
  * record is ONE map-side-combined `groupBy(entity)` — no windows, no
  * joins, output bounded by entity count:
  *
  *   - [[Survivorship.MostFrequent]]: the modal non-null value;
  *     deterministic ties-to-lowest (Spark's `mode(col, true)`), so
  *     engines agree and replays are stable;
  *   - [[Survivorship.LatestBy]]: the value on the member row with
  *     the greatest (orderCol, idCol) — recency wins, the unique id
  *     breaks order ties deterministically;
  *   - [[Survivorship.MaxOf]] / [[Survivorship.MinOf]]: numeric
  *     extremes (nulls ignored).
  *
  * The counted representation is MERGEABLE: per-entity
  * (attribute, value) counts are additive across batches, so
  * [[graft.streaming.GoldenStream]] maintains the live golden record
  * off a batch_id-partitioned count store and
  * [[goldenRecordFromCounts]] reads it back — same semilattice
  * argument as every streamed store here.
  */
object Survivorship {

  sealed trait Rule { def inCol: String; def outCol: String }

  /** Modal non-null value, ties to the LOWEST value (deterministic).
    *
    * @param tieCast the column's SQL type name; the count path stores
    *        values type-erased as strings, so its tie-break casts back
    *        to this type before ordering — without it a numeric tie
    *        breaks by string order ("10" < "3") and diverges from the
    *        row path's typed `mode`. The row path itself ignores this
    *        (the column is already typed).
    */
  final case class MostFrequent(inCol: String, outCol: String,
      tieCast: String = "string") extends Rule

  /** Value carried by the member row with the greatest
    * (orderCol, idCol); `idCol` must be unique per record so the
    * winner is total-ordered.
    */
  final case class LatestBy(inCol: String, orderCol: String, idCol: String,
      outCol: String) extends Rule

  final case class MaxOf(inCol: String, outCol: String) extends Rule
  final case class MinOf(inCol: String, outCol: String) extends Rule

  private def ruleAgg(r: Rule): Column = r match {
    case MostFrequent(c, out, _) => mode(col(c), deterministic = true).as(out)
    case LatestBy(c, ord, id, out) =>
      max_by(col(c), struct(col(ord), col(id))).as(out)
    case MaxOf(c, out) => max(col(c)).as(out)
    case MinOf(c, out) => min(col(c)).as(out)
  }

  /** One canonical row per entity: `entityCol`, `n_records` (member
    * count), then one column per rule. ONE exchange on the entity key.
    */
  def goldenRecord(
      records: DataFrame, entityCol: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one survivorship rule")
    val outs = rules.map(_.outCol)
    require(outs.distinct.size == outs.size, s"duplicate output columns: $outs")
    records.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_records"), rules.map(ruleAgg): _*)
  }

  /** [[goldenRecord]] off the mergeable (entity × attr × value) count
    * representation (see [[countRecords]]): `MostFrequent` becomes
    * min(struct(-n, value)) over the summed counts — highest count,
    * then lowest value, exactly the batch tie rule — and
    * `MaxOf`/`MinOf` are extremes over values with positive count.
    * Values ride as STRINGS in the store (one store for every
    * attribute type); cast the outputs back at the read site.
    * `LatestBy` is not servable from bare value counts — it lives in
    * the companion LATEST-WINS store instead ([[latestRecords]] /
    * [[latestFromState]]; argmax is a semilattice).
    *
    * Two aggregations over the combination-space-bounded store; never
    * row-sized state.
    */
  def goldenRecordFromCounts(
      counts: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one survivorship rule")
    require(rules.forall(!_.isInstanceOf[LatestBy]),
      "LatestBy needs per-row order state; not servable from value counts")
    val summed = counts.groupBy(col("entity_id"), col("attr"), col("value"))
      .agg(sum("n").as("n"))
    summed.groupBy(col("entity_id"))
      .agg(
        sum(when(col("attr") === RowAttr, col("n"))).as("n_records"),
        rules.map {
          case MostFrequent(c, out, tie) =>
            min(when(col("attr") === c && col("value").isNotNull,
              struct((-col("n")).as("neg"),
                col("value").cast(tie).as("ord"),
                col("value")))).getField("value").as(out)
          case MaxOf(c, out) =>
            max(when(col("attr") === c, col("value").cast("double"))).as(out)
          case MinOf(c, out) =>
            min(when(col("attr") === c, col("value").cast("double"))).as(out)
          case r => sys.error(s"unreachable: $r")
        }: _*)
  }

  /** The reserved attr counting member ROWS (a record with every
    * attribute null still counts toward `n_records`).
    */
  val RowAttr = "__row"

  // ---- the LATEST-WINS representation: LatestBy is not servable
  // from bare value counts, but per-entity argmax by (orderCol, id)
  // IS a semilattice — max(max(A), max(B)) = max(A ∪ B) — so a store
  // holding each batch's per-(entity, attr) winner merges to the
  // corpus winner. [[graft.streaming.GoldenStream]] keeps this as a
  // second, |entities|·|attrs|-bounded store beside the count store.

  /** One batch's (entity, attr, ord, tie_id, value) winners for the
    * given LatestBy rules — the mergeable latest-wins representation.
    * One map-side-combined aggregate of the batch; values ride as
    * strings like [[countRecords]] (cast back at the read site).
    * CONTRACT: `idCol` must be NUMERIC on this path (ties key on a
    * long id, same type-erasure trade as the string `ord`); a
    * non-numeric id fails the batch loudly instead of null-casting
    * into a nondeterministic tie-break.
    */
  def latestRecords(
      batch: DataFrame, entityCol: String, rules: Seq[LatestBy]): DataFrame = {
    require(rules.nonEmpty, "need at least one LatestBy rule")
    val stacked = rules.map { r =>
      // fail FAST on a non-numeric idCol, with an ACTIONABLE message:
      // a silent null-cast (non-ANSI) would make equal-ord tie-breaks
      // nondeterministic vs the batch path's typed total order, and
      // the ANSI cast error would name neither the rule nor the
      // contract. TRY-cast + raise_error fires per-row inside
      // codegen, no extra pass, under either ANSI setting.
      def tryLong(c: Column): Column =
        org.apache.spark.sql.classic.GraftPlanApi.column(
          org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.classic.GraftPlanApi.expression(c),
            org.apache.spark.sql.types.LongType, None,
            org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))
      val tieId = when(
        col(r.idCol).isNotNull && tryLong(col(r.idCol)).isNull,
        raise_error(concat(
          lit(s"LatestBy.idCol '${r.idCol}' must be numeric " +
            "(the latest-wins store keys ties on a long id); got: "),
          col(r.idCol).cast("string"))).cast("long"))
        .otherwise(tryLong(col(r.idCol)))
      batch.select(
        col(entityCol).as("entity_id"),
        lit(r.inCol).as("attr"),
        col(r.orderCol).cast("string").as("ord"),
        tieId.as("tie_id"),
        col(r.inCol).cast("string").as("value"))
    }.reduce(_ unionByName _)
    stacked.groupBy(col("entity_id"), col("attr"))
      .agg(max(struct(col("ord"), col("tie_id"), col("value"))).as("w"))
      .select(col("entity_id"), col("attr"),
        col("w.ord").as("ord"), col("w.tie_id").as("tie_id"),
        col("w.value").as("value"))
  }

  /** [[LatestBy]] served from the merged latest-wins state: re-apply
    * the same argmax across batch partitions (the semilattice merge),
    * then pivot the bounded winner table to one row per entity.
    * NOTE: `ord` compares as its STRING form — exact for the
    * timestamp/date/zero-padded keys the rule is meant for; callers
    * with bare numeric order columns should zero-pad or epoch-cast
    * them (the same type-erasure contract as the count store).
    */
  def latestFromState(
      state: DataFrame, rules: Seq[LatestBy]): DataFrame = {
    require(rules.nonEmpty, "need at least one LatestBy rule")
    val merged = state.groupBy(col("entity_id"), col("attr"))
      .agg(max(struct(col("ord"), col("tie_id"), col("value"))).as("w"))
    val aggs = rules.map { r =>
      min(when(col("attr") === r.inCol, col("w.value"))).as(r.outCol)
    }
    merged.groupBy(col("entity_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold one batch of entity-labelled records into the mergeable
    * representation: (entity_id, attr, value, n) where value is the
    * attribute cast to string (null preserved — a null's count keeps
    * `n_records` honest but never wins a mode). One map-side-combined
    * aggregate of the batch.
    */
  def countRecords(
      batch: DataFrame, entityCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    val stacked = batch.select(col(entityCol).as("entity_id"),
      explode(map_concat(
        (map(lit(RowAttr), lit("1")) +:
          attrCols.map(c => map(lit(c), col(c).cast("string")))): _*
      )).as(Seq("attr", "value")))
    stacked.groupBy(col("entity_id"), col("attr"), col("value"))
      .agg(count(lit(1)).as("n"))
  }
}
