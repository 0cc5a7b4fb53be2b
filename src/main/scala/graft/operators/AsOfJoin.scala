package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.classic.GraftPlanApi
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** As-of (point-in-time) join: for every left row, attach the LATEST
  * right row whose time is <= (or strictly <) the left row's time,
  * per key — the canonical event-stream / market-data operator that
  * Spark's built-in joins lack.
  *
  * Formulation: union both sides tagged, one window pass per key
  * ordered by (time, side), `last(struct, ignoreNulls)` carries the
  * most recent right payload forward onto each left row. This is the
  * same union + window pattern the reference uses instead of joins
  * (/root/reference/README.md:99,:102), and it scales the same way:
  * ONE hash exchange on the key (both sides co-partitioned by the
  * shuffle), one sort — versus a range-join which Spark would plan as
  * a broadcast/cartesian with a range filter. Right payloads travel as
  * a single struct so all columns come from the SAME right row (per-
  * column last() would mix rows when right columns hold genuine nulls).
  *
  * @param rightValueCols right columns to attach (null when no right
  *                       row precedes the left row)
  * @param tieBreak       extra ordering among right rows sharing
  *                       (key, time); the LAST in this order wins.
  *                       Without it, equal-time right rows give an
  *                       arbitrary survivor — dedupe or pass this.
  * @param strict         true = right row must be strictly earlier
  */
object AsOfJoin {

  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      tieBreak: Seq[String] = Nil,
      strict: Boolean = false): DataFrame = {

    val leftCols = left.columns.toSeq
    val payloadType = right
      .select(struct(rightValueCols.map(col): _*).as("__rv"))
      .schema("__rv").dataType

    // side ordering at equal time decides visibility: for <= the right
    // row must sort BEFORE the left row (0 < 1); for < it must sort
    // AFTER (2 > 1).
    val rightSide = if (strict) 2 else 0

    val lp = left
      .withColumn("__t", col(leftTimeCol))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(payloadType))
      .select((keyCols ++ Seq("__t", "__side", "__rv") ++
        leftCols.filterNot(keyCols.contains)).map(col): _*)

    val rp = right
      .withColumn("__t", col(rightTimeCol))
      .withColumn("__side", lit(rightSide))
      .withColumn("__rv", struct(rightValueCols.map(col): _*))
      .select((keyCols.map(col) ++ Seq(col("__t"), col("__side"), col("__rv")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)

    // tieBreak columns live inside the right payload struct (they must
    // be a subset of rightValueCols — left rows sort apart via __side,
    // so their null payload never competes).
    require(tieBreak.forall(rightValueCols.contains),
      "tieBreak columns must be included in rightValueCols")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((Seq(col("__t").asc, col("__side").asc) ++
        tieBreak.map(c => col("__rv").getField(c).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lp.union(rp)
      .withColumn("__last_rv", last("__rv", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightValueCols.map(c => col(s"__last_rv.$c").as(c)): _*)
  }

  /** Same semantics as [[asOfJoin]], planned as the native
    * [[graft.plans.AsOfJoinExec]] merge operator instead of the
    * union + window composition: one exchange + sort per side, then a
    * forward-only streaming merge — no null-padded union rows, no
    * window frame machine. Prefer this form at scale; the composed
    * form remains as the independent cross-check (AsOfJoinSpec proves
    * them equal).
    *
    * Key and time columns must have identical types on both sides
    * (cast beforehand). `tieBreak` may be any right columns here (the
    * composed form requires them inside `rightValueCols`).
    */
  def asOfJoinNative(
      left0: DataFrame,
      right0: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      tieBreak: Seq[String] = Nil,
      strict: Boolean = false): DataFrame = {
    // Coerce columns that differ between sides only in timestamp flavor
    // (TIMESTAMP vs TIMESTAMP_NTZ — e.g. one side read from a parquet
    // file written without isAdjustedToUTC): cast the NTZ side to the
    // session-timezone TIMESTAMP. Exact when the session TZ is UTC (as
    // this engine pins); both sides then order identically in the merge.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    def coerce(l: DataFrame, r: DataFrame, lc: String, rc: String)
        : (DataFrame, DataFrame) =
      (l.schema(lc).dataType, r.schema(rc).dataType) match {
        case (TimestampNTZType, TimestampType) =>
          (l.withColumn(lc, col(lc).cast(TimestampType)), r)
        case (TimestampType, TimestampNTZType) =>
          (l, r.withColumn(rc, col(rc).cast(TimestampType)))
        case _ => (l, r)
      }
    val (left, right) = (keyCols.map(k => (k, k)) :+ (leftTimeCol, rightTimeCol))
      .foldLeft((left0, right0)) { case ((l, r), (lc, rc)) => coerce(l, r, lc, rc) }

    val spark = left.sparkSession
    GraftPlanApi.ensureStrategy(spark, AsOfJoinStrategy)

    // Re-alias the projected right side so its attributes get fresh
    // exprIds — required for self-joins, harmless otherwise. The
    // projection also prunes right columns before the exchange (the
    // optimizer cannot prune through an unknown node).
    val rCols = (keyCols ++ Seq(rightTimeCol) ++ rightValueCols ++ tieBreak).distinct
    val rAnalyzed = right.select(rCols.map(col): _*).queryExecution.analyzed
    val aliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(aliases, rAnalyzed)
    val rOut = aliases.map(_.toAttribute)
    def rAttr(name: String): Attribute = rOut.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"right column not found: $name"))

    val lPlan = left.queryExecution.analyzed
    def lAttr(name: String): Attribute = lPlan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"left column not found: $name"))

    val plan = AsOfJoinPlan(
      lPlan, rPlan,
      keyCols.map(lAttr), keyCols.map(rAttr),
      lAttr(leftTimeCol), rAttr(rightTimeCol),
      rightValueCols.map(rAttr), tieBreak.map(rAttr), strict)
    require(plan.resolved,
      s"as-of join plan failed to resolve: check that key/time column " +
        s"types match between sides " +
        s"(left keys: ${keyCols.map(lAttr(_).dataType.simpleString)}, " +
        s"right keys: ${keyCols.map(rAttr(_).dataType.simpleString)}, " +
        s"left time: ${lAttr(leftTimeCol).dataType.simpleString}, " +
        s"right time: ${rAttr(rightTimeCol).dataType.simpleString})")
    GraftPlanApi.ofRows(spark, plan)
  }
}
