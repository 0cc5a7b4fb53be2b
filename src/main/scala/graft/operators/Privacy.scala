package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits over tabular training data — the release gate
  * that runs AFTER PII redaction ([[graft.functions.TextFunctions
  * .redactPii]] scrubs free text; these operators measure what the
  * STRUCTURED columns still leak).
  *
  * k-anonymity (Sweeney 2002, "k-anonymity: a model for protecting
  * privacy"): a row is k-anonymous when at least k rows share its
  * quasi-identifier combination — below that, joining the released
  * table to any public table on the quasi-identifiers re-identifies
  * individuals. l-diversity (Machanavajjhala et al. 2007) closes the
  * homogeneity gap k-anonymity leaves: a k-sized group whose
  * SENSITIVE column holds a single value still discloses that value
  * for everyone in the group.
  *
  * Scale shape: every audit is ONE map-side-combined aggregation over
  * the quasi-identifier columns (distinct sensitive values ride the
  * same exchange as a two-level aggregate); output is bounded by the
  * quasi-identifier COMBINATION SPACE, never by rows, and the per-row
  * flag variant is a broadcast-able join of that bounded table back —
  * nothing here shuffles data-sized state.
  */
object Privacy {

  /** Per-equivalence-class k-anonymity report: each observed
    * quasi-identifier combination with its group size, whether it
    * meets the `k` threshold, and the worst-case re-identification
    * probability (1/size, rounded like every engine-portable ratio
    * here).
    *
    * @param quasiCols the quasi-identifier columns (the join surface
    *        an attacker has — age/zip/gender-shaped, NOT free keys)
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    kAnonymityAgg(df, quasiCols, k, Seq.empty)

  /** [[kAnonymity]] plus distinct-l-diversity of one sensitive
    * column: per quasi-identifier combination, the number of DISTINCT
    * sensitive values (null counts as a value only if present — it is
    * an observable fact about the group) and whether it meets `l`.
    * A group can be k-anonymous yet l=1 — everyone in it shares the
    * sensitive value, so the "anonymous" release still discloses it.
    */
  def lDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Long,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 1, s"l must be >= 1, got $l")
    kAnonymityAgg(df, quasiCols, k,
      Seq(count_distinct(col(sensitiveCol)).as("sensitive_l")))
      .withColumn("l_diverse", col("sensitive_l") >= l)
  }

  /** The shared one-exchange aggregate behind both reports. */
  private def kAnonymityAgg(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long,
      extra: Seq[Column]): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"), extra: _*)
      .withColumn("k_anonymous", col("group_n") >= k)
      .withColumn("reident_risk", round(lit(1.0) / col("group_n"), 6))
  }

  /** Row-level suppression view: every input row tagged with its
    * group's `k_anonymous` flag — the frame a release pipeline
    * filters on. The class table is combination-space-bounded, so the
    * join back broadcasts; rows never shuffle.
    */
  def suppressionView(
      df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    df.join(
      broadcast(kAnonymity(df, quasiCols, k)
        .select((quasiCols.map(col) :+ col("k_anonymous")): _*)),
      quasiCols, "left")
}
