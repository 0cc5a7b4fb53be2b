package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * NON-NULL sensitive values and whether it meets `l`. NULL is
    * never counted as a sensitive value (`count_distinct` skips it,
    * and [[lDiversityFromCounts]] matches that contract): a class
    * whose members are all NULL gets `sensitive_l = 0` and fails the
    * diversity test — absent data is treated as no diversity
    * evidence, not as a value. A group can be k-anonymous yet l=1 —
    * everyone in it shares the sensitive value, so the "anonymous"
    * release still discloses it.
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

  /** t-closeness (Li, Li & Venkatasubramanian 2007): the attack
    * l-diversity misses is SKEW — a group can hold l distinct
    * sensitive values yet still leak ("99% of this group has the
    * disease") when its distribution diverges from the table-wide
    * one. Per equivalence class, the earth-mover's distance between
    * the group's sensitive-value distribution and the global
    * distribution over the ORDERED value domain (numeric EMD with
    * unit ground distance between adjacent ranks):
    * `EMD = Σᵢ |P̂group(≤vᵢ) − P̂global(≤vᵢ)| / (m−1)`.
    *
    * Scale shape: one exchange builds the (quasi × sensitive) count
    * table; everything after runs on that combination-space-bounded
    * frame, checkpointed once so the domain / group / grid deriveds
    * don't re-aggregate the corpus. The domain table (m rows) cross-
    * broadcasts onto the group table so absent values count as mass 0
    * — EMD is wrong without the zero fill. Per-term doubles are exact
    * in both engines (integer cumulative counts, one division each);
    * the per-group fold rides DECIMAL so it is order-independent.
    *
    * NULL sensitive values are EXCLUDED before anything else: NULL
    * has no position on the ordered value domain (engines disagree on
    * where it sorts — Spark windows put it first, SQL's `ORDER BY`
    * default last), and an equality join can never zero-fill a NULL
    * key, so including it would silently corrupt the grid. Group and
    * global mass therefore count non-null rows only; a class that is
    * 100% NULL disappears from the report.
    */
  def tCloseness(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      t: Double): DataFrame =
    tClosenessFromCounts(
      df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
        .agg(count(lit(1)).as("__c")),
      quasiCols, sensitiveCol, t)

  /** [[tCloseness]] from a pre-aggregated (quasi × sensitive) count
    * table — the MERGEABLE representation every audit here derives
    * from (counts are additive, so summed per-batch stores equal the
    * one-pass table; [[graft.streaming.PrivacyStream]] serves the
    * live variant off exactly this frame).
    */
  def tClosenessFromCounts(
      counts0: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      t: Double,
      cntCol: String = "__c"): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(t > 0.0 && t < 1.0, s"t must be in (0, 1), got $t")
    // NULL sensitive mass out first — see the class doc: no rank on
    // the ordered domain, and the zero-fill equi-join can't match it.
    val counts = counts0.withColumnRenamed(cntCol, "__c")
      .filter(col(sensitiveCol).isNotNull)
      .localCheckpoint(true) // combination-space × domain — bounded
    // ordered value domain with cumulative global mass; bounded
    // global window, like every vocab/bucket table here
    val domain = counts.groupBy(col(sensitiveCol)).agg(sum("__c").as("__gc"))
      .withColumn("__rank", row_number().over(Window.orderBy(col(sensitiveCol))))
      .withColumn("__cumgc",
        sum("__gc").over(Window.orderBy("__rank")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val Array(mRow) = domain
      .agg(count(lit(1)).as("m"), sum("__gc").as("n")).collect()
    val m = mRow.getLong(0)
    val n = mRow.getLong(1)
    require(m >= 2, s"sensitive domain must have >= 2 values, got $m")
    val groups = counts.groupBy(quasiCols.map(col): _*)
      .agg(sum("__c").as("group_n"))
    // the checkpointed count table carries no stats, so Spark would
    // sort-merge it — broadcast explicitly (combination-space-bounded)
    val grid = groups.crossJoin(broadcast(domain))
      .join(broadcast(counts.withColumnRenamed("__c", "__gc2")
          .select((quasiCols :+ sensitiveCol).map(col) :+ col("__gc2"): _*)),
        quasiCols :+ sensitiveCol, "left")
      .withColumn("__c", coalesce(col("__gc2"), lit(0L)))
    val w = Window.partitionBy(quasiCols.map(col): _*).orderBy("__rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val term = abs(
      sum("__c").over(w).cast("double") / col("group_n").cast("double") -
        col("__cumgc").cast("double") / lit(n.toDouble))
    grid
      .withColumn("__t", round(term, 9).cast("decimal(28,12)"))
      .groupBy(quasiCols.map(col): _*)
      .agg(max("group_n").as("group_n"), sum("__t").as("__s"))
      .withColumn("emd",
        round(col("__s").cast("double") / lit((m - 1).toDouble), 6))
      .withColumn("t_close", col("emd") <= t)
      .drop("__s")
  }

  /** Differentially private count release (Dwork, McSherry, Nissim &
    * Smith 2006): per quasi-identifier combination, the true count
    * plus Laplace(1/ε) noise — sensitivity 1 when each individual
    * contributes one row — released only when the NOISY count clears
    * `releaseThreshold` (the thresholding step of approximate-DP
    * partition selection: small groups vanish rather than leak, and
    * the released key set itself stays data-dependent-safe). True
    * counts and sub-threshold groups never appear in the output.
    *
    * PRIVACY CONTRACT (the part the mechanism cannot enforce for you):
    *
    *  - '''The seed is the noise source and MUST stay secret.''' The
    *    noise is pseudorandom — inverse-CDF Laplace driven by the
    *    portable sha-256 unit hash of (seed, epoch, group key) — so
    *    anyone holding the seed can subtract the noise exactly and
    *    recover true counts. Determinism given (seed, epoch) exists so
    *    a SPECIFIC release is replayable/auditable by its owner (and
    *    testable against the DuckDB oracle, which interpolates a test
    *    seed); it is not a license to publish the seed.
    *  - '''Every release needs a fresh `epoch`.''' The epoch (a
    *    release/batch id) is folded into the noise hash, so distinct
    *    epochs draw independent noise. Re-releasing a growing count
    *    store under ONE noise draw would let an observer difference
    *    two releases and read raw increments with no privacy at all —
    *    the exact failure a fixed per-key noise had.
    *  - '''The budget composes.''' T releases at ε each cost T·ε under
    *    sequential composition (Dwork & Roth 2014, Thm 3.14); callers
    *    monitoring a stream spend budget per epoch and must cap total
    *    epochs against their privacy target.
    *
    * Noise detail: `u < ½ → b·ln(2u)`, else `−b·ln(2−2u)`; the ln is
    * rounded to 7 dp — the same engine-exactness fold as the PSI/LM
    * operators. One map-side-combined aggregate; the noise term is a
    * per-GROUP projection on the bounded class table.
    */
  def dpRelease(
      df: DataFrame,
      quasiCols: Seq[String],
      epsilon: Double,
      releaseThreshold: Double,
      seed: Long,
      epoch: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("noisy_n",
        round(col("__n") + laplaceNoise(quasiCols, epsilon, seed, epoch), 6))
      .filter(col("noisy_n") >= releaseThreshold)
      .drop("__n")
  }

  /** Inverse-CDF Laplace(1/ε) from the portable unit hash of
    * (seed, epoch, group key): `u < ½ → b·ln(2u)`, else `−b·ln(2−2u)`,
    * the ln rounded to 7 dp for engine exactness. Pure per-group
    * projection; the epoch in the key makes each release's draw
    * independent of every other epoch's (see [[dpRelease]]'s privacy
    * contract).
    */
  private def laplaceNoise(
      quasiCols: Seq[String], epsilon: Double, seed: Long,
      epoch: Long): Column = {
    val b = 1.0 / epsilon
    val key = concat_ws("|",
      (lit(epoch).cast("string") +: quasiCols.map(c => col(c).cast("string"))): _*)
    val u = Sampling.hashUnitOpen(key, seed)
    when(u < 0.5, lit(b) * round(log(lit(2.0) * u), 7))
      .otherwise(lit(-b) * round(log(lit(2.0) - lit(2.0) * u), 7))
  }

  // ---- count-table variants: the same audits off the mergeable
  // (quasi × sensitive) count representation. Counts are additive, so
  // a union of per-batch count stores summed per key equals the
  // one-pass table — the parity [[graft.streaming.PrivacyStream]]
  // serves live and q_stream_* gates adjudicate against the batch
  // oracles. Each is an aggregation of the BOUNDED count table.

  /** [[kAnonymity]] from (quasi × sensitive) counts. */
  def kAnonymityFromCounts(
      counts: DataFrame,
      quasiCols: Seq[String],
      k: Long,
      cntCol: String = "__c"): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    counts.groupBy(quasiCols.map(col): _*)
      .agg(sum(cntCol).as("group_n"))
      .withColumn("k_anonymous", col("group_n") >= k)
      .withColumn("reident_risk", round(lit(1.0) / col("group_n"), 6))
  }

  /** [[lDiversity]] from (quasi × sensitive) counts: `sensitive_l` is
    * the count of NON-NULL sensitive rows present per class — exactly
    * `count_distinct`'s null-skipping contract on the raw rows.
    */
  def lDiversityFromCounts(
      counts: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Long,
      l: Long,
      cntCol: String = "__c"): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 1, s"l must be >= 1, got $l")
    require(k >= 2, s"k must be >= 2, got $k")
    counts.groupBy(quasiCols.map(col): _*)
      .agg(sum(cntCol).as("group_n"),
        count(when(col(sensitiveCol).isNotNull, lit(1))).as("sensitive_l"))
      .withColumn("k_anonymous", col("group_n") >= k)
      .withColumn("reident_risk", round(lit(1.0) / col("group_n"), 6))
      .withColumn("l_diverse", col("sensitive_l") >= l)
      // match the row-path column order (quasi, group_n, sensitive_l, …)
      .select(quasiCols.map(col) ++ Seq(col("group_n"), col("sensitive_l"),
        col("k_anonymous"), col("reident_risk"), col("l_diverse")): _*)
  }

  /** [[dpRelease]] from (quasi × sensitive) counts — the live release
    * endpoint. The same privacy contract applies: keep the seed
    * secret, advance `epoch` on EVERY release over the growing store
    * (per-epoch independent noise is what stops an observer from
    * differencing two releases into raw count deltas), and budget
    * ε per epoch under sequential composition.
    */
  def dpReleaseFromCounts(
      counts: DataFrame,
      quasiCols: Seq[String],
      epsilon: Double,
      releaseThreshold: Double,
      seed: Long,
      epoch: Long,
      cntCol: String = "__c"): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    counts.groupBy(quasiCols.map(col): _*)
      .agg(sum(cntCol).as("__n"))
      .withColumn("noisy_n",
        round(col("__n") + laplaceNoise(quasiCols, epsilon, seed, epoch), 6))
      .filter(col("noisy_n") >= releaseThreshold)
      .drop("__n")
  }
}
