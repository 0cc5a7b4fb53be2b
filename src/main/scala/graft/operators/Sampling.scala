package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is non-reproducible across retries, partitionings and
  * Spark versions (partition-seeded RNG), which poisons experiment
  * lineage: a re-run of the same pipeline yields a different corpus.
  * These operators decide membership from a portable sha-256 hash of
  * (seed, row id) instead — a pure per-row predicate, so:
  *
  *   - the same (id, seed) is in or out FOREVER, on any cluster layout,
  *     any engine (the driver's DuckDB oracle replays it exactly);
  *   - sampling is a codegen'd filter pushed like any other predicate —
  *     no shuffle, no RNG state, trivially parallel at 100 TB;
  *   - nested samples compose: a 1% sample of a 10% sample with
  *     different seeds behaves like an 0.1% sample.
  *
  * The unit interval comes from the top 8 hex digits of the hash
  * (32 uniform bits / 2^32 — same construction the minhash family
  * uses, [[TextFunctions.portableHash32]]).
  */
object Sampling {

  /** Uniform [0, 1) value derived from sha-256 of `seed:id`. */
  def hashUnit(idCol: Column, seed: Long): Column =
    TextFunctions.portableHash32(
      concat_ws(":", lit(seed), idCol.cast("string"))) / lit(4294967296.0)

  /** Keep each row iff hash(seed, id) < fraction. Expected — not exact
    * — sample size, like Bernoulli sampling everywhere; identical
    * membership on every run.
    */
  def deterministicSample(
      df: DataFrame, idCol: String, fraction: Double, seed: Long): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    df.filter(hashUnit(col(idCol), seed) < fraction)
  }

  /** Per-stratum fractions (e.g. language re-balancing: keep 100% of
    * low-resource strata, 5% of the dominant one). Strata absent from
    * `fractions` fall back to `defaultFraction`.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      fractions: Map[String, Double],
      seed: Long,
      defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be within [0, 1]")
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(hashUnit(col(idCol), seed) < frac)
  }

  /** EXACTLY `n` rows per stratum (vs the expected-size Bernoulli
    * forms above): the n smallest portable hashes win, ties broken by
    * id. Deterministic and layout-independent like everything here;
    * one exchange on the stratum key. A hot stratum sorts in one task
    * under the window form — for heavily skewed strata at scale,
    * [[Curation.sourceCaps]]'s k-bounded aggregator is the same
    * operator with (hash asc) as the score.
    */
  def exactSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int,
      seed: Long): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    df.withColumn("__u", hashUnit(col(idCol), seed))
      .withColumn("sample_rank",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(strataCol).orderBy(col("__u"), col(idCol)))
          .cast("long"))
      .filter(col("sample_rank") <= n)
      .drop("__u")
  }

  /** Deterministic train/validation/test split: disjoint hash-unit
    * ranges tag every row exactly once. A pure projection — no
    * shuffle, no state; the same (id, seed) lands in the same split
    * on any engine forever, so eval contamination from re-splits is
    * structurally impossible.
    */
  def split(
      df: DataFrame,
      idCol: String,
      seed: Long,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val u = hashUnit(col(idCol), seed)
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    // last branch is the otherwise: no row escapes float edge cases
    val tagged = fractions.init.zip(cuts.init).foldRight(
      lit(fractions.last._1)) { case (((name, _), cut), other) =>
      when(u < cut, name).otherwise(other)
    }
    df.withColumn("split", tagged)
  }

  /** Uniform (0, 1) value — strictly positive, so its logarithm is
    * finite — derived like [[hashUnit]] but offset by half a hash step.
    */
  def hashUnitOpen(idCol: Column, seed: Long): Column =
    (TextFunctions.portableHash32(
      concat_ws(":", lit(seed), idCol.cast("string"))) + lit(0.5)) /
      lit(4294967296.0)

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    * exactly `k` rows, each row's inclusion probability proportional to
    * its weight, deterministic forever. Every row draws the key
    * `u^(1/w)` (compared as `ln(u)/w` — same order, no overflow for
    * tiny weights) from the portable hash; the k largest keys win.
    *
    * The standard one-pass corpus subsampler when documents should be
    * drawn proportional to token count (or any quality score): a
    * uniform doc sample under-represents long documents by token mass.
    *
    * Scale shape: the key is a map-only codegen'd projection and the
    * selection is a global top-k (`TakeOrderedAndProject`) — each task
    * keeps its k best rows, the driver merges P×k candidates. No
    * shuffle, no sort of the corpus; identical to [[exactSample]]'s
    * guarantees but weight-aware.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // non-positive and NaN weights = excluded, by definition (a negative
    // weight would flip the key's sign and ALWAYS win the top-k; NaN
    // passes `> 0` under Spark's NaN-greatest ordering and a NaN key
    // would also sort first under desc)
    val key = log(hashUnitOpen(col(idCol), seed)) / col(weightCol).cast("double")
    df.filter(col(weightCol) > 0 && !isnan(col(weightCol).cast("double")))
      .withColumn("__es_key", key)
      .orderBy(col("__es_key").desc, col(idCol))
      .limit(k)
      .drop("__es_key")
  }

  /** Per-stratum weighted sampling without replacement: [[weightedSample]]
    * independently within each `groupCol` value (k best Efraimidis–
    * Spirakis keys per stratum). ONE exchange on the stratum key; a hot
    * stratum ranks in one task — for pathological stratum skew the
    * k-bounded aggregator form ([[Curation.sourceCaps]] with the ES key
    * as the score) is the same operator with map-side state.
    *
    * Duplicate ids within a stratum draw identical keys (the key is a
    * pure function of (seed, id, weight)), so callers feeding replayed
    * or unioned data should dedup on (group, id) first — the streaming
    * wrapper ([[graft.streaming.ReservoirStream]]) does exactly that.
    */
  def weightedSampleGrouped(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val key = log(hashUnitOpen(col(idCol), seed)) / col(weightCol).cast("double")
    df.filter(col(weightCol) > 0 && !isnan(col(weightCol).cast("double")))
      .withColumn("__es_key", key)
      .withColumn("sample_rank",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(groupCol)
            .orderBy(col("__es_key").desc, col(idCol)))
          .cast("long"))
      .filter(col("sample_rank") <= k)
      .drop("__es_key")
  }

  /** Weighted mixture of corpora: down-sample each source to
    * `weights(name)` and union, tagging provenance. The standard
    * "training mix" step; deterministic end to end.
    */
  def weightedMix(
      sources: Seq[(String, DataFrame, Double)],
      idCol: String,
      seed: Long): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    sources.map { case (name, df, w) =>
      deterministicSample(df, idCol, w, seed)
        .withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)
  }
}
