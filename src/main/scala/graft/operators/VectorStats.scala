package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-level statistics over an embedding column — the
  * audits a pipeline runs on a vector corpus before indexing it:
  * per-DIMENSION moments (the standardization/whitening profile — a
  * dead dimension or a scale-dominant one distorts every cosine), a
  * map-only standardization transform built from that profile, and
  * per-vector outlier detection against the label/cluster centroid
  * (mislabeled or off-manifold vectors surface as high centroid
  * distance).
  *
  * Scale shape: moments come from ONE posexplode + map-side-combined
  * groupBy on the dimension index — each partition pre-folds to
  * d rows, the shuffle moves d rows per partition, and the resulting
  * d-row (or |labels|·d-row) profile broadcasts back for the map-only
  * application. Nothing pairwise, nothing driver-side beyond the
  * bounded profile.
  *
  * Determinism (oracle parity): inputs quantize to [[Pca.Grid]]'s
  * exact integer grid (float32s are dyadic — `x · 2^20` is exact, the
  * round loses ~1e-7 relative) and every sum runs over exact
  * longs/decimals, so mean/std/min/max are pure functions of the data
  * on any engine; cross-term folds round to 7 dp into DECIMAL(27,7)
  * before summing, the same discipline as [[Divergence]].
  */
object VectorStats {

  private val Grid = Pca.Grid

  private def quantize(vecCol: Column): Column =
    transform(vecCol, x => round(x.cast("double") * lit(Grid), 0).cast("long"))

  /** Per-dimension profile `(dim, n, mean, std, dim_min, dim_max)`
    * (dim is 1-based; std is the population deviation). The
    * standardization / whitening parameter table, d rows total.
    */
  def dimProfile(df: DataFrame, vecCol: String): DataFrame = {
    val exploded = df
      .select(posexplode(quantize(col(vecCol))).as(Seq("__i", "__qx")))
    val m = exploded
      .groupBy((col("__i") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("__qx").cast("decimal(38,0)")).as("__s"),
        sum((col("__qx") * col("__qx")).cast("decimal(38,0)")).as("__s2"),
        min("__qx").as("__mn"), max("__qx").as("__mx"))
    val nD = col("n").cast("double")
    val sD = col("__s").cast("double")
    val s2D = col("__s2").cast("double")
    m.select(col("dim"), col("n"),
      round(sD / nD / lit(Grid), 6).as("mean"),
      round(sqrt((s2D - sD * sD / nD) / nD) / lit(Grid), 6).as("std"),
      round(col("__mn").cast("double") / lit(Grid), 6).as("dim_min"),
      round(col("__mx").cast("double") / lit(Grid), 6).as("dim_max"))
  }

  /** Map-only z-scoring of every vector against [[dimProfile]]:
    * `(idCol, z)` with `z_d = (x_d − mean_d)/std_d` (6 dp; dimensions
    * with zero deviation map to 0). The profile rides into the
    * closure as a literal array — no join, no shuffle beyond the
    * profile's own aggregation.
    */
  def standardize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val prof = dimProfile(df, vecCol)
      .select("dim", "mean", "std").collect() // d rows — bounded by dim
      .map(r => (r.getLong(0).toInt, (r.getDouble(1), r.getDouble(2))))
      .sortBy(_._1).map(_._2)
    if (prof.isEmpty) // empty corpus: no dims to standardize against
      return df.select(col(idCol),
        array().cast("array<double>").as("z")).limit(0)
    val means = array(prof.map(p => lit(p._1)): _*)
    val stds = array(prof.map(p => lit(p._2)): _*)
    df.select(col(idCol),
      zip_with(col(vecCol).cast("array<double>"),
        sequence(lit(0), lit(prof.length - 1)),
        (x, i) => {
          val sd = element_at(stds, i.cast("int") + 1)
          when(sd > 0, round((x - element_at(means, i.cast("int") + 1)) / sd, 6))
            .otherwise(lit(0.0))
        }).as("z"))
  }

  /** Embedding drift between two corpus slices: per label, the L2
    * shift and cosine similarity of the mean embedding — the
    * model-monitoring signal that a re-crawled or re-embedded slice
    * has MOVED in representation space (count-based drift like PSI is
    * blind to it: identical label counts can hide a rotated space).
    * Output: `(label, n_ref, n_cur, l2_shift, cos_sim)` for labels
    * present on BOTH sides (a one-sided label has no shift to
    * measure).
    *
    * Same exact-grid discipline as [[dimProfile]]: per-(label, dim)
    * means from exact integer sums, rounded to 6 dp before any cross
    * term; the per-label folds run through DECIMAL(27,7). Both sides
    * reduce to |labels|·d rows before they meet — the comparison is
    * dimension-bounded, never data-bounded.
    */
  def centroidShift(
      ref: DataFrame, cur: DataFrame,
      labelCol: String, vecCol: String): DataFrame =
    shiftFromCentroids(
      centroidsFromSums(centroidSums(ref, labelCol, vecCol)),
      centroidsFromSums(centroidSums(cur, labelCol, vecCol)))

  /** Exact per-(label, dim) quantized sums — the MERGEABLE
    * representation behind [[centroidShift]] (sum `s` and `n` across
    * any partitioning of the corpus and the centroids are identical;
    * [[graft.streaming.EmbeddingDriftStream]] persists exactly these).
    * Output: `(label, dim, s, n)` with dim 0-based.
    */
  def centroidSums(
      df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"),
      posexplode(quantize(col(vecCol))).as(Seq("dim", "qx")))
      .groupBy("label", "dim")
      .agg(sum(col("qx").cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n"))

  /** (label, dim, n, centroid) from a (label, dim, s, n) sum table —
    * one (label, dim) per row (merge duplicates by summing first).
    * The 6-dp round here is THE rounding point both engines share.
    */
  def centroidsFromSums(sums: DataFrame): DataFrame =
    sums.select(col("label"), col("dim"), col("n"),
      round(col("s").cast("double") / col("n").cast("double") /
        lit(Grid), 6).as("centroid"))

  /** [[centroidShift]] on two pre-computed centroid tables
    * (`(label, dim, n, centroid)` each).
    */
  def shiftFromCentroids(refC: DataFrame, curC: DataFrame): DataFrame = {
    def dec(c: Column): Column = round(c, 7).cast("decimal(27,7)")
    val a = refC.select(col("label").as("__lbl"), col("dim").as("__i"),
      col("n").as("__na"), col("centroid").as("__ca"))
    val b = curC.select(col("label").as("__lbl"), col("dim").as("__i"),
      col("n").as("__nb"), col("centroid").as("__cb"))
    val joined = a.join(b, Seq("__lbl", "__i"))
    val d = col("__ca") - col("__cb")
    joined
      .select(col("__lbl"), col("__na"), col("__nb"),
        dec(d * d).as("__dd"),
        dec(col("__ca") * col("__cb")).as("__ab"),
        dec(col("__ca") * col("__ca")).as("__aa"),
        dec(col("__cb") * col("__cb")).as("__bb"))
      .groupBy(col("__lbl").as("label"))
      .agg(max("__na").as("n_ref"), max("__nb").as("n_cur"),
        sum("__dd").as("__sdd"), sum("__ab").as("__sab"),
        sum("__aa").as("__saa"), sum("__bb").as("__sbb"))
      .select(col("label"), col("n_ref"), col("n_cur"),
        round(sqrt(col("__sdd").cast("double")), 6).as("l2_shift"),
        round(when(
          col("__saa").cast("double") > 0 && col("__sbb").cast("double") > 0,
          col("__sab").cast("double") /
            sqrt(col("__saa").cast("double") * col("__sbb").cast("double")))
          .otherwise(lit(null)), 6).as("cos_sim"))
  }

  /** Per-label centroid outliers: for each vector, the cosine
    * distance to its label's mean vector, ranked within the label —
    * `(label, rank, id, cos_dist)`, top `topK` per label (rank by
    * distance desc, id asc — total order). High ranks are the
    * mislabeled / off-manifold candidates pruned before training.
    *
    * The centroid table is |labels|·d rows from the same exact
    * quantized sums as [[dimProfile]] (means round to 6 dp before any
    * product, so both engines fold identical operands); per-vector
    * cosine folds (vec, dim) cross terms through DECIMAL(27,7).
    */
  def centroidOutliers(
      df: DataFrame, idCol: String, labelCol: String, vecCol: String,
      topK: Int = 5): DataFrame = {
    require(topK > 0, s"need topK > 0, got $topK")
    val exploded = df
      .select(col(idCol).as("__id"), col(labelCol).as("__lbl"),
        posexplode(quantize(col(vecCol))).as(Seq("__i", "__qx")))
    // NOT checkpointed: exploded is corpus-sized (d× rows) — recomputing
    // the map-only explode for the second read is cheaper at scale than
    // materializing it
    val centroids = exploded
      .groupBy("__lbl", "__i")
      .agg(sum(col("__qx").cast("decimal(38,0)")).as("__s"),
        count(lit(1)).as("__n"))
      .select(col("__lbl"), col("__i"),
        round(col("__s").cast("double") / col("__n").cast("double") /
          lit(Grid), 6).as("__c"))
    val xD = col("__qx").cast("double") / lit(Grid) // exact: /2^20
    def dec(c: Column): Column = round(c, 7).cast("decimal(27,7)")
    val perVec = exploded
      .join(broadcast(centroids), Seq("__lbl", "__i"))
      .select(col("__id"), col("__lbl"),
        dec(xD * col("__c")).as("__xc"),
        dec(xD * xD).as("__xx"),
        dec(col("__c") * col("__c")).as("__cc"))
      .groupBy("__id", "__lbl")
      .agg(sum("__xc").as("__sxc"), sum("__xx").as("__sxx"),
        sum("__cc").as("__scc"))
    val cos = col("__sxc").cast("double") /
      sqrt(col("__sxx").cast("double") * col("__scc").cast("double"))
    // zero-norm vectors (or degenerate all-zero centroids) have no
    // defined cosine — excluded identically in the oracle
    val dist = perVec
      .filter(col("__sxx").cast("double") > 0 &&
        col("__scc").cast("double") > 0)
      .select(col("__lbl").as(labelCol), col("__id").as(idCol),
      round(lit(1.0) - cos, 6).as("cos_dist"))
    dist
      .withColumn("__rk", row_number().over(Window.partitionBy(labelCol)
        .orderBy(col("cos_dist").desc, col(idCol))))
      .filter(col("__rk") <= topK)
      .select(col(labelCol), col("__rk").cast("long").as("rank"),
        col(idCol), col("cos_dist"))
  }
}
