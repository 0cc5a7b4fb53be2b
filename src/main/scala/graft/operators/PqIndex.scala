package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.NativeVector

/** Product quantization (PQ) for approximate nearest-neighbor search:
  * split each vector into `m` subvectors, learn a tiny k-means codebook
  * per subspace, and store each vector as `m` small codes (m bytes at
  * ksub <= 256) instead of `dim` floats — a 32-64× compression that
  * turns a 100 TB embedding corpus into something that fits hot
  * storage, with asymmetric-distance (ADC) scoring: the QUERY stays
  * exact, each candidate is scored through a per-query lookup table of
  * subspace dot products, sum of `m` table hits per pair instead of a
  * `dim`-wide dot.
  *
  * Scale shape:
  *   - training reduces each pass to m×ksub×dsub numbers through
  *     partial aggregation (same contract as [[IvfIndex.train]]: the
  *     driver only ever holds codebooks, never rows);
  *   - encoding is a map-only codegen'd pass (argmin over ksub plan-
  *     literal codewords per subspace — `dot(c,c) - 2·dot(v,c)`, the
  *     `dot(v,v)` term is constant per row and cannot move an argmin);
  *   - search broadcasts the (small by contract) query batch WITH its
  *     precomputed LUT; candidates stream through a single projection
  *     of m array lookups + adds — no shuffle on the corpus side, and
  *     the per-query top-k rides the bounded [[TopK]] aggregator.
  *   - compose with [[IvfIndex]] (IVF-PQ) by encoding each IVF cell's
  *     residuals: cell pruning bounds the candidates, PQ bounds the
  *     bytes per candidate.
  *
  * Determinism mirrors IVF: initial codewords are the subvectors of
  * the `ksub` smallest ids, iterations refine by cluster means, and at
  * iters=0 the whole encode+search pipeline is exact IEEE arithmetic an
  * external SQL engine replays bit-for-bit (the driver oracle does).
  */
object PqIndex {

  /** Trained codebooks: m subspaces × ksub codewords × dsub dims. */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def ksub: Int = if (codebooks.isEmpty) 0 else codebooks(0).length
    def dsub: Int = if (ksub == 0) 0 else codebooks(0)(0).length
  }

  private def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    NativeVector.register(df.sparkSession)
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as("id"), v.as("__v"))
      .withColumn("__norm", sqrt(NativeVector.dot(col("__v"), col("__v"))))
      .filter(col("__norm") > 0)
      .withColumn("nv", transform(col("__v"), x => x / col("__norm")))
      .select("id", "nv")
  }

  /** Subvector s (1-based slice) of a vector column. */
  private def sub(nv: Column, s: Int, dsub: Int): Column =
    slice(nv, s * dsub + 1, dsub)

  /** Code of the nearest codeword in subspace s: argmin of
    * `dot(c,c) - 2·dot(v,c)` (squared L2 minus the per-row constant),
    * ties to the lowest code via struct order. One matrix literal per
    * subspace; each codeword's dot evaluates exactly once per row.
    */
  private def argminCode(nv: Column, model: Model, s: Int): Column = {
    val cb = model.codebooks(s)
    val mat = typedLit(cb.map(_.toSeq).toSeq)
    val v = sub(nv, s, model.dsub)
    val scored = cb.indices.map { c =>
      val cv = element_at(mat, c + 1)
      val selfDot = cb(c).map(x => x * x).sum
      struct((lit(selfDot) - lit(2.0) * NativeVector.dot(v, cv)).as("d"),
        lit(c).as("code"))
    }
    element_at(array_sort(array(scored: _*)), 1).getField("code")
  }

  /** Train per-subspace k-means codebooks on the L2-normalized corpus.
    * Deterministic: initial codewords are the subvectors of the `ksub`
    * smallest ids; empty clusters keep their previous codeword.
    */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 4,
      ksub: Int = 16,
      iters: Int = 0): Model =
    trainOn(normalized(df, idCol, vecCol), m, ksub, iters)

  /** [[train]] on an already-prepared (id, nv) frame — the entry point
    * for [[IvfPq]], whose training vectors are RESIDUALS (not unit
    * vectors; nothing here assumes normalization).
    */
  private[operators] def trainOn(
      prepared: DataFrame,
      m: Int,
      ksub: Int,
      iters: Int): Model = {
    require(m >= 1 && ksub >= 1 && iters >= 0,
      s"need m >= 1, ksub >= 1, iters >= 0; got m=$m ksub=$ksub iters=$iters")
    val n = prepared.cache()
    try {
      val seeds = n.orderBy("id").limit(ksub)
        .select("nv").collect().map(_.getSeq[Double](0).toArray)
      require(seeds.nonEmpty, "empty training corpus")
      val dim = seeds(0).length
      require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
      val dsub = dim / m
      var books: Array[Array[Array[Double]]] =
        Array.tabulate(m, seeds.length)((s, c) =>
          seeds(c).slice(s * dsub, (s + 1) * dsub))
      for (_ <- 0 until iters) {
        val model = Model(books)
        // (subspace, code, component, mean) — m×ksub×dsub numbers out
        val codes = (0 until m).map(s => argminCode(col("nv"), model, s))
        val sums = n
          .select(col("nv"), posexplode(array(codes: _*)).as(Seq("s", "code")))
          .select(col("s"), col("code"),
            posexplode(slice(col("nv"), col("s") * dsub + 1, lit(dsub)))
              .as(Seq("i", "x")))
          .groupBy("s", "code", "i")
          .agg(sum("x").as("sx"), count(lit(1)).as("c"))
          .collect()
        val next = books.map(_.map(_.clone()))
        sums.foreach { r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
            r.getDouble(3) / r.getLong(4)
        }
        books = next
      }
      Model(books)
    } finally n.unpersist()
  }

  /** Corpus compressed to PQ codes: (id, codes array<int> of length m).
    * Map-only, no shuffle; at ksub <= 256 a storage layer would pack
    * `codes` into m bytes per row.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    encodeOn(normalized(df, idCol, vecCol), model)

  /** [[encode]] on an already-prepared (id, nv, ...) frame; extra
    * columns ride along (IvfPq keeps its cell id next to the codes).
    */
  private[operators] def encodeOn(prepared: DataFrame, model: Model): DataFrame = {
    val codes = (0 until model.m).map(s => argminCode(col("nv"), model, s))
    prepared.withColumn("codes", array(codes: _*)).drop("nv")
  }

  /** The m×ksub lookup table for one query vector: lut[s][c] =
    * dot(q_sub_s, codeword_c) — the entire per-candidate scoring
    * reduces to m array hits against this.
    */
  private[operators] def lutCol(nv: Column, model: Model): Column = {
    val luts = (0 until model.m).map { s =>
      val mat = typedLit(model.codebooks(s).map(_.toSeq).toSeq)
      transform(mat, c => NativeVector.dot(sub(nv, s, model.dsub), c))
    }
    array(luts: _*)
  }

  /** Fixed-order ADC sum over subspaces (s = 0 first, so an external
    * engine adding its terms in the same order matches to the last ulp).
    */
  private[operators] def adcScore(lut: Column, codes: Column, model: Model): Column =
    (0 until model.m)
      .map(s => element_at(element_at(lut, s + 1),
        element_at(codes, s + 1) + 1))
      .reduce(_ + _)

  /** ADC top-`kNeighbors`: per query, precompute the m×ksub lookup
    * table of subspace dots ONCE, broadcast queries+LUT, and score each
    * encoded candidate with m array hits + adds. Output contract
    * matches [[SimilaritySearch.bruteForceTopK]]: (query_id,
    * neighbor_id, score, rank), score rounded to 6 dp, ties on id.
    */
  def search(
      queries: DataFrame,
      encoded: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      kNeighbors: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val q = normalized(queries, idCol, vecCol)
      .select(col("id").as("query_id"), lutCol(col("nv"), model).as("lut"))
      .localCheckpoint(true) // tiny by contract; keep the LUT out of the join
    val scored = encoded.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(adcScore(col("lut"), col("codes"), model), 6).as("score"))
      .as[(Long, Long, Double)]
    TopK.perGroup(scored, kNeighbors)
      .toDF("query_id", "neighbor_id", "score", "rank")
  }
}
