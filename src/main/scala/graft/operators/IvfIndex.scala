package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.NativeVector
import graft.sources.AtomicDir

/** IVF (inverted-file) approximate nearest-neighbor index: a k-means
  * coarse quantizer partitions the corpus into `k` cells; a query is
  * compared only against the cells of its `nprobe` nearest centroids.
  * Complements the SRP-LSH path ([[SimilaritySearch.lshTopK]]) — IVF
  * recall is tuned by a single knob (`nprobe`) at query time, where LSH
  * requires re-hashing to change its operating point.
  *
  * Scale shape:
  *   - training touches the corpus `iters` times but reduces each pass
  *     to k×dim numbers (cluster sums via partial aggregation), so the
  *     only driver-side state is the centroid table — never rows;
  *   - centroids broadcast to assignment (k×dim doubles as plan
  *     literals; k is small by construction), so assignment is a
  *     map-only pass inside whole-stage codegen using the native dot
  *     product — no shuffle, no UDF;
  *   - search joins queries to candidates ON CELL ID (equi-join after
  *     the nprobe explode), so the per-query work is the probed cells'
  *     contents, never the corpus — no all-pairs / nested-loop stage;
  *   - per-query top-k uses the map-side bounded [[TopK]] aggregator.
  *
  * Training is floating-point iterative and therefore NOT replayable
  * bit-for-bit by an external SQL engine (sum order differs) — IVF
  * results are verified by recall-vs-brute-force specs at fixed probe
  * counts instead of a DuckDB hash oracle (see IvfIndexSpec).
  */
object IvfIndex {

  /** Trained coarse quantizer: k L2-normalized centroids. */
  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
    def dim: Int = if (centroids.isEmpty) 0 else centroids(0).length
  }

  private[operators] def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    NativeVector.register(df.sparkSession)
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as("id"), v.as("__v"))
      .withColumn("__norm", sqrt(NativeVector.dot(col("__v"), col("__v"))))
      .filter(col("__norm") > 0)
      .withColumn("nv", transform(col("__v"), x => x / col("__norm")))
      .select("id", "nv")
  }

  /** Centroid matrix as ONE literal column (k×dim doubles in a single
    * nested-array Literal — no closure capture, stays codegen-able).
    * One node instead of k×dim `lit` nodes: the per-centroid unrolled
    * formulation made janino compile a ~1000-literal expression tree,
    * which dominated query time at any data size.
    */
  private[operators] def centroidLit(c: Array[Array[Double]]): Column =
    typedLit(c.map(_.toSeq).toSeq)

  /** Index of the nearest centroid by cosine (vectors and centroids are
    * unit-L2, so max dot = min angle). Ties break to the lowest cell id
    * via the struct sort order. Each centroid's dot product is computed
    * exactly once per row.
    */
  private def nearestCell(nv: Column, model: Model): Column =
    element_at(probeCells(nv, model, 1), 1)

  /** Train a k-means coarse quantizer with Lloyd's algorithm on the
    * L2-normalized corpus. Deterministic: initial centroids are the
    * vectors of the `k` smallest ids (stable under re-runs and cheap —
    * no sampling pass), and each iteration's cluster means reduce
    * through Spark's partial aggregation. Empty clusters keep their
    * previous centroid.
    */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5): Model = {
    require(k > 0 && iters >= 0, s"need k > 0 and iters >= 0, got k=$k iters=$iters")
    val n = normalized(df, idCol, vecCol).cache()
    try {
      var centroids: Array[Array[Double]] = n.orderBy("id").limit(k)
        .select("nv").collect().map(_.getSeq[Double](0).toArray)
      require(centroids.nonEmpty, "empty training corpus")
      val dim = centroids(0).length
      for (_ <- 0 until iters) {
        val model = Model(centroids)
        // (cell, component index, component sum, count) — k×dim rows out
        val sums = n.select(nearestCell(col("nv"), model).as("cell"),
            posexplode(col("nv")).as(Seq("i", "x")))
          .groupBy("cell", "i")
          .agg(sum("x").as("s"), count(lit(1)).as("c"))
          .collect()
        // cells with no members don't appear in `sums` and keep their
        // previous centroid (the clone)
        val next = centroids.map(_.clone())
        sums.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
        }
        // re-normalize so cosine stays a dot product next round
        centroids = next.map { c =>
          val norm = math.sqrt(c.map(x => x * x).sum)
          if (norm > 0) c.map(_ / norm) else c
        }
        require(centroids.forall(_.length == dim))
      }
      Model(centroids)
    } finally n.unpersist()
  }

  /** Corpus rows tagged with their IVF cell: (id, nv, cell). */
  def assign(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val n = normalized(df, idCol, vecCol)
    n.withColumn("cell", nearestCell(col("nv"), model))
  }

  /** The inverted-file index: the assigned corpus, MATERIALIZED. In
    * production this is written to cell-partitioned storage and built
    * once per corpus version; here `localCheckpoint` stands in for the
    * stored table. Materializing matters beyond semantics: left lazy,
    * Catalyst inlines the k-way scoring expression into the search
    * join's key evaluation and re-evaluates it per joined row —
    * measured 5-6 s at sf0.1 versus ~1 s with the index cut out of the
    * join stage.
    */
  def index(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    assign(df, idCol, vecCol, model).localCheckpoint(true)

  /** Persist a trained index to `dir` so repeated query batches (and
    * other jobs) amortize training and assignment instead of redoing
    * both per search:
    *
    *   - `centroids/`: the model, k rows of (cell, centroid);
    *   - `index/`: the assigned corpus (id, nv), PARTITIONED BY cell —
    *     a search that probes nprobe of k cells prunes the rest at the
    *     file-listing level on read.
    *
    * The whole tree is staged through [[AtomicDir]] (write hidden tmp,
    * rename into place), so a crash mid-save or a concurrent reader
    * never observes a half-written index or a model/index mismatch.
    */
  def save(idx: DataFrame, model: Model, dir: String): Unit = {
    val spark = idx.sparkSession
    import spark.implicits._
    val dest = new Path(dir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = AtomicDir.tmpPath(dest)
    fs.delete(tmp, true)
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1) // k rows by construction
      .write.mode("overwrite").parquet(new Path(tmp, "centroids").toString)
    idx.select(col("id"), col("nv"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(new Path(tmp, "index").toString)
    AtomicDir.commit(fs, dest)
  }

  /** Load a [[save]]d index: (corpus frame for [[searchIndex]], model).
    * Repairs an interrupted save first. The only driver-side
    * materialization is the k-row centroid table.
    */
  def load(spark: SparkSession, dir: String): (DataFrame, Model) = {
    val dest = new Path(dir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicDir.recover(fs, dest)
    val centroids = spark.read.parquet(new Path(dest, "centroids").toString)
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, s"no centroids under $dir")
    val idx = spark.read.parquet(new Path(dest, "index").toString)
      .select(col("id"), col("nv"), col("cell").cast("int").as("cell"))
    (idx, Model(centroids))
  }

  /** The `nprobe` nearest cells per query, via a bounded sort over the
    * k centroid scores (k is plan-literal-sized; this is per-row
    * expression work, no shuffle).
    */
  private[operators] def probeCells(nv: Column, model: Model, nprobe: Int): Column = {
    val mat = centroidLit(model.centroids)
    // sort by score desc, cell asc (struct ordering: negate the score);
    // each centroid's dot is computed exactly once, against a row of
    // the single matrix literal
    val scored = (0 until model.k).map { i =>
      struct((-NativeVector.dot(nv, element_at(mat, i + 1))).as("neg"),
        lit(i).as("cell"))
    }
    slice(array_sort(array(scored: _*)), 1, nprobe).getField("cell")
  }

  /** Approximate cosine top-`kNeighbors` for each query row: search only
    * the `nprobe` cells nearest to the query. Output: query_id,
    * neighbor_id, cos_sim (6 dp), rank — same contract as
    * [[SimilaritySearch.bruteForceTopK]].
    */
  def search(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      kNeighbors: Int,
      nprobe: Int): DataFrame =
    searchIndex(queries, index(candidates, idCol, vecCol, model),
      idCol, vecCol, model, kNeighbors, nprobe)

  /** Search a pre-built [[index]] (reuse it across query batches). */
  def searchIndex(
      queries: DataFrame,
      idx: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      kNeighbors: Int,
      nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cand = idx
      .select(col("cell"), col("id").as("neighbor_id"), col("nv").as("c_vec"))
    // the probe set is small by contract; materialize it for the same
    // reason as the index (keep the k-way scorer out of the join stage)
    val q = normalized(queries, idCol, vecCol)
      .select(col("id").as("query_id"),
        explode(probeCells(col("nv"), model, nprobe)).as("cell"), col("nv").as("q_vec"))
      .localCheckpoint(true)
    // each candidate lives in exactly one cell and a query's probed
    // cells are distinct, so (query, candidate) pairs are already
    // unique — no dedup shuffle needed
    val scored = cand.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(NativeVector.dot(col("q_vec"), col("c_vec")), 6).as("cos_sim"))
      .as[(Long, Long, Double)]
    TopK.perGroup(scored, kNeighbors)
      .toDF("query_id", "neighbor_id", "cos_sim", "rank")
  }
}
