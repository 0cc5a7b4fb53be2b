package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.NativeVector

/** IVF-PQ (Jégou et al., "Product quantization for nearest neighbor
  * search", TPAMI 2011): the composition that makes billion-vector ANN
  * tractable — [[IvfIndex]]'s coarse quantizer prunes the corpus to
  * `nprobe` cells, and [[PqIndex]] codebooks trained on the RESIDUALS
  * (vector minus its cell centroid) compress what remains to m codes
  * per vector. Residual encoding is what buys the accuracy: residuals
  * concentrate near the origin with far less variance than raw
  * vectors, so the same 2^codeBits codebook covers them much more
  * densely.
  *
  * Scoring stays asymmetric (ADC) and decomposes exactly under the
  * dot-product metric:
  *
  *   dot(q, v) ≈ dot(q, centroid_cell) + Σ_s dot(q_sub_s, codeword_s)
  *
  * — the first term is one lookup per probed cell, the second is the
  * query's PQ LUT (both computed once per query, never per candidate).
  *
  * Scale shape: search touches `nprobe/k` of the index, reads m small
  * codes per candidate instead of `dim` floats, joins on cell id
  * (equi-join against a broadcast probe set — no all-pairs stage), and
  * ranks through the bounded [[TopK]] aggregator. Training reduces to
  * the IVF and PQ contracts: the driver holds centroids + codebooks,
  * never rows.
  */
object IvfPq {

  final case class Model(ivf: IvfIndex.Model, pq: PqIndex.Model)

  /** Residual frame (id, cell, nv = v - centroid_cell) for the
    * normalized corpus.
    */
  private def residuals(df: DataFrame, idCol: String, vecCol: String,
      ivf: IvfIndex.Model): DataFrame = {
    val mat = IvfIndex.centroidLit(ivf.centroids)
    IvfIndex.assign(df, idCol, vecCol, ivf)
      .select(col("id"), col("cell"),
        zip_with(col("nv"), element_at(mat, col("cell") + 1),
          (x, c) => x - c).as("nv"))
  }

  /** Train the coarse quantizer, then PQ codebooks on the residuals. */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      kCells: Int = 16,
      m: Int = 4,
      ksub: Int = 16,
      itersIvf: Int = 5,
      itersPq: Int = 3): Model = {
    val ivf = IvfIndex.train(df, idCol, vecCol, kCells, itersIvf)
    val pq = PqIndex.trainOn(
      residuals(df, idCol, vecCol, ivf).select("id", "nv"), m, ksub, itersPq)
    Model(ivf, pq)
  }

  /** The compressed inverted file: (id, cell, codes), materialized —
    * at scale this is the cell-partitioned table on disk, m bytes of
    * codes per vector instead of dim floats.
    */
  def index(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    PqIndex.encodeOn(residuals(df, idCol, vecCol, model.ivf), model.pq)
      .select("id", "cell", "codes")
      .localCheckpoint(true)

  /** ADC top-`kNeighbors` over the probed cells only. Per query the
    * broadcast side carries (cell, cellDot, lut): cellDot is the
    * centroid term of the score, the LUT serves every candidate in the
    * cell. Output contract matches the other search paths: (query_id,
    * neighbor_id, score, rank).
    */
  /** Persist a trained IVF-PQ index to `dir` — the artifact an
    * offline build job hands to every downstream query batch, so the
    * train+encode cost amortizes across sessions (the
    * [[IvfIndex.save]] contract, extended with the PQ codebooks):
    * `centroids/` (k rows), `codebooks/` (m·ksub rows of
    * (sub, code, vec)), and the cell-partitioned `index/` of
    * (id, codes) — m code bytes per vector, never the raw floats.
    * Atomic: readers see the old index or the new one, never a mix.
    */
  def save(idx: DataFrame, model: Model, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    import graft.sources.AtomicDir
    val spark = idx.sparkSession
    import spark.implicits._
    val dest = new Path(dir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = AtomicDir.tmpPath(dest)
    fs.delete(tmp, true)
    model.ivf.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1) // k rows by construction
      .write.mode("overwrite").parquet(new Path(tmp, "centroids").toString)
    model.pq.codebooks.zipWithIndex.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (w, code) => (sub, code, w.toSeq) }
    }.toSeq
      .toDF("sub", "code", "vec")
      .coalesce(1) // m * ksub rows by construction
      .write.mode("overwrite").parquet(new Path(tmp, "codebooks").toString)
    idx.select(col("id"), col("cell"), col("codes"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(new Path(tmp, "index").toString)
    AtomicDir.commit(fs, dest)
  }

  /** Load a [[save]]d IVF-PQ index: (encoded frame for [[search]],
    * model). Repairs an interrupted save first; the only driver-side
    * materializations are the k-row centroid and m·ksub-row codebook
    * tables.
    */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): (DataFrame, Model) = {
    import org.apache.hadoop.fs.Path
    import graft.sources.AtomicDir
    val dest = new Path(dir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicDir.recover(fs, dest)
    val centroids = spark.read.parquet(new Path(dest, "centroids").toString)
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, s"no centroids under $dir")
    val bookRows = spark.read.parquet(new Path(dest, "codebooks").toString)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(bookRows.nonEmpty, s"no codebooks under $dir")
    val codebooks = bookRows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3) }
      .toArray
    val idx = spark.read.parquet(new Path(dest, "index").toString)
      .select(col("id"), col("cell").cast("int").as("cell"), col("codes"))
    (idx, Model(IvfIndex.Model(centroids), PqIndex.Model(codebooks)))
  }

  def search(
      queries: DataFrame,
      idx: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      kNeighbors: Int,
      nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val mat = IvfIndex.centroidLit(model.ivf.centroids)
    val q = IvfIndex.normalized(queries, idCol, vecCol)
      .select(col("id").as("query_id"),
        explode(IvfIndex.probeCells(col("nv"), model.ivf, nprobe)).as("cell"),
        col("nv"))
      .select(col("query_id"), col("cell"),
        NativeVector.dot(col("nv"), element_at(mat, col("cell") + 1))
          .as("cell_dot"),
        PqIndex.lutCol(col("nv"), model.pq).as("lut"))
      .localCheckpoint(true) // small by contract; keeps the scorer out of the join
    val scored = idx.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(col("cell_dot") +
          PqIndex.adcScore(col("lut"), col("codes"), model.pq), 6).as("score"))
      .as[(Long, Long, Double)]
    TopK.perGroup(scored, kNeighbors)
      .toDF("query_id", "neighbor_id", "score", "rank")
  }
}
