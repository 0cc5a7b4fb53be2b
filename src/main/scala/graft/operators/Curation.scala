package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source/domain quota enforcement: keep at most `cap` rows per
  * source, best-first — the web-curation step that stops a handful of
  * over-crawled domains from dominating a training mix.
  *
  * Two formulations with identical output (total order: score desc,
  * id asc):
  *
  *   - [[sourceCapsWindow]] — `row_number` over a per-source window.
  *     Exact, but a hot domain's every row shuffles to one task and
  *     sorts there; it is the oracle truth, not the 100 TB path.
  *   - [[sourceCaps]] — the k-bounded [[TopK.TopKAggregator]] combines
  *     map-side (partial + final ObjectHashAggregate), so the shuffle
  *     carries at most `cap` rows per (source, input partition) no
  *     matter how skewed the crawl is. The kept ids rejoin the input
  *     for payload columns — a shuffle join on the id, broadcast-able
  *     when `#sources × cap` is small.
  */
object Curation {

  /** Exact window formulation (per-source full sort). */
  def sourceCapsWindow(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      scoreCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(sourceCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("src_rank", row_number().over(w).cast("long"))
      .filter(col("src_rank") <= cap)
  }

  /** Bounded-state formulation: map-side top-`cap` per source. Output
    * columns and values match [[sourceCapsWindow]] exactly.
    */
  def sourceCaps(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      scoreCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val spark = df.sparkSession
    import spark.implicits._
    val kept: Dataset[(String, Long, Long)] = df
      .select(col(sourceCol).cast("string"), col(idCol).cast("long"),
        col(scoreCol).cast("double"))
      .as[(String, Long, Double)]
      .map { case (src, id, score) => (src, TopK.Scored(id, score)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopK.TopKAggregator(cap).toColumn)
      .flatMap { case (src, top) =>
        top.iterator.zipWithIndex.map { case (n, i) => (src, n.id, (i + 1).toLong) }
      }
    df.join(
      kept.toDF(sourceCol, idCol, "src_rank")
        .drop(sourceCol), // id is unique; rejoin on it alone
      Seq(idCol))
  }
}
