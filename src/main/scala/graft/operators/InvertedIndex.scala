package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.normalizeText

/** Inverted-index construction — the search-engine-shaped corpus
  * artifact: one row per term with document frequency, collection
  * frequency, and a BOUNDED posting list (the k smallest doc ids).
  *
  * Scale design: the only per-term state anywhere is the k-bounded
  * posting buffer inside an [[Aggregator]] that combines map-side
  * (ObjectHashAggregate partial+final) — a stop-word term costs k ids
  * per input partition on the shuffle wire, never its full posting
  * list in one task. A `row_number` window would buffer the entire
  * term partition (every (doc, term) row of "the") on one reducer;
  * this is the same window-to-bounded-aggregate move as
  * [[TopK]] and for the same reason. df/cf ride the SAME grouped pass
  * as sibling typed aggregations, so the whole index is two shuffles:
  * the (term, doc) tf aggregate, then the per-term fold.
  */
object InvertedIndex {

  /** Keep the k smallest doc ids seen, exactly — a sorted Vector is
    * cheap at small k and keeps the buffer encoder simple. Input rows
    * are the grouped (doc_id, tf) pairs; only the id matters here.
    */
  final class MinKAggregator(k: Int)
      extends Aggregator[(Long, Long), Seq[Long], Seq[Long]] {
    require(k > 0, s"k must be positive, got $k")

    private def insert(buf: Seq[Long], n: Long): Seq[Long] =
      TopK.boundedInsert[Long](k, _ < _)(buf, n)

    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], a: (Long, Long)): Seq[Long] =
      insert(buf, a._1)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(insert)
    override def finish(buf: Seq[Long]): Seq[Long] = buf
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  private final class SumLong extends Aggregator[(Long, Long), Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: (Long, Long)): Long = b + a._2
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(b: Long): Long = b
    override def bufferEncoder: Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    override def outputEncoder: Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  private final class CountRows extends Aggregator[(Long, Long), Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: (Long, Long)): Long = b + 1L
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(b: Long): Long = b
    override def bufferEncoder: Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    override def outputEncoder: Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** @param maxPostings posting-list bound (the k SMALLEST doc ids —
    *        a deterministic, engine-portable truncation)
    * @param minDf terms below this document frequency are dropped
    *        (df/cf are computed on the FULL data before the cut)
    * @return (term, df, cf, postings) — postings a comma-joined
    *         ascending id string
    */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPostings: Int = 20,
      minDf: Long = 1L): DataFrame = {
    require(maxPostings > 0 && minDf >= 1, s"got $maxPostings, $minDf")
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(normalizeText(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

    tf.select(col("term"), col("doc_id"), col("tf"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new MinKAggregator(maxPostings).toColumn.name("postings"),
        new CountRows().toColumn.name("df"),
        new SumLong().toColumn.name("cf"))
      .toDF("term", "postings", "df", "cf")
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"), col("cf"),
        concat_ws(",", col("postings")).as("postings"))
  }
}
