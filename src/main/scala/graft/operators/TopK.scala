package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation.
  *
  * The window formulation of per-group top-k
  * (`row_number().over(partitionBy(g).orderBy(score))`) must shuffle
  * EVERY scored row to the group's reducer and sort the full group
  * before discarding all but k. This `Aggregator` keeps a k-bounded
  * buffer and combines map-side (ObjectHashAggregate partial+final), so
  * the shuffle carries at most k rows per (group, input partition) —
  * the difference between shipping N_candidates rows and k rows per
  * query at 100 TB.
  *
  * Ordering is total — (score desc, id asc) — so results are
  * deterministic and identical to the window formulation.
  */
object TopK {

  /** Shared k-bounded sorted-buffer insert (`better(a, b)` = a ranks
    * strictly ahead of b; buffer sorted best-first, capped at k). The
    * one subtle piece of every bounded aggregator in this package —
    * kept in exactly one place ([[TopKAggregator]],
    * [[InvertedIndex.MinKAggregator]]).
    */
  private[operators] def boundedInsert[T](
      k: Int, better: (T, T) => Boolean)(buf: Seq[T], n: T): Seq[T] =
    if (buf.size >= k && better(buf.last, n)) buf
    else {
      val idx = buf.indexWhere(x => better(n, x)) match {
        case -1 => buf.size
        case i => i
      }
      val grown = (buf.take(idx) :+ n) ++ buf.drop(idx)
      if (grown.size > k) grown.take(k) else grown
    }

  final case class Scored(id: Long, score: Double)

  /** Insert keeping the k best by (score desc, id asc); the buffer is a
    * sorted Vector (k is small; O(k) insert beats heap constant-factor
    * at these sizes and keeps the encoder simple).
    */
  final class TopKAggregator(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0, s"k must be positive, got $k")

    // java.lang.Double.compare semantics: NaN sorts as the LARGEST
    // double, exactly like Spark's window sort — a raw > comparison
    // would leave NaN un-ordered and corrupt the buffer.
    private def better(a: Scored, b: Scored): Boolean = {
      val c = java.lang.Double.compare(a.score, b.score)
      c > 0 || (c == 0 && a.id < b.id)
    }

    private def insert(buf: Seq[Scored], n: Scored): Seq[Scored] =
      boundedInsert(k, better)(buf, n)

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], n: Scored): Seq[Scored] = insert(buf, n)

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)

    override def finish(buf: Seq[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Per-group top-k over a (group, id, score) Dataset. Output one row
    * per kept element: (group, id, score, rank).
    */
  def perGroup(
      ds: Dataset[(Long, Long, Double)],
      k: Int): Dataset[(Long, Long, Double, Int)] = {
    val spark: SparkSession = ds.sparkSession
    import spark.implicits._
    ds.map { case (g, id, s) => (g, Scored(id, s)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopKAggregator(k).toColumn)
      .flatMap { case (g, kept) =>
        kept.iterator.zipWithIndex.map { case (n, i) => (g, n.id, n.score, i + 1) }
      }
  }
}
