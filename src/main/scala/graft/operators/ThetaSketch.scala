package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.NativeText

/** KMV ("k minimum values" / theta) distinct sketches and the
  * sketch-based source-overlap matrix — the 100 TB companion of
  * [[SourceOverlap.matrix]].
  *
  * The exact matrix joins every distinct shingle of every source pair:
  * correct, but the join input IS the corpus. The sketch form reduces
  * each source to its k smallest distinct shingle hashes (a KMV
  * sketch): per-source state is k longs no matter how many petabytes
  * the source holds, partials combine map-side (ObjectHashAggregate),
  * and overlap/union/jaccard estimates for every source pair come from
  * comparing k-long arrays on the driver. Standard KMV estimator
  * (Bar-Yossef et al.; the DataSketches theta sketch): with hashes
  * uniform in (0,1], the k-th smallest value θ estimates density, so
  * |S| ≈ (k-1)/θ, and for a pair the sample below θ = min(θ_a, θ_b)
  * is a uniform sample of the union.
  *
  * Everything here is DETERMINISTIC: the hash is the portable
  * sha-256-derived 32-bit value ([[TextFunctions.portableHash32]]
  * compatible), and "k smallest distinct" is order-independent — so
  * the ESTIMATES themselves (not just bounds) replay bit-identically
  * in the DuckDB oracle, division-for-division.
  */
object ThetaSketch {

  val DefaultK = 256

  /** Normalized position of a 32-bit hash in (0, 1]: (h+1)/2^32.
    * The +1 keeps θ strictly positive (a 0 hash would zero the
    * divisor); samples are compared STRICTLY below θ on both engines.
    */
  def norm(h: Long): Double = (h + 1L).toDouble / 4294967296.0

  /** (θ, sample): θ = 1.0 and the whole sketch when the source had
    * fewer than k distinct values (the sketch is then exhaustive and
    * estimates are exact); otherwise θ = norm(k-th smallest) and the
    * k-1 values strictly below it.
    */
  def thetaSample(sketch: Seq[Long], k: Int): (Double, Seq[Long]) =
    if (sketch.size < k) (1.0, sketch)
    else (norm(sketch.last), sketch.take(k - 1))

  /** Estimated distinct count of one sketch. */
  def estimateDistinct(sketch: Seq[Long], k: Int): Double = {
    val (theta, sample) = thetaSample(sketch, k)
    if (theta >= 1.0) sample.size.toDouble else sample.size / theta
  }

  /** Pairwise (est_inter, est_union, est_jaccard) of two sketches,
    * UNROUNDED (rounding happens in the output projection with
    * Spark's `round`, the engine-parity-proven path). Restrict both
    * samples to the pair's θ = min(θ_a, θ_b): below θ each sample is
    * a uniform distinct sample of its set, so set ops on the samples
    * scale up by 1/θ.
    */
  def estimateOverlap(
      a: Seq[Long], b: Seq[Long], k: Int): (Double, Double, Double) = {
    val (ta, sa) = thetaSample(a, k)
    val (tb, sb) = thetaSample(b, k)
    val theta = math.min(ta, tb)
    val fa = sa.filter(norm(_) < theta).toSet
    val fb = sb.filter(norm(_) < theta).toSet
    val inter = fa.intersect(fb).size
    val union = fa.union(fb).size
    val jacc = if (union == 0) 0.0 else inter.toDouble / union
    (inter / theta, union / theta, jacc)
  }

  /** k smallest DISTINCT long values, buffer sorted ascending and
    * capped at k — O(k) state per (group, partition), merges
    * associatively and commutatively (it computes a set min, so the
    * result is order-independent by construction).
    */
  final class KmvAggregator(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0, s"k must be positive, got $k")

    private def insert(buf: Seq[Long], n: Long): Seq[Long] = {
      if (buf.size >= k && n >= buf.last) return buf
      val idx = buf.search(n)(Ordering.Long) match {
        case scala.collection.Searching.Found(_) => return buf // distinct
        case scala.collection.Searching.InsertionPoint(i) => i
      }
      val grown = (buf.take(idx) :+ n) ++ buf.drop(idx)
      if (grown.size > k) grown.take(k) else grown
    }

    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], n: Long): Seq[Long] = insert(buf, n)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(insert)
    override def finish(buf: Seq[Long]): Seq[Long] = buf

    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group KMV sketch over the word n-gram shingle hashes of
    * `textCol` — the same hash domain as [[SourceOverlap.matrix]], so
    * the sketch estimates target exactly what the exact matrix counts.
    */
  def sourceSketches(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      n: Int,
      k: Int = DefaultK): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    NativeText.register(spark)
    df.select(col(groupCol).as("source"),
        explode(NativeText.shingleHash32(
          split(TextFunctions.normalizeText(col(textCol)), " "), n)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new KmvAggregator(k).toColumn.name("sketch"))
      .toDF("source", "sketch")
  }

  /** Sketch-estimated overlap matrix: one row per source pair
    * (src_a < src_b) with estimated shared-shingle count, union size,
    * and jaccard. The pair loop runs on the driver over the collected
    * sketches — S sources cost S·k longs of driver memory and S²/2
    * k-array comparisons; for very large S, self-join the sketch
    * table instead (same estimator, distributed).
    */
  def overlapMatrix(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      n: Int,
      k: Int = DefaultK): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketches = sourceSketches(df, groupCol, textCol, n, k)
      .as[(String, Seq[Long])].collect().sortBy(_._1)
    val rows = for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
    } yield {
      val (sa, ska) = sketches(i)
      val (sb, skb) = sketches(j)
      val (inter, union, jacc) = estimateOverlap(ska, skb, k)
      (sa, sb, inter, union, jacc)
    }
    rows.toDF("src_a", "src_b", "est_shared", "est_union", "est_jaccard")
      .select(col("src_a"), col("src_b"),
        round(col("est_shared"), 6).as("est_shared"),
        round(col("est_union"), 6).as("est_union"),
        round(col("est_jaccard"), 6).as("est_jaccard"))
  }
}
