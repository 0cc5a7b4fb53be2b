package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftPlanApi
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of `array<long>` rows into ONE fixed-width vector
  * accumulator per task — the aggregation shape dense linear algebra
  * needs (moment/Gram/histogram vectors): every partition folds its
  * rows locally and the shuffle moves d numbers per partition, never
  * a row. Built-in alternatives all materialize (row × element) pairs
  * through an explode/groupBy exchange; this is a
  * [[TypedImperativeAggregate]] exactly so the per-partition state IS
  * the output vector (same partial-aggregation contract as Spark's own
  * CountMinSketchAgg).
  *
  * Overflow is a loud `ArithmeticException` via `Math.addExact` —
  * callers scale inputs so sums fit (e.g. [[graft.operators.Pca]]
  * quantizes to 2^20, bounding element products under 2^41 and exact
  * sums to ~4M rows per... the documented rescale path for beyond is
  * chunk-and-merge in a wider type, not silent wraparound.
  *
  * All input rows must share one length; nulls are skipped.
  */
case class VectorSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum_long needs array<bigint>, got ${other.catalogString}")
  }

  // `null` is the UNINITIALIZED buffer sentinel — an actual Array of
  // length 0 means "saw zero-length input rows", which is a legal
  // vector width. Conflating the two would let a length-0 row slip
  // past the ragged-input guard and make an all-empty-arrays column
  // eval to SQL NULL instead of an empty vector.
  override def createAggregationBuffer(): Array[Long] = null

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val acc = if (buf == null) new Array[Long](n) else buf
      require(acc.length == n,
        s"vector_sum_long: ragged input (${acc.length} vs $n elements)")
      var i = 0
      while (i < n) { acc(i) = Math.addExact(acc(i), arr.getLong(i)); i += 1 }
      acc
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a == null) b
    else if (b == null) a
    else {
      require(a.length == b.length,
        s"vector_sum_long: ragged partials (${a.length} vs ${b.length})")
      var i = 0
      while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    if (buf == null) return Array[Byte](0)
    val bb = ByteBuffer.allocate(1 + 4 + 8 * buf.length)
    bb.put(1: Byte)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == 0) return null
    val out = new Array[Long](bb.getInt)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "vector_sum_long"
}

object NativeAgg {
  /** `array<long>` column -> element-wise-sum aggregate Column. */
  def vectorSumLong(c: Column): Column =
    GraftPlanApi.column(
      VectorSumLong(GraftPlanApi.expression(c)).toAggregateExpression())
}
