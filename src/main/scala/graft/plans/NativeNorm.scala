package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row text-normalization kernels.
  *
  * Unicode NFC normalization is the canonical first step of any text
  * pipeline that hashes, dedups or fingerprints documents: the SAME
  * visible text can arrive composed ("é" U+00E9) or decomposed
  * ("e" U+0065 + U+0301), and every downstream sha/minhash/simhash
  * signature diverges unless the bytes are canonicalized first. Spark
  * has no built-in for it, so this wraps `java.text.Normalizer` as a
  * codegen'd expression — map-only, no shuffle, stays inside
  * whole-stage codegen like the rest of the signature kernels.
  *
  * The compression-ratio signal (deflate bytes / raw bytes) is the
  * classic cheap proxy for boilerplate and low-entropy spam (highly
  * repetitive text compresses far below normal prose) used by
  * large-scale web-corpus quality filters alongside the Gopher/C4
  * rules ([[graft.operators.QualityRules]]). One JVM pass per row,
  * bounded scratch, no external state.
  */
object NativeNorm {

  val NfcName = "graft_nfc"
  val CompressionRatioName = "graft_compression_ratio"

  /** Register the native normalization functions on a session
    * (idempotent; same temp-function surface as [[NativeText]]).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      NfcName, exprs => NfcNormalize(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      CompressionRatioName, exprs => CompressionRatio(exprs.head), "built-in")
  }

  def nfc(text: Column): Column =
    org.apache.spark.sql.classic.GraftPlanApi.column(
      NfcNormalize(org.apache.spark.sql.classic.GraftPlanApi.expression(text)))

  def compressionRatio(text: Column): Column =
    org.apache.spark.sql.classic.GraftPlanApi.column(
      CompressionRatio(org.apache.spark.sql.classic.GraftPlanApi.expression(text)))

  /** NFC-normalize; returns the input object unchanged when the text is
    * already normalized (the overwhelmingly common case for clean
    * corpora — `isNormalized` is a scan, not an allocation).
    */
  def nfcEval(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  // one native Deflater per executor thread, reset() per row — a
  // per-row ctor/end() pair would pay a native malloc/free for every
  // document, dominating the deflate itself on short texts. Bounded by
  // executor thread count, held for the executor's lifetime.
  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(6, true))

  /** deflate(bytes).length / bytes.length at level 6 (raw deflate, no
    * zlib header, so tiny inputs aren't dominated by framing). Empty
    * text reports 1.0 (incompressible by convention). Values well
    * below ~0.3 on prose-length text indicate heavy repetition.
    */
  def compressionRatioEval(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}

/** text -> NFC-normalized text. See [[NativeNorm.nfcEval]]. */
case class NfcNormalize(text: Expression) extends UnaryExpression {

  override def child: Expression = text
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = text.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${NativeNorm.NfcName} requires a string column")
  }

  override def nullSafeEval(input: Any): Any =
    NativeNorm.nfcEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeNorm.nfcEval($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(text = c)
}

/** text -> deflate compression ratio in (0, ~1.1]. See
  * [[NativeNorm.compressionRatioEval]].
  */
case class CompressionRatio(text: Expression) extends UnaryExpression {

  override def child: Expression = text
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = text.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${NativeNorm.CompressionRatioName} requires a string column")
  }

  override def nullSafeEval(input: Any): Any =
    NativeNorm.compressionRatioEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeNorm.compressionRatioEval($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(text = c)
}
