package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Production registration of the engine's native functions and plans
  * for SQL users: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) makes `graft_dot`,
  * `graft_hyperplane_sig`, `graft_shingle_hash32`, `graft_minhash_sig32`
  * and `graft_band_hashes` available in every session, and installs the
  * [[AsOfJoinStrategy]] planner rule for [[AsOfJoinPlan]] — the
  * DataFrame API paths self-register per session and do not require
  * this.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(e: SparkSessionExtensions): Unit = {
    // whole-operator plans
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((
      FunctionIdentifier(NativeVector.DotName),
      info(NativeVector.DotName, "dot product of two array<double>"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(NativeVector.HyperplaneName),
      info(NativeVector.HyperplaneName, "packed SRP-LSH signature bits"),
      (exprs: Seq[Expression]) => HyperplaneSig(
        exprs(0),
        LiteralArgs.toInt(exprs(1)),
        LiteralArgs.toLong(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier(NativeText.ShingleHashName),
      info(NativeText.ShingleHashName, "portable 32-bit hashes of word n-gram shingles"),
      (exprs: Seq[Expression]) => WordShingleHash32(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(s"${NativeText.MinHashSigPrefix}32"),
      info(s"${NativeText.MinHashSigPrefix}32", "32-value minhash signature"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head, 32)))
    e.injectFunction((
      FunctionIdentifier(NativeText.BandHashName),
      info(NativeText.BandHashName, "LSH band keys from a minhash signature"),
      (exprs: Seq[Expression]) => LshBandHashes(
        exprs(0),
        LiteralArgs.toInt(exprs(1)),
        LiteralArgs.toInt(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier(NativeNorm.NfcName),
      info(NativeNorm.NfcName, "Unicode NFC normalization"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    e.injectFunction((
      FunctionIdentifier(NativeNorm.CompressionRatioName),
      info(NativeNorm.CompressionRatioName,
        "deflate compression ratio (low-entropy/boilerplate signal)"),
      (exprs: Seq[Expression]) => CompressionRatio(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_redact_pii"),
      info("graft_redact_pii", "replace emails/URLs/phone shapes with typed placeholders"),
      (exprs: Seq[Expression]) =>
        graft.functions.TextFunctions.PiiPatterns.foldLeft(exprs.head) {
          case (acc, (pat, repl)) =>
            org.apache.spark.sql.catalyst.expressions.RegExpReplace(
              acc,
              org.apache.spark.sql.catalyst.expressions.Literal(pat),
              org.apache.spark.sql.catalyst.expressions.Literal(repl))
        }))
  }
}
