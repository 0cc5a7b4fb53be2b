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
    // SQL DML over graft tables (INSERT/DELETE/MERGE/OPTIMIZE/VACUUM
    // on graft.`root` targets); everything else delegates untouched
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
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
    // ---- TABLE functions: the SQL/PySpark surface ---------------------
    //
    // A PySpark user (the reference's audience) drives the engine with
    // `spark.sql` alone: the SCD pipeline and the versioned table's
    // snapshot / time-travel / CDC / history reads are table-valued
    // functions. String/long arguments must be literals (they name
    // tables and versions — plan-time identity, not row data).
    def strArg(e: Expression, what: String): String = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
          if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
    def longArg(e: Expression, what: String): Long = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
          if v != null => v.toString.toLong
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    def plan(df: org.apache.spark.sql.DataFrame) = df.queryExecution.logical
    def active = org.apache.spark.sql.SparkSession.active
    e.injectTableFunction((
      FunctionIdentifier("graft_table_snapshot"),
      info("graft_table_snapshot",
        "graft_table_snapshot(root[, version]) - versioned-table read, " +
          "latest or time-traveled"),
      (exprs: Seq[Expression]) => plan(graft.sources.VersionedTable.read(
        active, strArg(exprs.head, "root"),
        exprs.lift(1).map(longArg(_, "version"))))))
    e.injectTableFunction((
      FunctionIdentifier("graft_table_changes"),
      info("graft_table_changes",
        "graft_table_changes(root, fromVersion, toVersion) - CDC rows " +
          "with _change_type/_commit_version"),
      (exprs: Seq[Expression]) => plan(graft.sources.VersionedTable.changes(
        active, strArg(exprs(0), "root"),
        longArg(exprs(1), "fromVersion"), longArg(exprs(2), "toVersion")))))
    e.injectTableFunction((
      FunctionIdentifier("graft_table_history"),
      info("graft_table_history",
        "graft_table_history(root) - DESCRIBE HISTORY off the commit log"),
      (exprs: Seq[Expression]) => plan(graft.sources.VersionedTable.history(
        active, strArg(exprs.head, "root")))))
    e.injectTableFunction((
      FunctionIdentifier("graft_scd_employee_all"),
      info("graft_scd_employee_all",
        "graft_scd_employee_all(inputDir) - the reference SCD pipeline's " +
          "employee_all over the dir's snapshot CSVs (bootstrap run)"),
      (exprs: Seq[Expression]) =>
        plan(ScdSql.employeeAll(active, strArg(exprs.head, "inputDir")))))
    e.injectTableFunction((
      FunctionIdentifier("graft_scd_employee_current"),
      info("graft_scd_employee_current",
        "graft_scd_employee_current(inputDir) - the SCD current view " +
          "over the dir's snapshot CSVs (bootstrap run)"),
      (exprs: Seq[Expression]) =>
        plan(ScdSql.employeeCurrent(active, strArg(exprs.head, "inputDir")))))
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
