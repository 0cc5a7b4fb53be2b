package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

import graft.sources.VersionedTable

/** SQL DML for graft versioned tables — the WRITE half of the
  * SQL/PySpark surface (reads are the `graft_table_*` TVFs in
  * [[GraftExtensions]]). A session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` accepts, via
  * plain `spark.sql(...)`:
  *
  *   - `INSERT INTO graft.`/root`` <query>`        — append commit
  *   - `INSERT OVERWRITE graft.`/root`` <query>`   — overwrite commit
  *   - `DELETE FROM graft.`/root`` [WHERE pred]`   — row-level delete
  *   - `MERGE INTO graft.`/root`` [AS t] USING <src> [AS s]
  *        ON t.k = s.k [AND ...]
  *        [WHEN MATCHED AND cond THEN DELETE]
  *        WHEN MATCHED THEN UPDATE SET *
  *        WHEN NOT MATCHED THEN INSERT *`          — keyed upsert
  *   - `OPTIMIZE graft.`/root`` [WHERE pred] [ZORDER BY (c, ...)]
  *        [INTO n FILES]`
  *   - `VACUUM graft.`/root`` [RETAIN n VERSIONS]`
  *   - `CREATE TABLE graft.`/dst`` SHALLOW CLONE graft.`/src``
  *        [VERSION AS OF n]`                      — zero-copy branch
  *
  * The grammar is the ENGINE-FAITHFUL subset, enforced loudly: MERGE
  * is [[VersionedTable.merge]]'s upsert contract (`UPDATE SET *` +
  * `INSERT *`, keys from the ON equality conjunction, at most one
  * `WHEN MATCHED [AND cond] THEN DELETE` whose condition reads
  * SOURCE columns — a delete-flagged source row deletes its match
  * and inserts nothing). Anything outside the subset throws with the
  * supported shape in the message instead of silently delegating to
  * Spark's parser, which would mis-resolve `graft.` as a catalog.
  *
  * Each statement plans as a [[LeafRunnableCommand]] returning one
  * `(operation, version)` row; like every Spark command it executes
  * EAGERLY at `spark.sql(...)` (the standard DDL/DML UX — Delta's SQL
  * commands behave identically), never at parse/analysis of a larger
  * enclosing statement.
  */
object GraftSqlDml {

  private val Flags = Pattern.CASE_INSENSITIVE | Pattern.DOTALL
  // the table reference: graft.`<root path>`
  private val T = "graft\\s*\\.\\s*`([^`]+)`"

  private def pat(re: String) = Pattern.compile(re, Flags)

  // per-verb TARGET gates: only a statement whose object is a
  // graft.`...` table is intercepted; everything else delegates
  private val InsertGate = pat(s"^\\s*INSERT\\s+(?:INTO|OVERWRITE)\\s+$T")
  private val DeleteGate = pat(s"^\\s*DELETE\\s+FROM\\s+$T")
  private val MergeGate = pat(s"^\\s*MERGE\\s+INTO\\s+$T")
  private val OptimizeGate = pat(s"^\\s*OPTIMIZE\\s+$T")
  private val VacuumGate = pat(s"^\\s*VACUUM\\s+$T")

  private val Insert =
    pat(s"^\\s*INSERT\\s+(INTO|OVERWRITE)\\s+$T\\s+(.+?)\\s*;?\\s*$$")
  private val Delete =
    pat(s"^\\s*DELETE\\s+FROM\\s+$T(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*$$")
  private val Vacuum =
    pat(s"^\\s*VACUUM\\s+$T(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS?)?\\s*;?\\s*$$")
  private val Optimize = pat(s"^\\s*OPTIMIZE\\s+$T(?:\\s+WHERE\\s+(.+?))?" +
    "(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?" +
    "(?:\\s+INTO\\s+(\\d+)\\s+FILES?)?\\s*;?\\s*$$")
  private val MergeHead =
    pat(s"^\\s*MERGE\\s+INTO\\s+$T(?:\\s+(?:AS\\s+)?(\\w+))?\\s+USING\\s+(.+)$$")
  // gate requires the SHALLOW CLONE verb so ordinary CREATE TABLE ...
  // USING graft statements keep flowing to Spark's parser (the V2
  // catalog path)
  private val CloneGate =
    pat(s"^\\s*CREATE\\s+TABLE\\s+$T\\s+SHALLOW\\s+CLONE\\s")
  private val Clone = pat(s"^\\s*CREATE\\s+TABLE\\s+$T\\s+SHALLOW\\s+CLONE" +
    s"\\s+$T(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*$$")

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft SQL DML: $msg")

  /** `sql` split into segments tagged isLiteral: single-quoted string
    * literals ('' escaping included) come back verbatim so grammar
    * surgery (alias stripping, qualifier checks, paren balancing)
    * never rewrites or miscounts text INSIDE a literal.
    */
  private def splitLiterals(s: String): Seq[(String, Boolean)] = {
    val out = Seq.newBuilder[(String, Boolean)]
    var i = 0
    var start = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        if (i > start) out += ((s.substring(start, i), false))
        var j = i + 1
        var closed = false
        while (j < s.length && !closed) {
          if (s.charAt(j) == '\'') {
            if (j + 1 < s.length && s.charAt(j + 1) == '\'') j += 2
            else { closed = true; j += 1 }
          } else j += 1
        }
        out += ((s.substring(i, j), true))
        i = j
        start = j
      } else i += 1
    }
    if (start < s.length) out += ((s.substring(start), false))
    out.result()
  }

  /** `f` applied to the non-literal segments only; literals ride
    * through byte-identical.
    */
  private def mapOutsideLiterals(s: String)(f: String => String): String =
    splitLiterals(s).map { case (seg, lit) => if (lit) seg else f(seg) }
      .mkString

  /** The statement text with literal CONTENTS blanked (quotes kept) —
    * what qualifier/shape checks should look at.
    */
  private def outsideLiterals(s: String): String =
    splitLiterals(s).map { case (seg, lit) => if (lit) "''" else seg }
      .mkString

  /** The graft DML plan for `sqlText`, or None when the statement's
    * target is not a graft table (→ delegate to Spark's parser).
    * A graft-targeted statement that fails the subset grammar throws.
    */
  def parse(sqlText: String): Option[LogicalPlan] = {
    def m(p: Pattern) = {
      val mm = p.matcher(sqlText)
      if (mm.matches()) Some(mm) else None
    }
    if (InsertGate.matcher(sqlText).find()) Some {
      val mm = m(Insert).getOrElse(bad(
        "expected INSERT INTO|OVERWRITE graft.`root` <query>"))
      GraftInsertCommand(mm.group(2),
        mm.group(3), mm.group(1).equalsIgnoreCase("OVERWRITE"))
    }
    else if (DeleteGate.matcher(sqlText).find()) Some {
      val mm = m(Delete).getOrElse(bad(
        "expected DELETE FROM graft.`root` [WHERE <predicate>]"))
      GraftDeleteCommand(mm.group(1), Option(mm.group(2)))
    }
    else if (VacuumGate.matcher(sqlText).find()) Some {
      val mm = m(Vacuum).getOrElse(bad(
        "expected VACUUM graft.`root` [RETAIN <n> VERSIONS]"))
      GraftVacuumCommand(mm.group(1), Option(mm.group(2)).map(_.toInt))
    }
    else if (OptimizeGate.matcher(sqlText).find()) Some {
      val mm = m(Optimize).getOrElse(bad(
        "expected OPTIMIZE graft.`root` [WHERE <pred>] [ZORDER BY (c, ...)]" +
          " [INTO <n> FILES]"))
      val zorder = Option(mm.group(3)).toSeq
        .flatMap(_.split(",")).map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty)
      val where = Option(mm.group(2))
      if (where.isDefined && zorder.nonEmpty)
        bad("OPTIMIZE supports WHERE or ZORDER BY, not both — a scoped " +
          "z-order rewrite would widen the z-curve past the selected files")
      GraftOptimizeCommand(mm.group(1), where, zorder,
        Option(mm.group(4)).map(_.toInt))
    }
    else if (CloneGate.matcher(sqlText).find()) Some {
      val mm = m(Clone).getOrElse(bad(
        "expected CREATE TABLE graft.`dst` SHALLOW CLONE graft.`src` " +
          "[VERSION AS OF <n>]"))
      GraftCloneCommand(mm.group(2), mm.group(1),
        Option(mm.group(3)).map(_.toLong))
    }
    else if (MergeGate.matcher(sqlText).find()) Some(parseMerge(sqlText))
    else None
  }

  private def parseMerge(sqlText: String): LogicalPlan = {
    val head = {
      val mm = MergeHead.matcher(sqlText)
      if (!mm.matches()) bad(
        "expected MERGE INTO graft.`root` [AS t] USING <table|(query)> " +
          "[AS s] ON <key equalities> WHEN ...")
      mm
    }
    val root = head.group(1)
    val tgtAlias = Option(head.group(2))
    var rest = head.group(3)
    // source: a balanced-paren subquery or a bare table/view name
    val (source, restAfterSrc) =
      if (rest.trim.startsWith("(")) {
        val s = rest.indexOf('(')
        var depth = 0; var i = s; var end = -1
        while (i < rest.length && end < 0) {
          rest.charAt(i) match {
            case '\'' =>
              // skip the string literal ('' escapes) so parens inside
              // it never move the depth counter
              var j = i + 1
              var closed = false
              while (j < rest.length && !closed) {
                if (rest.charAt(j) == '\'') {
                  if (j + 1 < rest.length && rest.charAt(j + 1) == '\'')
                    j += 2
                  else closed = true
                } else j += 1
              }
              i = if (closed) j else rest.length
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        if (end < 0) bad("unbalanced parentheses in MERGE source")
        (Right(rest.substring(s + 1, end)), rest.substring(end + 1))
      } else {
        val mm = pat("^\\s*([\\w.]+)(.*)$").matcher(rest)
        if (!mm.matches()) bad("cannot parse MERGE source")
        (Left(mm.group(1)), mm.group(2))
      }
    rest = restAfterSrc
    val aliasM = pat("^\\s*(?:AS\\s+)?(\\w+)?\\s*ON\\s+(.+)$").matcher(rest)
    if (!aliasM.matches()) bad("expected [AS alias] ON <cond> after source")
    val srcAlias = Option(aliasM.group(1))
      .filterNot(_.equalsIgnoreCase("ON"))
    rest = aliasM.group(2)
    val whenIdx = pat("\\s(WHEN\\s.+)$").matcher(rest)
    if (!whenIdx.find()) bad("MERGE needs WHEN clauses")
    val onCond = rest.substring(0, whenIdx.start(1)).trim
    val whenTail = whenIdx.group(1)

    def isAlias(q: String, a: Option[String]) =
      a.exists(_.equalsIgnoreCase(q))
    val keys = onCond.split("(?i)\\s+AND\\s+").toSeq.map { c =>
      val mm = pat("^\\s*(?:(\\w+)\\s*\\.\\s*)?(\\w+)\\s*=\\s*" +
        "(?:(\\w+)\\s*\\.\\s*)?(\\w+)\\s*$").matcher(c)
      if (!mm.matches()) bad(s"ON supports only key equality " +
        s"conjunctions (t.k = s.k), got `$c`")
      val (q1, c1, q2, c2) =
        (Option(mm.group(1)), mm.group(2), Option(mm.group(3)), mm.group(4))
      if (c1 != c2) bad(s"ON equality must pair the SAME column name " +
        s"on both sides (engine merge is keyed), got `$c`")
      Seq(q1, q2).flatten.foreach { q =>
        if (!isAlias(q, tgtAlias) && !isAlias(q, srcAlias))
          bad(s"unknown qualifier `$q` in ON clause (aliases: " +
            s"${(tgtAlias ++ srcAlias).mkString(", ")})")
      }
      c1
    }

    var update = false; var insert = false
    var deleteCond: Option[String] = None
    whenTail.split("(?i)(?=\\bWHEN\\b)").filter(_.trim.nonEmpty)
      .foreach { clause =>
        val ins = pat("^\\s*WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s+" +
          "\\*\\s*;?\\s*$").matcher(clause)
        val mat = pat("^\\s*WHEN\\s+MATCHED\\s+(?:AND\\s+(.+?)\\s+)?THEN" +
          "\\s+(UPDATE\\s+SET\\s+\\*|DELETE)\\s*;?\\s*$").matcher(clause)
        if (ins.matches()) {
          if (insert) bad("duplicate WHEN NOT MATCHED clause")
          insert = true
        } else if (mat.matches()) {
          val cond = Option(mat.group(1))
          if (mat.group(2).equalsIgnoreCase("DELETE")) {
            if (deleteCond.isDefined) bad("duplicate WHEN MATCHED ... DELETE")
            deleteCond = Some(cond.getOrElse("true"))
          } else {
            if (cond.isDefined) bad("conditional UPDATE is outside the " +
              "engine's merge contract — matched rows update " +
              "unconditionally (UPDATE SET * with no AND)")
            if (update) bad("duplicate WHEN MATCHED ... UPDATE clause")
            update = true
          }
        } else bad(s"unsupported WHEN clause `${clause.trim}` — supported: " +
          "WHEN MATCHED [AND c] THEN DELETE | WHEN MATCHED THEN UPDATE " +
          "SET * | WHEN NOT MATCHED THEN INSERT *")
      }
    if (!update || !insert) bad("MERGE must carry both WHEN MATCHED THEN " +
      "UPDATE SET * and WHEN NOT MATCHED THEN INSERT * (the engine merge " +
      "is a keyed upsert)")
    // the delete condition evaluates over SOURCE rows (the engine
    // flags source rows as tombstones); target-side references are
    // unexpressible there, so they refuse loudly
    val delCond = deleteCond.map { c =>
      // qualifier checks and alias stripping look only OUTSIDE string
      // literals — `... AND s.note = 'per s. smith'` must neither
      // refuse on the literal's "t." nor rewrite its "s."
      tgtAlias.foreach { a =>
        if (pat(s"\\b$a\\s*\\.").matcher(outsideLiterals(c)).find()) bad(
          s"the DELETE condition may reference only SOURCE columns " +
            s"(engine semantics: a flagged source row deletes its " +
            s"match); strip `$a.` references")
      }
      srcAlias.fold(c)(a => mapOutsideLiterals(c)(
        _.replaceAll(s"(?i)\\b$a\\s*\\.\\s*", "")))
    }
    GraftMergeCommand(root, source, keys, delCond)
  }
}

/** Delegating parser that intercepts graft DML ([[GraftSqlDml]]) and
  * hands every other statement to Spark's own parser untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlDml.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    GraftSqlDml.parse(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

private[plans] abstract class GraftDmlCommand extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = true)())
  protected def row(op: String, v: Option[Long]): Seq[Row] =
    Seq(Row(op, v.map(Long.box).orNull))
}

/** `INSERT INTO|OVERWRITE graft.`root`` — a stats-on commit (an SQL
  * writer must never silently downgrade the table's pruning).
  */
case class GraftInsertCommand(root: String, query: String,
    overwrite: Boolean) extends GraftDmlCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val v = VersionedTable.commit(spark.sql(query), root,
      overwrite = overwrite, statsColumns = Seq("*"))
    row(if (overwrite) "INSERT OVERWRITE" else "INSERT", Some(v))
  }
}

case class GraftDeleteCommand(root: String,
    where: Option[String]) extends GraftDmlCommand {
  override def run(spark: SparkSession): Seq[Row] =
    row("DELETE", VersionedTable.delete(spark, root,
      where.map(expr).getOrElse(lit(true))))
}

case class GraftMergeCommand(root: String,
    source: Either[String, String], keys: Seq[String],
    deleteCond: Option[String]) extends GraftDmlCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val src = source.fold(spark.table, spark.sql)
    row("MERGE", VersionedTable.merge(spark, root, src, keys,
      deleteMatched = deleteCond.map(expr)))
  }
}

/** Plain `OPTIMIZE` bin-packs small files ([[VersionedTable
  * .compactSmall]] — the incremental maintenance shape); `WHERE`
  * scopes to matching files; `ZORDER BY` re-clusters the table on the
  * dims' z-curve, sized to ~128 MB output files unless `INTO n FILES`
  * pins the count.
  */
case class GraftOptimizeCommand(root: String, where: Option[String],
    zorder: Seq[String], intoFiles: Option[Int]) extends GraftDmlCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val v =
      if (zorder.nonEmpty) {
        val target = intoFiles.getOrElse {
          val latest = VersionedTable.latestVersion(spark, root).getOrElse(
            throw new java.io.IOException(
              s"no committed version under $root"))
          val m = VersionedTable.manifest(spark, root, latest)
          val rootP = new org.apache.hadoop.fs.Path(root)
          val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
          val bytes = m.files.map(rel => fs.getFileStatus(
            new org.apache.hadoop.fs.Path(rootP, rel)).getLen).sum
          math.max(1, math.ceil(bytes / (128.0 * (1 << 20))).toInt)
        }
        VersionedTable.compact(spark, root, targetPartitions = target,
          zOrderBy = zorder)
      } else where match {
        case Some(w) => VersionedTable.compactWhere(spark, root, expr(w),
          targetPartitions = intoFiles.getOrElse(1))
        // a bare INTO n FILES pins the whole-table layout — honoring
        // it needs the full compact, not the small-file bin-pack
        // (which would silently ignore the user's explicit count)
        case None => intoFiles match {
          case Some(n) =>
            VersionedTable.compact(spark, root, targetPartitions = n)
          case None => VersionedTable.compactSmall(spark, root)
        }
      }
    row("OPTIMIZE", v)
  }
}

/** `CREATE TABLE graft.`dst` SHALLOW CLONE graft.`src`` — the
  * zero-copy branch ([[VersionedTable.cloneTable]], Delta's CLONE
  * syntax); the source version is tag-pinned so its vacuum cannot
  * destroy the branch's bytes.
  */
case class GraftCloneCommand(sourceRoot: String, destRoot: String,
    version: Option[Long]) extends GraftDmlCommand {
  override def run(spark: SparkSession): Seq[Row] =
    row("CLONE", Some(VersionedTable.cloneTable(
      spark, sourceRoot, destRoot, version)))
}

case class GraftVacuumCommand(root: String,
    keepVersions: Option[Int]) extends GraftDmlCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.vacuum(spark, root, keepVersions.getOrElse(2))
    row("VACUUM", None)
  }
}
