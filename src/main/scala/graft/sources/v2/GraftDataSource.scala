package graft.sources.v2

import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.VersionedTable

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * DataSourceV2 face of the versioned table, so foreign code that
  * speaks only the standard connector API (and the session catalog's
  * `CREATE TABLE t USING graft OPTIONS (path '...')`) reads and
  * writes graft tables without touching graft classes.
  *
  * Architecture is the JDBC/Delta MIGRATION shape: a V2
  * [[TableProvider]] whose scan builder takes column pruning
  * ([[SupportsPushDownRequiredColumns]]) and filter pushdown
  * ([[SupportsPushDownFilters]]), then hands execution to the
  * engine's own read path through a [[V1Scan]] bridge — the pushed
  * filters drive EXACTLY the zone-map/bloom file pruning `readWhere`
  * does (the relation plans its file list at construction, so the
  * prune is once-per-query, and a spec asserts file-list parity with
  * `readWhere`). Writes ride [[V1Write]] into stats-on commits;
  * `mode("overwrite")` maps to [[SupportsTruncate]].
  *
  * Options: `path` (the table root — also set by `.load(root)` and
  * CREATE TABLE's OPTIONS), `versionAsOf` (time travel).
  *
  * Scale note: the V1 bridge returns `df.rdd`, one row-serialization
  * boundary per scan — the connector is the COMPATIBILITY seam; the
  * native `VersionedTable.readWhere` / `graft_table_snapshot` paths
  * stay whole-stage-codegen and remain the hot path.
  */
class GraftDataSource extends TableProvider with DataSourceRegister
    with CreatableRelationProvider {
  override def shortName(): String = "graft"

  /** The V1 leg `DataFrameWriter.save` takes for the ErrorIfExists /
    * Ignore modes (Append/Overwrite ride the V2 write path above) —
    * Delta's DataSource carries the same dual face.
    */
  override def createRelation(context: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val r = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source needs a table root: .save(<root>) or option(\"path\")"))
    val spark = context.sparkSession
    val exists = VersionedTable.latestVersion(spark, r).isDefined
    import org.apache.spark.sql.SaveMode._
    mode match {
      case ErrorIfExists if exists => throw new IllegalStateException(
        s"graft table already exists at $r (mode ErrorIfExists)")
      case Ignore if exists => ()
      case m => VersionedTable.commit(data, r,
        overwrite = m == Overwrite, statsColumns = Seq("*"))
    }
    new GraftRelation(context, r, None, Array.empty,
      data.schema.fieldNames.toSeq)
  }

  private def root(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft source needs a table root: .load(<root>) or option(\"path\")"))

  private def version(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("versionAsOf")).map(_.toLong)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    VersionedTable.read(spark, root(options), version(options)).schema
  }

  // a WRITE to a not-yet-existing root must not require inferSchema
  // (the writer's own schema is the metadata — the commit-path gates
  // still validate appends against the manifest-pinned schema)
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftV2Table(root(opts), version(opts), schema)
  }
}

private[v2] class GraftV2Table(root: String, version: Option[Long],
    tableSchema: StructType) extends Table with SupportsRead
    with SupportsWrite {
  override def name(): String = s"graft.`$root`"
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new GraftScanBuilder(root, version, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(root, version)
}

private[v2] class GraftScanBuilder(root: String, version: Option[Long],
    tableSchema: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  /** A filter is ACCEPTED when it lowers to a Column the engine read
    * path evaluates exactly (and whose comparisons feed the zone-map
    * prune); everything else returns as a Spark-side residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) =
      filters.partition(f => GraftFilters.toColumn(f).isDefined)
    pushed = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new V1Scan {
    override def readSchema(): StructType = required
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T =
      new GraftRelation(context, root, version, pushed,
        required.fieldNames.toSeq).asInstanceOf[T]
  }
}

/** The executing relation: prunes its file list ONCE at construction
  * (exposed for the parity spec), then scans through the engine's own
  * DV-aware pruned read.
  */
private[graft] class GraftRelation(context: SQLContext, root: String,
    version: Option[Long], pushed: Array[Filter],
    requiredCols: Seq[String]) extends BaseRelation with TableScan {

  private val spark = context.sparkSession
  private val predicate: Option[Column] =
    pushed.flatMap(GraftFilters.toColumn).reduceOption(_ && _)

  // the snapshot is PINNED once at construction: plannedFiles, schema
  // and buildScan all read the same version, so a commit landing
  // between plan time and execution can never hand the scan a file
  // list from one snapshot under another's schema (version JSONs are
  // O(1)-file reads and the checkpoint parquet is driver-cached, so
  // the repeated manifest parses below stay metadata-cheap)
  private val pinnedVersion: Long = version
    .orElse(VersionedTable.latestVersion(spark, root))
    .getOrElse(throw new java.io.IOException(
      s"no committed version under $root"))
  private val pinnedManifest =
    VersionedTable.manifest(spark, root, pinnedVersion)

  /** The zone-map/bloom-pruned file list this scan plans — by
    * construction identical to what [[VersionedTable.readWhere]] with
    * the same predicate plans ([[VersionedTable.pruneFiles]] parity
    * is spec-gated).
    */
  val plannedFiles: Seq[String] = predicate match {
    case Some(p) =>
      VersionedTable.pruneFiles(spark, root, p, Some(pinnedVersion))._1
    case None => pinnedManifest.files
  }

  override def sqlContext: SQLContext = context
  override lazy val schema: StructType = {
    // the recorded snapshot schema is already LOGICAL (commit stores
    // df.schema.json) — no scan relation needs constructing just to
    // answer the schema question. Nullability normalizes to the scan's
    // view (a parquet read reports every field nullable), or Spark's
    // v1-fallback consistency check refuses the plan.
    val full = pinnedManifest.schemaJson
      .map(DataType.fromJson(_).asInstanceOf[StructType])
      .map(s => StructType(s.fields.map(_.copy(nullable = true))))
      .getOrElse(VersionedTable.read(spark, root, Some(pinnedVersion))
        .schema)
    StructType(requiredCols.map(c => full(full.fieldIndex(c))))
  }
  override def needConversion: Boolean = false

  override def buildScan(): RDD[Row] = {
    val base = predicate match {
      case Some(p) =>
        VersionedTable.readWhere(spark, root, p, Some(pinnedVersion))
      case None => VersionedTable.read(spark, root, Some(pinnedVersion))
    }
    val projected =
      if (requiredCols.isEmpty) base.select()
      else base.select(requiredCols.map(col): _*)
    // needConversion=false: hand back InternalRows without a
    // per-row external-Row conversion
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

private[v2] class GraftWriteBuilder(root: String, version: Option[Long])
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation(): InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, ovr: Boolean): Unit = {
          require(version.isEmpty,
            "cannot write to a time-traveled (versionAsOf) table")
          VersionedTable.commit(data, root,
            overwrite = overwrite || ovr, statsColumns = Seq("*"))
          ()
        }
      }
  }
}

/** sources.Filter → Column lowering for the shapes the engine's
  * zone-map/bloom pruner understands; None = keep Spark-side.
  */
private[v2] object GraftFilters {
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) => for {lc <- toColumn(l); rc <- toColumn(r)}
      yield lc && rc
    case Or(l, r) => for {lc <- toColumn(l); rc <- toColumn(r)}
      yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case _ => None
  }
}
