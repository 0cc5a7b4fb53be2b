package graft.sources

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Minimal snapshot-isolation commit log over parquet — the
  * concurrent-writer upgrade [[AtomicDir]] cannot give (its swap is
  * single-writer by contract) and the role Delta/Iceberg play in a
  * production lakehouse, built from nothing but parquet + an atomic
  * no-overwrite rename (no connector jars ship in this environment).
  *
  * Layout under the table root:
  * {{{
  *   _commits/v000000000000.json   one manifest per committed version
  *   data/c<token>/part-*.parquet  each commit's files, own subdir
  * }}}
  *
  * Protocol:
  *
  *   - **Write**: stage parquet into a fresh `data/c<token>/` subdir
  *     (invisible to every reader — readers ONLY open files their
  *     pinned manifest names), build the next manifest (append =
  *     predecessor's files + staged; overwrite = staged only), write
  *     it to a dot-temp, then PUBLISH with `FileContext.rename(…,
  *     Rename.NONE)` — the no-overwrite rename that is atomic on
  *     HDFS-like stores (the arbiter Delta uses there; an S3 deploy
  *     swaps in an external lock/conditional-put, same seam). Losing
  *     the race throws `FileAlreadyExistsException` → re-read the new
  *     latest, rebuild the manifest, retry with the next version
  *     number. The staged data files never move, so a retry re-links,
  *     never re-writes.
  *   - **Read**: pin a version (default: latest) by parsing ONE
  *     manifest; the plan reads exactly that file set. Later commits
  *     add new version files and new data subdirs — a pinned reader
  *     never sees them, and nothing a committed manifest references is
  *     ever mutated, so reader-during-commit isolation holds without
  *     coordination.
  *   - **Crash**: a writer dying before publish leaves a dot-temp
  *     manifest and an unreferenced `data/c*` subdir — INVISIBLE
  *     leftovers (latest version unchanged, reads unaffected).
  *     [[vacuum]] deletes stale temps, data subdirs no retained
  *     manifest references, and versions older than the retention
  *     count.
  *
  * Scale shape: commit cost is one rename + a manifest listing
  * O(files); reads list `_commits/` (O(versions), bounded by vacuum)
  * and open O(files) parquet — table data never rewrites on commit,
  * so a 100 TB table appends at the cost of its new partition alone.
  */
object VersionedTable {

  /** `txn` carries the last committed micro-batch id per streaming
    * writer (the Delta `txn` action): a replayed `foreachBatch` call
    * finds its own batch id already recorded and skips — exactly-once
    * append from an at-least-once engine callback.
    */
  final case class Manifest(version: Long, mode: String, files: Seq[String],
      txn: Map[String, Long] = Map.empty)

  private val CommitsDir = "_commits"
  private val MaxRetries = 20

  private def commitsPath(root: String) = new Path(root, CommitsDir)
  private def versionFile(root: String, v: Long) =
    new Path(commitsPath(root), f"v$v%012d.json")

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed version, if any commit exists. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val dir = commitsPath(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return None
    val vs = f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.substring(1, n.length - 5).toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Parse one committed manifest. */
  def manifest(spark: SparkSession, root: String, version: Long): Manifest = {
    val p = versionFile(root, version)
    val f = fs(spark, p)
    val in = f.open(p)
    val bytes = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, false)
      out.toByteArray
    } finally in.close()
    parseManifest(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Commit `df` as a new version. `overwrite = false` appends to the
    * predecessor snapshot; `true` replaces it (old files stay on disk
    * for pinned readers until [[vacuum]]). Returns the version number
    * won. Safe under concurrent writers: the version-file rename is
    * the arbiter; losers rebuild the manifest against the new latest
    * and retry (bounded; the staged files are reused as-is).
    */
  def commit(df: DataFrame, root: String, overwrite: Boolean = false): Long =
    commitInternal(df, root, overwrite, None).get // no txn → never skipped

  /** [[commit]] under a streaming writer's exactly-once contract: the
    * manifest records the last committed `batchId` per `writerId`
    * (the Delta `txn` pattern, carried forward commit over commit),
    * so an at-least-once `foreachBatch` replay finds its own batch id
    * already recorded and SKIPS (returns None) instead of appending a
    * duplicate copy. The check reruns inside the version-race retry
    * loop, so two racing replays of the same batch commit exactly one.
    */
  def streamCommit(
      df: DataFrame, root: String, writerId: String, batchId: Long,
      overwrite: Boolean = false): Option[Long] = {
    require(!writerId.contains("\""), s"writerId must not contain quotes")
    commitInternal(df, root, overwrite, Some(writerId -> batchId))
  }

  /** A `foreachBatch` body appending each micro-batch exactly once:
    * {{{ stream.writeStream.foreachBatch(VersionedTable.sink(root, "q1") _) }}}
    */
  def sink(root: String, writerId: String)(
      batch: DataFrame, batchId: Long): Unit = {
    streamCommit(batch, root, writerId, batchId)
    ()
  }

  private def alreadyCommitted(
      spark: SparkSession, root: String, txn: Option[(String, Long)]): Boolean =
    txn.exists { case (wid, bid) =>
      latestVersion(spark, root)
        .exists(v => manifest(spark, root, v).txn.get(wid).exists(_ >= bid))
    }

  private def commitInternal(
      df: DataFrame, root: String, overwrite: Boolean,
      txn: Option[(String, Long)]): Option[Long] = {
    val spark = df.sparkSession
    val rootP = new Path(root)
    val f = fs(spark, rootP)
    f.mkdirs(commitsPath(root))
    // replay fast-path: skip before paying the stage write
    if (alreadyCommitted(spark, root, txn)) return None
    // stage this commit's parquet in its own subdir (never moves)
    val token = java.util.UUID.randomUUID.toString.replace("-", "").take(16)
    val stageRel = s"data/c$token"
    val stage = new Path(rootP, stageRel)
    df.write.mode(SaveMode.ErrorIfExists).parquet(stage.toString)
    val staged = f.listStatus(stage).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$stageRel/${s.getPath.getName}")
      .sorted
    require(staged.nonEmpty || df.schema.nonEmpty,
      s"staging $stage produced no parquet files")
    val fc = FileContext.getFileContext(
      rootP.toUri, spark.sparkContext.hadoopConfiguration)
    var attempt = 0
    while (attempt < MaxRetries) {
      val prev = latestVersion(spark, root)
      val prevM = prev.map(v => manifest(spark, root, v))
      // race-safe replay check: a concurrent retry of the SAME batch
      // may have published while we staged
      if (txn.exists { case (wid, bid) =>
          prevM.exists(_.txn.get(wid).exists(_ >= bid)) }) {
        f.delete(stage, true) // our staged copy is the duplicate
        return None
      }
      val next = prev.fold(0L)(_ + 1L)
      val files =
        if (overwrite) staged
        else prevM.map(_.files).getOrElse(Nil) ++ staged
      // writer progress is metadata about the STREAM, not the data:
      // it survives an overwrite commit
      val txnMap = prevM.map(_.txn).getOrElse(Map.empty) ++ txn.toMap
      val body = renderManifest(Manifest(next,
        if (overwrite) "overwrite" else "append", files, txnMap))
      val tmp = new Path(commitsPath(root), s".v$next-$token.json.tmp")
      val out = f.create(tmp, true)
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      try {
        // atomic NO-overwrite rename: the commit arbiter
        fc.rename(tmp, versionFile(root, next), Options.Rename.NONE)
        return Some(next)
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.io.IOException if f.exists(versionFile(root, next)) =>
          f.delete(tmp, false) // lost the race; rebuild against new latest
          attempt += 1
      }
    }
    throw new java.io.IOException(
      s"commit to $root lost the version race $MaxRetries times")
  }

  /** The snapshot at `version` (default: latest) as a DataFrame whose
    * plan reads EXACTLY that manifest's files — later commits are
    * invisible to it by construction.
    */
  def read(spark: SparkSession, root: String, version: Option[Long] = None)
      : DataFrame = {
    val v = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new java.io.IOException(s"no committed version under $root"))
    val m = manifest(spark, root, v)
    val abs = m.files.map(rel => new Path(new Path(root), rel).toString)
    spark.read.parquet(abs: _*)
  }

  /** Delete crash leftovers and history past the retention count:
    * stale dot-temp manifests, version files older than the newest
    * `keepVersions`, and `data/c*` subdirs referenced by NO retained
    * manifest. Never touches anything a retained manifest names, so
    * readers pinned inside the retention window are safe.
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2): Unit = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val rootP = new Path(root)
    val f = fs(spark, rootP)
    val dir = commitsPath(root)
    if (!f.exists(dir)) return
    f.listStatus(dir).toSeq.filter(_.getPath.getName.endsWith(".tmp"))
      .foreach(s => f.delete(s.getPath, false))
    val versions = f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.substring(1, n.length - 5).toLong)
      .sorted
    val retained = versions.takeRight(keepVersions)
    versions.dropRight(keepVersions)
      .foreach(v => f.delete(versionFile(root, v), false))
    val live: Set[String] = retained
      .flatMap(v => manifest(spark, root, v).files)
      .map(_.split("/")(1)) // data/<cdir>/file -> <cdir>
      .toSet
    val dataDir = new Path(rootP, "data")
    if (f.exists(dataDir)) {
      f.listStatus(dataDir).toSeq
        .filter(s => s.isDirectory && !live.contains(s.getPath.getName))
        .foreach(s => f.delete(s.getPath, true))
    }
  }

  // ---- manifest (de)serialization: flat JSON, no library ----------

  private def renderManifest(m: Manifest): String = {
    val files = m.files.map(f => "\"" + f + "\"").mkString("[", ",", "]")
    val txn = m.txn.toSeq.sorted
      .map { case (w, b) => "\"" + w + "\":" + b }.mkString("{", ",", "}")
    s"""{"version":${m.version},"mode":"${m.mode}","txn":$txn,"files":$files}"""
  }

  private[graft] def parseManifest(s: String): Manifest = {
    val version = """"version":(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toLong)
      .getOrElse(throw new java.io.IOException(s"bad manifest: $s"))
    val mode = """"mode":"([a-z]+)"""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("append")
    val files = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      .map(_.stripPrefix("\"").stripSuffix("\""))
    val txn = """"txn":\{([^}]*)\}""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
      }.toMap
    Manifest(version, mode, files, txn)
  }
}
