package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line on stdout (per-query
  * progress goes to stderr so the driver's stdout parse stays clean).
  *
  * Measurement contract:
  *   - every output column is materialized via a `noop`-format write,
  *     so Catalyst cannot prune work whose result the action never
  *     touches (a bare `.count()` deletes Window nodes, JSON paths,
  *     anything not needed for cardinality);
  *   - each query runs twice and the min is reported, damping one-shot
  *     janino-codegen compilation and external machine load;
  *   - a crashing query is reported as -1 with its error in a separate
  *     "errors" map, never as a fake elapsed time.
  */
object Bench {

  /** Timed full materialization of every column. */
  private def materialize(
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      spark: SparkSession, sfDir: String): Double = {
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private[graft] def buildSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def calibrationQuery(spark: SparkSession, sfDir: String): Unit =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter("l_quantity > 0").groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

  /** Untimed warmup, then a timed run of a fixed scan+agg query.
    *
    * The timed number is a machine-speed probe: it has no plan that
    * this repo can regress, so when a fresh bench and the committed
    * floor file disagree on it, the difference is external load, not
    * code. [[BenchGuard]] divides per-query ratios by the calibration
    * ratio to separate "this machine is busy" (everything inflates,
    * calibration included) from "this plan got worse" (one query
    * inflates, calibration doesn't).
    */
  private[graft] def warmupAndCalibrate(spark: SparkSession, sfDir: String): Double = {
    // warmup: session/scan/codegen infrastructure (JIT, parquet footer
    // cache, janino) otherwise lands entirely on the first query
    calibrationQuery(spark, sfDir)
    timedCalibration(spark, sfDir)
  }

  /** One timed probe run (call [[warmupAndCalibrate]] first). Probing
    * both BEFORE and AFTER the query sweep and taking the max catches
    * load that arrives mid-sweep — a single leading probe reads quiet
    * while every query behind it inflates.
    */
  private[graft] def timedCalibration(spark: SparkSession, sfDir: String): Double = {
    val t0 = System.nanoTime()
    calibrationQuery(spark, sfDir)
    (System.nanoTime() - t0) / 1e9
  }

  /** min-of-`runs` measurement of every (filtered) SparkEntry query.
    * `SPARK_GRAFT_BENCH_GAP_MS` sleeps between attempts so a short
    * external-load burst cannot poison every sample of one query.
    */
  private[graft] def measureAll(
      spark: SparkSession,
      sfDir: String,
      runs: Int,
      only: Option[Set[String]],
      errors: scala.collection.mutable.Map[String, String]): Seq[(String, Double)] = {
    val gapMs = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_GAP_MS", "0").toLong).getOrElse(0L).max(0L)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    selected.map { case (name, fn) =>
      // Catch per run: a flaky second run must not discard a valid
      // first measurement. -1 only when EVERY run failed.
      val attempts = (1 to runs).map { i =>
        if (i > 1 && gapMs > 0) Thread.sleep(gapMs)
        try Right(materialize(fn, spark, sfDir))
        catch { case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      }
      val good = attempts.collect { case Right(s) => s }
      val secs =
        if (good.nonEmpty) good.min
        else {
          errors(name) = attempts.collectFirst { case Left(m) => m }
            .getOrElse("unknown").linesIterator.next().take(200)
          -1.0
        }
      System.err.println(f"[bench] $name%-24s $secs%8.2f s")
      name -> secs
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
      .getOrElse(2).max(1)
    val spark = buildSession()
    val calibPre = warmupAndCalibrate(spark, sfDir)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // dev filter: SPARK_GRAFT_BENCH_ONLY=q_a,q_b runs a subset (the
    // driver never sets it, so driver runs always cover everything)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = measureAll(spark, sfDir, runs, only, errors)
    val calibration = math.max(calibPre, timedCalibration(spark, sfDir))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"calibration":$calibration,"sf":"$sfDir"}""")
    spark.stop()
  }
}
