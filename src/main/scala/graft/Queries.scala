package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{CorpusGrowth, Curation, Dedup, Divergence, EventFlow, Graph, InvertedIndex, Lexicon, NgramLm, Profile, Scd, ScdMerge, SimilaritySearch, SourceOverlap, SubstringDedup, VectorStats}

/** The engine's query inventory: one entry per operator family from
  * SURVEY.md §2 plus the training-data-pipeline extensions, each with an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Oracle-parity rules used throughout (types and values must hash-match
  * across engines):
  *   - aggregate sums of doubles go through DECIMAL(18,2) (exact,
  *     order-independent) and back to double;
  *   - counts stay BIGINT on both sides; Spark int-typed outputs
  *     (row_number, size) are cast to long or mirrored with INTEGER
  *     casts in SQL;
  *   - every hash is sha2-256-based (DuckDB sha256), including the
  *     minhash base hash (first 8 hex chars as int64), so fuzzy-dedup
  *     signatures are bit-identical across engines;
  *   - floating-point folds (vector dot products) run in double with a
  *     fixed fold order on both sides, and similarity outputs are rounded
  *     to 6 dp.
  */
object Queries {

  /** Loads a fixture table and normalizes the `ts` column of the events
    * fixture to TIMESTAMP (LTZ) regardless of which encoding the fixture
    * generator used. Three encodings have been observed across fixture
    * generations:
    *   - TIMESTAMP(NANOS) → Spark reads a long (with
    *     spark.sql.legacy.parquet.nanosAsLong=true, set in every session
    *     this engine builds). Converted with exact integer division
    *     (ns-since-epoch exceeds 2^53, so double math would corrupt low
    *     bits); the oracle's TIMESTAMP_NS → TIMESTAMP cast truncates
    *     identically.
    *   - TIMESTAMP_MICROS with isAdjustedToUTC=0 → Spark 4 reads
    *     TIMESTAMP_NTZ. Cast to TIMESTAMP — exact, because the session
    *     timezone is pinned to UTC in every session this engine builds.
    *   - TIMESTAMP_MICROS adjusted to UTC → already TIMESTAMP; no-op.
    */
  private[graft] def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  // ---------------------------------------------------------------- core

  /** P1/P5/P8/P9: projection + predicate, pushed into the parquet scan. */
  def scanFilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 30.0)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  val scanFilterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30.0""".stripMargin

  /** P7: multi-branch when/otherwise chain. */
  def whenCase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_totalprice") < 50000.0, "small")
        .when(col("o_totalprice") < 150000.0, "medium")
        .when(col("o_totalprice") < 300000.0, "large")
        .otherwise("jumbo").as("price_band"),
      col("o_orderstatus"))

  val whenCaseSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice < 50000.0 THEN 'small'
      |       WHEN o_totalprice < 150000.0 THEN 'medium'
      |       WHEN o_totalprice < 300000.0 THEN 'large'
      |       ELSE 'jumbo' END AS price_band,
      |  o_orderstatus
      |FROM orders""".stripMargin

  /** U1/D1/W1: positional union + window dedup (the reference's upsert).
    * Doubling the table and deduping must reproduce the original.
    */
  def unionDedup(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val w = Window.partitionBy("o_orderkey").orderBy(col("o_orderkey").desc)
    o.union(o)
      .withColumn("row_number", row_number().over(w))
      .filter(col("row_number") === 1)
      .drop("row_number")
  }

  val unionDedupSql: String =
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders"

  /** A1/A2/P6: hash-aggregate + having — the duplicate-key quality gate. */
  def dupGate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  val dupGateSql: String =
    "SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1"

  /** Aggregations with exact decimal sums (TPC-H Q1 shape). */
  def aggPricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        count(lit(1)).as("count_order"))

  val aggPricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** W8: top-1-per-group (latest order per customer) via window. */
  def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
  }

  val topkPerGroupSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      |WHERE rn = 1""".stripMargin

  /** W2 analytics: lag/lead over per-user event streams. */
  def windowLagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      lag("event_id", 1).over(w).as("prev_event_id"),
      lead("event_id", 1).over(w).as("next_event_id"))
  }

  val windowLagLeadSql: String =
    """SELECT event_id, user_id,
      |  lag(event_id) OVER w AS prev_event_id,
      |  lead(event_id) OVER w AS next_event_id
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  /** W2 running aggregates with an explicit ROWS frame. */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      min("value").over(w).as("run_min"),
      max("value").over(w).as("run_max"),
      count(lit(1)).over(w).as("run_cnt"))
  }

  val windowRunningSql: String =
    """SELECT event_id, user_id,
      |  min(value) OVER w AS run_min,
      |  max(value) OVER w AS run_max,
      |  count(*) OVER w AS run_cnt
      |FROM (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** Gap-based sessionization: a new session starts when a user is idle
    * > 30 minutes; events carry their session sequence number. Windows
    * only — the per-user cumulative sum pattern every event pipeline
    * needs.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(run))
      .select("event_id", "user_id", "session_seq")
  }

  val sessionizeSql: String =
    """SELECT event_id, user_id,
      |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |FROM (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM (
      |    SELECT event_id, user_id, ts,
      |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)))""".stripMargin

  /** Rollup aggregation (subtotals + grand total). */
  def aggRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))

  val aggRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Grouping sets beyond rollup's prefix lattice: two independent
    * single-dimension summaries in ONE pass over the fact table (an
    * Expand of 2 copies + one shuffle — at 100 TB that halves the
    * scans versus running the two groupBys separately). The chosen
    * sets have disjoint key domains, so the null-extended rows are
    * unambiguous without a grouping_id column.
    */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))

  val aggGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS cnt
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin

  /** Time-based RANGE window frame: per-user rolling one-hour event
    * count and value total — the feature-engineering shape (activity
    * in the trailing window at each event). RANGE over the microsecond
    * epoch
    * includes all peers of a tied timestamp, so the result is
    * deterministic under any tie order; sums route through DECIMAL.
    */
  def windowTimeRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0L)
    t(s, dir, "events")
      .withColumn("events_last_hour", count(lit(1)).over(w))
      .withColumn("value_last_hour",
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
      .select("event_id", "user_id", "events_last_hour", "value_last_hour")
  }

  val windowTimeRangeSql: String =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS events_last_hour,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    AS value_last_hour
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      |      FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Distinct-count aggregation. */
  def countDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count_distinct(col("l_suppkey")).as("n_suppliers"),
        count_distinct(col("l_partkey")).as("n_parts"))

  val countDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers,
      |  count(DISTINCT l_partkey) AS n_parts
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Sketch-based distinct counting: HLL++ `approx_count_distinct`
    * (bounded per-group state — exact distinct counting keeps a
    * per-group hash set, which is the same unbounded-state trap as
    * exact percentiles at 100 TB). Like q_group_percentiles_approx,
    * the OUTPUT is the accuracy check, not the raw estimate — the
    * query computes exact and approximate side by side and emits
    * whether the estimate landed within the bound, which DuckDB can
    * hash-verify without reimplementing HLL. One distinct column on
    * purpose: a second would flip the planner from single-distinct
    * two-phase aggregation into the N-way Expand rewrite — measured
    * ~5x slower with the sketch riding every expanded copy.
    */
  def countDistinctApprox(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count_distinct(col("l_suppkey")).as("n_suppliers"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("approx_sup"))
      .select(col("l_returnflag"), col("n_suppliers"),
        (abs(col("approx_sup") - col("n_suppliers")) <=
          col("n_suppliers") * 0.1).as("within_bound"))

  val countDistinctApproxSql: String =
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers,
      |  true AS within_bound
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Pivot: per-month revenue spread across order-status columns. The
    * value list is explicit, so the output schema is static (a pivot
    * that scans for values first costs an extra job and breaks schema
    * stability between runs). Sums route through DECIMAL for
    * order-independence, same as every money aggregate here.
    */
  def pivotRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .select(col("order_month"), col("F").as("rev_f"),
        col("O").as("rev_o"), col("P").as("rev_p"))

  val pivotRevenueSql: String =
    """SELECT date_trunc('month', o_orderdate) AS order_month,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_f,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS rev_o,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS rev_p
      |FROM orders GROUP BY 1""".stripMargin

  /** Unpivot (melt): wide per-lineitem measures to long (metric, value)
    * rows — the normalization step feeding generic per-metric
    * aggregation/QC. Pure projection: no shuffle, map-side row
    * expansion only.
    */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("quantity"),
        col("l_extendedprice").cast("double").as("extendedprice"),
        col("l_discount").cast("double").as("discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("quantity"), col("extendedprice"), col("discount")),
        "metric", "value")

  val unpivotMetricsSql: String =
    """SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
      |  CAST(l_quantity AS DOUBLE) AS value FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'extendedprice',
      |  CAST(l_extendedprice AS DOUBLE) FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'discount',
      |  CAST(l_discount AS DOUBLE) FROM lineitem""".stripMargin

  /** W4/W5/W6: gaps-and-islands — start timestamp of each run of equal
    * event_type per user.
    */
  def gapsIslands(s: SparkSession, dir: String): DataFrame = {
    val rn1 = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val rn2 = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    val isl = Window.partitionBy("user_id", "event_type", "gap_grp")
    t(s, dir, "events")
      .withColumn("gap_grp", row_number().over(rn1) - row_number().over(rn2))
      .withColumn("island_start", min("ts").over(isl))
      .select("event_id", "user_id", "event_type", "island_start")
  }

  val gapsIslandsSql: String =
    """SELECT event_id, user_id, event_type, min(ts) OVER
      |  (PARTITION BY user_id, event_type, gap_grp) AS island_start
      |FROM (SELECT *,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) -
      |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC)
      |    AS gap_grp FROM (SELECT event_id, user_id, event_type,
      |      CAST(ts AS TIMESTAMP) AS ts FROM events))""".stripMargin

  /** W3/W7 scale path: global-max scalar via agg + broadcast cross join
    * instead of a single-partition window.
    */
  def globalMaxStamp(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val latest = o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val gmax = o.agg(max("o_orderdate").as("latest_known_date"))
    latest.crossJoin(broadcast(gmax)).select("o_custkey", "o_orderkey", "latest_known_date")
  }

  val globalMaxStampSql: String =
    """SELECT o_custkey, o_orderkey,
      |  (SELECT max(o_orderdate) FROM orders) AS latest_known_date
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      |WHERE rn = 1""".stripMargin

  /** F1/F2: sha2-256 row fingerprint over concat_ws('||', ...). */
  def rowFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey"),
      sha2(concat_ws("||",
        col("c_name"), col("c_mktsegment"), col("c_nationkey").cast("string")), 256)
        .as("row_hash"))

  val rowFingerprintSql: String =
    """SELECT c_custkey, sha256(concat_ws('||', c_name, c_mktsegment,
      |  CAST(c_nationkey AS VARCHAR))) AS row_hash FROM customer""".stripMargin

  /** Broadcast-join + aggregation (no-join is a reference quirk, not an
    * engine limit): revenue per nation, dims broadcast.
    */
  def joinRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))

  val joinRevenueSql: String =
    """SELECT n_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Semi-structured data: JSON field extraction from the events props
    * column.
    */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("prop_k"),
      col("event_type"))

  val jsonExtractSql: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
      |  event_type FROM events""".stripMargin

  /** Lateral explode + aggregation: corpus word frequencies per language. */
  def wordFrequencies(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"),
        explode(split(TextFunctions.normalizeText(col("text")), " ")).as("word"))
      .groupBy("lang", "word")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 20)

  val wordFrequenciesSql: String =
    """SELECT lang, word, count(*) AS cnt FROM (
      |  SELECT lang, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
      |  FROM documents)
      |GROUP BY lang, word HAVING count(*) >= 20""".stripMargin

  /** Heavy-hitter verification ([[graft.operators.HeavyHitters]]):
    * count-min-sketch estimates for every frequent token, emitted as
    * the CM guarantee check (exact <= est <= exact + ceil(eps*N)) so
    * DuckDB verifies a probabilistic sketch by hash — the same
    * bound-as-output technique as q_group_percentiles_approx. The
    * exact counts exist IN the query only to power the check; the
    * operator itself never shuffles the token dictionary.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val words = t(s, dir, "documents")
      .select(explode(split(TextFunctions.normalizeText(col("text")), " ")).as("word"))
    val exact = words.groupBy("word").agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") >= 100)
    graft.operators.HeavyHitters.withEstimates(
      exact, "word", words, "word", eps = 0.001, confidence = 0.99, seed = 17)
      .select(col("word"), col("n_exact"),
        (col("cms_est") >= col("n_exact") &&
          col("cms_est") <= col("n_exact") + col("cms_slack"))
          .as("within_bound"))
  }

  val heavyHittersSql: String =
    """SELECT word, count(*) AS n_exact, true AS within_bound FROM (
      |  SELECT unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
      |  FROM documents)
      |GROUP BY word HAVING count(*) >= 100""".stripMargin

  /** Temporal aggregation: monthly order counts and revenue. */
  def ordersByMonth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))

  val ordersByMonthSql: String =
    """SELECT date_trunc('month', o_orderdate) AS order_month,
      |  count(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY 1""".stripMargin

  /** Set operation: distinct. */
  def distinctFlags(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()

  val distinctFlagsSql: String =
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"

  // ------------------------------------------------------------- SCD

  /** The flagship: full SCD change classification over snapshot-ified
    * orders (entity = customer, snapshot = order date, attributes =
    * status/priority), reusing the [[graft.operators.Scd]] operator chain
    * in corrected-islands mode with the broadcast global max.
    */
  def scdStatus(s: SparkSession, dir: String): DataFrame = {
    val dedupW = Window.partitionBy("snapshot_date", "o_custkey")
      .orderBy(col("o_orderkey").desc)
    val orders = t(s, dir, "orders")
    val snap = orders
      .withColumn("snapshot_date", col("o_orderdate").cast("date"))
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .select("snapshot_date", "o_custkey", "o_orderstatus", "o_orderpriority")
    // global max date is dedup-invariant: computing it from the raw
    // orders scan avoids re-executing the dedup window lineage just for
    // one scalar (verified via explain: the max branch becomes a bare
    // scan + partial/final agg).
    val rawDates = orders.select(col("o_orderdate").cast("date").as("snapshot_date"))
    snap
      .transform(Scd.addRowHash(exclude = Seq("snapshot_date")))
      .transform(Scd.changeStatus(
        entityCols = Seq("o_custkey"), globalMaxOf = Some(rawDates)))
      .select("o_custkey", "snapshot_date", "change_status", "changed_status_date")
  }

  val scdStatusSql: String =
    """WITH base AS (
      |  SELECT CAST(o_orderdate AS DATE) AS snapshot_date, o_custkey,
      |         o_orderstatus, o_orderpriority,
      |         row_number() OVER (PARTITION BY CAST(o_orderdate AS DATE), o_custkey
      |           ORDER BY o_orderkey DESC) AS rn
      |  FROM orders),
      |snap AS (
      |  SELECT snapshot_date, o_custkey, o_orderstatus, o_orderpriority,
      |         sha256(concat_ws('||', CAST(o_custkey AS VARCHAR), o_orderstatus,
      |           o_orderpriority)) AS row_hash
      |  FROM base WHERE rn = 1),
      |cls AS (
      |  SELECT *,
      |    min(snapshot_date) OVER (PARTITION BY o_custkey) AS min_snap,
      |    max(snapshot_date) OVER (PARTITION BY o_custkey) AS max_snap,
      |    lag(row_hash) OVER (PARTITION BY o_custkey ORDER BY snapshot_date) AS prev_hash,
      |    lead(row_hash) OVER (PARTITION BY o_custkey ORDER BY snapshot_date) AS next_hash,
      |    max(snapshot_date) OVER () AS global_max
      |  FROM snap),
      |st AS (
      |  SELECT *,
      |    CASE WHEN snapshot_date = min_snap THEN 'New'
      |         WHEN next_hash IS NULL AND max_snap <> global_max THEN 'Deleted'
      |         WHEN prev_hash <> row_hash THEN 'Changed'
      |         WHEN prev_hash = row_hash THEN 'No Change'
      |         ELSE 'Unknown' END AS change_status,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY snapshot_date DESC) -
      |    row_number() OVER (PARTITION BY o_custkey, row_hash ORDER BY snapshot_date DESC)
      |      AS gap_grp
      |  FROM cls)
      |SELECT o_custkey, snapshot_date, change_status,
      |  CASE WHEN change_status = 'Deleted' THEN snapshot_date
      |       ELSE min(snapshot_date) OVER (PARTITION BY o_custkey, row_hash, gap_grp)
      |  END AS changed_status_date
      |FROM st""".stripMargin

  /** Join-based incremental merge of a current view ([[ScdMerge]]):
    * split orders at a date boundary, merge the halves, expect the
    * global latest row per customer.
    */
  def scdMergeCurrent(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")
    val boundary = lit("2000-01-01").cast("timestamp")
    val current = o.filter(col("o_orderdate") < boundary)
    val incoming = o.filter(col("o_orderdate") >= boundary)
    ScdMerge.mergeCurrent(current, incoming, Seq("o_custkey"), "o_orderdate",
      tieBreakCols = Seq("o_orderkey"))
  }

  val scdMergeCurrentSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      |WHERE rn = 1""".stripMargin

  /** As-of join ([[graft.operators.AsOfJoin]]): each event picks up the
    * customer's latest order at or before the event time. Right side is
    * deduped to one row per (key, time) so the survivor is well-defined
    * in both engines (DuckDB's native ASOF JOIN is the oracle).
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events").select("event_id", "user_id", "ts")
    val orders = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").cast("timestamp").as("odate"))
      .agg(max("o_orderkey").as("last_order_key"))
    graft.operators.AsOfJoin.asOfJoin(
      events, orders,
      keyCols = Seq("user_id"),
      leftTimeCol = "ts", rightTimeCol = "odate",
      rightValueCols = Seq("last_order_key", "odate"))
      .withColumnRenamed("odate", "last_order_date")
      .select("event_id", "user_id", "last_order_key", "last_order_date")
  }

  val asofJoinSql: String =
    """WITH r AS (SELECT o_custkey AS user_id, CAST(o_orderdate AS TIMESTAMP) AS odate,
      |    max(o_orderkey) AS last_order_key
      |  FROM orders GROUP BY 1, 2),
      |e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
      |SELECT e.event_id, e.user_id, r.last_order_key, r.odate AS last_order_date
      |FROM e ASOF LEFT JOIN r ON e.user_id = r.user_id AND r.odate <= e.ts""".stripMargin

  /** Same as-of semantics planned through the native whole-operator
    * path ([[graft.plans.AsOfJoinExec]]): custom LogicalPlan ->
    * Strategy -> merge SparkPlan, verified against the identical DuckDB
    * ASOF oracle as the composed form. Right side is unique per
    * (user_id, odate), so no tie-break is needed for determinism.
    */
  def asofJoinNative(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events").select("event_id", "user_id", "ts")
    val orders = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").cast("timestamp").as("odate"))
      .agg(max("o_orderkey").as("last_order_key"))
    graft.operators.AsOfJoin.asOfJoinNative(
      events, orders,
      keyCols = Seq("user_id"),
      leftTimeCol = "ts", rightTimeCol = "odate",
      rightValueCols = Seq("last_order_key", "odate"))
      .withColumnRenamed("odate", "last_order_date")
      .select("event_id", "user_id", "last_order_key", "last_order_date")
  }

  val asofJoinNativeSql: String = asofJoinSql

  /** Point-in-interval range join ([[graft.operators.RangeJoin]]):
    * for each order, how many of the SAME customer's 30-day order
    * windows contain its date (order-burst analysis — every order
    * matches at least its own window, so the check is never vacuous).
    * The bucket width equals the window span, so each interval
    * explodes to at most 2 buckets and the plan is a plain equi join
    * on (custkey, bucket) — DuckDB replays the same semantics with a
    * direct BETWEEN join. The range axis is integral micros on both
    * sides of the between (exact arithmetic).
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val micros30d = 30L * 86400L * 1000000L
    val orders = t(s, dir, "orders")
    val points = orders.select(
      col("o_orderkey").as("point_order"), col("o_custkey"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("pt"))
    val windows = orders.select(
      col("o_custkey"), col("o_orderkey").as("window_order"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("lo"),
      (unix_micros(col("o_orderdate").cast("timestamp")) + micros30d).as("hi"))
    graft.operators.RangeJoin.pointInInterval(
      points, windows, Seq("o_custkey"), "pt", "lo", "hi", micros30d)
      .groupBy("point_order", "o_custkey")
      .agg(count(lit(1)).as("n_windows"), max("window_order").as("last_window_order"))
  }

  val rangeJoinSql: String =
    """WITH o AS (SELECT o_orderkey, o_custkey,
      |    CAST(o_orderdate AS TIMESTAMP) AS od FROM orders)
      |SELECT p.o_orderkey AS point_order, p.o_custkey,
      |  count(*) AS n_windows, max(w.o_orderkey) AS last_window_order
      |FROM o p JOIN o w ON p.o_custkey = w.o_custkey
      |  AND p.od >= w.od AND p.od <= w.od + INTERVAL 30 DAY
      |GROUP BY 1, 2""".stripMargin

  /** PII redaction ([[TextFunctions.redactPii]]): documents get a
    * deterministic contact-info suffix planted (the raw corpus has
    * none), then emails/URLs/phone shapes are replaced with typed
    * placeholders. RE2-compatible patterns, so DuckDB replays the
    * exact redacted text; output fingerprinted to keep rows narrow.
    */
  def textRedact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or "),
          lit("https://ex.com/u/"), col("doc_id"),
          lit(" tel +1 (555) 010-"), col("doc_id")).as("text"))
      .select(col("doc_id"),
        sha2(TextFunctions.redactPii(col("text")), 256).as("redacted_fp"),
        (length(col("text")) - length(TextFunctions.redactPii(col("text"))))
          .cast("long").as("chars_removed"))

  val textRedactSql: String =
    """WITH raw AS (SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or ' ||
      |    'https://ex.com/u/' || CAST(doc_id AS VARCHAR) ||
      |    ' tel +1 (555) 010-' || CAST(doc_id AS VARCHAR) AS text
      |  FROM documents),
      |red AS (SELECT doc_id, text,
      |    regexp_replace(regexp_replace(regexp_replace(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      'https?://[^\s]+', '<URL>', 'g'),
      |      '\+?[0-9][0-9() .-]{7,}[0-9]', '<PHONE>', 'g') AS r
      |  FROM raw)
      |SELECT doc_id, sha256(r) AS redacted_fp,
      |  CAST(length(text) - length(r) AS BIGINT) AS chars_removed
      |FROM red""".stripMargin

  /** Benchmark decontamination ([[graft.operators.Decontaminate]]):
    * every 13th document stands in for the eval set, so those docs
    * must flag at 100% overlap while unrelated docs stay low. The
    * oracle rebuilds the same distinct-shingle sets and overlap
    * counts.
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Decontaminate.overlapReport(
      docs, docs.filter(col("doc_id") % 13 === 0), "doc_id", "text",
      shingleSize = 3, threshold = 0.8)
  }

  val decontaminateSql: String =
    """WITH words AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |sh AS (SELECT doc_id, list_distinct(
      |    list_transform(range(1, greatest(len(w) - 1, 1)),
      |      i -> CAST(('0x' || substr(sha256(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8)) AS BIGINT))
      |  ) AS sh FROM words),
      |corpus AS (SELECT doc_id, sh, CAST(len(sh) AS BIGINT) AS n_shingles FROM sh),
      |bench AS (SELECT DISTINCT unnest(sh) AS h FROM sh WHERE doc_id % 13 = 0),
      |hits AS (SELECT c.doc_id, count(*) AS n_overlap
      |  FROM (SELECT doc_id, unnest(sh) AS h FROM corpus) c
      |  JOIN bench ON c.h = bench.h GROUP BY 1)
      |SELECT c.doc_id, c.n_shingles,
      |  CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
      |  CASE WHEN c.n_shingles > 0
      |       THEN round(coalesce(h.n_overlap, 0) / c.n_shingles, 6)
      |       ELSE 0.0 END AS overlap_ratio,
      |  CASE WHEN c.n_shingles > 0
      |       THEN round(coalesce(h.n_overlap, 0) / c.n_shingles, 6) >= 0.8
      |       ELSE false END AS contaminated
      |FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id""".stripMargin

  /** The Bloom-prefiltered decontamination path
    * ([[graft.operators.Decontaminate.overlapReportBloom]]): same
    * inputs and — by construction — the same output as
    * [[decontaminate]] (the sketch only prunes the probe before an
    * exact confirm join), so it shares that query's oracle SQL. What
    * this verifies is that the native BloomFilterAggregate →
    * scalar-subquery → might_contain plumbing loses nothing.
    */
  def decontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Decontaminate.overlapReportBloom(
      docs, docs.filter(col("doc_id") % 13 === 0), "doc_id", "text",
      shingleSize = 3, threshold = 0.8,
      expectedShingles = 1L << 18, fpp = 0.01)
  }

  val decontaminateBloomSql: String = decontaminateSql

  /** Semantic dedup ([[graft.operators.SemDedup]]): cluster-then-prune
    * over the embeddings with the UNTRAINED (iters=0) coarse quantizer,
    * so assignment is deterministic and DuckDB replays the entire
    * decision — cell choice, same-cell pairing, the rounded cosine
    * threshold, and the min-id `dup_of` attribution.
    */
  def semanticDedup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val model = graft.operators.IvfIndex.train(e, "vec_id", "embedding", k = 16, iters = 0)
    graft.operators.SemDedup.prune(e, "vec_id", "embedding", model, tau = 0.95)
      .withColumnRenamed("id", "vec_id")
  }

  val semanticDedupSql: String =
    """WITH n AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, nv AS cv
      |  FROM n ORDER BY vec_id LIMIT 16),
      |assigned AS (SELECT n.vec_id, n.nv,
      |    (SELECT c.cell FROM cent c
      |     ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cell LIMIT 1) AS cell
      |  FROM n),
      |dups AS (SELECT a.vec_id, min(b.vec_id) AS dup_of
      |  FROM assigned a JOIN assigned b
      |    ON a.cell = b.cell AND b.vec_id < a.vec_id
      |  WHERE round(list_dot_product(a.nv, b.nv), 6) >= 0.95
      |  GROUP BY a.vec_id)
      |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
      |  coalesce(d.dup_of, -1) AS dup_of, d.dup_of IS NULL AS kept
      |FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id""".stripMargin

  /** The streaming windowed-aggregate shape
    * ([[graft.streaming.EventAggregates.windowedCounts]]) run in batch
    * mode: tumbling 1-hour `window()` buckets per event type. Sums
    * route through DECIMAL so they are order-independent and the
    * DuckDB replay (date_trunc buckets) hash-matches exactly.
    */
  def eventWindows(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  val eventWindowsSql: String =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
      |  date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
      |  event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** BM25 (odds-idf) relevance of every document against a fixed term
    * list ([[graft.operators.Bm25]]). All sums are of integer-valued
    * doubles (exact at any aggregation order) and the idf skips the
    * engine-dependent `ln`, so the oracle replays scores bit-for-bit.
    * SQL literals mirror the Scala arithmetic exactly — including
    * `(1.2 + 1.0)` instead of `2.2`, whose rounding is a tie.
    */
  def bm25Score(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bm25.score(
      t(s, dir, "documents"), "doc_id", "text",
      terms = Seq("hash", "join", "vector"))

  val bm25ScoreSql: String =
    """WITH w AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ws
      |  FROM documents),
      |d AS (SELECT doc_id,
      |    CAST(len(ws) AS DOUBLE) AS dl,
      |    CAST(len(list_filter(ws, x -> x = 'hash')) AS DOUBLE) AS tf_0,
      |    CAST(len(list_filter(ws, x -> x = 'join')) AS DOUBLE) AS tf_1,
      |    CAST(len(list_filter(ws, x -> x = 'vector')) AS DOUBLE) AS tf_2
      |  FROM w),
      |s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) AS sum_dl,
      |    CAST(sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_0,
      |    CAST(sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_1,
      |    CAST(sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_2
      |  FROM d)
      |SELECT doc_id, CAST(dl AS BIGINT) AS dl,
      |  round(
      |    ((n_docs - df_0 + 0.5) / (df_0 + 0.5)) * (tf_0 * (1.2 + 1.0))
      |      / (tf_0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
      |  + ((n_docs - df_1 + 0.5) / (df_1 + 0.5)) * (tf_1 * (1.2 + 1.0))
      |      / (tf_1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
      |  + ((n_docs - df_2 + 0.5) / (df_2 + 0.5)) * (tf_2 * (1.2 + 1.0))
      |      / (tf_2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs))), 6) AS score
      |FROM d, s""".stripMargin

  /** TF-IDF keyword extraction ([[graft.operators.TfIdf.topTerms]]):
    * top-3 most characteristic terms per document, ranked on the
    * ROUNDED score with a term-text tie-break so both engines agree
    * down to the last rank.
    */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame =
    graft.operators.TfIdf.topTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)
      .withColumnRenamed("id", "doc_id")
      .withColumn("rank", col("rank").cast("long"))

  val tfidfTopTermsSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      |  FROM toks GROUP BY 1, 2),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
      |scored AS (SELECT doc_id, term,
      |  round(tf * ln((n_docs + 1) /
      |    (CAST(count(*) OVER (PARTITION BY term) AS DOUBLE) + 1)), 6) AS tfidf
      |  FROM tf, n),
      |ranked AS (SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
      |  FROM scored)
      |SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3""".stripMargin

  /** Hashing-trick quality classifier
    * ([[graft.operators.TextClassifier]]) with the deterministic
    * dyadic init model (iters=0): logits are exact sums of k/1024
    * weights, so the oracle replays scoring order-independently from
    * the same 512-weight literal the Scala init derives. Trained
    * behavior (loss ↓, accuracy over the prior) is TextClassifierSpec's
    * job — float GD is not SQL-replayable, the same split as IVF/PQ.
    */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextClassifier
    TextClassifier.classify(
      t(s, dir, "documents"), "doc_id", "text",
      TextClassifier.Model(TextClassifier.initWeights(512)))
      .withColumnRenamed("id", "doc_id")
  }

  val qualityClassifierSql: String = {
    val w = graft.operators.TextClassifier.initWeights(512)
      .map(_.toString).mkString("[", ", ", "]")
    s"""WITH wv AS (SELECT CAST($w AS DOUBLE[]) AS w),
       |h AS (SELECT doc_id, list_transform(
       |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
       |    x -> CAST(('0x' || substr(sha256(x), 1, 8)) AS BIGINT)) AS hs
       |  FROM documents),
       |z AS (SELECT doc_id,
       |    list_sum(list_transform(hs, t -> w[(t % 512) + 1])) AS zv
       |  FROM h, wv)
       |SELECT doc_id, round(zv, 6) AS logit, zv > 0 AS predicted FROM z""".stripMargin
  }

  /** Skew-mitigated two-phase aggregation ([[graft.operators.Skew]]):
    * the salted partial/merge pair must produce EXACTLY the plain
    * GROUP BY result (counts and decimal-exact sums are associative),
    * which is precisely what the oracle computes — driver-gating the
    * skew path, not just spec-checking it.
    */
  def saltedAgg(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedAgg(
      t(s, dir, "lineitem"), Seq("l_returnflag"), saltFactor = 16)(
      partial = Seq(
        count(lit(1)).as("pc"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("pq")),
      merge = Seq(
        sum(col("pc")).as("n_rows"),
        sum(col("pq")).cast("double").as("sum_qty")))

  val saltedAggSql: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Exact interpolated percentiles per group (corpus distribution
    * stats), computed by distinct-value histogram
    * ([[graft.operators.Percentiles.exactByHistogram]]) instead of
    * Spark's `percentile` aggregate — same (n-1)*p interpolation to
    * the bit, but partials are plain counted rows with map-side
    * combine rather than per-task value→count maps. DuckDB's
    * `quantile_cont` implements the identical interpolation, so the
    * hash oracle holds (rounded to 6 dp to absorb last-ulp
    * interpolation differences).
    */
  def groupPercentiles(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val qty = graft.operators.Percentiles.exactByHistogram(
      li, Seq("l_returnflag"), "l_quantity",
      Seq("p50_qty" -> 0.5, "p90_qty" -> 0.9))
    val price = graft.operators.Percentiles.exactByHistogram(
      li, Seq("l_returnflag"), "l_extendedprice",
      Seq("p99_price" -> 0.99))
    qty.join(price, "l_returnflag").select(
      col("l_returnflag"),
      round(col("p50_qty"), 6).as("p50_qty"),
      round(col("p90_qty"), 6).as("p90_qty"),
      round(col("p99_price"), 6).as("p99_price"),
      col("n_l_quantity").as("n"))
  }

  val groupPercentilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
      |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
      |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Sketch-based percentiles — the 100 TB default next to the exact
    * [[groupPercentiles]] truth. Spark's `percentile_approx` keeps a
    * Greenwald–Khanna summary of O(accuracy · log n) entries per
    * group-per-task (vs the exact form's per-distinct-value map, whose
    * state grows with the data), with a published rank guarantee: the
    * returned value's rank is within n/accuracy of the target rank.
    *
    * The sketch itself is merge-order-sensitive, so the oracle cannot
    * hash the approximate VALUES. Instead the query output IS the
    * guarantee check: it joins the approximate percentiles back to the
    * data (broadcast — one row per group) and verifies, per group, that
    * each returned value's rank interval [rows<v, rows<=v] overlaps the
    * target rank ±(εn + 1). DuckDB replays the all-true verdict — so a
    * sketch regression past its error bound is a driver-visible hash
    * mismatch, not just a spec failure.
    */
  def groupPercentilesApprox(s: SparkSession, dir: String): DataFrame = {
    val acc = 1000 // ε = 1/acc relative rank error
    val li = t(s, dir, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice")
    val approx = li.groupBy("l_returnflag").agg(
      percentile_approx(col("l_quantity"), lit(0.5), lit(acc)).as("a50"),
      percentile_approx(col("l_quantity"), lit(0.9), lit(acc)).as("a90"),
      percentile_approx(col("l_extendedprice"), lit(0.99), lit(acc)).as("a99"))
    // one extra scan checks all three rank intervals; εn + 1 slack
    // (the +1 absorbs the 0- vs 1-based rank convention)
    def ok(le: Column, lt: Column, p: Double, n: Column): Column = {
      val slack = n.cast("double") / acc + 1d
      val target = n.cast("double") * p
      (le.cast("double") >= target - slack) && (lt.cast("double") <= target + slack)
    }
    li.join(broadcast(approx), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity") <= col("a50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_quantity") < col("a50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_quantity") <= col("a90"), 1L).otherwise(0L)).as("le90"),
        sum(when(col("l_quantity") < col("a90"), 1L).otherwise(0L)).as("lt90"),
        sum(when(col("l_extendedprice") <= col("a99"), 1L).otherwise(0L)).as("le99"),
        sum(when(col("l_extendedprice") < col("a99"), 1L).otherwise(0L)).as("lt99"))
      .select(col("l_returnflag"), col("n"),
        ok(col("le50"), col("lt50"), 0.5, col("n")).as("p50_in_bound"),
        ok(col("le90"), col("lt90"), 0.9, col("n")).as("p90_in_bound"),
        ok(col("le99"), col("lt99"), 0.99, col("n")).as("p99_in_bound"))
  }

  val groupPercentilesApproxSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  true AS p50_in_bound, true AS p90_in_bound, true AS p99_in_bound
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Deterministic stratified sampling ([[graft.operators.Sampling]]):
    * language re-balancing of the documents corpus via the portable
    * sha-256 membership hash — DuckDB replays the exact membership set,
    * so the oracle matches row-for-row (not just in expectation).
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedSample(
      t(s, dir, "documents").select("doc_id", "lang", "source"),
      "lang", "doc_id",
      Map("en" -> 0.1, "de" -> 0.5), seed = 42L, defaultFraction = 1.0)

  val sampleStratifiedSql: String =
    """SELECT doc_id, lang, source FROM documents
      |WHERE CAST(('0x' || substr(sha256('42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |    / 4294967296.0
      |  < CASE WHEN lang = 'en' THEN 0.1
      |         WHEN lang = 'de' THEN 0.5
      |         ELSE 1.0 END""".stripMargin

  /** Training-mix assembly ([[graft.operators.Sampling.weightedMix]]):
    * three language corpora down-sampled to target weights and
    * unioned with provenance tags — the "data mixture" step of every
    * pretraining run. Membership is the portable sha-256 predicate,
    * so the mix is identical on every rerun, engine to engine, and
    * the plan is a union of pushed filters: zero shuffles.
    */
  def sampleMix(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "lang", "source")
    graft.operators.Sampling.weightedMix(Seq(
      ("en_corpus", d.filter(col("lang") === "en"), 0.25),
      ("de_corpus", d.filter(col("lang") === "de"), 1.0),
      ("fr_corpus", d.filter(col("lang") === "fr"), 0.6)),
      "doc_id", seed = 7L)
  }

  val sampleMixSql: String =
    """WITH u AS (SELECT doc_id,
      |    CAST(('0x' || substr(sha256('7:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      / 4294967296.0 AS unit, lang, source FROM documents)
      |SELECT doc_id, lang, source, 'en_corpus' AS mix_source FROM u
      |  WHERE lang = 'en' AND unit < 0.25
      |UNION ALL
      |SELECT doc_id, lang, source, 'de_corpus' FROM u
      |  WHERE lang = 'de' AND unit < 1.0
      |UNION ALL
      |SELECT doc_id, lang, source, 'fr_corpus' FROM u
      |  WHERE lang = 'fr' AND unit < 0.6""".stripMargin

  /** Sequence packing ([[graft.operators.Packing]]): documents into
    * 2048-token packs across 8 hash shards. Pack ids derive from a
    * portable-hash shard + per-shard running token total, so DuckDB
    * replays every assignment exactly.
    */
  def docPacking(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packDocuments(
      t(s, dir, "documents").select("doc_id", "text"),
      "doc_id", "text", tokenBudget = 2048L, shards = 8)
      .select(col("doc_id"), col("n_tokens"), col("shard").cast("long").as("shard"),
        col("pack_id"), col("pack_pos"))

  val docPackingSql: String =
    """WITH d AS (SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
      |    CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
      |      AS shard
      |  FROM documents),
      |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
      |SELECT doc_id, n_tokens, shard,
      |  CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
      |  CAST(row_number() OVER (PARTITION BY shard,
      |      floor((cum - n_tokens) / 2048.0) ORDER BY doc_id) AS BIGINT) AS pack_pos
      |FROM c""".stripMargin

  // ----------------------------------------------------- dedup extensions

  /** Documents corpus + deterministic mutated copies, so dedup operators
    * have real duplicates to find (the raw corpus has none). Exact-dup
    * variants differ only in case; near-dup variants lose a tail chunk.
    */
  private def corpusWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    val exactDups = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), upper(col("text")).as("text"))
    d.union(exactDups)
  }

  private val corpusWithDupsSql: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, upper(text) AS text
      |FROM documents WHERE doc_id % 5 = 0""".stripMargin

  /** Exact dedup by normalized-text sha2 fingerprint. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(corpusWithDups(s, dir), "text", "doc_id")
      .select("doc_id", "representative", "cluster_size", "is_duplicate")

  val dedupExactSql: String =
    s"""WITH corpus AS ($corpusWithDupsSql),
       |fp AS (SELECT doc_id,
       |  sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM corpus)
       |SELECT doc_id,
       |  min(doc_id) OVER (PARTITION BY fp) AS representative,
       |  count(*) OVER (PARTITION BY fp) AS cluster_size,
       |  doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_duplicate
       |FROM fp""".stripMargin

  /** Near-dup corpus: tail-truncated variants (high shingle overlap). */
  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    val nearDups = d.filter(col("doc_id") % 7 === 0)
      .select(
        (col("doc_id") + 1000000).as("doc_id"),
        col("text").substr(lit(1), greatest(length(col("text")) - 15, lit(20))).as("text"))
    d.union(nearDups)
      .filter(size(split(TextFunctions.normalizeText(col("text")), " ")) >= 3)
  }

  private val nearDupCorpusSql: String =
    """SELECT doc_id, text FROM (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    substr(text, 1, greatest(length(text) - 15, 20)) AS text
      |  FROM documents WHERE doc_id % 7 = 0)
      |WHERE len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) >= 3""".stripMargin

  private val MinHashNumHashes = 32
  private val MinHashShingle = 3
  private val MinHashBands = 8

  /** MinHash + LSH candidate pairs. Signatures are bit-identical across
    * engines (sha2-based base hash + explicit universal-hash params), so
    * the oracle reproduces the exact pair set.
    */
  def dedupMinHash(s: SparkSession, dir: String): DataFrame = {
    val (pairs, _) = Dedup.minHashCandidates(
      nearDupCorpus(s, dir), "text", "doc_id",
      numHashes = MinHashNumHashes, shingleSize = MinHashShingle, bands = MinHashBands)
    pairs
  }

  /** Shared CTE chain deriving the minhash-LSH candidate pairs —
    * reused by the pair query and the cluster-resolution query so both
    * oracles see the identical pair set.
    */
  private val minHashPairsCtes: String = {
    val rows = MinHashNumHashes / MinHashBands
    val params = Dedup.minHashParams(MinHashNumHashes)
    val sigExprs = params.map { case (a, b) =>
      s"list_min(list_transform(hashes, h -> (${a}*h + ${b}) % ${Dedup.MinHashPrime}))"
    }.mkString("[", ", ", "]")
    val bandExprs = (0 until MinHashBands).map { bnd =>
      val lo = bnd * rows + 1
      val hi = bnd * rows + rows
      s"sha256('${bnd}' || ',' || array_to_string(sig[${lo}:${hi}], ','))"
    }.mkString("[", ", ", "]")
    s"""corpus AS ($nearDupCorpusSql),
       |words AS (SELECT doc_id,
       |  string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
       |  FROM corpus),
       |sh AS (SELECT doc_id,
       |  list_transform(range(1, len(w) - ${MinHashShingle - 2}),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shingles FROM words),
       |hs AS (SELECT doc_id,
       |  list_transform(shingles, s -> CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT)) AS hashes
       |  FROM sh),
       |sig AS (SELECT doc_id, $sigExprs AS sig FROM hs),
       |bands AS (SELECT doc_id, unnest($bandExprs) AS band FROM sig),
       |pairs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
       |  FROM bands l JOIN bands r ON l.band = r.band AND l.doc_id < r.doc_id)""".stripMargin
  }

  val dedupMinHashSql: String =
    s"""WITH $minHashPairsCtes
       |SELECT id_a, id_b FROM pairs""".stripMargin

  /** Incremental dedup ([[graft.operators.Dedup.incrementalCandidates]]):
    * the batch (doc_id % 5 == 0) dedups against STORED corpus band
    * signatures — only batch text is hashed; corpus rows enter as
    * (id, band) pruned to touched bands. The oracle is the full-corpus
    * pair CTE restricted to batch-touching pairs, which the operator
    * must equal exactly (bucket bounds evaluated over full buckets).
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    val (pairs, _) = graft.operators.Dedup.incrementalCandidates(
      graft.operators.Dedup.bandSignatures(
        corpus.filter(col("doc_id") % 5 =!= 0), "text", "doc_id",
        numHashes = MinHashNumHashes, shingleSize = MinHashShingle,
        bands = MinHashBands),
      corpus.filter(col("doc_id") % 5 === 0), "text", "doc_id",
      numHashes = MinHashNumHashes, shingleSize = MinHashShingle,
      bands = MinHashBands)
    pairs
  }

  val dedupIncrementalSql: String =
    s"""WITH $minHashPairsCtes
       |SELECT id_a, id_b FROM pairs WHERE id_a % 5 = 0 OR id_b % 5 = 0""".stripMargin

  /** Duplicate-cluster resolution: minhash candidate pairs →
    * [[graft.operators.ConnectedComponents]] min-label clusters. The
    * oracle computes the transitive closure of the SAME pair set with
    * a recursive CTE and takes the min reachable id — tractable at
    * oracle scale because dedup components are tiny; Spark's label
    * propagation is the form that survives 100 TB.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    graft.operators.ConnectedComponents.resolve(
      dedupMinHash(s, dir), "id_a", "id_b")
      .withColumnRenamed("node", "doc_id")

  val dedupClustersSql: String =
    s"""WITH RECURSIVE $minHashPairsCtes,
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(v, u) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a)
       |SELECT v AS doc_id, min(u) AS component FROM reach GROUP BY 1""".stripMargin

  /** The same cluster resolution through the bound-convergence
    * large-star/small-star path
    * ([[graft.operators.ConnectedComponents.resolveStars]]) — label
    * semantics are identical (min id per component), so the SAME
    * recursive-CTE oracle gates both algorithms against each other and
    * against DuckDB.
    */
  def dedupClustersStars(s: SparkSession, dir: String): DataFrame =
    graft.operators.ConnectedComponents.resolveStars(
      dedupMinHash(s, dir), "id_a", "id_b")
      .withColumnRenamed("node", "doc_id")

  val dedupClustersStarsSql: String = dedupClustersSql

  /** Canonical representative per near-dup cluster: instead of the
    * arbitrary keep-min-id policy, each cluster keeps its BEST-quality
    * member (engine-portable [[TextFunctions.qualityScore]], ties to
    * the low id) — the curation policy that decides which variant of a
    * duplicated page actually enters the corpus. Singletons (no
    * candidate pair) represent themselves. Rides the audited
    * q_dedup_clusters label table + one cluster-keyed window.
    */
  def clusterRepresentatives(s: SparkSession, dir: String): DataFrame = {
    val labels = dedupClusters(s, dir)
    val scored = nearDupCorpus(s, dir).select(
      col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality_score"))
    val w = Window.partitionBy("cluster")
    scored.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality_score"),
        coalesce(col("component"), col("doc_id")).as("cluster"))
      .withColumn("rn", row_number().over(
        w.orderBy(col("quality_score").desc, col("doc_id"))))
      .withColumn("n_members", count(lit(1)).over(w).cast("long"))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("doc_id").as("rep_doc_id"),
        col("quality_score").as("rep_quality"), col("n_members"))
  }

  val clusterRepresentativesSql: String =
    s"""WITH RECURSIVE $minHashPairsCtes,
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(v, u) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a),
       |labels AS (SELECT v AS doc_id, min(u) AS component FROM reach GROUP BY 1),
       |base AS (SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok,
       |    CAST(length(text) AS BIGINT) AS n_chr
       |  FROM corpus),
       |scored AS (
       |  SELECT doc_id,
       |    round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
       |      (CASE WHEN awl BETWEEN 3 AND 10 THEN 1.0
       |            WHEN awl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS quality_score
       |  FROM (SELECT *, CASE WHEN n_tok > 0
       |          THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
       |          ELSE 0.0 END AS awl FROM base)),
       |cl AS (SELECT s.doc_id, s.quality_score,
       |    coalesce(l.component, s.doc_id) AS cluster
       |  FROM scored s LEFT JOIN labels l ON s.doc_id = l.doc_id),
       |r AS (SELECT *,
       |    row_number() OVER (PARTITION BY cluster
       |      ORDER BY quality_score DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY cluster) AS nm
       |  FROM cl)
       |SELECT cluster, doc_id AS rep_doc_id, quality_score AS rep_quality,
       |  CAST(nm AS BIGINT) AS n_members
       |FROM r WHERE rn = 1""".stripMargin

  /** n-gram Jaccard over the known (original, variant) pairs, on
    * hash-compared shingle sets (see [[Dedup.ngramJaccard]]).
    */
  def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    val pairs = t(s, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000).as("id_b"))
    Dedup.ngramJaccard(corpus, pairs, "text", "doc_id", MinHashShingle)
      .select(
        col("id_a"), col("id_b"),
        col("inter").cast("long").as("inter"),
        col("uni").cast("long").as("uni"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  val ngramJaccardPairsSql: String =
    s"""WITH corpus AS ($nearDupCorpusSql),
       |words AS (SELECT doc_id,
       |  string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
       |  FROM corpus),
       |sets AS (SELECT doc_id,
       |  list_distinct(list_transform(
       |    list_transform(range(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
       |    s -> CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT)))
       |  AS sh FROM words),
       |pairs AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
       |  FROM documents WHERE doc_id % 7 = 0)
       |SELECT id_a, id_b,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       |  CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS uni,
       |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6) AS jaccard
       |FROM pairs JOIN sets a ON id_a = a.doc_id JOIN sets b ON id_b = b.doc_id""".stripMargin

  /** LSH candidate-recall audit ([[Dedup.lshRecall]]): exact-Jaccard
    * ground-truth pairs on a deterministic half-sample, each tagged
    * with whether the production banding surfaced it — the dedup
    * analogue of q_ann_recall, measuring the LSH s-curve against real
    * corpus geometry. Banding is per-document, so sample candidates
    * are exactly the full-corpus candidate set restricted to the
    * sample.
    */
  def dedupRecall(s: SparkSession, dir: String): DataFrame =
    Dedup.lshRecall(nearDupCorpus(s, dir), "text", "doc_id",
      sampleFraction = 0.5, seed = 23L, minJaccard = 0.4,
      numHashes = MinHashNumHashes, shingleSize = MinHashShingle,
      bands = MinHashBands)

  val dedupRecallSql: String =
    s"""WITH $minHashPairsCtes,
       |su AS (SELECT doc_id, text FROM corpus
       |  WHERE CAST(('0x' || substr(sha256('23:' || CAST(doc_id AS VARCHAR)), 1, 8))
       |    AS BIGINT) / 4294967296.0 < 0.5),
       |ssets AS (SELECT doc_id, list_distinct(list_transform(
       |    list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
       |    s -> CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT))) AS sh
       |  FROM (SELECT doc_id,
       |      string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
       |    FROM su)),
       |tj AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS uni,
       |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |      CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6)
       |      AS jaccard
       |  FROM ssets a JOIN ssets b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh)) > 0)
       |SELECT t.id_a, t.id_b, t.inter, t.uni, t.jaccard,
       |  (p.id_a IS NOT NULL) AS is_candidate
       |FROM tj t LEFT JOIN pairs p ON t.id_a = p.id_a AND t.id_b = p.id_b
       |WHERE t.jaccard >= 0.4""".stripMargin

  /** Winnowing partial-duplicate candidates
    * ([[graft.operators.Winnowing.overlapCandidates]]): documents
    * sharing >= 2 winnowed fingerprints (bigram hashes, window 4,
    * boilerplate fingerprints with df > 100 dropped). The oracle
    * replays the whole selection — shingle hashes, per-window
    * `list_min` (the fingerprint is a value SET, so min-tie position
    * cannot matter), df cap, pair counts — in DuckDB list ops.
    */
  def winnowOverlap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Winnowing.overlapCandidates(
      nearDupCorpus(s, dir), "text", "doc_id",
      k = 2, w = 4, minShared = 2, maxDf = 100)

  val winnowOverlapSql: String =
    s"""WITH corpus AS ($nearDupCorpusSql),
       |words AS (SELECT doc_id,
       |  string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
       |  FROM corpus),
       |hs AS (SELECT doc_id,
       |  list_transform(
       |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
       |    x -> CAST(('0x' || substr(sha256(x), 1, 8)) AS BIGINT)) AS h
       |  FROM words),
       |fps AS (SELECT doc_id,
       |  unnest(list_distinct(list_transform(
       |    range(1, greatest(len(h) - 3, 1) + 1),
       |    i -> list_min(h[i:i+3])))) AS fp
       |  FROM hs WHERE len(h) > 0),
       |ok AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 100)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
       |FROM fps a
       |JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |JOIN ok ON ok.fp = a.fp
       |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  /** SimHash signatures (32-bit) per document. */
  def dedupSimHash(s: SparkSession, dir: String): DataFrame =
    Dedup.withSimHash(t(s, dir, "documents"), "text", "simhash")
      .select("doc_id", "simhash")

  val dedupSimHashSql: String =
    """SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), i ->
      |  CASE WHEN list_sum(list_transform(
      |    list_transform(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
      |      s -> CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT)),
      |    h -> CASE WHEN CAST(floor(h / power(2, i)) AS BIGINT) % 2 = 1
      |              THEN 1 ELSE -1 END)) > 0
      |  THEN CAST(power(2, i) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
      |FROM documents""".stripMargin

  // ------------------------------------------------- similarity search

  /** Brute-force exact cosine top-k (query set broadcast). */
  def simsearchTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    SimilaritySearch.bruteForceTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  val simsearchTopKSql: String =
    """WITH n AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, nv AS cv FROM n),
      |scored AS (SELECT query_id, neighbor_id,
      |  round(list_dot_product(qv, cv), 6) AS cos_sim
      |  FROM q, c WHERE query_id <> neighbor_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, rn AS rank FROM ranked WHERE rn <= 5""".stripMargin

  /** IVF (inverted-file) ANN with an UNTRAINED quantizer (iters=0):
    * centroids are the normalized vectors of the k smallest ids, so —
    * unlike the Lloyd-trained model, whose float cluster means depend
    * on aggregation order — every step (assignment, probing, scoring,
    * top-k) is deterministic and replayable in DuckDB. The trained
    * model is covered by IvfIndexSpec's recall-vs-brute-force gate;
    * this query hash-verifies the SEARCH machinery: cell assignment,
    * nprobe pruning, the cell equi-join (no all-pairs stage), and the
    * bounded top-k aggregator.
    */
  def simsearchIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val model = graft.operators.IvfIndex.train(e, "vec_id", "embedding", k = 16, iters = 0)
    graft.operators.IvfIndex.search(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", model,
      kNeighbors = 5, nprobe = 4)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** DuckDB replay: same centroid choice (k=16 smallest vec_ids,
    * L2-normalized), same nearest-cell rule (max dot, ties to the
    * lowest cell), same nprobe=4 probe set, same candidate scoring
    * restricted to probed cells, same (cos_sim desc, neighbor_id) top-5.
    * `list_dot_product` matches Spark's sequential fold bit-for-bit.
    */
  val simsearchIvfSql: String =
    """WITH n AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, nv AS cv
      |  FROM n ORDER BY vec_id LIMIT 16),
      |assigned AS (SELECT n.vec_id, n.nv,
      |    (SELECT c.cell FROM cent c
      |     ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cell LIMIT 1) AS cell
      |  FROM n),
      |q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      |probes AS (SELECT q.query_id, q.qv, p.cell
      |  FROM q, LATERAL (SELECT c.cell FROM cent c
      |    ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cell LIMIT 4) p),
      |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
      |    round(list_dot_product(p.qv, a.nv), 6) AS cos_sim
      |  FROM probes p JOIN assigned a ON p.cell = a.cell
      |  WHERE a.vec_id <> p.query_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  /** Product-quantization ADC search ([[graft.operators.PqIndex]]):
    * m=4 subspaces × 16 codewords over the 64-dim embeddings — each
    * candidate scored through the query's LUT, never its raw vector.
    * At iters=0 the codebooks are the subvectors of the 16 smallest
    * ids, so encode (argmin of `dot(c,c) - 2·dot(v,c)`, ties to the
    * low code) and the fixed-order 4-term ADC sum replay exactly in
    * DuckDB; trained-codebook recall is spec-gated (PqIndexSpec), the
    * same split as IVF.
    */
  def simsearchPq(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PqIndex
    val e = t(s, dir, "embeddings")
    val model = PqIndex.train(e, "vec_id", "embedding", m = 4, ksub = 16, iters = 0)
    val codes = PqIndex.encode(e, "vec_id", "embedding", model)
    PqIndex.search(e.filter(col("vec_id") < 10), codes,
      "vec_id", "embedding", model, kNeighbors = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  val simsearchPqSql: String =
    """WITH n AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, nv
      |  FROM n ORDER BY vec_id LIMIT 16),
      |cb AS (SELECT s.s, seeds.code,
      |    seeds.nv[s.s*16+1 : s.s*16+16] AS cv
      |  FROM seeds, (SELECT unnest(range(0, 4)) AS s) s),
      |enc AS (SELECT n.vec_id,
      |  (SELECT c.code FROM cb c WHERE c.s = 0
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(n.nv[1:16], c.cv), c.code
      |   LIMIT 1) AS code0,
      |  (SELECT c.code FROM cb c WHERE c.s = 1
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(n.nv[17:32], c.cv), c.code
      |   LIMIT 1) AS code1,
      |  (SELECT c.code FROM cb c WHERE c.s = 2
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(n.nv[33:48], c.cv), c.code
      |   LIMIT 1) AS code2,
      |  (SELECT c.code FROM cb c WHERE c.s = 3
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(n.nv[49:64], c.cv), c.code
      |   LIMIT 1) AS code3
      |  FROM n),
      |q AS (SELECT vec_id AS query_id, nv FROM n WHERE vec_id < 10),
      |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
      |    round(list_dot_product(q.nv[1:16],  cb0.cv)
      |        + list_dot_product(q.nv[17:32], cb1.cv)
      |        + list_dot_product(q.nv[33:48], cb2.cv)
      |        + list_dot_product(q.nv[49:64], cb3.cv), 6) AS score
      |  FROM q, enc e
      |  JOIN cb cb0 ON cb0.s = 0 AND cb0.code = e.code0
      |  JOIN cb cb1 ON cb1.s = 1 AND cb1.code = e.code1
      |  JOIN cb cb2 ON cb2.s = 2 AND cb2.code = e.code2
      |  JOIN cb cb3 ON cb3.s = 3 AND cb3.code = e.code3
      |  WHERE e.vec_id <> q.query_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY score DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  /** IVF-PQ composed search ([[graft.operators.IvfPq]]): coarse cells
    * prune the corpus, residual PQ codes compress it, ADC scores
    * decompose as centroid term + LUT sum. At iters=0 both quantizers
    * are deterministic functions of the 16 smallest ids, so DuckDB
    * replays assignment, residuals, encoding and the parenthesized
    * score sum exactly; trained behavior is gated by IvfPqSpec
    * (residual coding must beat raw PQ at equal bits).
    */
  def simsearchIvfPq(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IvfPq
    val e = t(s, dir, "embeddings")
    val model = IvfPq.train(e, "vec_id", "embedding",
      kCells = 16, m = 4, ksub = 16, itersIvf = 0, itersPq = 0)
    val idx = IvfPq.index(e, "vec_id", "embedding", model)
    IvfPq.search(e.filter(col("vec_id") < 10), idx,
      "vec_id", "embedding", model, kNeighbors = 5, nprobe = 4)
      .withColumn("rank", col("rank").cast("long"))
  }

  val simsearchIvfPqSql: String =
    """WITH n AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, nv AS cv
      |  FROM n ORDER BY vec_id LIMIT 16),
      |assigned AS (SELECT n.vec_id, n.nv,
      |    (SELECT c.cell FROM cent c
      |     ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cell LIMIT 1) AS cell
      |  FROM n),
      |res AS (SELECT a.vec_id, a.cell,
      |    list_transform(range(1, 65), i -> a.nv[i] - c.cv[i]) AS rv
      |  FROM assigned a JOIN cent c ON c.cell = a.cell),
      |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, rv
      |  FROM res ORDER BY vec_id LIMIT 16),
      |cb AS (SELECT s.s, seeds.code,
      |    seeds.rv[s.s*16+1 : s.s*16+16] AS cv
      |  FROM seeds, (SELECT unnest(range(0, 4)) AS s) s),
      |enc AS (SELECT r.vec_id, r.cell,
      |  (SELECT c.code FROM cb c WHERE c.s = 0
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(r.rv[1:16], c.cv), c.code
      |   LIMIT 1) AS code0,
      |  (SELECT c.code FROM cb c WHERE c.s = 1
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(r.rv[17:32], c.cv), c.code
      |   LIMIT 1) AS code1,
      |  (SELECT c.code FROM cb c WHERE c.s = 2
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(r.rv[33:48], c.cv), c.code
      |   LIMIT 1) AS code2,
      |  (SELECT c.code FROM cb c WHERE c.s = 3
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(r.rv[49:64], c.cv), c.code
      |   LIMIT 1) AS code3
      |  FROM res r),
      |q AS (SELECT vec_id AS query_id, nv FROM n WHERE vec_id < 10),
      |probes AS (SELECT q.query_id, q.nv, p.cell
      |  FROM q, LATERAL (SELECT c.cell FROM cent c
      |    ORDER BY list_dot_product(q.nv, c.cv) DESC, c.cell LIMIT 4) p),
      |scored AS (SELECT p.query_id, e.vec_id AS neighbor_id,
      |    round(list_dot_product(p.nv, cc.cv)
      |      + (list_dot_product(p.nv[1:16],  cb0.cv)
      |       + list_dot_product(p.nv[17:32], cb1.cv)
      |       + list_dot_product(p.nv[33:48], cb2.cv)
      |       + list_dot_product(p.nv[49:64], cb3.cv)), 6) AS score
      |  FROM probes p
      |  JOIN cent cc ON cc.cell = p.cell
      |  JOIN enc e ON e.cell = p.cell
      |  JOIN cb cb0 ON cb0.s = 0 AND cb0.code = e.code0
      |  JOIN cb cb1 ON cb1.s = 1 AND cb1.code = e.code1
      |  JOIN cb cb2 ON cb2.s = 2 AND cb2.code = e.code2
      |  JOIN cb cb3 ON cb3.s = 3 AND cb3.code = e.code3
      |  WHERE e.vec_id <> p.query_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY score DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  /** Brute-force top-k over int8-QUANTIZED embeddings
    * ([[graft.functions.VectorFunctions.quantizeInt8]]): the 4×-smaller
    * storage form must still rank neighbors usefully, and every step
    * (floor quantization, midpoint dequantization, normalized dot,
    * top-k) is bit-deterministic, so DuckDB replays the ranking
    * exactly. Range [-0.6, 0.6] is the stored model parameter for this
    * corpus.
    */
  def embeddingQuantized(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val lo = -0.6
    val hi = 0.6
    val e = t(s, dir, "embeddings").select(col("vec_id"),
      VectorFunctions.dequantizeInt8(
        VectorFunctions.quantizeInt8(col("embedding"), lo, hi), lo, hi)
        .as("embedding"))
    SimilaritySearch.bruteForceTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Literal-for-literal replay of quantize -> dequantize -> top-k:
    * scale/step derive from the same (0.6 - (-0.6)) IEEE ops, floor
    * avoids engine-dependent rounding ties.
    */
  val embeddingQuantizedSql: String =
    """WITH dq AS (SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]), x ->
      |      ((least(greatest(floor((x - (-0.6)) * (255.0 / (0.6 - (-0.6)))), 0.0), 255.0)
      |        - 128.0) + 128.5) * ((0.6 - (-0.6)) / 255.0) + (-0.6)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id,
      |    list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv FROM dq),
      |q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, nv AS cv FROM n),
      |scored AS (SELECT query_id, neighbor_id,
      |  round(list_dot_product(qv, cv), 6) AS cos_sim
      |  FROM q, c WHERE query_id <> neighbor_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  /** Embedding corpus with planted near-duplicates: every 5th vector
    * gets a shifted copy (element-wise +0.05, id +1,000,000) whose
    * cosine to its original lands in ~[0.92, 0.99] — above the 0.8
    * near-dup threshold, while the hottest unplanted pair is ~0.55.
    * Element-wise addition is bit-identical cross-engine, so DuckDB
    * reproduces the corpus exactly.
    */
  private def nearDupEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val variants = e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.05)).as("embedding"))
    e.union(variants)
  }

  private val nearDupEmbeddingsSql: String =
    """corpus AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.05) AS v
      |  FROM embeddings WHERE vec_id % 5 = 0)""".stripMargin

  /** Embedding-cosine near-duplicate counts via LSH buckets — no
    * all-pairs stage anywhere in the plan. The exact all-pairs
    * formulation ([[SimilaritySearch.cosineNearDupCounts]]) is the
    * small-scale truth cross-checked in SimilaritySearchSpec (8 bits ×
    * 12 tables ≈ 0.99 worst-case pair recall at cosine 0.92; equals the
    * exact counts on the sf0.01 corpus, 200/200 planted pairs). The
    * oracle replays the same buckets, so the hash check is exact
    * regardless of recall.
    */
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.lshNearDupCounts(
      nearDupEmbeddings(s, dir), "vec_id", "embedding", threshold = 0.8)
      .withColumnRenamed("id", "vec_id")

  val embeddingNearDupSql: String =
    s"""WITH $nearDupEmbeddingsSql,
      |n AS (
      |  SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
      |  FROM corpus WHERE sqrt(list_dot_product(v, v)) > 0),
      |d AS (SELECT max(len(nv)) AS dim FROM n),
      |planes AS (
      |  SELECT tt.t AS t, bb.b AS b,
      |    list_transform(range(0, d.dim), j ->
      |      CAST(('0x' || substr(sha256(
      |          'srp:' || CAST(42 + tt.t * 7919 AS VARCHAR) || ':' ||
      |          CAST(bb.b AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
      |        / 2147483648.0 - 1.0) AS prow
      |  FROM range(0, 12) AS tt(t) CROSS JOIN range(0, 8) AS bb(b) CROSS JOIN d),
      |sigs AS (
      |  SELECT n.vec_id, p.t,
      |    CAST(sum(CASE WHEN list_dot_product(n.nv, p.prow) >= 0
      |      THEN CAST(power(2, p.b) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
      |  FROM n CROSS JOIN planes p GROUP BY n.vec_id, p.t),
      |bkt AS (SELECT vec_id,
      |    CAST(t AS VARCHAR) || ':' || CAST(sig AS VARCHAR) AS bucket FROM sigs),
      |cand AS (SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
      |  FROM bkt l JOIN bkt r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id),
      |hits AS (SELECT id_a,
      |    count(CASE WHEN round(list_dot_product(a.nv, b.nv), 6) >= 0.8 THEN 1 END) AS c
      |  FROM cand JOIN n a ON id_a = a.vec_id JOIN n b ON id_b = b.vec_id
      |  GROUP BY 1)
      |SELECT n.vec_id, CAST(coalesce(h.c, 0) AS BIGINT) AS n_near_dups
      |FROM n LEFT JOIN hits h ON n.vec_id = h.id_a""".stripMargin

  /** LSH-bucketed approximate top-k — the 100 TB scale path. Hyperplane
    * components derive from sha-256("srp:seed:b:j") (portable — see
    * [[graft.plans.HyperplaneSig]]), so DuckDB reproduces the exact
    * bucket assignments and the result is fully oracled.
    */
  def simsearchLsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    SimilaritySearch.lshTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** DuckDB replay of the SRP-LSH path: same sha-256-derived planes,
    * same sequential-fold dot product (`list_dot_product` matches
    * Spark's left-to-right fold bit-for-bit), same bucket labels
    * "table:signature", same within-bucket scoring + top-k.
    * numBits = 12, numTables = 2, seeds 42 + t*7919 — keep in sync with
    * [[graft.operators.SimilaritySearch.lshTopK]] defaults.
    */
  val simsearchLshSql: String =
    """WITH n AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings
      |  WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |             CAST(embedding AS DOUBLE[]))) > 0),
      |d AS (SELECT max(len(nv)) AS dim FROM n),
      |planes AS (
      |  SELECT tt.t AS t, bb.b AS b,
      |    list_transform(range(0, d.dim), j ->
      |      CAST(('0x' || substr(sha256(
      |          'srp:' || CAST(42 + tt.t * 7919 AS VARCHAR) || ':' ||
      |          CAST(bb.b AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
      |        / 2147483648.0 - 1.0) AS prow
      |  FROM range(0, 2) AS tt(t) CROSS JOIN range(0, 12) AS bb(b) CROSS JOIN d),
      |sigs AS (
      |  SELECT n.vec_id, p.t,
      |    CAST(sum(CASE WHEN list_dot_product(n.nv, p.prow) >= 0
      |      THEN CAST(power(2, p.b) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
      |  FROM n CROSS JOIN planes p GROUP BY n.vec_id, p.t),
      |bkt AS (SELECT vec_id,
      |    CAST(t AS VARCHAR) || ':' || CAST(sig AS VARCHAR) AS bucket FROM sigs),
      |q AS (SELECT bkt.vec_id AS query_id, n.nv AS qv, bkt.bucket
      |      FROM bkt JOIN n USING (vec_id) WHERE bkt.vec_id < 10),
      |c AS (SELECT bkt.vec_id AS neighbor_id, n.nv AS cv, bkt.bucket
      |      FROM bkt JOIN n USING (vec_id)),
      |pairs AS (SELECT DISTINCT query_id, neighbor_id,
      |      round(list_dot_product(qv, cv), 6) AS cos_sim
      |      FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
      |ranked AS (SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
      |      FROM pairs)
      |SELECT query_id, neighbor_id, cos_sim, rn AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  /** Multi-probe LSH ([[SimilaritySearch.lshTopKMultiProbe]]): the
    * query side additionally probes every Hamming-1 neighbor bucket —
    * recall rises toward the brute-force truth without more tables or
    * signature storage, at numBits+1 probe buckets per query per
    * table. Candidate indexing is untouched.
    */
  def simsearchLshMultiProbe(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    SimilaritySearch.lshTopKMultiProbe(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  val simsearchLshMultiProbeSql: String =
    """WITH n AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings
      |  WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |             CAST(embedding AS DOUBLE[]))) > 0),
      |d AS (SELECT max(len(nv)) AS dim FROM n),
      |planes AS (
      |  SELECT tt.t AS t, bb.b AS b,
      |    list_transform(range(0, d.dim), j ->
      |      CAST(('0x' || substr(sha256(
      |          'srp:' || CAST(42 + tt.t * 7919 AS VARCHAR) || ':' ||
      |          CAST(bb.b AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
      |        / 2147483648.0 - 1.0) AS prow
      |  FROM range(0, 2) AS tt(t) CROSS JOIN range(0, 12) AS bb(b) CROSS JOIN d),
      |sigs AS (
      |  SELECT n.vec_id, p.t,
      |    CAST(sum(CASE WHEN list_dot_product(n.nv, p.prow) >= 0
      |      THEN CAST(power(2, p.b) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
      |  FROM n CROSS JOIN planes p GROUP BY n.vec_id, p.t),
      |masks AS (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
      |  1024, 2048]) AS mask),
      |q AS (SELECT s.vec_id AS query_id, n.nv AS qv,
      |      CAST(s.t AS VARCHAR) || ':' || CAST(xor(s.sig, m.mask) AS VARCHAR) AS bucket
      |      FROM sigs s JOIN n USING (vec_id) CROSS JOIN masks m
      |      WHERE s.vec_id < 10),
      |c AS (SELECT s.vec_id AS neighbor_id, n.nv AS cv,
      |      CAST(s.t AS VARCHAR) || ':' || CAST(s.sig AS VARCHAR) AS bucket
      |      FROM sigs s JOIN n USING (vec_id)),
      |pairs AS (SELECT DISTINCT query_id, neighbor_id,
      |      round(list_dot_product(qv, cv), 6) AS cos_sim
      |      FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
      |ranked AS (SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
      |      FROM pairs)
      |SELECT query_id, neighbor_id, cos_sim, rn AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  // ------------------------------------------------------ text analysis

  /** Repetition quality signals: fraction of words / bigrams /
    * trigrams that repeat an earlier occurrence — the filter that
    * catches degenerate machine-generated or boilerplate text. One
    * native single-pass expression
    * ([[graft.plans.TextRepetitionStats]]) computes all four signals;
    * the HOF formulation ([[TextFunctions.dupNgramFraction]], spec-
    * pinned equivalent) re-evaluated the interpreted shingle transform
    * per reference and dominated the whole bench. DuckDB replays the
    * shingle construction and list_distinct exactly.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    graft.plans.NativeText.register(s)
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.plans.NativeText.textRepetitionStats(col("text")).as("r"))
      .select(
        col("doc_id"),
        col("r.n_words").as("n_words"),
        round(col("r.dup_word_frac"), 6).as("dup_word_frac"),
        round(col("r.dup_bigram_frac"), 6).as("dup_bigram_frac"),
        round(col("r.dup_trigram_frac"), 6).as("dup_trigram_frac"))
  }

  val textRepetitionSql: String =
    """WITH words AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |g AS (SELECT doc_id, w,
      |  list_transform(range(1, greatest(len(w), 1)),
      |    i -> w[i] || ' ' || w[i+1]) AS g2,
      |  list_transform(range(1, greatest(len(w) - 1, 1)),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS g3
      |  FROM words)
      |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
      |  CASE WHEN len(w) > 0
      |    THEN round((len(w) - len(list_distinct(w))) / len(w), 6)
      |    ELSE 0.0 END AS dup_word_frac,
      |  CASE WHEN len(g2) > 0
      |    THEN round((len(g2) - len(list_distinct(g2))) / len(g2), 6)
      |    ELSE 0.0 END AS dup_bigram_frac,
      |  CASE WHEN len(g3) > 0
      |    THEN round((len(g3) - len(list_distinct(g3))) / len(g3), 6)
      |    ELSE 0.0 END AS dup_trigram_frac
      |FROM g""".stripMargin

  /** Sliding-window chunking ([[graft.operators.Chunking]]): documents
    * into 64-token windows with 16 tokens of shared context. Chunk
    * ids, boundaries and text are a pure function of the word
    * positions, so DuckDB replays every chunk byte-for-byte.
    */
  def textChunks(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.chunkDocuments(
      t(s, dir, "documents"), "doc_id", "text", maxTokens = 64, overlap = 16)

  val textChunksSql: String =
    """WITH words AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |starts AS (SELECT doc_id, w, len(w) AS n,
      |    unnest(range(1, greatest(len(w), 1) + 1, 48)) AS s
      |  FROM words)
      |SELECT doc_id,
      |  CAST((s - 1) / 48 AS BIGINT) AS chunk_id,
      |  CAST(least(64, n - s + 1) AS BIGINT) AS n_tokens,
      |  array_to_string(w[s : least(s + 63, n)], ' ') AS chunk_text
      |FROM starts WHERE s = 1 OR s + 16 <= n""".stripMargin

  /** Z-order cell mapping ([[graft.operators.ZOrder.zValue]]): the
    * bit-interleaved Morton value over two bucketed dimensions of
    * `orders` — the write-side clustering key behind multi-dimensional
    * file pruning. Pure codegen'd arithmetic (shift/and/multiply), zero
    * shuffles; the oracle evaluates the IDENTICAL term expansion.
    */
  def zorderCells(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      graft.operators.ZOrder.zValue(
        Seq(col("o_custkey") % 256, col("o_orderkey") % 256), 8).as("z_cell"))

  val zorderCellsSql: String = {
    val z = graft.operators.ZOrder.zValueSql(
      Seq("(o_custkey % 256)", "(o_orderkey % 256)"), 8)
    s"SELECT o_orderkey, $z AS z_cell FROM orders"
  }

  /** Token counting, length stats, quality score, fingerprint. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val nTokens = TextFunctions.tokenCount(col("text"))
    d.select(
      col("doc_id"),
      nTokens.cast("long").as("n_tokens"),
      // BPE-ish subword proxy: letter runs, single digits, and isolated
      // punctuation each count as one token
      regexp_count(lower(col("text")), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"))
        .cast("long").as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_measured"),
      round(length(col("text")).cast("double") /
        when(nTokens > 0, nTokens.cast("double")).otherwise(lit(null)), 4)
        .as("avg_word_len"),
      TextFunctions.qualityScore(col("text")).as("quality_score"),
      TextFunctions.fingerprint(col("text")).as("fingerprint"))
  }

  val textStatsSql: String =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM documents
      |), awl AS (
      |  SELECT *,
      |    CASE WHEN n_tok > 0 THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |         ELSE 0.0 END AS avg_wl
      |  FROM base)
      |SELECT doc_id,
      |  n_tok AS n_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT)
      |    AS n_bpe_tokens,
      |  n_chr AS n_chars_measured,
      |  round(CASE WHEN n_tok > 0 THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE) END, 4)
      |    AS avg_word_len,
      |  round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |    (CASE WHEN avg_wl BETWEEN 3 AND 10 THEN 1.0
      |          WHEN avg_wl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS quality_score,
      |  sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
      |FROM awl""".stripMargin

  /** Marker-word language identification. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val scoreCols = TextFunctions.langMarkers.map { case (lang, _) =>
      TextFunctions.langScore(col("text"), lang).cast("long").as(s"score_$lang")
    }
    d.select(
      (col("doc_id") +: TextFunctions.langId(col("text")).as("predicted_lang") +: scoreCols): _*)
  }

  val langIdSql: String = {
    val scoreDefs = TextFunctions.langMarkers.map { case (lang, words) =>
      val sum = words
        .map(wd => s"len(regexp_extract_all(lower(text), '\\b$wd\\b'))")
        .mkString(" + ")
      s"CAST($sum AS BIGINT) AS score_$lang"
    }.mkString(",\n  ")
    val langs = TextFunctions.langMarkers.map(_._1)
    val best = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN score_$l = $best THEN '$l'").mkString("\n    ")
    s"""WITH scores AS (SELECT doc_id, text,
       |  $scoreDefs
       |FROM documents)
       |SELECT doc_id,
       |  CASE WHEN $best = 0 THEN 'und'
       |    $cases
       |  END AS predicted_lang,
       |  ${langs.map(l => s"score_$l").mkString(", ")}
       |FROM scores""".stripMargin
  }

  // ------------------------------------------------------- multimodal

  /** Binary-payload plumbing: documents as opaque binary media, with
    * expression-level feature extraction (deterministic fake decode —
    * real codec path is [[graft.operators.Multimodal.decodeFeatures]],
    * exercised in tests).
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val h = TextFunctions.portableHash32(col("text"))
    t(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"),
      sha2(encode(col("text"), "UTF-8"), 256).as("checksum"),
      (lit(16) + pmod(h, lit(4080L))).cast("long").as("width"),
      (lit(16) + pmod(floor(h / lit(4096.0)).cast("long"), lit(2144L))).cast("long").as("height"))
  }

  val multimodalFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  sha256(text) AS checksum,
      |  CAST(16 + CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) % 4080 AS BIGINT) AS width,
      |  CAST(16 + CAST(floor(CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) / 4096.0) AS BIGINT) % 2144 AS BIGINT) AS height
      |FROM documents""".stripMargin

  // ------------------------------------------- corpus curation (round 7)

  /** Bigram-LM perplexity quality filter ([[graft.operators.NgramLm]]):
    * train on the English slice, score every document's cross-entropy
    * against it — non-English and low-fluency documents surface with
    * high perplexity. The per-bigram `ln p` folds through
    * DECIMAL(27,7) so the score is order-independent and the oracle
    * replays it exactly (see the operator's Scaladoc for the 100 TB
    * shape: the model is bounded by the REFERENCE corpus and
    * broadcast; scoring is linear).
    */
  def lmPerplexity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = NgramLm.train(docs.filter(col("lang") === "en"), "text")
    NgramLm.score(model, docs, "doc_id", "text")
  }

  val lmPerplexitySql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w,
      |    generate_subscripts(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), 1) AS p
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, lang, p, w AS w1,
      |    lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
      |  FROM tok QUALIFY w2 IS NOT NULL),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi WHERE lang = 'en' GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bi WHERE lang = 'en' GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM tok WHERE lang = 'en'),
      |scored AS (
      |  SELECT b.doc_id,
      |    CASE WHEN c12.c12 IS NULL THEN 1 ELSE 0 END AS oov,
      |    CAST(round(ln((coalesce(c12.c12, 0) + 0.5) / (coalesce(c1.c1, 0) + 0.5 * v.v)), 7)
      |      AS DECIMAL(27,7)) AS nlp
      |  FROM bi b
      |  LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      |  LEFT JOIN c1 ON b.w1 = c1.w1
      |  CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams, CAST(sum(oov) AS BIGINT) AS oov_bigrams,
      |  round(-(CAST(sum(nlp) AS DOUBLE) / count(*)), 6) AS avg_neg_logp,
      |  round(exp(-(CAST(sum(nlp) AS DOUBLE) / count(*))), 6) AS perplexity
      |FROM scored GROUP BY doc_id""".stripMargin

  /** Interpolated Kneser–Ney perplexity ([[NgramLm.scoreKn]]): the
    * smoothing real perplexity filters use, over the same en-reference
    * train/score split as q_lm_perplexity. Same decimal-fold oracle
    * discipline; the KN interpolation's float expression trees are
    * parenthesized identically on both engines.
    */
  def lmPerplexityKn(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = NgramLm.trainKn(docs.filter(col("lang") === "en"), "text")
    NgramLm.scoreKn(model, docs, "doc_id", "text")
  }

  val lmPerplexityKnSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w,
      |    generate_subscripts(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), 1) AS p
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, lang, p, w AS w1,
      |    lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
      |  FROM tok QUALIFY w2 IS NOT NULL),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi WHERE lang = 'en' GROUP BY 1, 2),
      |c1 AS (SELECT w1, sum(c12) AS c1, count(*) AS n_after FROM c12 GROUP BY 1),
      |nb AS (SELECT w2, count(*) AS n_before FROM c12 GROUP BY 1),
      |b AS (SELECT count(*) AS b FROM c12),
      |v AS (SELECT count(DISTINCT w) AS v FROM tok WHERE lang = 'en'),
      |scored AS (
      |  SELECT bg.doc_id,
      |    CASE WHEN c12.c12 IS NULL THEN 1 ELSE 0 END AS oov,
      |    CAST(round(ln(CASE WHEN c1.c1 IS NULL
      |      THEN (coalesce(nb.n_before, 0) + 0.5) / (b.b + 0.5 * v.v)
      |      ELSE (greatest(coalesce(c12.c12, 0) - 0.75, 0.0) / c1.c1) +
      |        (((0.75 * c1.n_after) / c1.c1) *
      |          ((coalesce(nb.n_before, 0) + 0.5) / (b.b + 0.5 * v.v)))
      |      END), 7) AS DECIMAL(27,7)) AS nlp
      |  FROM bi bg
      |  LEFT JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
      |  LEFT JOIN c1 ON bg.w1 = c1.w1
      |  LEFT JOIN nb ON bg.w2 = nb.w2
      |  CROSS JOIN b CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams, CAST(sum(oov) AS BIGINT) AS oov_bigrams,
      |  round(-(CAST(sum(nlp) AS DOUBLE) / count(*)), 6) AS avg_neg_logp,
      |  round(exp(-(CAST(sum(nlp) AS DOUBLE) / count(*))), 6) AS perplexity
      |FROM scored GROUP BY doc_id""".stripMargin

  /** Gopher/C4-style rule-based quality gate
    * ([[graft.operators.QualityRules]]): five token-stream signals and
    * the conjunctive pass flag, as a zero-shuffle map-only pass — the
    * heuristic filter that runs before any learned scorer.
    */
  def qualityRules(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualityRules.signals(t(s, dir, "documents"), "doc_id", "text")

  val qualityRulesSql: String =
    """WITH norm AS (SELECT doc_id,
      |  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |sig AS (SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_words,
      |  CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mean_len,
      |  CAST(len(list_filter(w, x -> x IN ('the','a','of','to','and','in','is','that','for','it'))) AS DOUBLE) / len(w) AS stop_f,
      |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dist_f,
      |  CAST(list_max(list_transform(list_distinct(w), d -> len(list_filter(w, x -> x = d)))) AS DOUBLE) / len(w) AS top_f
      |FROM norm)
      |SELECT doc_id AS id, n_words,
      |  round(mean_len, 6) AS mean_word_len,
      |  round(stop_f, 6) AS stop_frac,
      |  round(dist_f, 6) AS distinct_frac,
      |  round(top_f, 6) AS top_frac,
      |  (n_words BETWEEN 20 AND 1000 AND mean_len BETWEEN 3.0 AND 6.0
      |    AND stop_f >= 0.03 AND dist_f >= 0.35 AND top_f <= 0.12) AS pass
      |FROM sig""".stripMargin

  /** DSIR importance weights ([[graft.operators.Dsir]]): hashed
    * unigram+bigram log-likelihood ratio of the English slice vs the
    * raw corpus — training is one bucket-bounded aggregation, scoring
    * is a zero-shuffle literal-LUT fold (the plan the driver audits).
    */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = graft.operators.Dsir.train(
      docs, "text", col("lang") === "en", numBuckets = 256)
    graft.operators.Dsir.score(model, docs, "doc_id", "text")
  }

  val dsirWeightsSql: String =
    """WITH norm AS (SELECT doc_id, lang,
      |  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |grams AS (SELECT doc_id, lang,
      |  list_concat(w,
      |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gs
      |  FROM norm),
      |ex AS (SELECT doc_id, lang,
      |  unnest(list_transform(gs,
      |    g -> CAST(('0x' || substr(sha256(g), 1, 8)) AS BIGINT) % 256)) AS f
      |  FROM grams),
      |cnt AS (SELECT f, count(*) AS cr,
      |  count(*) FILTER (WHERE lang = 'en') AS ct FROM ex GROUP BY f),
      |tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM cnt),
      |lut AS (SELECT f,
      |  CAST(round((ln((ct + 0.5) / (nt + 128.0)) - ln((cr + 0.5) / (nr + 128.0))) * 1e7) AS BIGINT) AS lam
      |  FROM cnt CROSS JOIN tot)
      |SELECT e.doc_id AS id, CAST(count(*) AS BIGINT) AS n_feats,
      |  CAST(sum(l.lam) AS BIGINT) AS dsir_weight_e7
      |FROM ex e JOIN lut l ON e.f = l.f
      |GROUP BY e.doc_id""".stripMargin

  /** Duplicated-substring spans ([[graft.operators.SubstringDedup]]):
    * cross-document repeated 8-gram hits (portable 32-bit shingle
    * hashes — never materialized gram strings) merged into maximal
    * spans per document, with duplicated-token coverage —
    * substring-level dedup signal that whole-document fingerprints
    * miss. The oracle replays the identical sha-256-derived hash.
    */
  def dupSpans(s: SparkSession, dir: String): DataFrame =
    SubstringDedup.spans(t(s, dir, "documents"), "doc_id", "text", n = 8)

  val dupSpansSql: String =
    """WITH norm AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt FROM documents),
      |tok AS (
      |  SELECT doc_id, unnest(string_split(nt, ' ')) AS w,
      |    generate_subscripts(string_split(nt, ' '), 1) AS p
      |  FROM norm),
      |ntok AS (SELECT doc_id, length(string_split(nt, ' ')) AS n_tokens FROM norm),
      |grams AS (
      |  SELECT doc_id, p AS pos,
      |    CAST(('0x' || substr(sha256(
      |      w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
      |      lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win || ' ' ||
      |      lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win || ' ' ||
      |      lead(w, 7) OVER win), 1, 8)) AS BIGINT) AS gram
      |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY p)
      |  QUALIFY lead(w, 7) OVER win IS NOT NULL),
      |rep AS (SELECT gram FROM grams GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
      |hit AS (SELECT g.doc_id, g.pos FROM grams g JOIN rep USING (gram)),
      |flag AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(max(pos) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 8,
      |      -9223372036854775808) THEN 1 ELSE 0 END AS new_span
      |  FROM hit),
      |sp AS (
      |  SELECT doc_id, pos, sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
      |  FROM flag),
      |per_span AS (
      |  SELECT doc_id, span, count(*) AS hits, max(pos) + 8 - min(pos) AS span_tokens
      |  FROM sp GROUP BY 1, 2)
      |SELECT p.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(sum(p.hits) AS BIGINT) AS dup_grams,
      |  count(*) AS n_spans,
      |  CAST(sum(p.span_tokens) AS BIGINT) AS dup_tokens,
      |  round(CAST(sum(p.span_tokens) AS DOUBLE) / n.n_tokens, 6) AS dup_coverage
      |FROM per_span p JOIN ntok n USING (doc_id)
      |GROUP BY p.doc_id, n.n_tokens""".stripMargin

  /** Cross-source shingle-overlap matrix
    * ([[graft.operators.SourceOverlap]]): shared 8-gram shingles and
    * Jaccard per source pair — the contamination/provenance audit run
    * before choosing which crawls enter the training mix.
    */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame =
    SourceOverlap.matrix(t(s, dir, "documents"), "source", "text", n = 8)

  val sourceOverlapSql: String =
    """WITH norm AS (
      |  SELECT doc_id, source, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, source, unnest(string_split(nt, ' ')) AS w,
      |    generate_subscripts(string_split(nt, ' '), 1) AS p
      |  FROM norm),
      |grams AS (
      |  SELECT DISTINCT source,
      |    CAST(('0x' || substr(sha256(
      |      w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
      |      lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win || ' ' ||
      |      lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win || ' ' ||
      |      lead(w, 7) OVER win), 1, 8)) AS BIGINT) AS gram
      |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY p)
      |  QUALIFY lead(w, 7) OVER win IS NOT NULL),
      |per_source AS (SELECT source, count(*) AS n FROM grams GROUP BY 1),
      |pairs AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared_shingles
      |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, shared_shingles,
      |  CAST(pa.n AS BIGINT) AS n_a, CAST(pb.n AS BIGINT) AS n_b,
      |  round(CAST(shared_shingles AS DOUBLE) / (pa.n + pb.n - shared_shingles), 6) AS jaccard
      |FROM pairs
      |JOIN per_source pa ON pairs.src_a = pa.source
      |JOIN per_source pb ON pairs.src_b = pb.source""".stripMargin

  /** Collocation mining ([[graft.operators.Collocations]]): token
    * pairs whose co-occurrence lift beats independence — the phrase /
    * tokenizer-merge-candidate pass. Lift is PMI without `ln` (the
    * BM25 odds-idf trade), so every step is a count ratio DuckDB
    * replays exactly.
    */
  def collocations(s: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.mine(
      t(s, dir, "documents"), "text", minCount = 5L, minLift = 1.2)

  val collocationsSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w,
      |    generate_subscripts(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), 1) AS p
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, p, w AS w1,
      |    lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
      |  FROM tok QUALIFY w2 IS NOT NULL),
      |pc AS (SELECT w1, w2, count(*) AS pair_count FROM bi GROUP BY 1, 2),
      |pref AS (SELECT w1, CAST(sum(pair_count) AS BIGINT) AS c1 FROM pc GROUP BY 1),
      |suf AS (SELECT w2, CAST(sum(pair_count) AS BIGINT) AS c2 FROM pc GROUP BY 1),
      |n AS (SELECT CAST(sum(pair_count) AS BIGINT) AS n_bigrams FROM pc)
      |SELECT w1, w2, pair_count, c1, c2,
      |  round((CAST(pair_count AS DOUBLE) * n_bigrams) /
      |        (CAST(c1 AS DOUBLE) * c2), 6) AS lift
      |FROM pc JOIN pref USING (w1) JOIN suf USING (w2) CROSS JOIN n
      |WHERE pair_count >= 5
      |  AND round((CAST(pair_count AS DOUBLE) * n_bigrams) /
      |            (CAST(c1 AS DOUBLE) * c2), 6) >= 1.2""".stripMargin

  /** Training-mix token budget: per (source, lang) document and token
    * totals with corpus share — the numbers a mix-weighting pass
    * ([[graft.operators.Sampling.weightedMix]]) is parameterized with.
    * One group aggregation + a one-row broadcast total.
    */
  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("source"), col("lang"),
      size(split(TextFunctions.normalizeText(col("text")), " "))
        .cast("long").as("__toks"))
    d.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("__toks")).as("n_tokens"))
      .crossJoin(broadcast(d.agg(sum(col("__toks")).as("__total"))))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("__total"), 6)
          .as("token_share"))
  }

  val tokenBudgetSql: String =
    """WITH d AS (
      |  SELECT source, lang,
      |    CAST(length(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
      |      AS BIGINT) AS toks
      |  FROM documents),
      |n AS (SELECT CAST(sum(toks) AS BIGINT) AS total FROM d)
      |SELECT source, lang, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens,
      |  round(CAST(sum(toks) AS DOUBLE) / any_value(n.total), 6) AS token_share
      |FROM d CROSS JOIN n
      |GROUP BY source, lang""".stripMargin

  /** Hard-negative mining
    * ([[graft.operators.SimilaritySearch.hardNegatives]]): nearest
    * different-label neighbors per query vector — contrastive-training
    * batch construction. Brute-force shape with the bounded broadcast
    * probe set, label inequality inside the join condition.
    */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    SimilaritySearch.hardNegatives(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", "label", k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  val hardNegativesSql: String =
    """WITH n AS (SELECT vec_id, label, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, label AS q_label, nv AS qv FROM n WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, label AS c_label, nv AS cv FROM n),
      |scored AS (SELECT query_id, neighbor_id,
      |  round(list_dot_product(qv, cv), 6) AS cos_sim
      |  FROM q, c WHERE query_id <> neighbor_id AND q_label <> c_label),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, rn AS rank FROM ranked WHERE rn <= 5""".stripMargin

  /** Contrastive training-triplet mining: (anchor, positive, negative)
    * rows for embedding-model training — positives are near-duplicate
    * variants above a Jaccard floor (the audited
    * [[Dedup.ngramJaccard]] path), negatives are each anchor's hardest
    * different-label embedding neighbor (the audited
    * [[graft.operators.SimilaritySearch.hardNegatives]] path). The
    * composition is the point: the mined pairs and the embedding
    * space come from two different proven operators, joined on the
    * anchor. At corpus scale the negative side routes through the
    * LSH/IVF probe instead of the bounded brute-force used here.
    */
  def trainingTriplets(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    val pairs = t(s, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000).as("id_b"))
    val pos = Dedup.ngramJaccard(corpus, pairs, "text", "doc_id", MinHashShingle)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a").as("anchor_id"), col("id_b").as("positive_id"),
        col("jaccard").as("pos_jaccard"))
    val e = t(s, dir, "embeddings")
    val anchors = e.join(
      pos.select(col("anchor_id").as("vec_id")).distinct(), "vec_id")
    val neg = SimilaritySearch.hardNegatives(
      anchors, e, "vec_id", "embedding", "label", k = 1)
      .select(col("query_id").as("anchor_id"),
        col("neighbor_id").as("negative_id"),
        col("cos_sim").as("neg_cos_sim"))
    pos.join(neg, "anchor_id")
      .select("anchor_id", "positive_id", "pos_jaccard",
        "negative_id", "neg_cos_sim")
  }

  val trainingTripletsSql: String =
    s"""WITH corpus AS ($nearDupCorpusSql),
       |words AS (SELECT doc_id,
       |  string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
       |  FROM corpus),
       |sets AS (SELECT doc_id,
       |  list_distinct(list_transform(
       |    list_transform(range(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
       |    s -> CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT)))
       |  AS sh FROM words),
       |pr AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
       |  FROM documents WHERE doc_id % 7 = 0),
       |pos AS (SELECT * FROM (
       |  SELECT id_a AS anchor_id, id_b AS positive_id,
       |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |      CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6)
       |      AS pos_jaccard
       |  FROM pr JOIN sets a ON id_a = a.doc_id JOIN sets b ON id_b = b.doc_id)
       |  WHERE pos_jaccard >= 0.5),
       |n AS (SELECT vec_id, label, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                                   CAST(embedding AS DOUBLE[])))) AS nv
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, label AS q_label, nv AS qv FROM n
       |  WHERE vec_id IN (SELECT anchor_id FROM pos)),
       |scored AS (SELECT query_id, vec_id AS neighbor_id,
       |    round(list_dot_product(qv, nv), 6) AS cos_sim
       |  FROM q, n WHERE query_id <> vec_id AND q_label <> label),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
       |SELECT p.anchor_id, p.positive_id, p.pos_jaccard,
       |  r.neighbor_id AS negative_id, r.cos_sim AS neg_cos_sim
       |FROM pos p JOIN ranked r ON r.query_id = p.anchor_id AND r.rn = 1""".stripMargin

  /** Curriculum binning ([[graft.operators.Curriculum.exactBins]]):
    * per-language quality-quantile bins (ntile + percent_rank over the
    * total (score, doc_id) order). The quality score is the engine's
    * [[TextFunctions.qualityScore]], already proven hash-exact against
    * DuckDB by q_text_stats, so the ordering agrees across engines
    * bit-for-bit. The sketch-boundary scale path is spec-gated
    * (CurriculumSpec) against this exact truth.
    */
  def curriculumBins(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curriculum.exactBins(
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("quality_score")),
      "lang", "quality_score", "doc_id", bins = 4)

  val curriculumBinsSql: String =
    """WITH base AS (
      |  SELECT doc_id, lang,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, lang,
      |    round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |      (CASE WHEN awl BETWEEN 3 AND 10 THEN 1.0
      |            WHEN awl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS quality_score
      |  FROM (SELECT *, CASE WHEN n_tok > 0
      |          THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |          ELSE 0.0 END AS awl FROM base))
      |SELECT doc_id, lang, quality_score,
      |  CAST(ntile(4) OVER w AS BIGINT) AS bin,
      |  round(percent_rank() OVER w, 6) AS pct_rank
      |FROM scored
      |WINDOW w AS (PARTITION BY lang ORDER BY quality_score, doc_id)""".stripMargin

  /** Deterministic shard assignment
    * ([[graft.operators.Sharding.shardAssign]]): the training-export
    * global shuffle — shard and in-shard position both derive from the
    * portable sha-256 hash, so DuckDB replays every (shard, pos).
    */
  def shardAssign(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sharding.shardAssign(
      t(s, dir, "documents").select("doc_id", "lang", "source"),
      "doc_id", numShards = 8, seed = 13L)

  val shardAssignSql: String =
    """WITH h AS (SELECT doc_id, lang, source,
      |    CAST(('0x' || substr(sha256('13:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
      |  FROM documents)
      |SELECT doc_id, lang, source, hv % 8 AS shard,
      |  CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS BIGINT) AS shard_pos
      |FROM h""".stripMargin

  /** Per-source quota caps
    * ([[graft.operators.Curation.sourceCapsWindow]]): keep the top-10
    * quality docs per source. The oracle checks the exact window
    * truth; CurationSpec proves the k-bounded map-side formulation
    * ([[graft.operators.Curation.sourceCaps]]) emits identical rows.
    */
  def sourceCaps(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.sourceCapsWindow(
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality_score")),
      "source", "doc_id", "quality_score", cap = 10)

  val sourceCapsSql: String =
    """WITH base AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, source,
      |    round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |      (CASE WHEN awl BETWEEN 3 AND 10 THEN 1.0
      |            WHEN awl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS quality_score
      |  FROM (SELECT *, CASE WHEN n_tok > 0
      |          THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |          ELSE 0.0 END AS awl FROM base))
      |SELECT doc_id, source, quality_score,
      |  CAST(rn AS BIGINT) AS src_rank
      |FROM (SELECT *, row_number() OVER (PARTITION BY source
      |        ORDER BY quality_score DESC, doc_id) AS rn FROM scored)
      |WHERE rn <= 10""".stripMargin

  /** Anti join: customers with no urgent order. Spark plans LEFT ANTI
    * with the orders side aggregated to distinct keys before the join;
    * at scale the filter pushes into the orders scan and the join
    * stays a hash (or broadcast) anti — never a per-row subquery.
    */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
  }

  val antiJoinSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin

  /** Semi join: suppliers with at least one max-quantity deep-discount
    * shipment. LEFT SEMI — the lineitem side never duplicates supplier
    * rows, and the selective predicate pushes to the parquet scan.
    */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val li = t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 50.0 && col("l_discount") > 0.09)
      .select("l_suppkey")
    sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_nationkey")
  }

  val semiJoinSql: String =
    """SELECT s_suppkey, s_name, s_nationkey FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_suppkey = s.s_suppkey
      |    AND l.l_quantity >= 50.0 AND l.l_discount > 0.09)""".stripMargin

  /** Fixed-width histogram of document lengths: a single hash
    * aggregate on the computed bucket — the distribution profile step
    * before length filtering. Bucket arithmetic is plain double
    * division + floor, identical in both engines.
    */
  def lengthHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(least(floor(col("n_chars") / lit(50.0)), lit(11L))
        .cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))

  val lengthHistogramSql: String =
    """SELECT CAST(least(floor(n_chars / 50.0), 11) AS BIGINT) AS bucket,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM documents GROUP BY 1""".stripMargin

  /** Native session windows: Spark's `session_window` (gap-merged
    * event-time windows) as a batch aggregate — the same operator
    * Structured Streaming uses for watermarked session state, so this
    * oracle also pins the streaming sessionization semantics
    * (SessionWindowParitySpec replays the fixture through the
    * stateful streaming form and matches sessions one-for-one). A
    * session's end is last-event + gap; a new session starts when the
    * gap to the previous event is >= 30 min (windows merge only on
    * strict overlap).
    */
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"), col("total_value"))

  val sessionWindowsSql: String =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |x AS (SELECT *, lag(epoch_us(ts)) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
      |y AS (SELECT *, CASE WHEN prev IS NULL OR epoch_us(ts) - prev >= 1800000000
      |        THEN 1 ELSE 0 END AS ns FROM x),
      |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS UNBOUNDED PRECEDING) AS seq FROM y)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM z GROUP BY user_id, seq""".stripMargin

  /** Cohort retention triangle: users bucketed by first-activity week,
    * distinct-active counts per weeks-since-cohort. The classic
    * product-analytics shape: one aggregate for first-seen, a shuffle
    * join back (NOT broadcast — the user dimension grows with the
    * data), one count-distinct aggregate. Week distance is exact day
    * arithmetic (multiples of 7), identical in both engines.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("w"))
    val first = e.groupBy("user_id").agg(min("w").as("cohort"))
    e.join(first, "user_id")
      .groupBy(col("cohort"),
        (datediff(col("w"), col("cohort")) / lit(7)).cast("long")
          .as("weeks_since"))
      .agg(count_distinct(col("user_id")).as("active_users"))
  }

  val cohortRetentionSql: String =
    """WITH e AS (SELECT user_id,
      |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS w FROM events),
      |f AS (SELECT user_id, min(w) AS cohort FROM e GROUP BY 1)
      |SELECT cohort,
      |  CAST(datediff('day', cohort, w) / 7 AS BIGINT) AS weeks_since,
      |  count(DISTINCT e.user_id) AS active_users
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  /** Cube aggregation: all 2^2 grouping combinations in one pass
    * (rollup and grouping-sets siblings are q_agg_rollup /
    * q_agg_grouping_sets). `grouping_id` disambiguates real NULL keys
    * from subtotal rows.
    */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid"))

  val aggCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n,
      |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** INTERSECT / EXCEPT set semantics in one result: nations with
    * high-balance customers split by whether they also field
    * high-balance suppliers. Spark plans both as aggregate-then-join
    * (left-semi / left-anti over distincts) — no sort, broadcast-able
    * sides.
    */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("nationkey")).distinct()
    val sup = t(s, dir, "supplier").filter(col("s_acctbal") > 9000)
      .select(col("s_nationkey").as("nationkey")).distinct()
    c.intersect(sup).withColumn("set_op", lit("both"))
      .unionByName(c.except(sup).withColumn("set_op", lit("customer_only")))
  }

  val setOpsSql: String =
    """WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |  WHERE c_acctbal > 9000),
      |s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier
      |  WHERE s_acctbal > 9000)
      |SELECT nationkey, 'both' AS set_op FROM (SELECT * FROM c INTERSECT SELECT * FROM s)
      |UNION ALL
      |SELECT nationkey, 'customer_only' FROM (SELECT * FROM c EXCEPT SELECT * FROM s)""".stripMargin

  /** Exact-size per-stratum sampling
    * ([[graft.operators.Sampling.exactSample]]): exactly 20 docs per
    * language — the n smallest portable hashes win, so DuckDB replays
    * the membership row-for-row (unlike Bernoulli forms, the size is
    * a guarantee, which is what eval-set construction needs).
    */
  def sampleExact(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.exactSample(
      t(s, dir, "documents").select("doc_id", "lang", "source"),
      "lang", "doc_id", n = 20, seed = 5L)

  val sampleExactSql: String =
    """WITH h AS (SELECT doc_id, lang, source,
      |    CAST(('0x' || substr(sha256('5:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      / 4294967296.0 AS u
      |  FROM documents)
      |SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS sample_rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
      |  FROM h)
      |WHERE rn <= 20""".stripMargin

  /** Deterministic train/val/test split
    * ([[graft.operators.Sampling.split]]): disjoint hash-unit ranges,
    * pure projection — zero shuffles, and a re-run can never migrate a
    * row across splits. Fractions are binary-exact (0.75/0.125/0.125)
    * so the cut points have one representation in both engines.
    */
  def trainTestSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.split(
      t(s, dir, "documents").select("doc_id", "lang"),
      "doc_id", seed = 11L,
      fractions = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))

  val trainTestSplitSql: String =
    """SELECT doc_id, lang,
      |  CASE WHEN u < 0.75 THEN 'train'
      |       WHEN u < 0.875 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (SELECT doc_id, lang,
      |  CAST(('0x' || substr(sha256('11:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |    / 4294967296.0 AS u
      |FROM documents)""".stripMargin

  /** Global top-N without a global sort: `orderBy + limit` plans as
    * TakeOrderedAndProject — each partition keeps its local top-100,
    * only those k·partitions rows converge — so "best N docs in the
    * corpus" never total-sorts 100 TB. The (score desc, id) order is
    * total, so the selected SET is deterministic and oracle-checkable
    * (the driver compare is order-insensitive).
    */
  def globalTopN(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextFunctions.qualityScore(col("text")).as("quality_score"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .limit(100)

  val globalTopNSql: String =
    """WITH base AS (
      |  SELECT doc_id, lang,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM documents)
      |SELECT doc_id, lang,
      |  round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |    (CASE WHEN awl BETWEEN 3 AND 10 THEN 1.0
      |          WHEN awl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS quality_score
      |FROM (SELECT *, CASE WHEN n_tok > 0
      |        THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |        ELSE 0.0 END AS awl FROM base)
      |ORDER BY quality_score DESC, doc_id LIMIT 100""".stripMargin

  /** Funnel attribution (view → first purchase within the hour): the
    * as-of join run FORWARD by negating the time axis — "latest right
    * ≤ left" on -t is "earliest right ≥ left" on t, so the existing
    * operator (one exchange per side, no self-join) answers the
    * conversion question as composed. Delay stays in exact integer
    * microseconds; the window test is a post-filter.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"),
        col("ts").as("view_ts"), (-unix_micros(col("ts"))).as("nts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), (-unix_micros(col("ts"))).as("p_nts"))
    graft.operators.AsOfJoin.asOfJoin(
      views, purchases,
      keyCols = Seq("user_id"),
      leftTimeCol = "nts", rightTimeCol = "p_nts",
      rightValueCols = Seq("p_nts"),
      strict = true)
      .select(col("event_id"), col("user_id"), col("view_ts"),
        (-col("p_nts") - unix_micros(col("view_ts"))).as("delay_us"),
        (col("p_nts").isNotNull &&
          -col("p_nts") - unix_micros(col("view_ts")) <= 3600000000L)
          .as("converted_1h"))
  }

  val funnelSql: String =
    """WITH v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT v.event_id, v.user_id, v.ts AS view_ts,
      |  epoch_us((SELECT min(p.ts) FROM p
      |    WHERE p.user_id = v.user_id AND p.ts > v.ts)) - epoch_us(v.ts)
      |    AS delay_us,
      |  coalesce(epoch_us((SELECT min(p.ts) FROM p
      |    WHERE p.user_id = v.user_id AND p.ts > v.ts)) - epoch_us(v.ts)
      |    <= 3600000000, false) AS converted_1h
      |FROM v""".stripMargin

  /** Per-group z-score outliers with CROSS-ENGINE-DETERMINISTIC
    * variance: l_quantity is integer-valued, so sum and sum-of-squares
    * are exact longs at any aggregation order — the z-test then runs
    * in double with the identical operation order on both engines,
    * where a floating stddev_samp would drift by merge order and flap
    * the hash oracle. One stats aggregate broadcast back over one
    * scan; the flag is a pure projection.
    */
  def groupOutliers(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity").cast("long").as("q"))
    val stats = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"), sum("q").as("s"), sum(col("q") * col("q")).as("ss"))
    // z² as (n·q - s)² > k²·n·(n·ss - s²)/(n-1), k = 1.6. The SUMS are
    // exact longs; the products run in DOUBLE from the first factor —
    // long products would overflow past ~3e9 rows per group (ANSI
    // throw), and the oracle must replay the identical IEEE operation
    // order, so both sides spell the same double formula.
    val nD = col("n").cast("double")
    val dev = nD * col("q") - col("s")
    li.join(broadcast(stats), "l_returnflag")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("q"),
        (dev * dev >
          // k² spelled as the literal 2.56 on BOTH sides: Scala's
          // 1.6*1.6 rounds to a different double than DuckDB's exact
          // DECIMAL product — a 1-ulp constant gap that could flap
          // boundary rows
          lit(2.56) / (nD - 1) * col("n") *
            (nD * col("ss") - col("s").cast("double") * col("s"))).as("is_outlier"))
      .filter(col("is_outlier"))
  }

  val groupOutliersSql: String =
    """WITH li AS (SELECT l_orderkey, l_linenumber, l_returnflag,
      |    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
      |st AS (SELECT l_returnflag, count(*) AS n, sum(q) AS s, sum(q * q) AS ss
      |  FROM li GROUP BY 1)
      |SELECT l_orderkey, l_linenumber, li.l_returnflag, q, true AS is_outlier
      |FROM li JOIN st ON li.l_returnflag = st.l_returnflag
      |WHERE (CAST(n AS DOUBLE) * q - s) * (CAST(n AS DOUBLE) * q - s) >
      |  2.56 / (CAST(n AS DOUBLE) - 1) * n *
      |    (CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)""".stripMargin

  /** One BPE trainer step: count adjacent character pairs inside words
    * corpus-wide, emit the top merge candidates — the inner loop of
    * byte-pair/sentencepiece vocabulary training. Pair extraction is a
    * per-row codegen'd array transform (no join, no per-char explode
    * of the corpus — one explode per word pair list); the top-20 is
    * TakeOrdered on the aggregated counts, never a global sort. Both
    * engines index substrings by codepoint, so CJK text counts
    * identically.
    */
  def bpeMerges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(TextFunctions.normalizeText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)

  val bpeMergesSql: String =
    """WITH w AS (SELECT unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |p AS (SELECT unnest(list_transform(range(1, length(w)),
      |    i -> substr(w, i, 2))) AS pair
      |  FROM w WHERE length(w) >= 2)
      |SELECT pair, count(*) AS cnt FROM p
      |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""".stripMargin

  /** Edit-distance verification of near-dup pairs: levenshtein between
    * each planted variant and its original — the character-level
    * complement to set-based Jaccard (catches reorder-free edits that
    * shingles blur). Restricted to pure-ASCII texts because DuckDB's
    * levenshtein counts BYTES where Spark counts codepoints — the
    * octet_length == length predicate is the same test in both
    * engines. Pair workload shape: id join, per-pair O(n·m) DP kernel
    * codegen'd per row.
    */
  def editDistancePairs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .filter(octet_length(col("text")) === length(col("text")))
    val orig = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("id_a"), col("text").as("text_a"))
    val variant = orig.select(
      (col("id_a") + 1000000).as("id_b"),
      expr("substr(text_a, 1, greatest(length(text_a) - 15, 20))").as("text_b"),
      col("id_a"))
    orig.join(variant, "id_a")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("text_a"), col("text_b")).cast("long").as("edit_dist"),
        round(lit(1.0) - levenshtein(col("text_a"), col("text_b")) /
          greatest(length(col("text_a")), length(col("text_b"))).cast("double"), 6)
          .as("edit_sim"))
  }

  val editDistancePairsSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents
      |  WHERE strlen(text) = length(text)),
      |o AS (SELECT doc_id AS id_a, text AS text_a FROM d WHERE doc_id % 7 = 0),
      |v AS (SELECT id_a, id_a + 1000000 AS id_b,
      |  substr(text_a, 1, greatest(length(text_a) - 15, 20)) AS text_b FROM o)
      |SELECT o.id_a, v.id_b,
      |  levenshtein(text_a, text_b) AS edit_dist,
      |  round(1.0 - levenshtein(text_a, text_b) /
      |    CAST(greatest(length(text_a), length(text_b)) AS DOUBLE), 6) AS edit_sim
      |FROM o JOIN v USING (id_a)""".stripMargin

  /** Distribution-drift monitor: per-source chi-square of the
    * doc-length histogram against the corpus-wide distribution — the
    * "did source X change shape this crawl" check. KL/PSI need `ln`
    * (engine-dependent rounding); chi-square is rational in the exact
    * integer counts, and the per-source sum folds through
    * DECIMAL(27,10) so it is order-independent — the same trade the
    * BM25 odds-idf makes. Zero-observed buckets contribute their full
    * expected mass (a source missing a bucket IS drift), via a
    * source × bucket cross of two tiny aggregates.
    */
  def distributionDrift(s: SparkSession, dir: String): DataFrame = {
    val d = graft.operators.Drift.lengthBuckets(
      t(s, dir, "documents"), "source", "n_chars")
    graft.operators.Drift.chi2FromCounts(
      d.groupBy("source", "bucket").agg(count(lit(1)).as("o")))
  }

  val distributionDriftSql: String =
    """WITH d AS (SELECT source,
      |    CAST(least(floor(n_chars / 50.0), 11) AS BIGINT) AS bucket
      |  FROM documents),
      |obs AS (SELECT source, bucket, count(*) AS o FROM d GROUP BY 1, 2),
      |st AS (SELECT source, count(*) AS src_n FROM d GROUP BY 1),
      |bk AS (SELECT bucket, count(*) AS bucket_n FROM d GROUP BY 1),
      |tot AS (SELECT count(*) AS all_n FROM d),
      |grid AS (SELECT source, src_n, bucket, bucket_n, all_n FROM st, bk, tot),
      |terms AS (SELECT g.source, g.src_n,
      |    CAST((coalesce(o, 0) - e) * (coalesce(o, 0) - e) / e AS DECIMAL(27,10)) AS term
      |  FROM (SELECT *,
      |      CAST(src_n AS DOUBLE) * bucket_n / all_n AS e FROM grid) g
      |  LEFT JOIN obs ON g.source = obs.source AND g.bucket = obs.bucket)
      |SELECT source, max(src_n) AS n_docs,
      |  round(CAST(sum(term) AS DOUBLE), 6) AS chi2
      |FROM terms GROUP BY 1""".stripMargin

  /** Population Stability Index companion of q_distribution_drift
    * ([[graft.operators.Drift.psiFromCounts]]): the banded drift score
    * model-risk dashboards alarm on, over the identical count table.
    * `ln` is made engine-exact by the perplexity family's
    * round-to-7dp-then-decimal-fold discipline.
    */
  def psiDrift(s: SparkSession, dir: String): DataFrame = {
    val d = graft.operators.Drift.lengthBuckets(
      t(s, dir, "documents"), "source", "n_chars")
    graft.operators.Drift.psiFromCounts(
      d.groupBy("source", "bucket").agg(count(lit(1)).as("o")))
  }

  val psiDriftSql: String =
    """WITH d AS (SELECT source,
      |    CAST(least(floor(n_chars / 50.0), 11) AS BIGINT) AS bucket
      |  FROM documents),
      |obs AS (SELECT source, bucket, count(*) AS o FROM d GROUP BY 1, 2),
      |st AS (SELECT source, count(*) AS src_n FROM d GROUP BY 1),
      |bk AS (SELECT bucket, count(*) AS bucket_n FROM d GROUP BY 1),
      |tot AS (SELECT count(*) AS all_n FROM d),
      |grid AS (SELECT source, src_n, bucket, bucket_n, all_n FROM st, bk, tot),
      |probs AS (SELECT g.source, g.src_n,
      |    (coalesce(o, 0) + 0.5) / (g.src_n + 6.0) AS p_src,
      |    (g.bucket_n + 0.5) / (g.all_n + 6.0) AS p_all
      |  FROM grid g
      |  LEFT JOIN obs ON g.source = obs.source AND g.bucket = obs.bucket),
      |terms AS (SELECT source, src_n,
      |    CAST(round((p_src - p_all) * ln(p_src / p_all), 7) AS DECIMAL(27,7)) AS term
      |  FROM probs)
      |SELECT source, max(src_n) AS n_docs,
      |  round(CAST(sum(term) AS DOUBLE), 6) AS psi
      |FROM terms GROUP BY 1""".stripMargin

  /** Asymmetric containment on the known (original, prefix-variant)
    * pairs ([[graft.operators.Dedup.ngramContainment]]): the variant
    * is a prefix of the original, so cont_b ≈ 1 while Jaccard is
    * diluted by the original's extra tail — the quote/subset signal
    * set-symmetric measures blur.
    */
  def containmentPairs(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    val pairs = t(s, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000).as("id_b"))
    graft.operators.Dedup.ngramContainment(
      corpus, pairs, "text", "doc_id", MinHashShingle)
  }

  val containmentPairsSql: String =
    s"""WITH corpus AS ($nearDupCorpusSql),
       |words AS (SELECT doc_id,
       |  string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
       |  FROM corpus),
       |sets AS (SELECT doc_id,
       |  list_distinct(list_transform(
       |    list_transform(range(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
       |    s -> CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT)))
       |  AS sh FROM words),
       |pairs AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
       |  FROM documents WHERE doc_id % 7 = 0)
       |SELECT id_a, id_b,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       |  CAST(len(a.sh) AS BIGINT) AS size_a,
       |  CAST(len(b.sh) AS BIGINT) AS size_b,
       |  CASE WHEN len(a.sh) > 0 THEN round(
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6)
       |    ELSE 0.0 END AS cont_a,
       |  CASE WHEN len(b.sh) > 0 THEN round(
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh), 6)
       |    ELSE 0.0 END AS cont_b
       |FROM pairs JOIN sets a ON id_a = a.doc_id JOIN sets b ON id_b = b.doc_id""".stripMargin

  // ------------------------------------------------- graph analytics (r7)

  /** The shared graph fixture: the co-order part graph — parts linked
    * when some order contains both. Canonical by construction
    * (`a < b` + distinct), ~116k edges at sf0.01. The self-join's two
    * sides are the same subplan, so the scan and its exchange are
    * planned once and reused. (An array-fold build — collect each
    * order's part set, explode its pairs — was tried and REVERTED:
    * isolated quiet-machine benches showed it 2× slower end-to-end on
    * the walk workload, the object-heavy collect_set + nested-array
    * explode losing to the codegen'd sort-merge self-join.)
    */
  private def coOrderEdges(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
    li.as("x")
      .join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct()
  }

  private val coOrderEdgesSql: String =
    """  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey""".stripMargin

  /** Per-node triangle counts over the co-order graph
    * ([[graft.operators.Graph.triangles]], degree-oriented — wedge
    * width O(sqrt E), hub-safe). Integer-exact, so the oracle is the
    * same construction replayed in SQL.
    */
  def graphTriangles(s: SparkSession, dir: String): DataFrame =
    Graph.triangles(coOrderEdges(s, dir), canonical = true)

  val graphTrianglesSql: String =
    s"""WITH canon AS (
      |$coOrderEdgesSql),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT a AS node FROM canon UNION ALL SELECT b FROM canon)
      |  GROUP BY node),
      |oriented AS (
      |  SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END AS src,
      |         CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END AS dst,
      |         CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN db.deg ELSE da.deg END AS ddeg
      |  FROM canon e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
      |wedge AS (
      |  SELECT CASE WHEN (o1.ddeg, o1.dst) < (o2.ddeg, o2.dst) THEN o1.dst ELSE o2.dst END AS v,
      |         CASE WHEN (o1.ddeg, o1.dst) < (o2.ddeg, o2.dst) THEN o2.dst ELSE o1.dst END AS w,
      |         o1.src AS u
      |  FROM oriented o1 JOIN oriented o2 ON o1.src = o2.src AND o1.dst < o2.dst),
      |tri AS (
      |  SELECT wg.u, wg.v, wg.w FROM wedge wg
      |  JOIN oriented o ON o.src = wg.v AND o.dst = wg.w)
      |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
      |  SELECT u AS node FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
      |GROUP BY node""".stripMargin

  /** 64-core of the co-order graph ([[graft.operators.Graph.kcore]]).
    * Peeling is monotone and synchronous, so "at most 8 rounds" is
    * engine-portable whether or not the fixpoint lands inside the
    * budget: the oracle's recursion runs the SAME 8 peels (a converged
    * set just re-emits itself).
    */
  def graphKcore(s: SparkSession, dir: String): DataFrame =
    Graph.kcore(coOrderEdges(s, dir), k = 64, maxRounds = 8, canonical = true)

  val graphKcoreSql: String =
    s"""WITH RECURSIVE canon AS (
      |$coOrderEdgesSql),
      |sym AS (SELECT a AS src, b AS dst FROM canon
      |        UNION ALL SELECT b, a FROM canon),
      |alive(i, src, dst) AS (
      |  SELECT 0, src, dst FROM sym
      |  UNION ALL
      |  SELECT i + 1, src, dst FROM (
      |    SELECT i, src, dst,
      |      count(*) OVER (PARTITION BY i, src) AS dsrc,
      |      count(*) OVER (PARTITION BY i, dst) AS ddst
      |    FROM alive WHERE i < 8)
      |  WHERE dsrc >= 64 AND ddst >= 64)
      |SELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree
      |FROM alive WHERE i = 8 GROUP BY src""".stripMargin

  /** 4 iterations of deterministic fixed-point PageRank over the
    * co-order graph ([[graft.operators.Graph.pageRank]]): all-Long
    * floor arithmetic, so ranks are bit-identical across engines —
    * no floating-point fold order anywhere. The oracle unrolls the
    * same four synchronous updates.
    */
  def graphPageRank(s: SparkSession, dir: String): DataFrame =
    Graph.pageRank(coOrderEdges(s, dir), iters = 4, canonical = true)

  val graphPageRankSql: String = {
    val step = (i: Int, j: Int) =>
      s"""r$j AS (
        |  SELECT d.node, d.deg,
        |    CAST(150000000000 + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN (
        |    SELECT e.dst, sum(p.r // p.deg) AS c
        |    FROM sym e JOIN r$i p ON p.node = e.src GROUP BY e.dst) s
        |  ON s.dst = d.node)""".stripMargin
    s"""WITH canon AS (
      |$coOrderEdgesSql),
      |sym AS (SELECT a AS src, b AS dst FROM canon
      |        UNION ALL SELECT b, a FROM canon),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
      |        FROM sym GROUP BY src),
      |r0 AS (SELECT node, deg, CAST(1000000000000 AS BIGINT) AS r FROM deg),
      |${(0 until 4).map(i => step(i, i + 1)).mkString(",\n")}
      |SELECT node, r AS rank FROM r4""".stripMargin
  }

  /** Deterministic random walks over the co-order graph
    * ([[graft.operators.Graph.randomWalks]]): 4 hops from every node,
    * next hop = min universal-hash score over the neighbors, seeded by
    * one sha per (walk, step) — a map-side `min`, no window, no
    * indexed adjacency. Bit-identical on any engine; the oracle
    * unrolls the same four hops.
    */
  def graphWalks(s: SparkSession, dir: String): DataFrame =
    Graph.randomWalks(coOrderEdges(s, dir), steps = 4, seed = 7L, canonical = true)

  val graphWalksSql: String = {
    val step = (i: Int, j: Int) =>
      s"""w$j AS (
        |  SELECT walk_id,
        |    CAST(min(sc * 4294967296 + e.dst) % 4294967296 AS BIGINT) AS cur,
        |    max(path) || ',' ||
        |      CAST(CAST(min(sc * 4294967296 + e.dst) % 4294967296 AS BIGINT) AS VARCHAR) AS path
        |  FROM (
        |    SELECT w.walk_id, w.path, e.dst,
        |      ((CAST(('0x' || substr(sha256(
        |          '7:' || CAST(w.walk_id AS VARCHAR) || ':$j'),
        |          1, 7)) AS BIGINT) + 1) * (e.dst + 40503)) % 2147483647 AS sc
        |    FROM w$i w JOIN sym e ON e.src = w.cur) e
        |  GROUP BY walk_id)""".stripMargin
    s"""WITH canon AS (
      |$coOrderEdgesSql),
      |sym AS (SELECT a AS src, b AS dst FROM canon
      |        UNION ALL SELECT b, a FROM canon),
      |w0 AS (SELECT DISTINCT src AS walk_id, src AS cur,
      |         CAST(src AS VARCHAR) AS path FROM sym),
      |${(0 until 4).map(i => step(i, i + 1)).mkString(",\n")}
      |SELECT walk_id, path FROM w4""".stripMargin
  }

  // ------------------------------------------- index & profiling (r7)

  /** Inverted index over the documents table
    * ([[graft.operators.InvertedIndex]]): per-term df/cf and a
    * 20-bounded posting list folded in a k-bounded map-side-combining
    * aggregator — never a per-term window, so a stop-word term costs k
    * ids per partition on the wire instead of its whole posting list
    * in one task.
    */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    InvertedIndex.build(t(s, dir, "documents"), "doc_id", "text",
      maxPostings = 20, minDf = 5L)

  val invertedIndexSql: String =
    """WITH tf AS (
      |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id,
      |      unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
      |    FROM documents)
      |  WHERE term <> '' GROUP BY term, doc_id),
      |topd AS (
      |  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      |  FROM (SELECT term, doc_id,
      |          row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM tf)
      |  WHERE rn <= 20 GROUP BY term)
      |SELECT s.term, s.df, s.cf, topd.postings
      |FROM (SELECT term, CAST(count(*) AS BIGINT) AS df,
      |        CAST(sum(tf) AS BIGINT) AS cf
      |      FROM tf GROUP BY term HAVING count(*) >= 5) s
      |JOIN topd ON topd.term = s.term""".stripMargin

  /** Exact single-pass profile of 7 lineitem columns
    * ([[graft.operators.Profile.profile]]) — long format, typed
    * min/max cast to string after aggregation. The sketch variant
    * (no Expand, the 100 TB default) is spec-gated against this one.
    */
  def tableProfile(s: SparkSession, dir: String): DataFrame =
    Profile.profile(t(s, dir, "lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus", "l_shipdate"))

  val tableProfileSql: String = {
    val one = (c: String) =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
        |  CAST(min($c) AS VARCHAR) AS min_val,
        |  CAST(max($c) AS VARCHAR) AS max_val FROM lineitem""".stripMargin
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .map(one).mkString("\nUNION ALL\n")
  }

  /** Snapshot reconciliation ([[graft.operators.SnapshotDiff]]): the
    * per-customer current-order view at two time boundaries, diffed —
    * one full-outer sort-merge join, drift-proportional output. The
    * window choice ([1995-,) vs (-,1997)) exercises all three change
    * classes: customers active only before 1995 are `removed`, only
    * from 1997 `added`, and anyone whose latest order moved between
    * the windows is `changed` with the moved columns named.
    */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        "o_orderstatus")
    def latest(df: DataFrame): DataFrame = df
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val old = latest(o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
    val cur = latest(o.filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")))
    graft.operators.SnapshotDiff.diff(old, cur, Seq("o_custkey"))
  }

  val snapshotDiffSql: String =
    """WITH old AS (SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, o_orderstatus,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01') WHERE rn = 1),
      |cur AS (SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, o_orderstatus,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01') WHERE rn = 1),
      |j AS (SELECT coalesce(o.o_custkey, c.o_custkey) AS o_custkey,
      |  CASE WHEN o.o_custkey IS NULL THEN 'added'
      |       WHEN c.o_custkey IS NULL THEN 'removed'
      |       WHEN o.o_orderkey IS DISTINCT FROM c.o_orderkey
      |         OR o.o_orderdate IS DISTINCT FROM c.o_orderdate
      |         OR o.o_totalprice IS DISTINCT FROM c.o_totalprice
      |         OR o.o_orderstatus IS DISTINCT FROM c.o_orderstatus
      |       THEN 'changed' END AS change_type,
      |  concat_ws(',',
      |    CASE WHEN o.o_orderkey IS DISTINCT FROM c.o_orderkey THEN 'o_orderkey' END,
      |    CASE WHEN o.o_orderdate IS DISTINCT FROM c.o_orderdate THEN 'o_orderdate' END,
      |    CASE WHEN o.o_totalprice IS DISTINCT FROM c.o_totalprice THEN 'o_totalprice' END,
      |    CASE WHEN o.o_orderstatus IS DISTINCT FROM c.o_orderstatus THEN 'o_orderstatus' END)
      |    AS cols
      |  FROM old o FULL JOIN cur c ON o.o_custkey = c.o_custkey)
      |SELECT o_custkey, change_type,
      |  CASE WHEN change_type = 'changed' THEN cols ELSE '' END AS changed_cols
      |FROM j WHERE change_type IS NOT NULL""".stripMargin

  /** One-pass Pearson correlation matrix over the lineitem pricing
    * columns — the repo's exact-integer-moment pattern
    * ([[graft.operators.Regression]]): every sum is a DECIMAL fold of
    * cents-scaled integers (order-independent, engine-exact), the
    * correlation formula runs in doubles with a pinned op order, and
    * the 6 pairs unpivot from the single aggregate row. Correlation is
    * scale-invariant, so the cents grid drops out mathematically; both
    * engines see identical doubles.
    */
  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def fp(c: String) = round(col(c) * 100L, 0).cast("decimal(38,0)")
    val sums =
      Seq(count(lit(1)).as("n")) ++
        cols.map(c => sum(fp(c)).as(s"s_$c")) ++
        (for { i <- cols.indices; j <- i until cols.length } yield
          sum(fp(cols(i)) * fp(cols(j))).as(s"p_${cols(i)}_${cols(j)}"))
    val agg = t(s, dir, "lineitem").agg(sums.head, sums.tail: _*)
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.length } yield {
      val (a, b) = (cols(i), cols(j))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        round((n * d(s"p_${a}_$b") - d(s"s_$a") * d(s"s_$b")) /
          sqrt(n * d(s"p_${a}_$a") - d(s"s_$a") * d(s"s_$a")) /
          sqrt(n * d(s"p_${b}_$b") - d(s"s_$b") * d(s"s_$b")), 6).as("corr"))
    }
    agg.select(explode(array(pairs: _*)).as("t"))
      .select(col("t.col_a").as("col_a"), col("t.col_b").as("col_b"),
        col("t.corr").as("corr"))
  }

  val corrMatrixSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val fp = (c: String) => s"CAST(round($c * 100, 0) AS HUGEINT)"
    val sums =
      (Seq("CAST(count(*) AS BIGINT) AS n") ++
        cols.map(c => s"sum(${fp(c)}) AS s_$c") ++
        (for { i <- cols.indices; j <- i until cols.length } yield
          s"sum(${fp(cols(i))} * ${fp(cols(j))}) AS p_${cols(i)}_${cols(j)}"))
        .mkString(",\n  ")
    val d = (c: String) => s"CAST($c AS DOUBLE)"
    val pairRows = (for { i <- cols.indices; j <- i + 1 until cols.length } yield {
      val (a, b) = (cols(i), cols(j))
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
        |  round((${d("n")} * ${d(s"p_${a}_$b")} - ${d(s"s_$a")} * ${d(s"s_$b")}) /
        |    sqrt(${d("n")} * ${d(s"p_${a}_$a")} - ${d(s"s_$a")} * ${d(s"s_$a")}) /
        |    sqrt(${d("n")} * ${d(s"p_${b}_$b")} - ${d(s"s_$b")} * ${d(s"s_$b")}), 6)
        |    + 0.0 AS corr FROM m""".stripMargin
    }).mkString("\nUNION ALL\n")
    s"WITH m AS (SELECT\n  $sums\nFROM lineitem)\n$pairRows"
  }

  /** In-plan 2-feature OLS ([[graft.operators.Regression.fit2Df]]):
    * extendedprice regressed on quantity and discount — one exact
    * decimal moment pass, Cramer's rule in pinned-order doubles, R²
    * by the algebraic identity. The DuckDB oracle replays the solve
    * token for token.
    */
  def olsCoeffs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Regression.fit2Df(
      t(s, dir, "lineitem"), "l_extendedprice", "l_quantity", "l_discount")

  val olsCoeffsSql: String =
    """WITH m AS (SELECT
      |  CAST(count(*) AS BIGINT) AS n,
      |  sum(CAST(round(l_quantity * 100, 0) AS HUGEINT)) AS s1,
      |  sum(CAST(round(l_discount * 100, 0) AS HUGEINT)) AS s2,
      |  sum(CAST(round(l_quantity * 100, 0) AS HUGEINT) * CAST(round(l_quantity * 100, 0) AS HUGEINT)) AS s11,
      |  sum(CAST(round(l_quantity * 100, 0) AS HUGEINT) * CAST(round(l_discount * 100, 0) AS HUGEINT)) AS s12,
      |  sum(CAST(round(l_discount * 100, 0) AS HUGEINT) * CAST(round(l_discount * 100, 0) AS HUGEINT)) AS s22,
      |  sum(CAST(round(l_quantity * 100, 0) AS HUGEINT) * CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS s1y,
      |  sum(CAST(round(l_discount * 100, 0) AS HUGEINT) * CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS s2y,
      |  sum(CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS sy,
      |  sum(CAST(round(l_extendedprice * 100, 0) AS HUGEINT) * CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS syy
      |FROM lineitem),
      |v AS (SELECT CAST(n AS DOUBLE) AS n,
      |  CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
      |  CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12, CAST(s22 AS DOUBLE) AS s22,
      |  CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y,
      |  CAST(sy AS DOUBLE) AS sy, CAST(syy AS DOUBLE) AS syy FROM m),
      |b AS (SELECT n, sy, s1y, s2y, syy,
      |  (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y))
      |    / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)) AS b0s,
      |  (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2))
      |    / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)) AS b1s,
      |  (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2))
      |    / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)) AS b2s
      |  FROM v)
      |SELECT 'intercept' AS stat, round(b0s / 100, 6) + 0.0 AS value FROM b
      |UNION ALL SELECT 'l_quantity', round(b1s, 6) + 0.0 FROM b
      |UNION ALL SELECT 'l_discount', round(b2s, 6) + 0.0 FROM b
      |UNION ALL SELECT 'r2',
      |  round(1.0 - (syy - (b0s * sy + b1s * s1y + b2s * s2y)) / (syy - sy * sy / n), 6) + 0.0 FROM b""".stripMargin

  /** PCA moment pass ([[graft.operators.Pca.covarianceDf]]): the
    * sample covariance of the first 16 embedding dimensions on the
    * 2^20 quantization grid — ONE [[graft.plans.VectorSumLong]]
    * aggregation (a 152-long vector per partition crosses the
    * exchange, never a row), exploded back to (i, j, cov). The
    * eigensolve/projection on top is spec-gated (PcaSpec); this query
    * pins the whole data-touching pass to the DuckDB oracle. (The
    * oracle adds `+ 0.0` after rounding: Spark's round goes through
    * BigDecimal, which has no signed zero, so a tiny negative entry
    * is +0.0 in Spark and −0.0 raw in DuckDB — the add normalizes
    * only that value, every other double is unchanged. Same guard on
    * the corr/OLS oracles.)
    */
  def pcaCov(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pca.covarianceDf(t(s, dir, "embeddings"), "embedding", 16)

  val pcaCovSql: String =
    """WITH q AS (SELECT list_transform(embedding[1:16],
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0, 0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |lin AS (SELECT i.i AS i, sum(qv[i.i]) AS s
      |  FROM q, range(1, 17) i(i) GROUP BY 1),
      |quad AS (SELECT a.i AS i, b.j AS j, sum(qv[a.i] * qv[b.j]) AS p
      |  FROM q, range(1, 17) a(i), range(1, 17) b(j) WHERE b.j >= a.i
      |  GROUP BY 1, 2),
      |nn AS (SELECT count(*) AS n FROM q)
      |SELECT CAST(quad.i AS BIGINT) AS i, CAST(quad.j AS BIGINT) AS j,
      |  round((CAST(quad.p AS DOUBLE) -
      |      CAST(li.s AS DOUBLE) * CAST(lj.s AS DOUBLE) / n) /
      |    (n - 1) / 1099511627776.0, 6) + 0.0 AS cov
      |FROM quad
      |JOIN lin li ON li.i = quad.i
      |JOIN lin lj ON lj.i = quad.j
      |CROSS JOIN nn""".stripMargin

  /** Robust per-group outlier stats: median / MAD (median absolute
    * deviation) per return flag, plus the count beyond 3×MAD — the
    * outlier gate that survives heavy tails where z-scores
    * (q_group_outliers) saturate. Exact medians ride the proven
    * `percentile` ≡ DuckDB `quantile_cont` parity
    * (q_group_percentiles); deviations are exact double differences of
    * 2-dp values, so the second median interpolates identical inputs.
    * Three staged passes by necessity (median → deviations → gate) —
    * group stats travel back via broadcast, never a row shuffle; the
    * sketch percentile (q_group_percentiles_approx) is the documented
    * single-digit-pass scale variant.
    */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice")
    val med = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("median_price"))
    val dev = li.join(broadcast(med), "l_returnflag")
      .withColumn("__dev", abs(col("l_extendedprice") - col("median_price")))
    val mad = dev.groupBy("l_returnflag")
      .agg(expr("percentile(__dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        round(first(col("median_price")), 6).as("median_price"),
        round(first(col("mad")), 6).as("mad"),
        sum(when(col("__dev") > lit(3.0) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  val madOutliersSql: String =
    """WITH med AS (SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.5) AS median_price
      |  FROM lineitem GROUP BY 1),
      |dev AS (SELECT li.l_returnflag, median_price,
      |    abs(l_extendedprice - median_price) AS d
      |  FROM lineitem li JOIN med ON li.l_returnflag = med.l_returnflag),
      |mad AS (SELECT l_returnflag, quantile_cont(d, 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT dev.l_returnflag,
      |  round(any_value(dev.median_price), 6) AS median_price,
      |  round(any_value(mad.mad), 6) AS mad,
      |  CAST(sum(CASE WHEN d > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM dev JOIN mad ON dev.l_returnflag = mad.l_returnflag
      |GROUP BY 1""".stripMargin

  /** The scale companion to q_mad_outliers: sketch (GK) medians for
    * both stages — per-task state bounded by the sketch, never the
    * group — with the q_group_percentiles_approx verification
    * contract: the output carries rank-interval BOOLEANS checked
    * in-engine (εn + 1 slack), so the driver's hash gate fails if
    * either sketch ever leaves its guarantee, while the oracle only
    * replays the exact group counts.
    */
  def madOutliersApprox(s: SparkSession, dir: String): DataFrame = {
    val acc = 1000
    val li = t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice")
    val med = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc)).as("amed"))
    val dev = li.join(broadcast(med), "l_returnflag")
      .withColumn("__dev", abs(col("l_extendedprice") - col("amed")))
    val mad = dev.groupBy("l_returnflag")
      .agg(percentile_approx(col("__dev"), lit(0.5), lit(acc)).as("amad"))
    def ok(le: Column, lt: Column, n: Column): Column = {
      val slack = n.cast("double") / acc + 1d
      val target = n.cast("double") * 0.5
      (le.cast("double") >= target - slack) && (lt.cast("double") <= target + slack)
    }
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") <= col("amed"), 1L).otherwise(0L)).as("lem"),
        sum(when(col("l_extendedprice") < col("amed"), 1L).otherwise(0L)).as("ltm"),
        sum(when(col("__dev") <= col("amad"), 1L).otherwise(0L)).as("led"),
        sum(when(col("__dev") < col("amad"), 1L).otherwise(0L)).as("ltd"))
      .select(col("l_returnflag"), col("n"),
        ok(col("lem"), col("ltm"), col("n")).as("med_in_bound"),
        ok(col("led"), col("ltd"), col("n")).as("mad_in_bound"))
  }

  val madOutliersApproxSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  true AS med_in_bound, true AS mad_in_bound
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Per-label embedding centroids via the native vector-sum aggregate
    * ([[graft.plans.VectorSumLong]]) in GROUPED mode: one exchange of
    * 64-long vectors (one per group per partition after map-side
    * combine — rows never shuffle), exact integer sums on the PCA
    * quantization grid, means in pinned-order doubles. The prototype
    * table classifier-distillation and SemDeDup-style seeding read.
    */
  def embeddingCentroids(s: SparkSession, dir: String): DataFrame = {
    val grid = graft.operators.Pca.Grid
    val q = transform(col("embedding"),
      x => round(x.cast("double") * lit(grid), 0).cast("long"))
    t(s, dir, "embeddings")
      .groupBy("label")
      .agg(count(lit(1)).as("__n"),
        graft.plans.NativeAgg.vectorSumLong(q).as("__s"))
      .select(col("label").cast("long").as("label"), col("__n"),
        posexplode(col("__s")).as(Seq("__pos", "__v")))
      .select(col("label"), (col("__pos") + 1).cast("long").as("dim"),
        round(col("__v").cast("double") / col("__n") / lit(grid), 6)
          .as("centroid"))
  }

  val embeddingCentroidsSql: String =
    """WITH q AS (SELECT label, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0, 0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |g AS (SELECT label, count(*) AS n FROM q GROUP BY 1)
      |SELECT CAST(q.label AS BIGINT) AS label, CAST(d.d AS BIGINT) AS dim,
      |  round(CAST(sum(qv[d.d]) AS DOUBLE) / any_value(g.n) / 1048576.0, 6)
      |    + 0.0 AS centroid
      |FROM q JOIN g ON q.label = g.label, range(1, 65) d(d)
      |GROUP BY q.label, d.d""".stripMargin

  /** Leakage-safe train/val/test split: the hash-range splitter
    * ([[graft.operators.Sampling.split]]) keyed on the NEAR-DUP
    * CLUSTER instead of the document — a plain per-doc split leaks
    * eval data whenever a test document's near-duplicate lands in
    * train (exactly what the planted variants here do), so the whole
    * [[graft.operators.ConnectedComponents]] cluster moves as one
    * unit. Singletons (no candidate pair) key on their own id. Scale
    * shape: clustering is the audited q_dedup_clusters path; the
    * extra work on top is one id-keyed join and a map-only hash tag.
    */
  def splitLeakageSafe(s: SparkSession, dir: String): DataFrame = {
    val labels = graft.operators.ConnectedComponents.resolve(
      dedupMinHash(s, dir), "id_a", "id_b")
      .withColumnRenamed("node", "doc_id")
    val withCluster = nearDupCorpus(s, dir).select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster"))
    graft.operators.Sampling.split(withCluster, "cluster", seed = 13L,
      fractions = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
  }

  val splitLeakageSafeSql: String =
    s"""WITH RECURSIVE $minHashPairsCtes,
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(v, u) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a),
       |labels AS (SELECT v AS doc_id, min(u) AS component FROM reach GROUP BY 1),
       |alldocs AS ($nearDupCorpusSql),
       |cl AS (SELECT c.doc_id, coalesce(l.component, c.doc_id) AS cluster
       |  FROM alldocs c LEFT JOIN labels l ON c.doc_id = l.doc_id)
       |SELECT doc_id, cluster,
       |  CASE WHEN u < 0.75 THEN 'train'
       |       WHEN u < 0.875 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, cluster,
       |  CAST(('0x' || substr(sha256('13:' || CAST(cluster AS VARCHAR)), 1, 8)) AS BIGINT)
       |    / 4294967296.0 AS u
       |FROM cl)""".stripMargin

  /** Dictionary blocklist gate ([[graft.operators.Blocklist]]): one
    * Aho–Corasick pass per document vs O(terms) substring scans. The
    * term list deliberately nests ("scan" inside "slow scan") to
    * exercise output-closure hits, and every term is borderless (no
    * proper prefix equals a suffix), so occurrences cannot overlap
    * themselves and the oracle's single-pass `replace` count equals
    * the automaton's every-end-position count exactly.
    */
  val blocklistTerms: Seq[String] = Seq(
    "slow scan", "scan", "big table", "hash join", "merge batch",
    "stream", "vector")

  def blocklistGate(s: SparkSession, dir: String): DataFrame =
    graft.operators.Blocklist.score(
      t(s, dir, "documents"), "doc_id", "text", blocklistTerms)

  val blocklistGateSql: String = {
    // documents text is ASCII, so DuckDB's char-counting length()
    // agrees with the automaton's byte walk
    val hits = blocklistTerms.map(term =>
      s"(length(t) - length(replace(t, '$term', ''))) // ${term.length}")
      .mkString("\n|    + ")
    val present = blocklistTerms.map(term =>
      s"CAST(contains(t, '$term') AS BIGINT)").mkString("\n|    + ")
    s"""WITH n AS (SELECT doc_id,
       |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
       |  FROM documents)
       |SELECT doc_id AS id,
       |  $hits AS n_hits,
       |  $present AS n_terms,
       |  ($present) > 0 AS blocked
       |FROM n""".stripMargin
  }

  /** KMV/theta-sketch source-overlap estimates
    * ([[graft.operators.ThetaSketch]]) — the bounded-state companion
    * of q_source_overlap's exact matrix. The sketch (k smallest
    * distinct portable shingle hashes per source) is deterministic
    * and order-independent, so the ESTIMATES replay bit-identically
    * in DuckDB: same k-min sets, same θ, same divisions.
    */
  def sourceOverlapSketch(s: SparkSession, dir: String): DataFrame =
    graft.operators.ThetaSketch.overlapMatrix(
      t(s, dir, "documents"), "source", "text", n = 8, k = 256)

  val sourceOverlapSketchSql: String =
    """WITH norm AS (
      |  SELECT doc_id, source, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, source, unnest(string_split(nt, ' ')) AS w,
      |    generate_subscripts(string_split(nt, ' '), 1) AS p
      |  FROM norm),
      |grams AS (
      |  SELECT DISTINCT source,
      |    CAST(('0x' || substr(sha256(
      |      w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
      |      lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win || ' ' ||
      |      lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win || ' ' ||
      |      lead(w, 7) OVER win), 1, 8)) AS BIGINT) AS gram
      |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY p)
      |  QUALIFY lead(w, 7) OVER win IS NOT NULL),
      |r AS (SELECT source, gram,
      |    row_number() OVER (PARTITION BY source ORDER BY gram) AS rn,
      |    count(*) OVER (PARTITION BY source) AS nd
      |  FROM grams),
      |th AS (SELECT source, max(nd) AS nd,
      |    CASE WHEN max(nd) >= 256
      |      THEN (max(CASE WHEN rn = 256 THEN gram END) + 1) / 4294967296.0
      |      ELSE 1.0 END AS theta
      |  FROM r GROUP BY source),
      |samp AS (SELECT r.source, r.gram
      |  FROM r JOIN th ON r.source = th.source
      |  WHERE r.rn <= CASE WHEN th.nd >= 256 THEN 255 ELSE th.nd END),
      |prs AS (SELECT a.source AS sa, b.source AS sb,
      |    least(a.theta, b.theta) AS theta
      |  FROM th a JOIN th b ON a.source < b.source),
      |flt AS (SELECT p.sa, p.sb, p.theta, s.gram, s.source
      |  FROM prs p JOIN samp s ON (s.source = p.sa OR s.source = p.sb)
      |    AND (s.gram + 1) / 4294967296.0 < p.theta),
      |per AS (SELECT sa, sb, theta, gram, count(DISTINCT source) AS cs
      |  FROM flt GROUP BY 1, 2, 3, 4),
      |agg AS (SELECT sa, sb, theta,
      |    CAST(sum(CASE WHEN cs = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ci,
      |    count(*) AS cu
      |  FROM per GROUP BY 1, 2, 3)
      |SELECT p.sa AS src_a, p.sb AS src_b,
      |  round(coalesce(a.ci, 0) / p.theta, 6) AS est_shared,
      |  round(coalesce(a.cu, 0) / p.theta, 6) AS est_union,
      |  CASE WHEN coalesce(a.cu, 0) = 0 THEN 0.0
      |    ELSE round(CAST(a.ci AS DOUBLE) / a.cu, 6) END AS est_jaccard
      |FROM prs p LEFT JOIN agg a ON p.sa = a.sa AND p.sb = a.sb""".stripMargin

  /** ANN index-quality evaluation: recall@5 of the IVF probe
    * ([[simsearchIvf]]) against the exact brute-force ground truth
    * ([[simsearchTopK]]), per query vector. The standard acceptance
    * gate before swapping an approximate index into a retrieval
    * pipeline — run on a sampled query set, it prices the
    * nprobe/recall trade with real corpus geometry instead of trusting
    * the index's own training loss.
    *
    * Scale shape: both sides are k-bounded per query (k rows each), so
    * the hit join and the per-query rollup move k×|queries| rows — the
    * corpus-sized work happens inside the two audited search operators.
    */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val k = 5
    val exact = simsearchTopK(s, dir).select("query_id", "neighbor_id")
    val approx = simsearchIvf(s, dir).select("query_id", "neighbor_id")
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall_at_5", round(col("n_hits") / lit(k.toDouble), 6))
  }

  val annRecallSql: String =
    """WITH n AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      |ex_scored AS (SELECT query_id, n.vec_id AS neighbor_id,
      |    round(list_dot_product(qv, n.nv), 6) AS cos_sim
      |  FROM q, n WHERE n.vec_id <> query_id),
      |ex_ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM ex_scored),
      |ex AS (SELECT query_id, neighbor_id FROM ex_ranked WHERE rn <= 5),
      |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, nv AS cv
      |  FROM n ORDER BY vec_id LIMIT 16),
      |assigned AS (SELECT n.vec_id, n.nv,
      |    (SELECT c.cell FROM cent c
      |     ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cell LIMIT 1) AS cell
      |  FROM n),
      |probes AS (SELECT q.query_id, q.qv, p.cell
      |  FROM q, LATERAL (SELECT c.cell FROM cent c
      |    ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cell LIMIT 4) p),
      |iv_scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
      |    round(list_dot_product(p.qv, a.nv), 6) AS cos_sim
      |  FROM probes p JOIN assigned a ON p.cell = a.cell
      |  WHERE a.vec_id <> p.query_id),
      |iv_ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM iv_scored),
      |iv AS (SELECT query_id, neighbor_id FROM iv_ranked WHERE rn <= 5),
      |hits AS (SELECT e.query_id, count(*) AS n
      |  FROM ex e JOIN iv i ON e.query_id = i.query_id
      |    AND e.neighbor_id = i.neighbor_id
      |  GROUP BY 1)
      |SELECT q.query_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
      |  round(coalesce(h.n, 0) / 5.0, 6) AS recall_at_5
      |FROM q LEFT JOIN hits h ON q.query_id = h.query_id""".stripMargin

  /** Weighted sampling without replacement
    * ([[graft.operators.Sampling.weightedSample]]): 100 documents
    * drawn proportional to character count — the corpus subsample
    * whose TOKEN mass, not doc count, is representative. Key order
    * (`ln(u)/w`) replays in DuckDB from the same portable hash; the
    * key itself stays out of the output so the comparison is over
    * membership, not transcendental bit patterns.
    */
  def weightedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedSample(
      t(s, dir, "documents").select("doc_id", "n_chars"),
      "doc_id", "n_chars", k = 100, seed = 17L)
      .withColumnRenamed("n_chars", "weight")

  val weightedSampleSql: String =
    """SELECT doc_id, n_chars AS weight FROM (
      |  SELECT doc_id, n_chars,
      |    ln((CAST(('0x' || substr(sha256('17:' || CAST(doc_id AS VARCHAR)), 1, 8))
      |         AS BIGINT) + 0.5) / 4294967296.0) / n_chars AS es_key
      |  FROM documents WHERE n_chars > 0)
      |ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin

  /** Per-source weighted sampling
    * ([[graft.operators.Sampling.weightedSampleGrouped]]): the k best
    * Efraimidis–Spirakis keys within each source — the per-stratum
    * form the streaming reservoir ([[graft.streaming.ReservoirStream]])
    * converges to exactly. One exchange on the stratum key.
    */
  def weightedSampleGrouped(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedSampleGrouped(
      t(s, dir, "documents").select("source", "doc_id", "n_chars"),
      "source", "doc_id", "n_chars", k = 20, seed = 17L)
      .withColumnRenamed("n_chars", "weight")

  val weightedSampleGroupedSql: String =
    """SELECT source, doc_id, n_chars AS weight, CAST(rn AS BIGINT) AS sample_rank
      |FROM (SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY
      |      ln((CAST(('0x' || substr(sha256('17:' || CAST(doc_id AS VARCHAR)), 1, 8))
      |           AS BIGINT) + 0.5) / 4294967296.0) / n_chars DESC,
      |      doc_id) AS rn
      |  FROM documents WHERE n_chars > 0)
      |WHERE rn <= 20""".stripMargin

  /** Unicode NFC normalization ([[graft.plans.NativeNorm]]): the
    * canonical-composition pass every hash/dedup pipeline needs before
    * signatures (composed "é" and decomposed "e"+U+0301 are different
    * bytes for the same text). The fixture corpus is ASCII, so a
    * deterministic decomposed suffix is appended on BOTH engines to
    * prove the kernel recomposes: lengths shrink by exactly the two
    * combining marks and the recomposed tail hashes identically.
    */
  def unicodeNorm(s: SparkSession, dir: String): DataFrame = {
    val decomposed = concat(col("text"), lit("é Å"))
    t(s, dir, "documents").select(
      col("doc_id"),
      length(decomposed).cast("long").as("n_raw"),
      length(graft.plans.NativeNorm.nfc(decomposed)).cast("long").as("n_nfc"),
      substring(graft.plans.NativeNorm.nfc(decomposed), -3, 3).as("nfc_tail"))
  }

  val unicodeNormSql: String =
    """SELECT doc_id,
      |  length(text || 'e' || chr(769) || ' A' || chr(778)) AS n_raw,
      |  length(nfc_normalize(text || 'e' || chr(769) || ' A' || chr(778))) AS n_nfc,
      |  right(nfc_normalize(text || 'e' || chr(769) || ' A' || chr(778)), 3) AS nfc_tail
      |FROM documents""".stripMargin

  /** Freshness-decayed per-user activity: each event contributes
    * `value · 2^-age_days` (age capped at 20 days), the standard
    * recency weighting for data-curation priority and user-activity
    * features. The decay factor is a power of two and the value is
    * decimal-quantized to cents, so every contribution is an exact
    * integer — the fold is order-independent and engine-portable with
    * no floating-point epsilon, the same trick the correlation/OLS
    * moment passes use. One scan + one grouped agg; the global max
    * timestamp broadcasts as a one-row aggregate.
    */
  def decayWeights(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val mx = e.agg(max("ts").as("max_ts"))
    e.crossJoin(broadcast(mx))
      .withColumn("days", least(
        expr("(unix_timestamp(max_ts) - unix_timestamp(ts)) DIV 86400"),
        lit(20L)))
      .withColumn("contrib", expr(
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * " +
          "shiftleft(CAST(1 AS BIGINT), CAST(20 - days AS INT))"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("contrib").as("sc"))
      // 100 (cents) * 2^20 (full-weight shift) = 104857600
      .select(col("user_id"), col("n_events"),
        round(col("sc") / lit(104857600.0), 6).as("decayed_activity"))
  }

  val decayWeightsSql: String =
    """WITH mx AS (SELECT max(ts) AS m FROM events),
      |d AS (SELECT user_id,
      |    least(date_diff('second', ts, (SELECT m FROM mx)) // 86400, 20) AS days,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      |  FROM events)
      |SELECT user_id, count(*) AS n_events,
      |  round(sum(vc * CAST(power(2, 20 - days) AS BIGINT)) / 104857600.0, 6)
      |    AS decayed_activity
      |FROM d GROUP BY 1""".stripMargin

  /** Deflate compression ratio
    * ([[graft.plans.NativeNorm.compressionRatio]]): the cheap
    * low-entropy/boilerplate proxy quality filters run beside the
    * Gopher rules. DuckDB exposes no deflate, so the oracle
    * adjudicates the KERNEL on pinned inputs instead of replaying the
    * codec: six deterministic entropy classes (empty, single char,
    * pure run, phrase repetition, prose, sha-chain hex) flow through
    * the native expression in-plan, and the oracle carries the
    * expected (n_bytes, ratio) rows — values pinned to the identical
    * constants NativeNormSpec asserts, so any JVM/zlib drift fails
    * `sbt test` locally before it can fail the driver gate. The
    * corpus-scale application is the same expression over a text
    * column (map-only, codegen'd; see NativeNormSpec's corpus tests).
    */
  def compressionRatio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // deterministic pseudo-random hex: sha-256 chain from a fixed seed
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = new StringBuilder
    var h = "graft-compression-seed".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    (0 until 32).foreach { _ =>
      h = md.digest(h)
      h.foreach(b => hex.append(f"${b & 0xff}%02x"))
    }
    val prose = "Compression ratio is a cheap proxy for text entropy: " +
      "natural prose compresses to roughly a third of its size, " +
      "boilerplate and repeated navigation chrome compress far " +
      "below that, and random hex barely compresses at all. " +
      "Quality filters exploit this: a document whose deflate " +
      "ratio sits well under the prose band is almost always " +
      "machine-generated repetition, and a ratio near one on " +
      "long text signals binary junk that slipped past the " +
      "decoder. The thresholds are calibrated per corpus."
    Seq(
      ("c1_empty", ""),
      ("c2_single_char", "a"),
      ("c3_run_4096", "a" * 4096),
      ("c4_phrase_repeat", "the quick brown fox jumps over the lazy dog. " * 96),
      ("c5_prose", prose),
      ("c6_hex_chain", hex.toString)).toDF("case_id", "text")
      .select(
        col("case_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        round(graft.plans.NativeNorm.compressionRatio(col("text")), 6)
          .as("compression_ratio"))
  }

  val compressionRatioSql: String =
    """SELECT * FROM (VALUES
      |  ('c1_empty',        CAST(0    AS BIGINT), CAST(1.0      AS DOUBLE)),
      |  ('c2_single_char',  CAST(1    AS BIGINT), CAST(3.0      AS DOUBLE)),
      |  ('c3_run_4096',     CAST(4096 AS BIGINT), CAST(0.005371 AS DOUBLE)),
      |  ('c4_phrase_repeat',CAST(4320 AS BIGINT), CAST(0.016898 AS DOUBLE)),
      |  ('c5_prose',        CAST(484  AS BIGINT), CAST(0.595041 AS DOUBLE)),
      |  ('c6_hex_chain',    CAST(2048 AS BIGINT), CAST(0.561035 AS DOUBLE))
      |) AS t(case_id, n_bytes, compression_ratio)""".stripMargin

  /** Pairwise source redundancy ([[graft.operators.Divergence
    * .jsDivergence]]): Jensen–Shannon divergence between the unigram
    * distributions of every source pair — the mixture-design signal
    * behind sampling weights (near-zero JS ⇒ distributionally
    * redundant sources; near ln 2 ⇒ disjoint). Vocab-bounded
    * aggregates; decimal-folded contributions replay exactly.
    */
  def sourceDivergence(s: SparkSession, dir: String): DataFrame =
    Divergence.jsDivergence(t(s, dir, "documents"), "source", "text")

  val sourceDivergenceSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |cnt AS (SELECT source, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1),
      |wp AS (SELECT c.source, c.w, c.c, t.t FROM cnt c JOIN tot t ON t.source = c.source),
      |shared AS (
      |  SELECT a.source AS sa, b.source AS sb, count(*) AS n_shared,
      |    sum(CAST(round(
      |      ((CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE)) *
      |         ln((CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE)) * 2.0 /
      |            ((CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE)) +
      |             (CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE)))) +
      |       (CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE)) *
      |         ln((CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE)) * 2.0 /
      |            ((CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE)) +
      |             (CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE))))) * 0.5,
      |      7) AS DECIMAL(27,7))) AS j_shared,
      |    sum(CAST(round(CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE), 7)
      |      AS DECIMAL(27,7))) AS pa_shared,
      |    sum(CAST(round(CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE), 7)
      |      AS DECIMAL(27,7))) AS pb_shared
      |  FROM wp a JOIN wp b ON a.w = b.w AND a.source < b.source
      |  GROUP BY 1, 2),
      |vocab AS (SELECT source, CAST(count(*) AS BIGINT) AS v FROM cnt GROUP BY 1),
      |pairs AS (SELECT a.source AS sa, a.v AS va, b.source AS sb, b.v AS vb
      |  FROM vocab a, vocab b WHERE a.source < b.source)
      |SELECT p.sa AS source_a, p.sb AS source_b,
      |  CAST(p.va + p.vb - coalesce(s.n_shared, 0) AS BIGINT) AS n_terms,
      |  round(coalesce(CAST(s.j_shared AS DOUBLE), 0.0) +
      |    0.5 * 0.6931471805599453 * (2.0 -
      |      coalesce(CAST(s.pa_shared AS DOUBLE), 0.0) -
      |      coalesce(CAST(s.pb_shared AS DOUBLE), 0.0)), 6) AS js_divergence
      |FROM pairs p LEFT JOIN shared s ON s.sa = p.sa AND s.sb = p.sb""".stripMargin

  /** Diversity-aware subset selection
    * ([[graft.operators.SimilaritySearch.kCenterSelect]]): greedy
    * k-center over the embedding corpus — 8 centers covering the
    * space, the post-dedup "don't sample the dense blob twice"
    * selector. Per-pair cosine rounds to 6 dp before every min/argmax,
    * so the greedy trajectory is a total order DuckDB replays exactly
    * (recursive CTE).
    */
  def diverseSubset(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.kCenterSelect(
      t(s, dir, "embeddings"), "vec_id", "embedding", k = 8)

  val diverseSubsetSql: String =
    """WITH RECURSIVE n AS (
      |  SELECT vec_id AS id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings
      |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |sel(rank, id, min_dist, ids) AS (
      |  SELECT 1, (SELECT min(id) FROM n), CAST(NULL AS DOUBLE),
      |    [(SELECT min(id) FROM n)]
      |  UNION ALL
      |  SELECT s.rank + 1, w.id, w.d, list_append(s.ids, w.id)
      |  FROM sel s, LATERAL (
      |    SELECT p.id, 1 - max(round(list_dot_product(p.nv, c.nv), 6)) AS d
      |    FROM n p, n c
      |    WHERE list_contains(s.ids, c.id) AND NOT list_contains(s.ids, p.id)
      |    GROUP BY p.id ORDER BY d DESC, p.id LIMIT 1) w
      |  WHERE s.rank < 8)
      |SELECT rank AS center_rank, id AS vec_id, round(min_dist, 6) AS min_dist
      |FROM sel""".stripMargin

  /** Temperature-scaled mixture plan
    * ([[graft.operators.Curation.mixturePlan]]): per-source sampling
    * weights `mass^(1/T)` renormalized (T = 2), plus integer document
    * quotas summing exactly to the 1000-doc budget via
    * largest-remainder apportionment — the multilingual rebalancing
    * step that lifts low-resource sources. One corpus aggregate;
    * everything else runs on the |sources|-row table.
    */
  def mixturePlan(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.mixturePlan(
      t(s, dir, "documents"), "source", "n_chars",
      temperature = 2.0, totalQuota = 1000L)

  val mixturePlanSql: String =
    """WITH agg AS (SELECT source, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS mass FROM documents GROUP BY 1),
      |s AS (SELECT *, CAST(round(power(CAST(mass AS DOUBLE), 0.5), 6)
      |    AS DECIMAL(27,6)) AS sc FROM agg),
      |t AS (SELECT *, sum(sc) OVER () AS tot FROM s),
      |e AS (SELECT *, 1000.0 * (CAST(sc AS DOUBLE) / CAST(tot AS DOUBLE)) AS ex
      |  FROM t),
      |b AS (SELECT *, CAST(floor(ex) AS BIGINT) AS base,
      |    ex - CAST(floor(ex) AS BIGINT) AS rem FROM e),
      |r AS (SELECT *, 1000 - sum(base) OVER () AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
      |SELECT source, n_docs, mass,
      |  round(CAST(sc AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS weight,
      |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
      |FROM r""".stripMargin

  /** Per-source Zipf slope ([[graft.operators.Divergence.zipfSlope]]):
    * OLS slope of ln(freq) on ln(rank) over each source's top-200
    * terms — the naturalness audit (prose ≈ −1; templated text
    * flattens). Rank order is total (count desc, term asc), so both
    * engines rank identically; moments fold through DECIMAL(27,7).
    */
  def zipfSlope(s: SparkSession, dir: String): DataFrame =
    Divergence.zipfSlope(t(s, dir, "documents"), "source", "text")

  val zipfSlopeSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |cnt AS (SELECT source, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |ranked AS (SELECT source, w, c,
      |    row_number() OVER (PARTITION BY source ORDER BY c DESC, w) AS rank
      |  FROM cnt),
      |pts AS (SELECT source,
      |    CAST(round(ln(CAST(rank AS DOUBLE)), 7) AS DECIMAL(27,7)) AS x,
      |    CAST(round(ln(CAST(c AS DOUBLE)), 7) AS DECIMAL(27,7)) AS y,
      |    CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)), 7)
      |      AS DECIMAL(27,7)) AS xx,
      |    CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 7)
      |      AS DECIMAL(27,7)) AS xy
      |  FROM ranked WHERE rank <= 200),
      |m AS (SELECT source, count(*) AS n_terms,
      |    sum(x) AS sx, sum(y) AS sy, sum(xx) AS sxx, sum(xy) AS sxy
      |  FROM pts GROUP BY 1)
      |SELECT source, n_terms,
      |  round((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |        (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |         CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope
      |FROM m""".stripMargin

  /** Vocabulary coverage ([[graft.operators.Lexicon.vocabCoverage]]):
    * per-document OOV rate against the corpus' own top-K unigram
    * vocabulary — the "would a K-entry tokenizer cover this document"
    * audit. K = 16 here so the fixture's 31-term vocabulary actually
    * splits (a K above the corpus vocab would make every rate 0).
    * Vocab membership is a total order (count desc, term asc); the
    * K-row vocab broadcasts into the membership join.
    */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame =
    Lexicon.vocabCoverage(t(s, dir, "documents"), "doc_id", "text",
      vocabSize = 16)

  val vocabCoverageSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |tk AS (SELECT doc_id, w FROM tok WHERE w <> ''),
      |vocab AS (SELECT w FROM (
      |  SELECT w, count(*) AS c FROM tk GROUP BY 1
      |  ORDER BY c DESC, w LIMIT 16)),
      |per AS (
      |  SELECT t.doc_id, count(*) AS n_tokens,
      |    sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
      |  FROM tk t LEFT JOIN vocab v ON v.w = t.w GROUP BY 1)
      |SELECT doc_id, n_tokens, CAST(n_oov AS BIGINT) AS n_oov,
      |  round(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS oov_rate
      |FROM per""".stripMargin

  /** Source-distinctive terms
    * ([[graft.operators.Lexicon.distinctiveTerms]]): Monroe et al.
    * log-odds z-score with an informative Dirichlet prior (alpha0 =
    * 100 scaled by global frequency), top-10 terms per source — WHAT
    * each source contributes lexically. Ranking is on the 6-dp-rounded
    * z with a term tie-break, a total order both engines replay.
    */
  def distinctiveTerms(s: SparkSession, dir: String): DataFrame =
    Lexicon.distinctiveTerms(t(s, dir, "documents"), "source", "text")

  val distinctiveTermsSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |cnt AS (SELECT source, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |g AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM cnt GROUP BY 1),
      |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cnt GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cnt),
      |j AS (SELECT c.source, c.w, c.c, g.cw, st.ns, tot.nn
      |  FROM cnt c JOIN g USING (w) JOIN st USING (source) CROSS JOIN tot),
      |z AS (SELECT source, w AS term, c AS c_source,
      |  CAST(cw - c AS BIGINT) AS c_rest,
      |  round((ln((CAST(c AS DOUBLE) +
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE)) /
      |      greatest(CAST(ns AS DOUBLE) + 100.0 - CAST(c AS DOUBLE) -
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE), 1e-12)) -
      |     ln((CAST(cw AS DOUBLE) - CAST(c AS DOUBLE) +
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE)) /
      |      greatest(CAST(nn AS DOUBLE) - CAST(ns AS DOUBLE) + 100.0 -
      |        (CAST(cw AS DOUBLE) - CAST(c AS DOUBLE)) -
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE), 1e-12))) /
      |    sqrt(1.0 / (CAST(c AS DOUBLE) +
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE)) +
      |      1.0 / (CAST(cw AS DOUBLE) - CAST(c AS DOUBLE) +
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE))), 6) AS keyness
      |  FROM j),
      |r AS (SELECT *, row_number() OVER (
      |  PARTITION BY source ORDER BY keyness DESC, term) AS rk FROM z)
      |SELECT source, CAST(rk AS BIGINT) AS rank, term, c_source, c_rest, keyness
      |FROM r WHERE rk <= 10""".stripMargin

  /** Lexical diversity ([[graft.operators.Lexicon.tokenEntropy]]):
    * per-document unigram Shannon entropy (nats) and type–token
    * ratio — the template/spam signal character-level repetition
    * misses. Per-term `c·ln c` folds through DECIMAL(27,7).
    */
  def tokenEntropy(s: SparkSession, dir: String): DataFrame =
    Lexicon.tokenEntropy(t(s, dir, "documents"), "doc_id", "text")

  val tokenEntropySql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |tc AS (SELECT doc_id, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |p AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    count(*) AS n_types,
      |    sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 7)
      |      AS DECIMAL(27,7))) AS s
      |  FROM tc GROUP BY 1)
      |SELECT doc_id, n_tokens, n_types,
      |  round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
      |  round(ln(CAST(n_tokens AS DOUBLE)) -
      |    CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS entropy
      |FROM p""".stripMargin

  /** Behavioral transition matrix
    * ([[graft.operators.EventFlow.transitions]]): first-order Markov
    * transition counts, conditional probabilities, and PMI between
    * consecutive event types per user — the flow audit behind
    * sessionization/funnels. One user-keyed exchange for the lag;
    * everything after is |types|²-bounded.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame =
    EventFlow.transitions(
      t(s, dir, "events"), "user_id", "ts", "event_type", "event_id")

  val eventTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |pairs AS (SELECT prev AS prev_type, event_type AS next_type,
      |    count(*) AS n_trans
      |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
      |o AS (SELECT prev_type, CAST(sum(n_trans) AS BIGINT) AS n_out
      |  FROM pairs GROUP BY 1),
      |i AS (SELECT next_type, CAST(sum(n_trans) AS BIGINT) AS n_in
      |  FROM pairs GROUP BY 1),
      |t AS (SELECT CAST(sum(n_trans) AS BIGINT) AS n_total FROM pairs)
      |SELECT p.prev_type, p.next_type, p.n_trans,
      |  round(CAST(p.n_trans AS DOUBLE) / CAST(o.n_out AS DOUBLE), 6) AS p_cond,
      |  round(ln(CAST(p.n_trans AS DOUBLE) * CAST(t.n_total AS DOUBLE) /
      |    (CAST(o.n_out AS DOUBLE) * CAST(i.n_in AS DOUBLE))), 6) AS pmi
      |FROM pairs p JOIN o USING (prev_type) JOIN i USING (next_type)
      |CROSS JOIN t""".stripMargin

  /** Embedding dimension profile
    * ([[graft.operators.VectorStats.dimProfile]]): per-dimension
    * n/mean/std/min/max over the corpus — the standardization /
    * whitening parameter table (dead or scale-dominant dimensions
    * distort every cosine). Exact [[graft.operators.Pca.Grid]]
    * integer-grid sums, so every statistic replays bit-for-bit.
    */
  def dimProfile(s: SparkSession, dir: String): DataFrame =
    VectorStats.dimProfile(t(s, dir, "embeddings"), "embedding")

  val dimProfileSql: String =
    """WITH q AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> CAST(round(x * 1048576.0, 0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |e AS (SELECT i.i AS dim, qv[i.i] AS qx FROM q, range(1, 65) i(i)),
      |m AS (SELECT dim, count(*) AS n,
      |    sum(CAST(qx AS DECIMAL(38,0))) AS s,
      |    sum(CAST(qx * qx AS DECIMAL(38,0))) AS s2,
      |    min(qx) AS mn, max(qx) AS mx
      |  FROM e GROUP BY 1)
      |SELECT CAST(dim AS BIGINT) AS dim, n,
      |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0, 6) AS mean,
      |  round(sqrt((CAST(s2 AS DOUBLE) -
      |      CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) /
      |    CAST(n AS DOUBLE)) / 1048576.0, 6) AS std,
      |  round(CAST(mn AS DOUBLE) / 1048576.0, 6) AS dim_min,
      |  round(CAST(mx AS DOUBLE) / 1048576.0, 6) AS dim_max
      |FROM m""".stripMargin

  /** Per-label centroid outliers
    * ([[graft.operators.VectorStats.centroidOutliers]]): cosine
    * distance of every vector to its label's mean embedding, top-5
    * per label — the mislabeled / off-manifold candidates pruned
    * before training. Centroid means round to 6 dp before any
    * product; per-vector folds run through DECIMAL(27,7).
    */
  def centroidOutliers(s: SparkSession, dir: String): DataFrame =
    VectorStats.centroidOutliers(
      t(s, dir, "embeddings"), "vec_id", "label", "embedding")

  val centroidOutliersSql: String =
    """WITH q AS (SELECT vec_id, label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(round(x * 1048576.0, 0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |e AS (SELECT vec_id, label, i.i AS i, qv[i.i] AS qx
      |  FROM q, range(1, 65) i(i)),
      |c AS (SELECT label, i,
      |    round(CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE) /
      |      CAST(count(*) AS DOUBLE) / 1048576.0, 6) AS cv
      |  FROM e GROUP BY 1, 2),
      |d AS (SELECT e.vec_id, e.label,
      |    sum(CAST(round((CAST(e.qx AS DOUBLE) / 1048576.0) * c.cv, 7)
      |      AS DECIMAL(27,7))) AS sxc,
      |    sum(CAST(round((CAST(e.qx AS DOUBLE) / 1048576.0) *
      |        (CAST(e.qx AS DOUBLE) / 1048576.0), 7)
      |      AS DECIMAL(27,7))) AS sxx,
      |    sum(CAST(round(c.cv * c.cv, 7) AS DECIMAL(27,7))) AS scc
      |  FROM e JOIN c ON c.label = e.label AND c.i = e.i GROUP BY 1, 2),
      |r AS (SELECT label, vec_id,
      |    round(1.0 - CAST(sxc AS DOUBLE) /
      |      sqrt(CAST(sxx AS DOUBLE) * CAST(scc AS DOUBLE)), 6) AS cos_dist
      |  FROM d
      |  WHERE CAST(sxx AS DOUBLE) > 0 AND CAST(scc AS DOUBLE) > 0),
      |k AS (SELECT *, row_number() OVER (
      |  PARTITION BY label ORDER BY cos_dist DESC, vec_id) AS rk FROM r)
      |SELECT label, CAST(rk AS BIGINT) AS rank, vec_id, cos_dist
      |FROM k WHERE rk <= 5""".stripMargin

  /** MinHash-LSH banding planner ([[graft.operators.Dedup.lshPlan]]):
    * the MMDS design table for a 128-minhash signature at target
    * Jaccard 0.5 — S-curve inflection, candidate probability at the
    * threshold, false-positive rate at 0.375 and miss rate at 0.625
    * for every bands×rows factorization. Data-independent (like
    * q_compression_ratio's pinned kernel rows) but engine-replayed:
    * both sides exponentiate the same exact binary doubles.
    */
  def lshPlanQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.lshPlan(s, sigLen = 128, threshold = 0.5)

  val lshPlanSql: String =
    """SELECT b AS bands, CAST(128 / b AS BIGINT) AS rows_per_band,
      |  round(power(1.0 / CAST(b AS DOUBLE),
      |    1.0 / (128.0 / CAST(b AS DOUBLE))), 6) AS est_threshold,
      |  round(1.0 - power(1.0 - power(0.5, 128.0 / CAST(b AS DOUBLE)),
      |    CAST(b AS DOUBLE)), 6) AS p_at_threshold,
      |  round(1.0 - power(1.0 - power(0.375, 128.0 / CAST(b AS DOUBLE)),
      |    CAST(b AS DOUBLE)), 6) AS fp_below,
      |  round(1.0 - (1.0 - power(1.0 - power(0.625, 128.0 / CAST(b AS DOUBLE)),
      |    CAST(b AS DOUBLE))), 6) AS miss_above
      |FROM range(1, 129) t(b) WHERE 128 % b = 0""".stripMargin

  /** Per-source quality calibration
    * ([[graft.operators.Curation.calibrateQuality]]): percent-rank of
    * the quality score within each source, plus the keep flag for a
    * calibrated keep-best-half gate — so a global threshold compares
    * like with like instead of keeping only the "easiest" sources.
    * Rank order is (6-dp score, doc_id) — total, engine-portable.
    */
  def qualityCalibrated(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.operators.Curation.calibrateQuality(
      d, "doc_id", "source", TextFunctions.qualityScore(col("text")))
  }

  val qualityCalibratedSql: String =
    """WITH base AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM documents),
      |awl AS (
      |  SELECT *,
      |    CASE WHEN n_tok > 0 THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |         ELSE 0.0 END AS avg_wl
      |  FROM base),
      |sc AS (
      |  SELECT doc_id, source,
      |    round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |      (CASE WHEN avg_wl BETWEEN 3 AND 10 THEN 1.0
      |            WHEN avg_wl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS score
      |  FROM awl),
      |pr AS (
      |  SELECT doc_id, source, score,
      |    round(percent_rank() OVER (
      |      PARTITION BY source ORDER BY score, doc_id), 6) AS pct_rank,
      |    row_number() OVER (
      |      PARTITION BY source ORDER BY score DESC, doc_id DESC) AS rkd,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM sc)
      |SELECT doc_id, source, score, pct_rank,
      |  rkd <= CAST(ceil(CAST(n AS DOUBLE) * 0.5) AS BIGINT) AS keep
      |FROM pr""".stripMargin

  /** Fuzzy decontamination
    * ([[graft.operators.Decontaminate.fuzzyOverlapReport]]): corpus
    * docs that are minhash-band NEAR-duplicates of a benchmark item,
    * verified with exact shingle Jaccard — the paraphrased/truncated
    * eval leakage the exact-overlap gate underestimates. Benchmark =
    * the near-dup fixture's planted truncated variants (ids ≥ 1e6);
    * corpus = the originals. Signatures are sha-derived, so the
    * oracle replays the identical candidate set and similarities.
    */
  def decontaminateFuzzy(s: SparkSession, dir: String): DataFrame = {
    val all = nearDupCorpus(s, dir)
    graft.operators.Decontaminate.fuzzyOverlapReport(
      all.filter(col("doc_id") < 1000000),
      all.filter(col("doc_id") >= 1000000),
      "doc_id", "text", numHashes = MinHashNumHashes,
      shingleSize = MinHashShingle, bands = MinHashBands, threshold = 0.5)
  }

  val decontaminateFuzzySql: String =
    s"""WITH $minHashPairsCtes,
       |cand AS (SELECT id_a AS doc_id, id_b AS bench_id FROM pairs
       |  WHERE id_a < 1000000 AND id_b >= 1000000),
       |sets AS (SELECT doc_id, list_distinct(hashes) AS hs FROM hs),
       |j AS (SELECT c.doc_id, c.bench_id,
       |    CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS inter,
       |    CAST(len(a.hs) + len(b.hs) AS BIGINT) AS su
       |  FROM cand c JOIN sets a ON a.doc_id = c.doc_id
       |  JOIN sets b ON b.doc_id = c.bench_id),
       |r AS (SELECT doc_id, bench_id, inter, su - inter AS uni,
       |    round(CASE WHEN su - inter > 0
       |      THEN CAST(inter AS DOUBLE) / CAST(su - inter AS DOUBLE)
       |      ELSE 0.0 END, 6) AS jaccard
       |  FROM j)
       |SELECT doc_id, bench_id, inter, uni, jaccard,
       |  jaccard >= 0.5 AS contaminated
       |FROM r""".stripMargin

  /** End-to-end corpus curation — the pipeline composition a user of
    * this engine actually ships, as ONE query: exact-dedup to cluster
    * representatives ([[graft.operators.Dedup.exactDedup]]), per-source
    * quality calibration keeping each source's best half
    * ([[graft.operators.Curation.calibrateQuality]]), temperature-
    * scaled mixture quotas over the survivors
    * ([[graft.operators.Curation.mixturePlan]], T = 2, 1000-doc
    * budget), and the final per-source selection by (score desc, id).
    * Emits every gated survivor with its rank, quota and keep flag —
    * the audit trail, not just the kept set.
    *
    * Every stage is individually oracled elsewhere; this query pins
    * the COMPOSITION (the joins between stages are where a real
    * pipeline silently loses rows). Scale shape: one fingerprint
    * window, one doc-keyed join back for mass, two source-keyed
    * windows, and |sources|-row quota tables broadcast — nothing new
    * beyond the stages' own audited plans.
    */
  def curateCorpus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents")
    val reps = graft.operators.Dedup.exactDedup(d, "text", "doc_id")
      .filter(!col("is_duplicate"))
      .select("doc_id", "source", "text", "n_chars")
    val gated = graft.operators.Curation
      .calibrateQuality(reps, "doc_id", "source",
        TextFunctions.qualityScore(col("text")))
      .filter(col("keep"))
      .join(reps.select("doc_id", "n_chars"), "doc_id")
    val quotas = graft.operators.Curation
      .mixturePlan(gated, "source", "n_chars",
        temperature = 2.0, totalQuota = 1000L)
      .select("source", "quota")
    gated
      .withColumn("rk", row_number().over(Window.partitionBy("source")
        .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .join(broadcast(quotas), "source")
      .select(col("source"), col("doc_id"), col("score"), col("pct_rank"),
        col("rk"), col("quota"), (col("rk") <= col("quota")).as("kept"))
  }

  val curateCorpusSql: String =
    """WITH fp AS (
      |  SELECT doc_id, source, text, n_chars,
      |    sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
      |  FROM documents),
      |reps AS (
      |  SELECT doc_id, source, text, n_chars FROM (
      |    SELECT *, min(doc_id) OVER (PARTITION BY f) AS rep FROM fp)
      |  WHERE doc_id = rep),
      |base AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM reps),
      |awl AS (
      |  SELECT *,
      |    CASE WHEN n_tok > 0 THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |         ELSE 0.0 END AS avg_wl
      |  FROM base),
      |sc AS (
      |  SELECT doc_id, source, n_chars,
      |    round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |      (CASE WHEN avg_wl BETWEEN 3 AND 10 THEN 1.0
      |            WHEN avg_wl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS score
      |  FROM awl),
      |pr AS (
      |  SELECT *, round(percent_rank() OVER (
      |    PARTITION BY source ORDER BY score, doc_id), 6) AS pct_rank,
      |    row_number() OVER (
      |      PARTITION BY source ORDER BY score DESC, doc_id DESC) AS rkd,
      |    count(*) OVER (PARTITION BY source) AS ng
      |  FROM sc),
      |gated AS (SELECT * FROM pr
      |  WHERE rkd <= CAST(ceil(CAST(ng AS DOUBLE) * 0.5) AS BIGINT)),
      |agg AS (SELECT source, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS mass FROM gated GROUP BY 1),
      |s AS (SELECT *, CAST(round(power(CAST(mass AS DOUBLE), 0.5), 6)
      |    AS DECIMAL(27,6)) AS scw FROM agg),
      |t AS (SELECT *, sum(scw) OVER () AS tot FROM s),
      |e AS (SELECT *, 1000.0 * (CAST(scw AS DOUBLE) / CAST(tot AS DOUBLE)) AS ex
      |  FROM t),
      |b AS (SELECT *, CAST(floor(ex) AS BIGINT) AS base,
      |    ex - CAST(floor(ex) AS BIGINT) AS rem FROM e),
      |r AS (SELECT *, 1000 - sum(base) OVER () AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, source) AS rkq FROM b),
      |quotas AS (SELECT source,
      |    CAST(base + CASE WHEN rkq <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |      AS quota
      |  FROM r),
      |rk AS (SELECT source, doc_id, score, pct_rank,
      |    CAST(row_number() OVER (
      |      PARTITION BY source ORDER BY score DESC, doc_id) AS BIGINT) AS rk
      |  FROM gated)
      |SELECT k.source, k.doc_id, k.score, k.pct_rank, k.rk, q.quota,
      |  k.rk <= q.quota AS kept
      |FROM rk k JOIN quotas q USING (source)""".stripMargin

  /** Near-dup provenance matrix: minhash-LSH candidate pairs rolled up
    * to the UNORDERED source pair — which sources duplicate which (the
    * dedup dashboard a curation team reads before deciding crawl
    * exclusions; complements q_source_overlap's shingle-level matrix
    * with a DOCUMENT-pair count). Planted near-dup variants inherit
    * their original's source. Rides the audited minhash candidate
    * path ([[graft.operators.Dedup.minHashCandidates]]); the roll-up
    * is two keyed joins on the doc id and one |sources|²-bounded
    * aggregate.
    */
  def sourceDedupMatrix(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    val (pairs, _) = graft.operators.Dedup.minHashCandidates(
      corpus, "text", "doc_id", numHashes = MinHashNumHashes,
      shingleSize = MinHashShingle, bands = MinHashBands)
    val src = t(s, dir, "documents").select(col("doc_id"), col("source"))
    def baseId(c: Column): Column =
      when(c >= 1000000L, c - 1000000L).otherwise(c)
    pairs
      .withColumn("__ka", baseId(col("id_a")))
      .withColumn("__kb", baseId(col("id_b")))
      .join(src.select(col("doc_id").as("__ka"), col("source").as("__sa")), "__ka")
      .join(src.select(col("doc_id").as("__kb"), col("source").as("__sb")), "__kb")
      .groupBy(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  val sourceDedupMatrixSql: String =
    s"""WITH $minHashPairsCtes,
       |src AS (SELECT doc_id, source FROM documents),
       |ps AS (SELECT p.id_a, p.id_b, da.source AS sa, db.source AS sb
       |  FROM pairs p
       |  JOIN src da ON da.doc_id =
       |    CASE WHEN p.id_a >= 1000000 THEN p.id_a - 1000000 ELSE p.id_a END
       |  JOIN src db ON db.doc_id =
       |    CASE WHEN p.id_b >= 1000000 THEN p.id_b - 1000000 ELSE p.id_b END)
       |SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
       |  count(*) AS n_pairs
       |FROM ps GROUP BY 1, 2""".stripMargin

  /** Embedding drift ([[graft.operators.VectorStats.centroidShift]]):
    * per-label centroid L2 shift and cosine between the even-id
    * (reference) and odd-id (current) halves of the embedding corpus —
    * the representation-space drift monitor count-based drift misses.
    * Exact-grid means; decimal-folded cross terms.
    */
  def embeddingDrift(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    VectorStats.centroidShift(
      e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
      "label", "embedding")
  }

  val embeddingDriftSql: String =
    """WITH q AS (SELECT vec_id, label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(round(x * 1048576.0, 0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |e AS (SELECT vec_id, label, i.i AS i, qv[i.i] AS qx
      |  FROM q, range(1, 65) i(i)),
      |ca AS (SELECT label, i, count(*) AS na,
      |    round(CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE) /
      |      CAST(count(*) AS DOUBLE) / 1048576.0, 6) AS cv
      |  FROM e WHERE vec_id % 2 = 0 GROUP BY 1, 2),
      |cb AS (SELECT label, i, count(*) AS nb,
      |    round(CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE) /
      |      CAST(count(*) AS DOUBLE) / 1048576.0, 6) AS cv
      |  FROM e WHERE vec_id % 2 = 1 GROUP BY 1, 2),
      |j AS (SELECT a.label, a.na, b.nb,
      |    CAST(round((a.cv - b.cv) * (a.cv - b.cv), 7) AS DECIMAL(27,7)) AS dd,
      |    CAST(round(a.cv * b.cv, 7) AS DECIMAL(27,7)) AS ab,
      |    CAST(round(a.cv * a.cv, 7) AS DECIMAL(27,7)) AS aa,
      |    CAST(round(b.cv * b.cv, 7) AS DECIMAL(27,7)) AS bb
      |  FROM ca a JOIN cb b ON b.label = a.label AND b.i = a.i),
      |m AS (SELECT label, max(na) AS n_ref, max(nb) AS n_cur,
      |    sum(dd) AS sdd, sum(ab) AS sab, sum(aa) AS saa, sum(bb) AS sbb
      |  FROM j GROUP BY 1)
      |SELECT label, n_ref, n_cur,
      |  round(sqrt(CAST(sdd AS DOUBLE)), 6) AS l2_shift,
      |  round(CASE WHEN CAST(saa AS DOUBLE) > 0 AND CAST(sbb AS DOUBLE) > 0
      |    THEN CAST(sab AS DOUBLE) /
      |      sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE))
      |    ELSE NULL END, 6) AS cos_sim
      |FROM m""".stripMargin

  /** Term burstiness ([[graft.operators.Lexicon.termBurstiness]]):
    * Church–Gale dispersion of the corpus' top-30 terms across the
    * documents containing them — mean occurrences per containing doc
    * and variance-to-mean ratio. Separates "everywhere" terms from
    * "hammered by a few documents" terms; exact-long folds replay.
    */
  def termBurstiness(s: SparkSession, dir: String): DataFrame =
    Lexicon.termBurstiness(t(s, dir, "documents"), "doc_id", "text")

  val termBurstinessSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |tc AS (SELECT doc_id, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |pt AS (SELECT w, CAST(sum(c) AS DECIMAL(38,0)) AS cfd,
      |    count(*) AS df,
      |    CAST(sum(c * c) AS DECIMAL(38,0)) AS c2
      |  FROM tc GROUP BY 1),
      |r AS (SELECT w AS term, CAST(cfd AS BIGINT) AS cf, df,
      |    round(CAST(cfd AS DOUBLE) / CAST(df AS DOUBLE), 6) AS burstiness,
      |    round(CASE WHEN CAST(cfd AS DOUBLE) / CAST(df AS DOUBLE) > 0
      |      THEN ((CAST(c2 AS DOUBLE) -
      |          CAST(cfd AS DOUBLE) * CAST(cfd AS DOUBLE) / CAST(df AS DOUBLE)) /
      |        CAST(df AS DOUBLE)) /
      |        (CAST(cfd AS DOUBLE) / CAST(df AS DOUBLE))
      |      ELSE 0.0 END, 6) AS vmr
      |  FROM pt),
      |k AS (SELECT *, CAST(row_number() OVER (ORDER BY cf DESC, term) AS BIGINT)
      |    AS rank FROM r)
      |SELECT rank, term, cf, df, burstiness, vmr FROM k WHERE rank <= 30""".stripMargin

  /** Per-document trigram novelty
    * ([[graft.operators.CorpusGrowth.ngramNovelty]]): fraction of each
    * document's distinct word trigrams first seen (smallest doc_id) in
    * that document — the cross-document staleness signal
    * within-document repetition cannot see. Two keyed aggregations
    * (by n-gram, then by doc); no windows over data.
    */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame =
    CorpusGrowth.ngramNovelty(t(s, dir, "documents"), "doc_id", "text", n = 3)

  val ngramNoveltySql: String =
    """WITH w AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents
      |  WHERE length(regexp_extract_all(text, '\S+')) >= 3),
      |g AS (SELECT DISTINCT doc_id, h FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |    i -> CAST(('0x' || substr(sha256(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
      |      1, 8)) AS BIGINT))) AS h FROM w)),
      |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams FROM g GROUP BY 1),
      |nov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_novel FROM (
      |  SELECT h, min(doc_id) AS doc_id FROM g GROUP BY 1) GROUP BY 1)
      |SELECT per.doc_id, per.n_ngrams,
      |  coalesce(nov.n_novel, 0) AS n_novel,
      |  round(CAST(coalesce(nov.n_novel, 0) AS DOUBLE) /
      |    CAST(per.n_ngrams AS DOUBLE), 6) AS novelty
      |FROM per LEFT JOIN nov USING (doc_id)""".stripMargin

  /** Heaps'-law vocabulary growth
    * ([[graft.operators.CorpusGrowth.vocabGrowth]]): cumulative tokens
    * vs cumulative distinct vocabulary over 10 equal doc-id ranges,
    * plus the local Heaps exponent between consecutive points — the
    * tokenizer-sizing / source-exhaustion curve. First-occurrence
    * attribution per word replaces 10 corpus rescans.
    */
  def vocabGrowth(s: SparkSession, dir: String): DataFrame =
    CorpusGrowth.vocabGrowth(t(s, dir, "documents"), "doc_id", "text", buckets = 10)

  val vocabGrowthSql: String =
    """WITH b AS (SELECT CAST(min(doc_id) AS BIGINT) AS lo,
      |    CAST(max(doc_id) AS BIGINT) - CAST(min(doc_id) AS BIGINT) + 1 AS span
      |  FROM documents),
      |d AS (SELECT ((CAST(doc_id AS BIGINT) - b.lo) * 10) // b.span + 1 AS bucket,
      |    CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok,
      |    doc_id, text
      |  FROM documents CROSS JOIN b),
      |dt AS (SELECT bucket, CAST(sum(tok) AS BIGINT) AS toks FROM d GROUP BY 1),
      |fw AS (SELECT w, min(bucket) AS bucket FROM (
      |  SELECT bucket, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w FROM d)
      |  WHERE w <> '' GROUP BY 1),
      |nw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_words FROM fw GROUP BY 1),
      |c AS (SELECT dt.bucket, dt.toks, coalesce(nw.new_words, 0) AS new_words
      |  FROM dt LEFT JOIN nw USING (bucket)),
      |cum AS (SELECT bucket,
      |    sum(toks) OVER (ORDER BY bucket) AS cum_tokens,
      |    sum(new_words) OVER (ORDER BY bucket) AS cum_vocab
      |  FROM c),
      |r AS (SELECT bucket, cum_tokens, cum_vocab,
      |    lag(cum_tokens) OVER (ORDER BY bucket) AS pt,
      |    lag(cum_vocab) OVER (ORDER BY bucket) AS pv
      |  FROM cum)
      |SELECT bucket, CAST(cum_tokens AS BIGINT) AS cum_tokens,
      |  CAST(cum_vocab AS BIGINT) AS cum_vocab,
      |  round(CASE WHEN pt IS NOT NULL AND cum_tokens > pt AND pv > 0
      |    THEN (ln(CAST(cum_vocab AS DOUBLE)) - ln(CAST(pv AS DOUBLE))) /
      |      (ln(CAST(cum_tokens AS DOUBLE)) - ln(CAST(pt AS DOUBLE)))
      |    ELSE NULL END, 6) AS heaps_beta
      |FROM r""".stripMargin

  /** Data-constrained epoch allocation
    * ([[graft.operators.Curation.epochAllocation]]): whole epochs per
    * source under a 100k-token budget with value decaying 0.5× per
    * repeat (Muennighoff et al. 2023) — greedy-by-marginal-value as a
    * single ranking over the |sources|·8-row pair table.
    */
  def epochAllocation(s: SparkSession, dir: String): DataFrame =
    Curation.epochAllocation(t(s, dir, "documents"), "source",
      TextFunctions.tokenCount(col("text")),
      budget = 100000L, maxEpochs = 8, delta = 0.5)

  val epochAllocationSql: String =
    """WITH m AS (SELECT source,
      |    CAST(sum(length(regexp_extract_all(text, '\S+'))) AS BIGINT) AS u
      |  FROM documents GROUP BY 1
      |  HAVING sum(length(regexp_extract_all(text, '\S+'))) > 0),
      |p AS (SELECT source, u, unnest(range(1, 9)) AS epoch FROM m),
      |v AS (SELECT *, round(CAST(u AS DOUBLE) * power(0.5, epoch - 1), 6) AS val
      |  FROM p),
      |c AS (SELECT *, sum(u) OVER (ORDER BY val DESC, source, epoch
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spent FROM v)
      |SELECT source, u AS unique_tokens,
      |  CAST(sum(CASE WHEN spent <= 100000 THEN 1 ELSE 0 END) AS BIGINT) AS epochs,
      |  CAST(sum(CASE WHEN spent <= 100000 THEN 1 ELSE 0 END) * u AS BIGINT)
      |    AS tokens_allocated,
      |  round(CAST(u AS DOUBLE) *
      |    (1 - power(0.5, sum(CASE WHEN spent <= 100000 THEN 1 ELSE 0 END))) /
      |    0.5, 6) AS effective_value
      |FROM c GROUP BY source, u""".stripMargin

  /** Per-source corpus scorecard — the curation dashboard as ONE
    * query, composing the audited per-doc signals: document/token
    * volume and share, exact-duplicate rate
    * (fingerprint-first-owner), mean token entropy
    * ([[graft.operators.Lexicon.tokenEntropy]]), mean trigram novelty
    * ([[graft.operators.CorpusGrowth.ngramNovelty]]), and
    * majority-language purity. Every mean folds the 6-dp-rounded
    * per-doc values through DECIMAL(27,6) (exact sum, one double
    * division) so the roll-up is fold-order-independent like its
    * inputs. Per-doc frames meet on the doc key; per-source tables
    * (lang mode, token total) come back by broadcast.
    */
  def corpusScorecard(s: SparkSession, dir: String): DataFrame =
    corpusScorecardFrame(t(s, dir, "documents"))

  /** [[corpusScorecard]] over any (doc_id, source, lang, text) frame —
    * the form [[graft.streaming.ScorecardStream]]'s parity gate folds
    * against.
    */
  def corpusScorecardFrame(docs: DataFrame): DataFrame = {
    val ent = Lexicon.tokenEntropy(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("entropy"))
    val nov = CorpusGrowth.ngramNovelty(docs, "doc_id", "text")
      .select(col("doc_id"), col("novelty"))
    val slim = docs.select(col("doc_id"), col("source"), col("lang"),
      TextFunctions.fingerprint(col("text")).as("__fp"))
    val firsts = slim.groupBy("__fp").agg(min("doc_id").as("__first"))
    val flagged = slim.join(firsts, Seq("__fp"))
      .select(col("doc_id"), col("source"), col("lang"),
        when(col("doc_id") === col("__first"), 0.0).otherwise(1.0).as("__dup"))
    val perSource = flagged
      .join(ent, Seq("doc_id"), "left")
      .join(nov, Seq("doc_id"), "left")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("__dup").as("__dups"),
        sum(col("entropy").cast("decimal(27,6)")).as("__ents"),
        count(col("entropy")).as("__entn"),
        sum(col("novelty").cast("decimal(27,6)")).as("__novs"),
        count(col("novelty")).as("__novn"))
    val langTop = docs.groupBy("source", "lang").agg(count(lit(1)).as("__c"))
      .groupBy("source").agg(max("__c").as("__top"))
    // corpus token total map-only off the raw text (== Σ ent.n_tokens:
    // \S+ runs survive normalization unchanged), so the denominator
    // never re-runs the entropy pipeline
    val total = docs.agg(
      sum(TextFunctions.tokenCount(col("text")).cast("long")).as("__tot"))
    perSource
      .join(broadcast(langTop), Seq("source"))
      .crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("__tot").cast("double"), 6)
          .as("token_share"),
        round(col("__dups") / col("n_docs").cast("double"), 6).as("dup_rate"),
        round(col("__ents").cast("double") / col("__entn").cast("double"), 6)
          .as("mean_entropy"),
        round(col("__novs").cast("double") / col("__novn").cast("double"), 6)
          .as("mean_novelty"),
        round(col("__top").cast("double") / col("n_docs").cast("double"), 6)
          .as("lang_purity"))
  }

  val corpusScorecardSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |tc AS (SELECT doc_id, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |ent AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    round(ln(CAST(sum(c) AS DOUBLE)) -
      |      CAST(sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 7)
      |        AS DECIMAL(27,7))) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS entropy
      |  FROM tc GROUP BY 1),
      |ws AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents
      |  WHERE length(regexp_extract_all(text, '\S+')) >= 3),
      |g AS (SELECT DISTINCT doc_id, h FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |    i -> CAST(('0x' || substr(sha256(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
      |      1, 8)) AS BIGINT))) AS h FROM ws)),
      |nov AS (SELECT per.doc_id,
      |    round(CAST(coalesce(f.n_novel, 0) AS DOUBLE) /
      |      CAST(per.n AS DOUBLE), 6) AS novelty
      |  FROM (SELECT doc_id, count(*) AS n FROM g GROUP BY 1) per
      |  LEFT JOIN (SELECT doc_id, count(*) AS n_novel FROM (
      |    SELECT h, min(doc_id) AS doc_id FROM g GROUP BY 1) GROUP BY 1) f
      |  USING (doc_id)),
      |fp AS (SELECT doc_id, source, lang,
      |    sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents),
      |d AS (SELECT f.doc_id, f.source, f.lang,
      |    CASE WHEN f.doc_id = fi.first_id THEN 0.0 ELSE 1.0 END AS is_dup
      |  FROM fp f JOIN (SELECT fp, min(doc_id) AS first_id FROM fp GROUP BY 1) fi
      |  USING (fp)),
      |lt AS (SELECT source, max(c) AS top FROM (
      |  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2)
      |  GROUP BY 1),
      |tot AS (SELECT CAST(sum(length(regexp_extract_all(text, '\S+'))) AS BIGINT)
      |  AS t FROM documents),
      |agg AS (SELECT d.source, count(*) AS n_docs,
      |    CAST(sum(ent.n_tokens) AS BIGINT) AS n_tokens,
      |    sum(d.is_dup) AS dups,
      |    sum(CAST(ent.entropy AS DECIMAL(27,6))) AS ents,
      |    count(ent.entropy) AS entn,
      |    sum(CAST(nov.novelty AS DECIMAL(27,6))) AS novs,
      |    count(nov.novelty) AS novn
      |  FROM d LEFT JOIN ent USING (doc_id) LEFT JOIN nov USING (doc_id)
      |  GROUP BY 1)
      |SELECT agg.source, agg.n_docs, agg.n_tokens,
      |  round(CAST(agg.n_tokens AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
      |    AS token_share,
      |  round(agg.dups / CAST(agg.n_docs AS DOUBLE), 6) AS dup_rate,
      |  round(CAST(agg.ents AS DOUBLE) / CAST(agg.entn AS DOUBLE), 6)
      |    AS mean_entropy,
      |  round(CAST(agg.novs AS DOUBLE) / CAST(agg.novn AS DOUBLE), 6)
      |    AS mean_novelty,
      |  round(CAST(lt.top AS DOUBLE) / CAST(agg.n_docs AS DOUBLE), 6)
      |    AS lang_purity
      |FROM agg JOIN lt USING (source) CROSS JOIN tot""".stripMargin

  /** Substring dedup as an edit
    * ([[graft.operators.SubstringDedup.scrub]]): rebuild each
    * document with every cross-document duplicated 8-gram span
    * removed, keeping the copy in the gram's first-owner document —
    * the "remove one copy" pass over the same hashed-gram machinery
    * q_dup_spans reports on. One per-doc coverage sweep; the oracle
    * replays the identical sha-derived hash, window order, and
    * order-stable reconstruction.
    */
  def dedupScrub(s: SparkSession, dir: String): DataFrame =
    SubstringDedup.scrub(t(s, dir, "documents"), "doc_id", "text", n = 8)

  val dedupScrubSql: String =
    """WITH norm AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, unnest(string_split(nt, ' ')) AS w,
      |    generate_subscripts(string_split(nt, ' '), 1) AS p
      |  FROM norm),
      |grams AS (
      |  SELECT doc_id, p AS pos,
      |    CAST(('0x' || substr(sha256(
      |      w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
      |      lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win || ' ' ||
      |      lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win || ' ' ||
      |      lead(w, 7) OVER win), 1, 8)) AS BIGINT) AS gram
      |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY p)
      |  QUALIFY lead(w, 7) OVER win IS NOT NULL),
      |own AS (SELECT gram, min(doc_id) AS owner FROM grams GROUP BY 1
      |  HAVING min(doc_id) <> max(doc_id)),
      |bad AS (SELECT g.doc_id, g.pos FROM grams g JOIN own o USING (gram)
      |  WHERE g.doc_id <> o.owner),
      |u AS (SELECT doc_id, pos, 0 AS kind, NULL AS w FROM bad
      |  UNION ALL SELECT doc_id, p AS pos, 1 AS kind, w FROM tok),
      |f AS (SELECT doc_id, pos, kind, w,
      |    max(CASE WHEN kind = 0 THEN pos END) OVER (
      |      PARTITION BY doc_id ORDER BY pos, kind
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_s
      |  FROM u),
      |kept AS (SELECT doc_id, pos, w FROM f
      |  WHERE kind = 1 AND (last_s IS NULL OR pos - last_s > 7)),
      |ntok AS (SELECT doc_id,
      |    CAST(length(string_split(nt, ' ')) AS BIGINT) AS n_tokens FROM norm)
      |SELECT n.doc_id, n.n_tokens,
      |  n.n_tokens - count(k.w) AS n_removed,
      |  coalesce(string_agg(k.w, ' ' ORDER BY k.pos), '') AS clean_text
      |FROM ntok n LEFT JOIN kept k USING (doc_id)
      |GROUP BY n.doc_id, n.n_tokens""".stripMargin

  /** Readability ([[graft.functions.TextFunctions.readability]]):
    * Flesch reading-ease and Flesch–Kincaid grade per document, over
    * deterministic vowel-group syllable counts — the
    * educational-value / complexity axis of quality filtering,
    * orthogonal to the length/stopword heuristics. Map-only, zero
    * shuffles.
    */
  def readability(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      TextFunctions.readability(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_words").as("n_words"),
        col("r.n_sentences").as("n_sentences"),
        col("r.n_syllables").as("n_syllables"),
        col("r.flesch").as("flesch"), col("r.fk_grade").as("fk_grade"))

  val readabilitySql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
      |    CAST(greatest(length(regexp_extract_all(text, '[.!?]+')), 1)
      |      AS BIGINT) AS n_sentences,
      |    CAST(length(regexp_extract_all(lower(text), '[aeiouy]+')) +
      |      length(list_filter(
      |        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
      |        w -> w <> '' AND NOT regexp_matches(w, '[aeiouy]')))
      |      AS BIGINT) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  CASE WHEN n_words > 0 THEN round(206.835 -
      |    1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) -
      |    84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6)
      |  END AS flesch,
      |  CASE WHEN n_words > 0 THEN round(
      |    0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) +
      |    11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) -
      |    15.59, 6)
      |  END AS fk_grade
      |FROM base""".stripMargin

  /** Matryoshka-truncation recall: recall@5 of brute-force cosine
    * search over the FIRST d dimensions (renormalized) against the
    * full-dimension ground truth, for d ∈ {8, 16, 32} of the 64-dim
    * corpus — the published matryoshka-representation evaluation that
    * prices "store d dims instead of 64" as a retrieval-quality
    * number. At 100 TB the embedding store dominates storage, so this
    * is a first-class capacity decision, measured with real corpus
    * geometry like [[annRecall]] (same bounded probe set, k-bounded
    * joins; the corpus-sized work stays inside the audited brute-force
    * operator). Vectors whose truncated prefix is all-zero drop from
    * that dim's rows (no direction to search on), identically in both
    * engines.
    */
  def matryoshkaRecall(s: SparkSession, dir: String): DataFrame = {
    val k = 5
    val e = t(s, dir, "embeddings")
    val truth = SimilaritySearch.bruteForceTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id")
    Seq(8, 16, 32).map { d =>
      val td = e.select(col("vec_id"), slice(col("embedding"), 1, d).as("emb"))
      val approx = SimilaritySearch.bruteForceTopK(
        td.filter(col("vec_id") < 10), td, "vec_id", "emb", k)
        .select("query_id", "neighbor_id")
      val hits = truth.join(approx, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      approx.select("query_id").distinct()
        .join(hits, Seq("query_id"), "left")
        .select(lit(d.toLong).as("dim"), col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)) / lit(k.toDouble), 6)
            .as("recall_at_5"))
    }.reduce(_ unionAll _)
  }

  val matryoshkaRecallSql: String =
    """WITH dims AS (SELECT unnest([8, 16, 32]) AS d),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, list_transform(v,
      |    x -> x / sqrt(list_dot_product(v, v))) AS nv
      |  FROM e WHERE list_dot_product(v, v) > 0),
      |q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      |exs AS (SELECT query_id, n.vec_id AS neighbor_id,
      |    round(list_dot_product(qv, n.nv), 6) AS cos_sim
      |  FROM q, n WHERE n.vec_id <> query_id),
      |exr AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM exs),
      |ex AS (SELECT query_id, neighbor_id FROM exr WHERE rn <= 5),
      |tn AS (SELECT d, vec_id, list_transform(v[1:d],
      |    x -> x / sqrt(list_dot_product(v[1:d], v[1:d]))) AS tv
      |  FROM e CROSS JOIN dims WHERE list_dot_product(v[1:d], v[1:d]) > 0),
      |tq AS (SELECT d, vec_id AS query_id, tv AS qv FROM tn WHERE vec_id < 10),
      |ts AS (SELECT tq.d, tq.query_id, tn.vec_id AS neighbor_id,
      |    round(list_dot_product(tq.qv, tn.tv), 6) AS cos_sim
      |  FROM tq JOIN tn ON tn.d = tq.d AND tn.vec_id <> tq.query_id),
      |tr AS (SELECT *, row_number() OVER (PARTITION BY d, query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM ts),
      |ap AS (SELECT d, query_id, neighbor_id FROM tr WHERE rn <= 5),
      |hits AS (SELECT ap.d, ap.query_id, CAST(count(*) AS BIGINT) AS n_hits
      |  FROM ap JOIN ex USING (query_id, neighbor_id) GROUP BY 1, 2)
      |SELECT CAST(b.d AS BIGINT) AS dim, b.query_id,
      |  coalesce(h.n_hits, 0) AS n_hits,
      |  round(coalesce(h.n_hits, 0) / 5.0, 6) AS recall_at_5
      |FROM (SELECT DISTINCT d, query_id FROM tq) b
      |LEFT JOIN hits h ON h.d = b.d AND h.query_id = b.query_id""".stripMargin

  /** Benford first-digit audit over `l_extendedprice`: observed vs
    * expected leading-digit frequencies (Benford's law,
    * `log10(1 + 1/d)`) plus the chi-square statistic each digit
    * contributes — the classic fabricated-/truncated-data smell test
    * for numeric columns feeding a pipeline. One map-side-combined
    * 9-row aggregate; expectations are literals.
    */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_extendedprice") > 0)
      .select(substring(col("l_extendedprice").cast("string"), 1, 1)
        .cast("int").as("digit"))
      // values in (0,1) lead with '0' (expected = log10(1+1/0) = Inf)
      // and extreme magnitudes can render scientific notation whose
      // first char is not a digit (null) — a generic audit keeps only
      // the nine Benford digits
      .filter(col("digit").between(1, 9))
    val counts = li.groupBy("digit").agg(count(lit(1)).as("n"))
    val expected = log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double"))
    counts
      .crossJoin(broadcast(counts.agg(sum("n").as("__tot"))))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__tot").cast("double"), 6)
          .as("observed"),
        round(expected, 6).as("expected"),
        round(pow(col("n").cast("double") -
            expected * col("__tot").cast("double"), 2) /
          (expected * col("__tot").cast("double")), 6).as("chi2_term"))
  }

  val benfordAuditSql: String =
    """WITH d AS (SELECT CAST(substr(CAST(l_extendedprice AS VARCHAR), 1, 1)
      |    AS INT) AS digit
      |  FROM lineitem WHERE l_extendedprice > 0),
      |c AS (SELECT digit, count(*) AS n FROM d
      |  WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
      |SELECT digit, CAST(n AS BIGINT) AS n,
      |  round(CAST(n AS DOUBLE) / tot, 6) AS observed,
      |  round(log10(1.0 + 1.0 / digit), 6) AS expected,
      |  round(pow(CAST(n AS DOUBLE) -
      |      log10(1.0 + 1.0 / digit) * tot, 2) /
      |    (log10(1.0 + 1.0 / digit) * tot), 6) AS chi2_term
      |FROM c CROSS JOIN t""".stripMargin

  /** Referential-integrity audit: orphan counts and rates for the
    * fact-to-dimension links a pipeline joins on (lineitem→orders,
    * orders→customer, lineitem→part, lineitem→supplier) — silent
    * orphans turn inner joins into row loss. Each link is one
    * left-anti count against the key side, plus the denominator —
    * distinct-key anti joins on the join key, never row×row.
    */
  def fkIntegrity(s: SparkSession, dir: String): DataFrame = {
    // fully declarative — each link is a grand aggregate over the
    // anti join crossed with the fact count; nothing touches the
    // driver, the union is 4 one-row frames
    def link(
        name: String, fact: DataFrame, key: String,
        dim: DataFrame, dimKey: String): DataFrame =
      fact
        .join(dim.select(col(dimKey).as(key)).distinct(), Seq(key), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .crossJoin(broadcast(fact.agg(count(lit(1)).as("n_rows"))))
        .select(lit(name).as("link"), col("n_rows"), col("n_orphans"),
          round(col("n_orphans").cast("double") /
            when(col("n_rows") > 0, col("n_rows").cast("double")), 6)
            .as("orphan_rate"))
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    Seq(
      link("lineitem->orders", li.select("l_orderkey"), "l_orderkey",
        o, "o_orderkey"),
      link("orders->customer", o.select("o_custkey"), "o_custkey",
        t(s, dir, "customer"), "c_custkey"),
      link("lineitem->part", li.select("l_partkey"), "l_partkey",
        t(s, dir, "part"), "p_partkey"),
      link("lineitem->supplier", li.select("l_suppkey"), "l_suppkey",
        t(s, dir, "supplier"), "s_suppkey"))
      .reduce(_ unionAll _)
  }

  val fkIntegritySql: String =
    """SELECT 'lineitem->orders' AS link,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_orphans,
      |  round(CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS orphan_rate
      |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |UNION ALL
      |SELECT 'orders->customer',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  round(CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6)
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |UNION ALL
      |SELECT 'lineitem->part',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  round(CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6)
      |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |UNION ALL
      |SELECT 'lineitem->supplier',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  round(CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6)
      |FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey""".stripMargin

  /** Shuffle-key skew diagnosis ([[graft.operators.Skew.skewReport]]):
    * the per-key row-count distribution of two prospective join/agg
    * keys (events.user_id, lineitem.l_orderkey), with the exact
    * integer-ceil `suggested_salt` — the measurement that decides
    * whether [[graft.operators.Skew.saltedJoin]] is worth its
    * overhead BEFORE wiring a 100 TB shuffle. Key-count tables are
    * the only corpus-sized pass; percentiles run over key
    * cardinality.
    */
  def skewReport(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.skewReport(t(s, dir, "events"), "user_id")
      .unionAll(graft.operators.Skew
        .skewReport(t(s, dir, "lineitem"), "l_orderkey"))

  val skewReportSql: String =
    """WITH a AS (SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY 1),
      |b AS (SELECT l_orderkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1),
      |ra AS (SELECT 'user_id' AS key, CAST(sum(cnt) AS BIGINT) AS n_rows,
      |    CAST(count(*) AS BIGINT) AS n_keys,
      |    round(quantile_cont(cnt, 0.5), 6) AS p50_rows_per_key,
      |    round(quantile_cont(cnt, 0.99), 6) AS p99_rows_per_key,
      |    CAST(max(cnt) AS BIGINT) AS max_rows_per_key
      |  FROM a),
      |rb AS (SELECT 'l_orderkey' AS key, CAST(sum(cnt) AS BIGINT) AS n_rows,
      |    CAST(count(*) AS BIGINT) AS n_keys,
      |    round(quantile_cont(cnt, 0.5), 6) AS p50_rows_per_key,
      |    round(quantile_cont(cnt, 0.99), 6) AS p99_rows_per_key,
      |    CAST(max(cnt) AS BIGINT) AS max_rows_per_key
      |  FROM b),
      |u AS (SELECT * FROM ra UNION ALL SELECT * FROM rb)
      |SELECT key, n_rows, n_keys,
      |  round(CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE), 6)
      |    AS avg_rows_per_key,
      |  p50_rows_per_key, p99_rows_per_key, max_rows_per_key,
      |  round(CAST(max_rows_per_key AS DOUBLE) * CAST(n_keys AS DOUBLE) /
      |    CAST(n_rows AS DOUBLE), 6) AS skew_factor,
      |  CAST(greatest(1, (max_rows_per_key * 32 + n_rows - 1) // n_rows)
      |    AS BIGINT) AS suggested_salt
      |FROM u""".stripMargin

  // ------------------------------------------------------------ registry

  /** name -> (spark, sfDir) -> result. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_filter_project" -> (scanFilterProject _),
    "q_when_case" -> (whenCase _),
    "q_union_dedup" -> (unionDedup _),
    "q_dup_gate" -> (dupGate _),
    "q_agg_pricing" -> (aggPricing _),
    "q_topk_per_group" -> (topkPerGroup _),
    "q_window_lag_lead" -> (windowLagLead _),
    "q_window_running" -> (windowRunning _),
    "q_sessionize" -> (sessionize _),
    "q_zorder_cells" -> (zorderCells _),
    "q_tfidf_topterms" -> (tfidfTopTerms _),
    "q_quality_classifier" -> (qualityClassifier _),
    "q_simsearch_pq" -> (simsearchPq _),
    "q_simsearch_ivfpq" -> (simsearchIvfPq _),
    "q_agg_rollup" -> (aggRollup _),
    "q_agg_grouping_sets" -> (aggGroupingSets _),
    "q_window_time_range" -> (windowTimeRange _),
    "q_count_distinct" -> (countDistinct _),
    "q_count_distinct_approx" -> (countDistinctApprox _),
    "q_pivot_revenue" -> (pivotRevenue _),
    "q_unpivot_metrics" -> (unpivotMetrics _),
    "q_decontaminate_bloom" -> (decontaminateBloom _),
    "q_semantic_dedup" -> (semanticDedup _),
    "q_gaps_islands" -> (gapsIslands _),
    "q_global_max_stamp" -> (globalMaxStamp _),
    "q_row_fingerprint" -> (rowFingerprint _),
    "q_join_revenue" -> (joinRevenue _),
    "q_distinct_flags" -> (distinctFlags _),
    "q_json_extract" -> (jsonExtract _),
    "q_word_frequencies" -> (wordFrequencies _),
    "q_heavy_hitters" -> (heavyHitters _),
    "q_orders_by_month" -> (ordersByMonth _),
    "q_scd_status" -> (scdStatus _),
    "q_scd_merge_current" -> (scdMergeCurrent _),
    "q_asof_join" -> (asofJoin _),
    "q_asof_join_native" -> (asofJoinNative _),
    "q_range_join" -> (rangeJoin _),
    "q_sample_stratified" -> (sampleStratified _),
    "q_sample_mix" -> (sampleMix _),
    "q_doc_packing" -> (docPacking _),
    "q_group_percentiles" -> (groupPercentiles _),
    "q_group_percentiles_approx" -> (groupPercentilesApprox _),
    "q_event_windows" -> (eventWindows _),
    "q_salted_agg" -> (saltedAgg _),
    "q_bm25" -> (bm25Score _),
    "q_text_redact" -> (textRedact _),
    "q_decontaminate" -> (decontaminate _),
    "q_dedup_exact" -> (dedupExact _),
    "q_dedup_minhash" -> (dedupMinHash _),
    "q_dedup_incremental" -> (dedupIncremental _),
    "q_dedup_clusters" -> (dedupClusters _),
    "q_dedup_clusters_stars" -> (dedupClustersStars _),
    "q_cluster_representatives" -> (clusterRepresentatives _),
    "q_ngram_jaccard" -> (ngramJaccardPairs _),
    "q_dedup_recall" -> (dedupRecall _),
    "q_winnow_overlap" -> (winnowOverlap _),
    "q_dedup_simhash" -> (dedupSimHash _),
    "q_simsearch_topk" -> (simsearchTopK _),
    "q_simsearch_lsh" -> (simsearchLsh _),
    "q_simsearch_lsh_mp" -> (simsearchLshMultiProbe _),
    "q_simsearch_ivf" -> (simsearchIvf _),
    "q_embedding_quantized" -> (embeddingQuantized _),
    "q_embedding_neardup" -> (embeddingNearDup _),
    "q_text_stats" -> (textStats _),
    "q_text_repetition" -> (textRepetition _),
    "q_text_chunks" -> (textChunks _),
    "q_lang_id" -> (langId _),
    "q_lm_perplexity" -> (lmPerplexity _),
    "q_lm_perplexity_kn" -> (lmPerplexityKn _),
    "q_dup_spans" -> (dupSpans _),
    "q_source_overlap" -> (sourceOverlap _),
    "q_collocations" -> (collocations _),
    "q_token_budget" -> (tokenBudget _),
    "q_hard_negatives" -> (hardNegatives _),
    "q_training_triplets" -> (trainingTriplets _),
    "q_curriculum_bins" -> (curriculumBins _),
    "q_shard_assign" -> (shardAssign _),
    "q_source_caps" -> (sourceCaps _),
    "q_anti_join" -> (antiJoin _),
    "q_semi_join" -> (semiJoin _),
    "q_length_histogram" -> (lengthHistogram _),
    "q_session_windows" -> (sessionWindows _),
    "q_cohort_retention" -> (cohortRetention _),
    "q_agg_cube" -> (aggCube _),
    "q_set_ops" -> (setOps _),
    "q_sample_exact" -> (sampleExact _),
    "q_train_test_split" -> (trainTestSplit _),
    "q_global_topn" -> (globalTopN _),
    "q_funnel" -> (funnel _),
    "q_group_outliers" -> (groupOutliers _),
    "q_bpe_merges" -> (bpeMerges _),
    "q_edit_distance" -> (editDistancePairs _),
    "q_distribution_drift" -> (distributionDrift _),
    "q_psi_drift" -> (psiDrift _),
    "q_containment" -> (containmentPairs _),
    "q_multimodal_features" -> (multimodalFeatures _),
    "q_graph_triangles" -> (graphTriangles _),
    "q_graph_kcore" -> (graphKcore _),
    "q_graph_pagerank" -> (graphPageRank _),
    "q_graph_walks" -> (graphWalks _),
    "q_inverted_index" -> (invertedIndex _),
    "q_table_profile" -> (tableProfile _),
    "q_quality_rules" -> (qualityRules _),
    "q_dsir_weights" -> (dsirWeights _),
    "q_snapshot_diff" -> (snapshotDiff _),
    "q_corr_matrix" -> (corrMatrix _),
    "q_ols_coeffs" -> (olsCoeffs _),
    "q_pca_cov" -> (pcaCov _),
    "q_mad_outliers" -> (madOutliers _),
    "q_mad_outliers_approx" -> (madOutliersApprox _),
    "q_embedding_centroids" -> (embeddingCentroids _),
    "q_split_leakage_safe" -> (splitLeakageSafe _),
    "q_blocklist" -> (blocklistGate _),
    "q_source_overlap_sketch" -> (sourceOverlapSketch _),
    "q_ann_recall" -> (annRecall _),
    "q_weighted_sample" -> (weightedSample _),
    "q_weighted_sample_grouped" -> (weightedSampleGrouped _),
    "q_unicode_norm" -> (unicodeNorm _),
    "q_decay_weights" -> (decayWeights _),
    "q_compression_ratio" -> (compressionRatio _),
    "q_source_divergence" -> (sourceDivergence _),
    "q_zipf_slope" -> (zipfSlope _),
    "q_diverse_subset" -> (diverseSubset _),
    "q_mixture_plan" -> (mixturePlan _),
    "q_vocab_coverage" -> (vocabCoverage _),
    "q_distinctive_terms" -> (distinctiveTerms _),
    "q_token_entropy" -> (tokenEntropy _),
    "q_event_transitions" -> (eventTransitions _),
    "q_dim_profile" -> (dimProfile _),
    "q_centroid_outliers" -> (centroidOutliers _),
    "q_lsh_plan" -> (lshPlanQuery _),
    "q_quality_calibrated" -> (qualityCalibrated _),
    "q_decontaminate_fuzzy" -> (decontaminateFuzzy _),
    "q_curate_corpus" -> (curateCorpus _),
    "q_source_dedup_matrix" -> (sourceDedupMatrix _),
    "q_embedding_drift" -> (embeddingDrift _),
    "q_term_burstiness" -> (termBurstiness _),
    "q_ngram_novelty" -> (ngramNovelty _),
    "q_vocab_growth" -> (vocabGrowth _),
    "q_epoch_allocation" -> (epochAllocation _),
    "q_corpus_scorecard" -> (corpusScorecard _),
    "q_dedup_scrub" -> (dedupScrub _),
    "q_readability" -> (readability _),
    "q_matryoshka_recall" -> (matryoshkaRecall _),
    "q_benford_audit" -> (benfordAudit _),
    "q_fk_integrity" -> (fkIntegrity _),
    "q_skew_report" -> (skewReport _))

  /** name -> DuckDB oracle SQL. EVERY registered query is oracled —
    * including q_compression_ratio (adjudicated on pinned kernel
    * constants since DuckDB has no deflate) and the LSH path (its
    * planes are sha-256-derived and DuckDB-reproducible).
    */
  val oracles: Map[String, String] = Map(
    "q_compression_ratio" -> compressionRatioSql,
    "q_source_divergence" -> sourceDivergenceSql,
    "q_zipf_slope" -> zipfSlopeSql,
    "q_diverse_subset" -> diverseSubsetSql,
    "q_mixture_plan" -> mixturePlanSql,
    "q_vocab_coverage" -> vocabCoverageSql,
    "q_distinctive_terms" -> distinctiveTermsSql,
    "q_token_entropy" -> tokenEntropySql,
    "q_event_transitions" -> eventTransitionsSql,
    "q_dim_profile" -> dimProfileSql,
    "q_centroid_outliers" -> centroidOutliersSql,
    "q_lsh_plan" -> lshPlanSql,
    "q_quality_calibrated" -> qualityCalibratedSql,
    "q_decontaminate_fuzzy" -> decontaminateFuzzySql,
    "q_curate_corpus" -> curateCorpusSql,
    "q_source_dedup_matrix" -> sourceDedupMatrixSql,
    "q_embedding_drift" -> embeddingDriftSql,
    "q_term_burstiness" -> termBurstinessSql,
    "q_ngram_novelty" -> ngramNoveltySql,
    "q_vocab_growth" -> vocabGrowthSql,
    "q_epoch_allocation" -> epochAllocationSql,
    "q_corpus_scorecard" -> corpusScorecardSql,
    "q_dedup_scrub" -> dedupScrubSql,
    "q_readability" -> readabilitySql,
    "q_matryoshka_recall" -> matryoshkaRecallSql,
    "q_benford_audit" -> benfordAuditSql,
    "q_fk_integrity" -> fkIntegritySql,
    "q_skew_report" -> skewReportSql,
    "q_scan_filter_project" -> scanFilterProjectSql,
    "q_when_case" -> whenCaseSql,
    "q_union_dedup" -> unionDedupSql,
    "q_dup_gate" -> dupGateSql,
    "q_agg_pricing" -> aggPricingSql,
    "q_topk_per_group" -> topkPerGroupSql,
    "q_window_lag_lead" -> windowLagLeadSql,
    "q_window_running" -> windowRunningSql,
    "q_sessionize" -> sessionizeSql,
    "q_zorder_cells" -> zorderCellsSql,
    "q_tfidf_topterms" -> tfidfTopTermsSql,
    "q_quality_classifier" -> qualityClassifierSql,
    "q_simsearch_pq" -> simsearchPqSql,
    "q_simsearch_ivfpq" -> simsearchIvfPqSql,
    "q_agg_rollup" -> aggRollupSql,
    "q_agg_grouping_sets" -> aggGroupingSetsSql,
    "q_window_time_range" -> windowTimeRangeSql,
    "q_count_distinct" -> countDistinctSql,
    "q_count_distinct_approx" -> countDistinctApproxSql,
    "q_pivot_revenue" -> pivotRevenueSql,
    "q_unpivot_metrics" -> unpivotMetricsSql,
    "q_decontaminate_bloom" -> decontaminateBloomSql,
    "q_semantic_dedup" -> semanticDedupSql,
    "q_gaps_islands" -> gapsIslandsSql,
    "q_global_max_stamp" -> globalMaxStampSql,
    "q_row_fingerprint" -> rowFingerprintSql,
    "q_join_revenue" -> joinRevenueSql,
    "q_distinct_flags" -> distinctFlagsSql,
    "q_json_extract" -> jsonExtractSql,
    "q_word_frequencies" -> wordFrequenciesSql,
    "q_heavy_hitters" -> heavyHittersSql,
    "q_orders_by_month" -> ordersByMonthSql,
    "q_scd_status" -> scdStatusSql,
    "q_scd_merge_current" -> scdMergeCurrentSql,
    "q_asof_join" -> asofJoinSql,
    "q_asof_join_native" -> asofJoinNativeSql,
    "q_range_join" -> rangeJoinSql,
    "q_sample_stratified" -> sampleStratifiedSql,
    "q_sample_mix" -> sampleMixSql,
    "q_doc_packing" -> docPackingSql,
    "q_group_percentiles" -> groupPercentilesSql,
    "q_group_percentiles_approx" -> groupPercentilesApproxSql,
    "q_event_windows" -> eventWindowsSql,
    "q_salted_agg" -> saltedAggSql,
    "q_bm25" -> bm25ScoreSql,
    "q_text_redact" -> textRedactSql,
    "q_decontaminate" -> decontaminateSql,
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_minhash" -> dedupMinHashSql,
    "q_dedup_incremental" -> dedupIncrementalSql,
    "q_dedup_clusters" -> dedupClustersSql,
    "q_dedup_clusters_stars" -> dedupClustersStarsSql,
    "q_ngram_jaccard" -> ngramJaccardPairsSql,
    "q_winnow_overlap" -> winnowOverlapSql,
    "q_dedup_simhash" -> dedupSimHashSql,
    "q_simsearch_topk" -> simsearchTopKSql,
    "q_simsearch_lsh" -> simsearchLshSql,
    "q_simsearch_lsh_mp" -> simsearchLshMultiProbeSql,
    "q_simsearch_ivf" -> simsearchIvfSql,
    "q_embedding_quantized" -> embeddingQuantizedSql,
    "q_embedding_neardup" -> embeddingNearDupSql,
    "q_text_stats" -> textStatsSql,
    "q_text_repetition" -> textRepetitionSql,
    "q_text_chunks" -> textChunksSql,
    "q_lang_id" -> langIdSql,
    "q_lm_perplexity" -> lmPerplexitySql,
    "q_lm_perplexity_kn" -> lmPerplexityKnSql,
    "q_dup_spans" -> dupSpansSql,
    "q_source_overlap" -> sourceOverlapSql,
    "q_collocations" -> collocationsSql,
    "q_token_budget" -> tokenBudgetSql,
    "q_hard_negatives" -> hardNegativesSql,
    "q_training_triplets" -> trainingTripletsSql,
    "q_curriculum_bins" -> curriculumBinsSql,
    "q_shard_assign" -> shardAssignSql,
    "q_source_caps" -> sourceCapsSql,
    "q_anti_join" -> antiJoinSql,
    "q_semi_join" -> semiJoinSql,
    "q_length_histogram" -> lengthHistogramSql,
    "q_session_windows" -> sessionWindowsSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_agg_cube" -> aggCubeSql,
    "q_set_ops" -> setOpsSql,
    "q_sample_exact" -> sampleExactSql,
    "q_train_test_split" -> trainTestSplitSql,
    "q_global_topn" -> globalTopNSql,
    "q_funnel" -> funnelSql,
    "q_group_outliers" -> groupOutliersSql,
    "q_bpe_merges" -> bpeMergesSql,
    "q_edit_distance" -> editDistancePairsSql,
    "q_distribution_drift" -> distributionDriftSql,
    "q_psi_drift" -> psiDriftSql,
    "q_cluster_representatives" -> clusterRepresentativesSql,
    "q_containment" -> containmentPairsSql,
    "q_multimodal_features" -> multimodalFeaturesSql,
    "q_graph_triangles" -> graphTrianglesSql,
    "q_graph_kcore" -> graphKcoreSql,
    "q_graph_pagerank" -> graphPageRankSql,
    "q_graph_walks" -> graphWalksSql,
    "q_inverted_index" -> invertedIndexSql,
    "q_table_profile" -> tableProfileSql,
    "q_quality_rules" -> qualityRulesSql,
    "q_dsir_weights" -> dsirWeightsSql,
    "q_snapshot_diff" -> snapshotDiffSql,
    "q_corr_matrix" -> corrMatrixSql,
    "q_ols_coeffs" -> olsCoeffsSql,
    "q_pca_cov" -> pcaCovSql,
    "q_mad_outliers" -> madOutliersSql,
    "q_mad_outliers_approx" -> madOutliersApproxSql,
    "q_embedding_centroids" -> embeddingCentroidsSql,
    "q_split_leakage_safe" -> splitLeakageSafeSql,
    "q_blocklist" -> blocklistGateSql,
    "q_source_overlap_sketch" -> sourceOverlapSketchSql,
    "q_ann_recall" -> annRecallSql,
    "q_dedup_recall" -> dedupRecallSql,
    "q_weighted_sample" -> weightedSampleSql,
    "q_weighted_sample_grouped" -> weightedSampleGroupedSql,
    "q_unicode_norm" -> unicodeNormSql,
    "q_decay_weights" -> decayWeightsSql)
}
