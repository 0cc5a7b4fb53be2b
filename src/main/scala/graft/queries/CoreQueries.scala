package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.t
import graft.functions.TextFunctions

/** Split from the monolithic Queries.scala registry (round 11);
  * registered via [[graft.Queries.all]], oracled via [[graft.Queries.oracles]].
  */
object CoreQueries {

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

  /** ORC round-trip: a lineitem slice written as ORC (the other
    * columnar interchange format large pipelines speak), read back,
    * and aggregated — the engine's ORC source/sink proved end-to-end.
    * The oracle runs the SAME aggregate over the original parquet, so
    * the gate holds only if the round trip is lossless (values,
    * types, row count). Decimal-ridden sum, order-independent.
    */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = StreamGateQueries.tempRoot("graft_q_orc_roundtrip")
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate")
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_orderkey")).as("max_key"))
  }

  val orcRoundtripSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  min(l_shipdate) AS first_ship,
      |  max(l_orderkey) AS max_key
      |FROM lineitem GROUP BY 1""".stripMargin

  /** The SQL rank family per group — ntile / percent_rank / cume_dist
    * / dense_rank over a per-priority total order (price desc, key
    * tie-break). One exchange on the partition key; the group count
    * is dimension-bounded (5 priorities), so each partition sorts
    * locally — for DATA-WIDE quantiles over unbounded key spaces the
    * sketch-based percentile family is the scale path, not a global
    * window.
    */
  def windowRanks(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderpriority"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cum_dist"),
      dense_rank().over(w).cast("long").as("drank"))
  }

  val windowRanksSql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cum_dist,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drank
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |  ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin

  /** Pivot with an EXPLICIT value list (no extra distinct pass over
    * the data — the spine the reference's dynamic pivots lack):
    * per-nation customer counts fanned across the five market
    * segments, absent combinations zero-filled. One map-side-combined
    * aggregate; output bounded by |nations| × |segments|.
    */
  def pivotSegments(s: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val piv = t(s, dir, "customer")
      .groupBy("c_nationkey")
      .pivot("c_mktsegment", segs)
      .agg(count(lit(1)))
    piv.select(col("c_nationkey") +:
      segs.map(g => coalesce(col(s"`$g`"), lit(0L)).as(g)): _*)
  }

  val pivotSegmentsSql: String = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val cols = segs.map(g =>
      s"""CAST(count(CASE WHEN c_mktsegment = '$g' THEN 1 END) AS BIGINT) AS "$g"""")
      .mkString(",\n|  ")
    s"""SELECT c_nationkey,
      |  $cols
      |FROM customer GROUP BY 1""".stripMargin
  }
}
