package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Queries.t
import graft.sources.VersionedTable

/** The lakehouse storage layer, oracled end-to-end: every query here
  * routes its data THROUGH [[graft.sources.VersionedTable]] (commit →
  * manifest → pinned read) and must still hash-match a DuckDB oracle
  * running directly over the source parquet — so the commit log, the
  * zone-map skipping read path, the compaction rewrite, and the change
  * feed are each proved lossless by the driver gate, not just by local
  * specs. Registered via [[graft.Queries.all]].
  */
object TableQueries {

  /** Zone-map file skipping on the read path: lineitem is committed
    * range-clustered on `l_shipdate` (8 files with disjoint date
    * ranges + per-file min/max recorded in the manifest), then the
    * measured read plans ONLY the files whose zone maps admit the
    * 1996 ship-date window — at 100 TB this is the difference between
    * opening O(matching files) and O(table). The residual filter
    * still applies, so the aggregate equals the oracle's direct
    * filtered scan regardless of how sharply the ranges split.
    */
  def tableSkipping(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_skipping")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate")
    VersionedTable.commit(
      li.repartitionByRange(8, col("l_shipdate"))
        .sortWithinPartitions("l_shipdate"),
      root, statsColumns = Seq("l_shipdate", "l_orderkey"))
    VersionedTable.readWhere(s, root,
        col("l_shipdate") >= "1996-01-01" && col("l_shipdate") <= "1996-12-31")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
  }

  /** [[tableSkipping]] re-run through the STANDARD connector API
    * ([[graft.sources.v2.GraftDataSource]]): the same range-clustered
    * statted table, but the measured read is
    * `spark.read.format("graft")` with a plain `.filter` — Spark's
    * V2 pushdown hands the ship-date window to the source, the source
    * plans the same zone-map-pruned file list `readWhere` would
    * (spec-gated parity in GraftV2Spec), and the aggregate must equal
    * the SAME DuckDB oracle as the native path. Proves a foreign
    * Spark user needs zero graft classes for a pruned read.
    */
  def tableDsv2(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_dsv2")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate")
    VersionedTable.commit(
      li.repartitionByRange(8, col("l_shipdate"))
        .sortWithinPartitions("l_shipdate"),
      root, statsColumns = Seq("l_shipdate", "l_orderkey"))
    s.read.format("graft").load(root)
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") <= "1996-12-31")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
  }

  /** CHECK constraints end to end
    * ([[VersionedTable.addConstraint]]): half of orders commits, the
    * `o_totalprice > 0` gate installs (after its validation scan),
    * the other half appends THROUGH the gate, a poisoned append and a
    * poisoned merge both die with [[VersionedTable.ConstraintViolationException]]
    * — committing NOTHING — and a clean merge lands. The final
    * aggregate hash-matches DuckDB replaying only the writes that
    * were allowed through: if either refused write had leaked a
    * single row (or the refusals had torn anything), the hash breaks.
    */
  def tableConstraint(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_constraint")
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    VersionedTable.commit(orders.filter(col("o_orderkey") % 2 === 0)
      .repartition(4), root, statsColumns = Seq("*"))
    VersionedTable.addConstraint(s, root, "price_pos", "o_totalprice > 0")
    VersionedTable.commit(orders.filter(col("o_orderkey") % 2 === 1)
      .repartition(4), root)
    try {
      VersionedTable.commit(orders.limit(50)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000000L)
        .withColumn("o_totalprice", -col("o_totalprice")), root)
      throw new IllegalStateException("poisoned append was admitted")
    } catch { case _: VersionedTable.ConstraintViolationException => () }
    try {
      VersionedTable.merge(s, root,
        orders.orderBy("o_orderkey").limit(1)
          .withColumn("o_totalprice", lit(-1.0)), Seq("o_orderkey"))
      throw new IllegalStateException("poisoned merge was admitted")
    } catch { case _: VersionedTable.ConstraintViolationException => () }
    VersionedTable.merge(s, root,
      orders.filter(col("o_orderkey") % 1000 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0)),
      Seq("o_orderkey"))
    VersionedTable.read(s, root)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
  }

  /** DESCRIBE HISTORY under the oracle ([[VersionedTable.history]]):
    * a scripted mutation sequence — bulk load, append, a CHECK
    * constraint install, a predicate DELETE, a vectored delete, a
    * column rename and an OPTIMIZE — then the commit log read back as
    * a DataFrame. The oracle recomputes every row/total delta
    * directly from the source parquet, so a mis-attributed file, a
    * lost row stat, or a delta diffed against the wrong predecessor
    * breaks the hash. (Timestamps and file counts are real but
    * machine-varying, so the oracled projection takes the stable
    * row-metric columns; HistorySpec covers the rest.)
    */
  def tableHistory(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_history")
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    VersionedTable.commit(orders.filter(col("o_orderkey") % 2 === 0)
      .coalesce(1), root, statsColumns = Seq("*"))              // v0
    VersionedTable.commit(orders.filter(col("o_orderkey") % 2 === 1)
      .coalesce(1), root, statsColumns = Seq("*"))              // v1
    VersionedTable.addConstraint(s, root, "price_pos",
      "o_totalprice > 0")                                       // v2
    VersionedTable.delete(s, root, col("o_orderkey") % 10 === 7) // v3
    VersionedTable.deleteVectored(s, root,
      col("o_orderkey") % 10 === 4)                             // v4
    VersionedTable.renameColumn(s, root, "o_totalprice", "o_revenue") // v5
    VersionedTable.compact(s, root, targetPartitions = 1)       // v6
    VersionedTable.history(s, root)
      .select("version", "operation", "rows_added", "rows_removed",
        "total_rows", "dv_dead_rows", "constraint_count")
  }

  val tableHistorySql: String =
    """WITH c AS (
      |  SELECT count(*) FILTER (o_orderkey % 2 = 0) AS evens,
      |    count(*) FILTER (o_orderkey % 2 = 1) AS odds,
      |    count(*) FILTER (o_orderkey % 10 = 7) AS sevens,
      |    count(*) FILTER (o_orderkey % 10 = 4) AS fours,
      |    count(*) AS total
      |  FROM orders)
      |SELECT * FROM (
      |  SELECT CAST(0 AS BIGINT) AS version, 'append' AS operation,
      |    evens AS rows_added, CAST(0 AS BIGINT) AS rows_removed,
      |    evens AS total_rows, CAST(0 AS BIGINT) AS dv_dead_rows,
      |    CAST(0 AS BIGINT) AS constraint_count FROM c
      |  UNION ALL SELECT 1, 'append', odds, 0, total, 0, 0 FROM c
      |  UNION ALL SELECT 2, 'constraint', 0, 0, total, 0, 1 FROM c
      |  -- %10==7 keys are all ODD: the delete rewrites only the odds
      |  -- file; the evens file has zero matches and never moves
      |  UNION ALL SELECT 3, 'delete', odds - sevens, odds,
      |    total - sevens, 0, 1 FROM c
      |  UNION ALL SELECT 4, 'dvdelete', 0, 0, total - sevens, fours, 1
      |    FROM c
      |  UNION ALL SELECT 5, 'rename', 0, 0, total - sevens, fours, 1
      |    FROM c
      |  UNION ALL SELECT 6, 'compact', total - sevens - fours,
      |    total - sevens, total - sevens - fours, 0, 1 FROM c)
      |ORDER BY version""".stripMargin

  val tableConstraintSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(CASE WHEN o_orderkey % 1000 = 0
      |    THEN o_totalprice + 1000.0 ELSE o_totalprice END
      |    AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY 1""".stripMargin

  /** Column mapping end to end: half of orders lands price-clustered,
    * `o_totalprice` is RENAMED to `o_revenue` (a metadata-only commit
    * — zero files move), the other half APPENDS under the new logical
    * name (its files writing the immutable physical name), and the
    * measured read filters + aggregates on the renamed column — so
    * old files, new files, zone-map pruning through the map and the
    * scan-side alias must all agree with DuckDB running on the
    * original column, or the hash breaks.
    *
    * Floor provenance (r18): the r17 1.57x flag on this query was
    * adjudicated ENVIRONMENTAL, not a plan regression — the r16
    * commit that recorded the 1.01 s floor re-benches at 1.52 s on
    * the same machine today while HEAD benches 1.47 s (commit-path
    * work is FS-bound, which the CPU-bound calibration probe cannot
    * normalize). Floor re-set to the measured 1.47 s.
    */
  def tableRename(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_rename")
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    VersionedTable.commit(
      orders.filter(col("o_orderkey") % 2 === 0)
        .repartitionByRange(6, col("o_totalprice"))
        .sortWithinPartitions("o_totalprice"),
      root, statsColumns = Seq("*"))
    VersionedTable.renameColumn(s, root, "o_totalprice", "o_revenue")
    VersionedTable.commit(
      orders.filter(col("o_orderkey") % 2 === 1)
        .withColumnRenamed("o_totalprice", "o_revenue")
        .repartitionByRange(6, col("o_revenue"))
        .sortWithinPartitions("o_revenue"),
      root, statsColumns = Seq("*"))
    VersionedTable.readWhere(s, root,
        col("o_revenue") >= 50000.0 && col("o_revenue") < 150000.0)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_revenue").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
  }

  val tableRenameSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |WHERE o_totalprice >= 50000.0 AND o_totalprice < 150000.0
      |GROUP BY 1""".stripMargin

  /** Manifest checkpointing under the oracle: with the spill
    * threshold forced low, five trickle appends push the log into
    * checkpoint + KB-delta mode (a fresh checkpoint rotates once
    * mid-history), a predicate DELETE lands as a delta remove/add,
    * and the measured read resolves the manifest THROUGH the parquet
    * checkpoint chain — zone-map pruning included. DuckDB computes
    * the twin directly; a lost delta entry, a stale checkpoint cache
    * or a mis-applied remove all break the hash.
    */
  def tableCkpt(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_ckpt")
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    s.conf.set("spark.graft.manifest.checkpointThreshold", "2")
    s.conf.set("spark.graft.manifest.checkpointInterval", "3")
    try {
      (0L to 4L).foreach(k => VersionedTable.commit(
        orders.filter(col("o_orderkey") % 5 === k)
          .repartitionByRange(2, col("o_totalprice"))
          .sortWithinPartitions("o_totalprice"),
        root, statsColumns = Seq("*")))
      VersionedTable.delete(s, root, col("o_orderpriority") === "1-URGENT")
      VersionedTable.readWhere(s, root, col("o_totalprice") >= 100000.0)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("mass"))
    } finally {
      s.conf.unset("spark.graft.manifest.checkpointThreshold")
      s.conf.unset("spark.graft.manifest.checkpointInterval")
    }
  }

  val tableCkptSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mass
      |FROM orders
      |WHERE o_orderpriority <> '1-URGENT' AND o_totalprice >= 100000.0
      |GROUP BY 1""".stripMargin

  /** Metadata-only TYPE WIDENING end to end: the pre-1995 half of
    * orders commits with an INT order key (clustered on it, stats +
    * blooms on), `widenColumn` flips the recorded schema to LONG
    * moving zero files, the rest of orders appends with native long
    * keys, and the measured read filters + joins nothing — it
    * aggregates across the mixed int/long files, pruning through the
    * shared long stats domain. DuckDB computes the twin off the
    * original table; any upcast loss, broken zone map or widened-file
    * mismatch breaks the hash.
    */
  def tableWiden(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_widen")
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
    VersionedTable.commit(
      orders.filter(col("o_orderdate") < "1995-01-01")
        .withColumn("o_orderkey", col("o_orderkey").cast("int"))
        .repartitionByRange(4, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      root, statsColumns = Seq("*"))
    VersionedTable.widenColumn(s, root, "o_orderkey",
      org.apache.spark.sql.types.LongType)
    VersionedTable.commit(
      orders.filter(col("o_orderdate") >= "1995-01-01")
        .repartitionByRange(4, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      root, statsColumns = Seq("*"))
    VersionedTable.readWhere(s, root, col("o_orderkey") % 10 === 0)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_orderkey")).as("key_mass"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("mass"))
  }

  val tableWidenSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS key_mass,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mass
      |FROM orders
      |WHERE o_orderkey % 10 = 0
      |GROUP BY 1""".stripMargin

  /** Streaming change-feed CONSUMPTION: a follower table continuously
    * applies the source table's CDC through
    * [[graft.streaming.ChangeFeedStream]] — the Delta readChangeFeed +
    * startingVersion role. The source mutates through its whole op
    * vocabulary (seed, append, keyed MERGE with price bumps and
    * inserts, predicate DELETE), the follower consumes ONE source
    * version per batch off its own txn watermark, a caught-up tick
    * and a replayed tick both land nothing, and the rollup reads the
    * FOLLOWER — so a lost update, double-applied merge, resurrected
    * delete or broken watermark all break the hash against DuckDB's
    * closed-form twin of the source's final state.
    */
  def tableStreamCdcApply(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ChangeFeedStream
    val src = StreamGateQueries.tempRoot("graft_q_cdc_src")
    val dst = StreamGateQueries.tempRoot("graft_q_cdc_dst")
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    VersionedTable.commit(orders.filter(col("o_orderkey") % 3 === 0),
      src, statsColumns = Seq("*"))                               // v0 seed
    VersionedTable.commit(orders.filter(col("o_orderkey") % 3 === 1),
      src)                                                        // v1 append
    VersionedTable.merge(s, src,                                  // v2 merge
      orders.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0)),
      Seq("o_orderkey"))
    VersionedTable.delete(s, src,                                 // v3 delete
      col("o_orderpriority") === "1-URGENT")
    val batches = ChangeFeedStream.sync(s, src, dst,
      Seq("o_orderkey"), "follower")
    // caught up + crash-redelivery: neither may land anything
    val idle = ChangeFeedStream.sync(s, src, dst,
      Seq("o_orderkey"), "follower")
    VersionedTable.read(s, dst)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("mass"))
      .withColumn("n_batches", lit(batches.toLong))
      .withColumn("n_idle", lit(idle.toLong))
      .withColumn("consumed",
        lit(ChangeFeedStream.lastConsumed(s, dst, "follower")))
  }

  val tableStreamCdcApplySql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
      |      ELSE o_totalprice END AS o_totalprice
      |  FROM orders
      |  WHERE o_orderkey % 3 IN (0, 1) OR o_orderkey % 5 = 0)
      |SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mass,
      |  CAST(4 AS BIGINT) AS n_batches,
      |  CAST(0 AS BIGINT) AS n_idle,
      |  CAST(3 AS BIGINT) AS consumed
      |FROM base
      |WHERE o_orderpriority <> '1-URGENT'
      |GROUP BY 1""".stripMargin

  /** Hive-style partition columns end to end: lineitem lands
    * month-partitioned (`l_month=1995-01-01/` directory layout, exact
    * min = max partition stats off the path), a second commit APPENDS
    * into the same layout (the spec is a table property), one month is
    * atomically backfilled discount-free through a per-partition
    * [[VersionedTable.replaceWhere]] (the whole partition's files drop
    * wholesale — no rewrite read), and the measured read prunes to the
    * six queried months' files before any data file opens. The rollup
    * must hash-match DuckDB's direct scan with the backfill expressed
    * as a CASE — proving layout, inheritance, pruning and the atomic
    * swap are all value-lossless.
    */
  def tablePartition(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_partition")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate")
      .withColumn("l_month", trunc(col("l_shipdate"), "month"))
    VersionedTable.commit(li.filter(col("l_shipdate") < "1996-01-01"),
      root, partitionBy = Seq("l_month"), statsColumns = Seq("*"))
    // append WITHOUT restating the spec: the layout is inherited
    VersionedTable.commit(li.filter(col("l_shipdate") >= "1996-01-01"), root)
    // per-partition backfill: March 1996 re-lands discount-free in one
    // atomic commit (readers never see the month half-replaced)
    val marchPred = col("l_month") === lit("1996-03-01").cast("date")
    val repl = VersionedTable.readWhere(s, root, marchPred)
      .withColumn("l_discount", lit(0.0))
    VersionedTable.replaceWhere(s, root, repl, marchPred)
    VersionedTable.readWhere(s, root,
        col("l_month") >= "1996-01-01" && col("l_month") <= "1996-06-01")
      .groupBy("l_month", "l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
  }

  val tablePartitionSql: String =
    """WITH li AS (
      |  SELECT l_returnflag, l_quantity, l_extendedprice,
      |    CASE WHEN date_trunc('month', l_shipdate) = DATE '1996-03-01'
      |      THEN 0.0 ELSE l_discount END AS l_discount,
      |    CAST(date_trunc('month', l_shipdate) AS DATE) AS l_month
      |  FROM lineitem)
      |SELECT l_month, l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM li
      |WHERE l_month >= DATE '1996-01-01' AND l_month <= DATE '1996-06-01'
      |GROUP BY 1, 2""".stripMargin

  val tableSkippingSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  min(l_shipdate) AS first_ship,
      |  max(l_shipdate) AS last_ship
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate <= DATE '1996-12-31'
      |GROUP BY 1""".stripMargin

  /** SUB-FILE skipping ([[VersionedTable.commit]] `rowGroupStats` +
    * the parquet reader's own row-group pruning): the lineitem slice
    * commits SORTED into a single multi-row-group file (tiny
    * `parquet.block.size` for the fixture; a real compaction output
    * at scale) with per-row-group zone maps read off the footer at
    * commit time. The narrow orderkey range then (a) prunes at FILE
    * granularity through the row-group-refined manifest maps and
    * (b) skips the non-matching row groups INSIDE the kept file via
    * the pushed-down residual predicate — RowGroupStatsSpec gates the
    * scan's output-row metric; this query gates the ANSWER against
    * the DuckDB twin.
    */
  def tableRowgroup(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_rowgroup")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice",
        "l_discount")
    val conf = s.sparkContext.hadoopConfiguration
    val prevB = Option(conf.get("parquet.block.size"))
    val prevP = Option(conf.get("parquet.page.size"))
    conf.set("parquet.block.size", "262144")
    conf.set("parquet.page.size", "65536")
    try {
      VersionedTable.commit(li.orderBy("l_orderkey").coalesce(1), root,
        statsColumns = Seq("*"), rowGroupStats = true)
    } finally {
      prevB.fold(conf.unset("parquet.block.size"))(
        conf.set("parquet.block.size", _))
      prevP.fold(conf.unset("parquet.page.size"))(
        conf.set("parquet.page.size", _))
    }
    VersionedTable.readWhere(s, root,
        col("l_orderkey").between(100L, 2000L))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        min(col("l_orderkey")).as("first_key"),
        max(col("l_orderkey")).as("last_key"))
  }

  val tableRowgroupSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  min(l_orderkey) AS first_key,
      |  max(l_orderkey) AS last_key
      |FROM lineitem
      |WHERE l_orderkey BETWEEN 100 AND 2000
      |GROUP BY 1""".stripMargin

  /** SHALLOW CLONE ([[VersionedTable.cloneTable]]): the orders table
    * commits in two versions, forks zero-copy into a branch, then BOTH
    * sides diverge with different deletes and BOTH get vacuumed at
    * retention 1 — if the branch's manifest lost a shared file, a
    * vacuum crossed roots, or the source's pin tag failed to hold the
    * cloned bytes, one side's aggregate (or the whole read) breaks
    * against the DuckDB twin, which derives each side's surviving rows
    * straight from the base table.
    */
  def tableClone(s: SparkSession, dir: String): DataFrame = {
    val src = StreamGateQueries.tempRoot("graft_q_table_clone_src")
    val dst = StreamGateQueries.tempRoot("graft_q_table_clone_dst") + "/t"
    val o = t(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
    VersionedTable.commit(o.filter(col("o_orderdate") < "1996-01-01"),
      src, statsColumns = Seq("*"))
    VersionedTable.commit(o.filter(col("o_orderdate") >= "1996-01-01"),
      src, statsColumns = Seq("*"))
    VersionedTable.cloneTable(s, src, dst)
    // diverge: the branch drops urgent orders, the source drops the
    // expensive ones — then both vacuum hard
    VersionedTable.delete(s, dst, col("o_orderpriority") === "1-URGENT")
    VersionedTable.delete(s, src, col("o_totalprice") > 200000.0)
    VersionedTable.vacuum(s, src, keepVersions = 1)
    VersionedTable.vacuum(s, dst, keepVersions = 1)
    def side(root: String, name: String) =
      VersionedTable.read(s, root).agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"))
        .withColumn("side", lit(name))
        .select("side", "n", "total", "first_key", "last_key")
    side(src, "source").unionByName(side(dst, "branch"))
  }

  val tableCloneSql: String =
    """SELECT 'source' AS side, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
      |FROM orders WHERE NOT (o_totalprice > 200000.0)
      |UNION ALL
      |SELECT 'branch' AS side, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
      |FROM orders WHERE NOT (o_orderpriority = '1-URGENT')""".stripMargin

  /** The change feed (CDC) across a three-commit history: v0 seeds the
    * pre-1998 orders, v1 APPENDS the rest (streamed from the append's
    * own files — zero diffing, the 100 TB fast path), v2 OVERWRITES
    * down to the urgent orders (a full multiset snapshot diff). The
    * rollup per (version, change type) must reproduce the closed-form
    * partition of the orders table the oracle computes directly —
    * wrong file lineage, a double-counted replay, or a diff that loses
    * multiplicity all break the hash.
    */
  def tableChanges(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_changes")
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    VersionedTable.commit(
      orders.filter(col("o_orderdate") < "1998-01-01"), root) // v0
    VersionedTable.commit(
      orders.filter(col("o_orderdate") >= "1998-01-01"), root) // v1 append
    VersionedTable.commit(
      orders.filter(col("o_orderpriority") === "1-URGENT"), root,
      overwrite = true) // v2 overwrite
    VersionedTable.changes(s, root, 0L, 2L)
      .groupBy(col("_commit_version").as("commit_version"),
        col("_change_type").as("change_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("mass"),
        min(col("o_orderkey")).as("min_key"))
  }

  val tableChangesSql: String =
    """SELECT CAST(1 AS BIGINT) AS commit_version, 'insert' AS change_type,
      |  count(*) AS n_rows,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mass,
      |  min(o_orderkey) AS min_key
      |FROM orders WHERE o_orderdate >= DATE '1998-01-01'
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'delete', count(*),
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
      |  min(o_orderkey)
      |FROM orders WHERE o_orderpriority <> '1-URGENT'""".stripMargin

  /** Compaction is data-identical: lineitem lands as four separate
    * append commits (the small-file pile a streaming writer produces),
    * gets OPTIMIZE'd into four range-clustered files in one rebase-safe
    * commit, and the post-compaction snapshot must still aggregate to
    * exactly the source table. The measured read goes through a
    * zone-map-pruned ship-date window over the REWRITTEN files, so a
    * compaction that lost, duplicated, or mis-clustered rows fails the
    * oracle hash.
    */
  def tableCompact(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_compact")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_linestatus", "l_quantity", "l_tax",
        "l_shipdate")
    (0 until 4).foreach { k =>
      VersionedTable.commit(li.filter(col("l_orderkey") % 4 === k), root)
    }
    VersionedTable.compact(s, root, targetPartitions = 4,
      clusterBy = Seq("l_shipdate"), statsColumns = Seq("l_shipdate"))
    VersionedTable.readWhere(s, root, col("l_shipdate") >= "1996-01-01")
      .groupBy("l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum(col("l_tax").cast("decimal(18,4)")).cast("double").as("sum_tax"),
        max(col("l_orderkey")).as("max_key"))
  }

  /** Multi-dimensional data skipping: lineitem is Z-ORDER clustered on
    * (l_orderkey, l_partkey) before the commit ([[graft.operators
    * .ZOrder.cluster]] — Delta's `OPTIMIZE ZORDER BY` role), so the
    * manifest's zone maps are tight in BOTH dimensions and the
    * measured read prunes on a conjunction over both — where a
    * single-column sort only ever prunes its leading dimension. The
    * aggregate must still equal the oracle's direct filtered scan.
    */
  def tableZorder(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_zorder")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    VersionedTable.commit(
      graft.operators.ZOrder.cluster(li,
        Seq("l_orderkey", "l_partkey"), bits = 8, numFiles = 16),
      root, statsColumns = Seq("l_orderkey", "l_partkey"))
    VersionedTable.readWhere(s, root,
        col("l_orderkey") < 1000L && col("l_partkey") >= 100L)
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        min(col("l_partkey")).as("min_part"),
        max(col("l_orderkey")).as("max_order"))
  }

  val tableZorderSql: String =
    """SELECT count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  min(l_partkey) AS min_part,
      |  max(l_orderkey) AS max_order
      |FROM lineitem
      |WHERE l_orderkey < 1000 AND l_partkey >= 100""".stripMargin

  /** Row-level takedown through the version log, proved against a
    * DuckDB DELETE twin: the documents table lands range-clustered on
    * `doc_id`, a takedown removes one whole source PLUS a contiguous
    * id range ([[graft.sources.VersionedTable.delete]] — zone-map
    * pruned candidate selection, whole-match files dropped without
    * rewrite, partial files rewritten to survivors), and the output
    * joins the SURVIVOR rollup read back from the table with the CDC
    * `delete` rows [[graft.sources.VersionedTable.changes]] emitted
    * for the commit. A delete that loses a survivor, keeps a matched
    * row, or mis-lineages the change feed breaks the hash.
    */
  def tableDelete(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_delete")
    val docs = t(s, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars")
    VersionedTable.commit(
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      root, statsColumns = Seq("doc_id"))
    val pred = col("source") === "src7" ||
      (col("doc_id") >= 100L && col("doc_id") < 140L)
    val v = VersionedTable.delete(s, root, pred).getOrElse(
      throw new IllegalStateException("takedown matched no rows"))
    val survivors = VersionedTable.read(s, root)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("n_chars")).as("sum_chars"))
    val deleted = VersionedTable.changes(s, root, v - 1L, v)
      .filter(col("_change_type") === "delete")
      .groupBy("lang")
      .agg(count(lit(1)).as("_n_del"), sum(col("doc_id")).as("_del_ids"))
    survivors.join(deleted, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("sum_ids"), col("sum_chars"),
        coalesce(col("_n_del"), lit(0L)).as("n_deleted"),
        coalesce(col("_del_ids"), lit(0L)).as("deleted_ids"))
  }

  val tableDeleteSql: String =
    """WITH flagged AS (SELECT *,
      |  (source = 'src7' OR (doc_id >= 100 AND doc_id < 140)) AS del
      |  FROM documents),
      |surv AS (SELECT lang, count(*) AS n_docs,
      |    CAST(sum(doc_id) AS BIGINT) AS sum_ids,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |  FROM flagged WHERE NOT del GROUP BY lang),
      |gone AS (SELECT lang, count(*) AS n_deleted,
      |    CAST(sum(doc_id) AS BIGINT) AS deleted_ids
      |  FROM flagged WHERE del GROUP BY lang)
      |SELECT s.lang, s.n_docs, s.sum_ids, s.sum_chars,
      |  CAST(COALESCE(g.n_deleted, 0) AS BIGINT) AS n_deleted,
      |  CAST(COALESCE(g.deleted_ids, 0) AS BIGINT) AS deleted_ids
      |FROM surv s LEFT JOIN gone g USING (lang)""".stripMargin

  /** Deletion-vector takedown through the commit log, proved against a
    * DuckDB DELETE twin: the corpus lands key-clustered in 8 files,
    * one [[VersionedTable.deleteVectored]] then kills the takedown set
    * WITHOUT rewriting a single data file (the query throws if the
    * file list moved), the CDC feed must emit exactly the newly-dead
    * rows, the metadata-only row count must stay exact (hashed as
    * `meta_rows`), and a compact PURGE must reproduce the same live
    * rows from plain files. At 100 TB this is the row-granular
    * takedown: O(matching rows) written, zero files rewritten until
    * the deferred purge.
    */
  def tableDv(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_dv")
    val docs = t(s, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars")
    VersionedTable.commit(
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      root, statsColumns = Seq("doc_id"))
    val pred = col("source") === "src5" ||
      (col("doc_id") >= 200L && col("doc_id") < 260L)
    val v = VersionedTable.deleteVectored(s, root, pred).getOrElse(
      throw new IllegalStateException("vectored takedown matched no rows"))
    val before = VersionedTable.manifest(s, root, v - 1L).files
    if (VersionedTable.manifest(s, root, v).files != before)
      throw new IllegalStateException(
        "deleteVectored must not rewrite data files")
    val metaRows = VersionedTable.rowCount(s, root).getOrElse(
      throw new IllegalStateException("metadata count unavailable"))
    val cdc = VersionedTable.changes(s, root, v - 1L, v)
      .filter(col("_change_type") === "delete")
      .groupBy("lang")
      .agg(count(lit(1)).as("_n_del"), sum(col("doc_id")).as("_del_ids"))
    // purge: vectors clear, live rows must round-trip into plain files
    VersionedTable.compact(s, root, targetPartitions = 4,
      clusterBy = Seq("doc_id"))
    val surv = VersionedTable.read(s, root)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("n_chars")).as("sum_chars"))
    surv.join(cdc, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("sum_ids"), col("sum_chars"),
        coalesce(col("_n_del"), lit(0L)).as("n_deleted"),
        coalesce(col("_del_ids"), lit(0L)).as("deleted_ids"),
        lit(metaRows).as("meta_rows"))
  }

  val tableDvSql: String =
    """WITH flagged AS (SELECT *,
      |  (source = 'src5' OR (doc_id >= 200 AND doc_id < 260)) AS del
      |  FROM documents),
      |surv AS (SELECT lang, count(*) AS n_docs,
      |    CAST(sum(doc_id) AS BIGINT) AS sum_ids,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |  FROM flagged WHERE NOT del GROUP BY lang),
      |gone AS (SELECT lang, count(*) AS n_deleted,
      |    CAST(sum(doc_id) AS BIGINT) AS deleted_ids
      |  FROM flagged WHERE del GROUP BY lang)
      |SELECT s.lang, s.n_docs, s.sum_ids, s.sum_chars,
      |  CAST(COALESCE(g.n_deleted, 0) AS BIGINT) AS n_deleted,
      |  CAST(COALESCE(g.deleted_ids, 0) AS BIGINT) AS deleted_ids,
      |  (SELECT CAST(count(*) AS BIGINT) FROM flagged WHERE NOT del)
      |    AS meta_rows
      |FROM surv s LEFT JOIN gone g USING (lang)""".stripMargin

  /** Tagged-release reproducibility through the commit log: the
    * corpus lands, gets tagged as a RELEASE, then suffers a vectored
    * takedown, a purge AND a vacuum — and the tagged read must still
    * reproduce the original corpus bit-for-bit (the training-run
    * citation that must never rot), while the live read reflects the
    * takedown. Hashed columns carry BOTH rollups; a tag that drifts
    * with the live table, or a vacuum that destroys a tagged
    * release's files, breaks the oracle.
    */
  def tableTag(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_tag")
    val docs = t(s, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars")
    VersionedTable.commit(
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      root, statsColumns = Seq("doc_id"))
    VersionedTable.tag(s, root, "release-1.0")
    VersionedTable.deleteVectored(s, root, col("lang") === "fr")
    VersionedTable.purgeVectors(s, root)
    VersionedTable.vacuum(s, root, keepVersions = 1)
    val release = VersionedTable.readTag(s, root, "release-1.0")
      .groupBy("lang")
      .agg(count(lit(1)).as("rel_docs"), sum(col("n_chars")).as("rel_chars"))
    val live = VersionedTable.read(s, root)
      .groupBy("lang")
      .agg(count(lit(1)).as("live_docs"),
        sum(col("n_chars")).as("live_chars"))
    release.join(live, Seq("lang"), "left")
      .select(col("lang"), col("rel_docs"), col("rel_chars"),
        coalesce(col("live_docs"), lit(0L)).as("live_docs"),
        coalesce(col("live_chars"), lit(0L)).as("live_chars"))
  }

  val tableTagSql: String =
    """WITH rel AS (SELECT lang, count(*) AS rel_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS rel_chars
      |  FROM documents GROUP BY lang),
      |live AS (SELECT lang, count(*) AS live_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS live_chars
      |  FROM documents WHERE lang <> 'fr' GROUP BY lang)
      |SELECT r.lang, r.rel_docs, r.rel_chars,
      |  CAST(COALESCE(l.live_docs, 0) AS BIGINT) AS live_docs,
      |  CAST(COALESCE(l.live_chars, 0) AS BIGINT) AS live_chars
      |FROM rel r LEFT JOIN live l USING (lang)""".stripMargin

  /** ANALYZE through the commit log: an unstatted append DISABLES the
    * metadata-only count (the query throws if it does not — that None
    * is the contract that stats never guess), one
    * [[VersionedTable.analyzeStats]] pass then reads ONLY the
    * stat-less files and commits a metadata-only `stats` version, and
    * the re-enabled count plus a zone-map-PRUNED read off the
    * backfilled stats must match the twin — an unsound backfilled
    * bound would silently drop matching files here.
    */
  def tableAnalyze(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_analyze")
    val docs = t(s, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars")
    VersionedTable.commit(
      docs.filter(col("doc_id") % 2 === 0)
        .repartitionByRange(4, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      root, statsColumns = Seq("doc_id"))
    VersionedTable.commit( // a writer that forgot statsColumns
      docs.filter(col("doc_id") % 2 === 1)
        .repartitionByRange(4, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      root)
    if (VersionedTable.rowCount(s, root).isDefined)
      throw new IllegalStateException(
        "rowCount must refuse to guess over unstatted files")
    VersionedTable.analyzeStats(s, root).getOrElse(
      throw new IllegalStateException("analyze found nothing to do"))
    val metaRows = VersionedTable.rowCount(s, root).getOrElse(
      throw new IllegalStateException("analyze did not re-enable counts"))
    VersionedTable.readWhere(s, root,
        col("doc_id") >= 100L && col("doc_id") < 400L)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("n_chars")).as("sum_chars"))
      .withColumn("meta_rows", lit(metaRows))
  }

  val tableAnalyzeSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS meta_rows
      |FROM documents
      |WHERE doc_id >= 100 AND doc_id < 400
      |GROUP BY lang""".stripMargin

  /** Exactly-once STREAMING TAKEDOWN — the DMCA/PII feed shape: three
    * micro-batches each vector-delete their third of the Chinese docs
    * through the txn-guarded [[VersionedTable.deleteVectored]] (zero
    * data files rewritten), batch 1 is REPLAYED after a simulated
    * crash and must be skipped by its txn record (the hashed
    * `n_versions` breaks if a fourth delete version appears), and the
    * final live rollup must equal the closed-form twin — a resurrected
    * row or double-counted vector breaks the hash.
    */
  def tableStreamDv(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_stream_table_dv")
    val docs = t(s, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars")
    VersionedTable.commit(
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      root, statsColumns = Seq("doc_id"))
    (0L until 3L).foreach { k =>
      VersionedTable.deleteVectored(s, root,
        col("lang") === "zh" && col("doc_id") % 3 === k,
        txn = Some(("wipe", k)))
    }
    // at-least-once redelivery of batch 1: the txn record must skip it
    VersionedTable.deleteVectored(s, root,
      col("lang") === "zh" && col("doc_id") % 3 === 1L,
      txn = Some(("wipe", 1L)))
    val latest = VersionedTable.latestVersion(s, root).get
    VersionedTable.read(s, root)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .withColumn("n_versions", lit(latest))
  }

  val tableStreamDvSql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(3 AS BIGINT) AS n_versions
      |FROM documents WHERE lang <> 'zh'
      |GROUP BY source""".stripMargin

  /** Targeted vector purge through the commit log: after a vectored
    * takedown, [[VersionedTable.purgeVectors]] rewrites ONLY the dirty
    * files to their live rows (the query throws if a clean file moved
    * or any vector survived) — the O(dirty) maintenance pass that
    * re-earns plain scans and lets vacuum destroy the dead bytes,
    * where a whole-table compact would read 100 TB to discharge a
    * 4-file takedown. The post-purge rollup plus the metadata-only
    * row count must match the DuckDB DELETE twin exactly.
    */
  def tablePurge(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_purge")
    val docs = t(s, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars")
    VersionedTable.commit(
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      root, statsColumns = Seq("doc_id"))
    val pred = col("source") === "src4" ||
      (col("doc_id") >= 300L && col("doc_id") < 360L)
    val v = VersionedTable.deleteVectored(s, root, pred).getOrElse(
      throw new IllegalStateException("vectored takedown matched no rows"))
    val mPre = VersionedTable.manifest(s, root, v)
    val clean = mPre.files.filterNot(mPre.dvs.contains)
    VersionedTable.purgeVectors(s, root).getOrElse(
      throw new IllegalStateException("purge found no vectors"))
    val mPost = VersionedTable.manifest(s, root,
      VersionedTable.latestVersion(s, root).get)
    if (mPost.dvs.nonEmpty)
      throw new IllegalStateException("vectors survived the purge")
    if (!clean.forall(mPost.files.contains))
      throw new IllegalStateException("purge moved a clean file")
    val metaRows = VersionedTable.rowCount(s, root).getOrElse(
      throw new IllegalStateException("metadata count unavailable"))
    VersionedTable.read(s, root)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("n_chars")).as("sum_chars"))
      .withColumn("meta_rows", lit(metaRows))
  }

  val tablePurgeSql: String =
    """WITH surv AS (SELECT * FROM documents
      |  WHERE NOT (source = 'src4' OR (doc_id >= 300 AND doc_id < 360)))
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  (SELECT CAST(count(*) AS BIGINT) FROM surv) AS meta_rows
      |FROM surv GROUP BY source""".stripMargin

  /** MERGE (keyed upsert / CDC apply) through the commit log, proved
    * against a closed-form twin: the base table holds two thirds of
    * the corpus key-clustered into 8 files, then ONE merge applies a
    * CDC batch — updates (matched keys, n_chars bumped), inserts
    * (unmatched keys), and tombstones (op = 'D' on the German docs,
    * the op marker never reaching the table) — and the measured rollup
    * reads BOTH the merged snapshot and the merge commit's CDC rows.
    * A merge that drops a survivor, double-applies an update, inserts
    * a tombstone, or emits wrong-direction CDC breaks the hash. The
    * zone-map prune (source key bounds vs per-file doc_id ranges)
    * keeps the rewrite O(matched files) — the 100 TB trickle-batch
    * shape.
    */
  def tableMerge(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_merge")
    val docs = t(s, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars")
    VersionedTable.commit(
      docs.filter(col("doc_id") % 3 =!= 2)
        .repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      root, statsColumns = Seq("doc_id"))
    val src = docs.filter(col("doc_id") % 3 === 0 || col("doc_id") % 3 === 2)
      .withColumn("n_chars", col("n_chars") + lit(1000L))
      .withColumn("op", when(col("lang") === "de", "D").otherwise("U"))
    val v = VersionedTable.merge(s, root, src, Seq("doc_id"),
      deleteMatched = Some(col("op") === "D")).getOrElse(
      throw new IllegalStateException("merge was a no-op"))
    val surv = VersionedTable.read(s, root)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("n_chars")).as("sum_chars"))
    val cdc = VersionedTable.changes(s, root, v - 1L, v)
      .groupBy("lang")
      .agg(
        count(when(col("_change_type") === "insert", 1)).as("_ins"),
        count(when(col("_change_type") === "delete", 1)).as("_del"))
    surv.join(cdc, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("sum_ids"), col("sum_chars"),
        coalesce(col("_ins"), lit(0L)).as("n_cdc_ins"),
        coalesce(col("_del"), lit(0L)).as("n_cdc_del"))
  }

  val tableMergeSql: String =
    """WITH base AS (SELECT doc_id, source, lang, n_chars
      |  FROM documents WHERE doc_id % 3 <> 2),
      |src AS (SELECT doc_id, source, lang, n_chars + 1000 AS n_chars,
      |    CASE WHEN lang = 'de' THEN 'D' ELSE 'U' END AS op
      |  FROM documents WHERE doc_id % 3 = 0 OR doc_id % 3 = 2),
      |matched AS (SELECT b.* FROM base b
      |  WHERE b.doc_id IN (SELECT doc_id FROM src)),
      |merged AS (
      |  SELECT b.* FROM base b
      |  WHERE b.doc_id NOT IN (SELECT doc_id FROM src)
      |  UNION ALL
      |  SELECT doc_id, source, lang, n_chars FROM src WHERE op = 'U'),
      |surv AS (SELECT lang, count(*) AS n_docs,
      |    CAST(sum(doc_id) AS BIGINT) AS sum_ids,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |  FROM merged GROUP BY lang),
      |ins AS (SELECT lang, count(*) AS n_cdc_ins FROM src
      |  WHERE op = 'U' GROUP BY lang),
      |del AS (SELECT lang, count(*) AS n_cdc_del FROM matched GROUP BY lang)
      |SELECT s.lang, s.n_docs, s.sum_ids, s.sum_chars,
      |  CAST(COALESCE(i.n_cdc_ins, 0) AS BIGINT) AS n_cdc_ins,
      |  CAST(COALESCE(d.n_cdc_del, 0) AS BIGINT) AS n_cdc_del
      |FROM surv s LEFT JOIN ins i USING (lang)
      |LEFT JOIN del d USING (lang)""".stripMargin

  /** Atomic predicate-scoped overwrite (the Delta `replaceWhere`
    * backfill), proved against a closed-form twin: orders land
    * date-clustered into 8 files, then ONE commit replaces the whole
    * 1997 region with its re-derived urgent-only, price-doubled twin —
    * whole-1997 files DROP with no rewrite, boundary files rewrite to
    * survivors, non-1997 files never move. The measured rollup reads
    * the final snapshot plus the replace commit's CDC (pre-images as
    * deletes, replacements as inserts); a reader-visible delete/append
    * gap, a leaked out-of-region row, or a lost boundary survivor
    * breaks the hash.
    */
  def tableReplace(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_replace")
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    VersionedTable.commit(
      orders.repartitionByRange(8, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate"),
      root, statsColumns = Seq("o_orderdate"))
    val in1997 = col("o_orderdate") >= "1997-01-01" &&
      col("o_orderdate") < "1998-01-01"
    val repl = orders.filter(in1997 && col("o_orderpriority") === "1-URGENT")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val v = VersionedTable.replaceWhere(s, root, repl, in1997).getOrElse(
      throw new IllegalStateException("replaceWhere committed nothing"))
    val snap = VersionedTable.read(s, root)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))
    val cdc = VersionedTable.changes(s, root, v - 1L, v)
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("_change_type") === "insert", 1)).as("_ins"),
        count(when(col("_change_type") === "delete", 1)).as("_del"))
    snap.join(cdc, Seq("o_orderpriority"), "left")
      .select(col("o_orderpriority"), col("n"), col("sum_price"),
        col("first_date"), col("last_date"),
        coalesce(col("_ins"), lit(0L)).as("n_cdc_ins"),
        coalesce(col("_del"), lit(0L)).as("n_cdc_del"))
  }

  val tableReplaceSql: String =
    """WITH repl AS (SELECT o_orderkey, o_orderdate, o_orderpriority,
      |    o_totalprice * 2 AS o_totalprice
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |    AND o_orderpriority = '1-URGENT'),
      |gone AS (SELECT o_orderpriority, count(*) AS n_cdc_del FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1),
      |ins AS (SELECT o_orderpriority, count(*) AS n_cdc_ins FROM repl
      |  GROUP BY 1),
      |merged AS (
      |  SELECT o_orderkey, o_orderdate, o_orderpriority, o_totalprice
      |  FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |    OR o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  UNION ALL SELECT * FROM repl),
      |snap AS (SELECT o_orderpriority, count(*) AS n,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS sum_price,
      |    min(o_orderdate) AS first_date,
      |    max(o_orderdate) AS last_date
      |  FROM merged GROUP BY 1)
      |SELECT s.o_orderpriority, s.n, s.sum_price, s.first_date, s.last_date,
      |  CAST(COALESCE(i.n_cdc_ins, 0) AS BIGINT) AS n_cdc_ins,
      |  CAST(COALESCE(g.n_cdc_del, 0) AS BIGINT) AS n_cdc_del
      |FROM snap s LEFT JOIN ins i USING (o_orderpriority)
      |LEFT JOIN gone g USING (o_orderpriority)""".stripMargin

  /** Bloom-filter point-lookup skipping, proved against a direct scan:
    * lineitem lands HASH-scattered across 16 files (every file's
    * orderkey range overlaps every lookup, so zone maps keep all 16)
    * with per-file Bloom sidecars on `l_orderkey`
    * ([[graft.sources.VersionedTable]] bloomColumns — the Delta
    * bloom-index role); the measured read is an IN-list point lookup
    * (present keys + one absent) that plans only the files whose
    * filters admit a key. At 100 TB this is the difference between a
    * needle query opening O(1) files and scanning the table — the
    * residual filter still applies, so the rollup equals the oracle's
    * direct scan regardless of filter density.
    */
  def tablePointlookup(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_pointlookup")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_extendedprice")
    VersionedTable.commit(li.repartition(16, col("l_orderkey")), root,
      statsColumns = Seq("l_orderkey"), bloomColumns = Seq("l_orderkey"),
      bloomExpectedItems = 50000L)
    VersionedTable.readWhere(s, root,
        col("l_orderkey").isin(1L, 5L, 32L, 71L, 999999999L))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))
  }

  val tablePointlookupSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  min(l_orderkey) AS min_key,
      |  max(l_orderkey) AS max_key
      |FROM lineitem
      |WHERE l_orderkey IN (1, 5, 32, 71, 999999999)
      |GROUP BY 1""".stripMargin

  /** Schema evolution through the commit log, proved against a
    * closed-form twin: half the corpus lands WITHOUT `n_chars`, the
    * other half appends WITH it under `mergeSchema = true` (the Delta
    * role — the snapshot schema widens, old files read back NULL for
    * the new column by parquet name resolution), and the final
    * snapshot rollup counts/sums the column across the boundary. A
    * widen that drops rows, misaligns columns, or backfills anything
    * but NULL breaks the hash.
    */
  def tableEvolve(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_evolve")
    val docs = t(s, dir, "documents")
    VersionedTable.commit(
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "source"),
      root, statsColumns = Seq("doc_id"))
    VersionedTable.commit(
      docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "source", "n_chars"),
      root, statsColumns = Seq("doc_id"), mergeSchema = true)
    VersionedTable.read(s, root)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("n_chars")).as("n_with_chars"),
        sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars"),
        max(col("doc_id")).as("max_id"))
  }

  val tableEvolveSql: String =
    """SELECT source, count(*) AS n_docs,
      |  count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_with_chars,
      |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END)
      |    AS BIGINT) AS sum_chars,
      |  max(doc_id) AS max_id
      |FROM documents GROUP BY source""".stripMargin

  /** Exactly-once streaming appends PLUS full-history CDC, proved by
    * one hash: three micro-batches land through the streaming
    * `txn`-guarded commit path, batch 1 is then REPLAYED (the
    * at-least-once delivery a real foreachBatch engine gives after a
    * crash) and must be skipped, and the change feed bootstrapped from
    * `fromVersion = -1` must reconstruct exactly the source table —
    * one extra or missing row in any batch breaks the oracle.
    */
  def tableStreamFeed(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_stream_table_feed")
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val batches = (0L until 3L).map(k =>
      orders.filter(col("o_orderkey") % 3 === k))
    batches.zipWithIndex.foreach { case (b, i) =>
      VersionedTable.streamCommit(b, root, "feed", i.toLong)
    }
    // the engine redelivers batch 1 after a simulated crash: the txn
    // record must skip it, or version 3 appears and n_rows doubles
    VersionedTable.streamCommit(batches(1), root, "feed", 1L)
    val latest = VersionedTable.latestVersion(s, root).get
    VersionedTable.changes(s, root, -1L, latest)
      .groupBy(col("_commit_version").as("commit_version"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("_change_type")).as("change_type"), // all-insert, hashed
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("mass"))
  }

  val tableStreamFeedSql: String =
    """SELECT CAST(o_orderkey % 3 AS BIGINT) AS commit_version,
      |  count(*) AS n_rows,
      |  'insert' AS change_type,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mass
      |FROM orders GROUP BY 1""".stripMargin

  /** Exactly-once STREAMING MERGE — the foreachBatch SCD-1 upsert that
    * serves a live table off a CDC stream: the corpus seeds the table,
    * three micro-batches then each upsert their third of the keys
    * (n_chars rewritten per batch), tombstone the Chinese docs, and
    * insert synthetic clones of the English docs, every batch through
    * the txn-guarded [[VersionedTable.merge]]. Batch 1 is then
    * REPLAYED (at-least-once delivery after a crash) and must be
    * skipped by its txn record — if it lands, a fourth merge version
    * appears and the hashed `n_versions` column breaks against the
    * closed-form DuckDB twin. The rollup reads the final snapshot, so
    * a lost survivor, a double-applied update, or a resurrected
    * tombstone breaks the hash too.
    */
  def tableStreamMerge(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_stream_table_merge")
    val docs = t(s, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars")
    VersionedTable.commit(
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      root, statsColumns = Seq("doc_id"))
    def batch(k: Long): DataFrame = {
      val third = docs.filter(col("doc_id") % 3 === k)
      val upserts = third
        .withColumn("n_chars", col("n_chars") * 10 + lit(k))
        .withColumn("op", when(col("lang") === "zh", "D").otherwise("U"))
      val clones = third.filter(col("lang") === "en")
        .select(
          (col("doc_id") + 1000000L).as("doc_id"),
          lit("clone").as("source"), col("lang"), col("n_chars"),
          lit("U").as("op"))
      upserts.unionByName(clones)
    }
    (0L until 3L).foreach { k =>
      VersionedTable.merge(s, root, batch(k), Seq("doc_id"),
        deleteMatched = Some(col("op") === "D"),
        txn = Some(("scd1", k)))
    }
    // the engine redelivers batch 1 after a simulated crash: the txn
    // record must skip it, or a fourth merge version appears
    VersionedTable.merge(s, root, batch(1L), Seq("doc_id"),
      deleteMatched = Some(col("op") === "D"), txn = Some(("scd1", 1L)))
    val latest = VersionedTable.latestVersion(s, root).get
    VersionedTable.read(s, root)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("n_chars")).as("sum_chars"))
      .withColumn("n_versions", lit(latest))
  }

  val tableStreamMergeSql: String =
    """WITH updated AS (
      |  SELECT doc_id, lang, n_chars * 10 + (doc_id % 3) AS n_chars
      |  FROM documents WHERE lang <> 'zh'
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, lang, n_chars
      |  FROM documents WHERE lang = 'en')
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(3 AS BIGINT) AS n_versions
      |FROM updated GROUP BY lang""".stripMargin

  val tableCompactSql: String =
    """SELECT l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE) AS sum_tax,
      |  max(l_orderkey) AS max_key
      |FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
      |GROUP BY 1""".stripMargin

  /** The SQL DML write surface end to end
    * ([[graft.plans.GraftSqlDml]]): the whole table lifecycle —
    * INSERT, row-level DELETE, keyed MERGE with a delete branch,
    * OPTIMIZE, VACUUM, then the snapshot read-back — runs through
    * `spark.sql` ALONE (the PySpark audience's surface; zero Scala
    * API calls touch the table). The oracle replays the mutation
    * algebra in plain SQL: survivors of the delete that no merge row
    * claims, matched merge rows below the tombstone threshold, and
    * unmatched merge rows below it (an unmatched tombstone inserts
    * nothing — engine semantics), so any drift in the parser, the
    * command routing, or the underlying ops breaks the hash.
    */
  def tableSqlDml(s: SparkSession, dir: String): DataFrame = {
    val root = StreamGateQueries.tempRoot("graft_q_table_sql_dml")
    t(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .createOrReplaceTempView("sql_dml_orders")
    s.sql(s"INSERT INTO graft.`$root` " +
      "SELECT * FROM sql_dml_orders WHERE o_orderkey % 2 = 0")
    s.sql(s"DELETE FROM graft.`$root` WHERE o_totalprice < 50000.0")
    s.sql(
      s"""MERGE INTO graft.`$root` AS t
         |USING (SELECT o_orderkey, 'MERGED' AS o_orderpriority,
         |         o_totalprice
         |       FROM sql_dml_orders WHERE o_orderkey % 5 = 0) AS s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED AND s.o_totalprice > 200000.0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql(s"OPTIMIZE graft.`$root`")
    s.sql(s"VACUUM graft.`$root` RETAIN 1 VERSIONS")
    s.sql("SELECT o_orderpriority, count(*) AS n, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
      s"FROM graft_table_snapshot('$root') GROUP BY o_orderpriority")
  }

  val tableSqlDmlSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      |  WHERE o_orderkey % 2 = 0 AND o_totalprice >= 50000.0),
      |src AS (
      |  SELECT o_orderkey, 'MERGED' AS o_orderpriority, o_totalprice
      |  FROM orders WHERE o_orderkey % 5 = 0),
      |fin AS (
      |  SELECT * FROM base
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
      |  UNION ALL
      |  SELECT s.* FROM src s JOIN base b ON s.o_orderkey = b.o_orderkey
      |  WHERE NOT (s.o_totalprice > 200000.0)
      |  UNION ALL
      |  SELECT s.* FROM src s
      |  WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM base)
      |    AND NOT (s.o_totalprice > 200000.0))
      |SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM fin GROUP BY 1""".stripMargin
}
