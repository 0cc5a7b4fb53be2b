package graft

import org.apache.spark.sql.functions._

import graft.queries.AuditQueries

/** Hand-checkable anchors for the round-11 profiling queries beyond
  * their DuckDB oracles: the oracle proves Spark == DuckDB; these
  * prove both == the textbook definition on controlled inputs.
  */
class AuditQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("moments matches the naive two-pass computation per group") {
    val rows = AuditQueries.moments(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    li.groupBy(_._1).foreach { case (flag, grp) =>
      // same quantization the query applies: exact integer cents
      val xs = grp.map(p => math.round(p._2 * 100).toDouble)
      val n = xs.length.toDouble
      val m = xs.sum / n
      val m2 = xs.map(x => (x - m) * (x - m)).sum / n
      val m3 = xs.map(x => math.pow(x - m, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - m, 4)).sum / n
      val (gotN, gotMean, gotSd, gotSkew, gotKurt) = rows(flag)
      assert(gotN === xs.length.toLong)
      assert(math.abs(gotMean - m / 100.0) < 1e-4, s"$flag mean")
      assert(math.abs(gotSd - math.sqrt(m2) / 100.0) < 1e-4, s"$flag sd")
      assert(math.abs(gotSkew - m3 / math.pow(m2, 1.5)) < 1e-4, s"$flag skew")
      assert(math.abs(gotKurt - (m4 / (m2 * m2) - 3.0)) < 1e-4, s"$flag kurt")
    }
  }

  test("equi-depth buckets partition all rows with near-equal depth") {
    val out = AuditQueries.equidepthHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(out.map(_._4).sum === total, "buckets must partition every row")
    assert(out.map(_._1).toSeq === (1L to 10L), "exactly buckets 1..10")
    // contiguous, ordered ranges
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._2, s"bucket ${a._1} hi ${a._3} overlaps ${b._1} lo ${b._2}")
    }
    // near-equal depth: each within 25% of the ideal tenth (ties on
    // duplicate values can only shift whole value-groups)
    val ideal = total / 10.0
    out.foreach { case (bkt, _, _, n) =>
      assert(math.abs(n - ideal) <= ideal * 0.25, s"bucket $bkt depth $n vs ideal $ideal")
    }
  }

  test("interarrival gap counts: one gap per user-type consecutive pair") {
    val out = AuditQueries.interarrival(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(sum(greatest(col("n") - 1L, lit(0L))).as("gaps"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === expected)
  }

  test("basket affinity: exclusive co-purchase has lift n_orders; ubiquitous pairs 1.0") {
    // 4 orders; parts 1,2 in every order (independent baseline);
    // parts 8,9 ONLY together in order 1 (perfect association)
    val rows = (1L to 4L).flatMap(ok => Seq((ok, 1L), (ok, 2L))) ++
      Seq((1L, 8L), (1L, 9L))
    val hist = rows.toDF("l_orderkey", "l_partkey")
      .withColumn("l_orderdate", lit("2024-01-01").cast("timestamp"))
    // run the real query against a temp parquet dir shaped like the fixture
    val tmp = java.nio.file.Files.createTempDirectory("basket").toString
    hist.select(col("l_orderkey"), col("l_partkey"))
      .write.parquet(s"$tmp/lineitem.parquet")
    val got = AuditQueries.basketAffinity(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got((1L, 2L)) === ((4L, 1.0))) // co-ordered always, but so is each alone
    // parts 8,9: n_co=1 -> below the min_co=2 gate, so absent; the
    // ubiquitous pair is the only survivor — the gate works
    assert(got.keySet === Set((1L, 2L)))
  }
}
