package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderstatus")

  test("saltedJoin returns exactly the plain join's rows") {
    val plain = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
      .orderBy("l_orderkey", "l_linenumber")
      .collect().toSeq
    val salted = Skew.saltedJoin(
      lineitem,
      orders.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), saltFactor = 8)
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
      .orderBy("l_orderkey", "l_linenumber")
      .collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin spreads a hot key across salt values") {
    // all rows share ONE key: without salting they'd hit one reducer
    val hot = lineitem.withColumn("k", lit(1L))
    val dim = Seq((1L, "x")).toDF("k", "v")
    val salted = hot
      .withColumn("__salt", pmod(xxhash64(hot.columns.map(col).toSeq: _*), lit(8L)))
    val saltSpread = salted.select("__salt").distinct().count()
    assert(saltSpread > 4, s"hot key only spread over $saltSpread salts")
    val joined = Skew.saltedJoin(hot, dim, Seq("k"), 8)
    assert(joined.count() == hot.count())
  }

  test("saltedAgg equals direct aggregation") {
    val direct = lineitem.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    val salted = Skew.saltedAgg(lineitem, Seq("l_returnflag"), 8)(
      partial = Seq(
        sum(col("l_quantity").cast("decimal(18,2)")).as("q_p"),
        count(lit(1)).as("n_p")),
      merge = Seq(sum("q_p").as("q"), sum("n_p").as("n")))
      .orderBy("l_returnflag").collect().toSeq
    assert(salted.map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))) ==
      direct.map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))))
  }

  test("skewReport: planted hot key yields the hand-computed diagnosis") {
    import spark.implicits._
    // 9 keys with 10 rows each + one hot key with 910 rows:
    // 1000 rows, 10 keys, avg 100, max 910, skew 9.1;
    // suggested_salt at 32 partitions = ceil(910*32/1000) = ceil(29.12) = 30
    val df = ((1 to 9).flatMap(k => Seq.fill(10)(k.toLong)) ++
      Seq.fill(910)(99L)).toDF("k")
    val r = graft.operators.Skew.skewReport(df, "k").collect().head
    assert(r.getString(0) === "k")
    assert(r.getLong(1) === 1000L && r.getLong(2) === 10L)
    assert(r.getDouble(3) === 100.0)          // avg
    assert(r.getDouble(4) === 10.0)           // p50 (most keys at 10)
    assert(r.getLong(6) === 910L)             // max
    assert(r.getDouble(7) === 9.1)            // skew factor
    assert(r.getLong(8) === 30L)              // suggested salt
  }

  test("skewReport: a uniform key suggests no salting") {
    import spark.implicits._
    val df = (1 to 100).flatMap(k => Seq.fill(5)(k.toLong)).toDF("k")
    val r = graft.operators.Skew.skewReport(df, "k").collect().head
    assert(r.getDouble(7) === 1.0, "uniform keys: skew factor 1")
    assert(r.getLong(8) === 1L, "uniform keys: salt 1 (don't salt)")
  }
}
