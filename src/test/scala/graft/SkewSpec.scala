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

  // ------------------------------------- diagnosis -> mitigation, e2e

  // Rows carry a distinct id so the whole-row hash actually varies
  // (salting a row set with IDENTICAL rows cannot spread — every copy
  // hashes to the same salt; real data always has distinguishing cols).
  private lazy val skewedRows = {
    val hot = (1 to 2000).map(i => (99L, i.toLong))
    val cold = (1 to 50).flatMap(k => (1 to 20).map(i => (k.toLong, 10000L + k * 100 + i)))
    (hot ++ cold).toDF("k", "id")
  }

  test("feeding skewReport's suggested_salt into saltedAgg flattens the hot key") {
    val report = Skew.skewReport(skewedRows, "k").collect().head
    val salt = report.getLong(8).toInt
    // 3000 rows, 51 keys, max 2000 -> salt = ceil(2000*32/3000) = 22
    assert(salt === 22, s"expected hand-computed salt 22, got $salt")

    // the hottest (key, salt) sub-group is what a reducer actually
    // receives in saltedAgg's partial stage — measure it directly with
    // the operator's own salting formula
    val hash = xxhash64(skewedRows.columns.map(col).toSeq: _*)
    val maxSub = skewedRows
      .withColumn("__salt", pmod(hash, lit(salt.toLong)))
      .groupBy("k", "__salt").count()
      .agg(max("count")).collect().head.getLong(0)
    val maxPerKey = 2000L
    val ideal = (maxPerKey + salt - 1) / salt // 91
    assert(maxSub <= 2 * ideal,
      s"hottest sub-group $maxSub vs ideal $ideal — salting failed to spread")
    assert(maxPerKey.toDouble / maxSub >= salt / 2.0,
      s"reducer load only dropped ${maxPerKey.toDouble / maxSub}x for salt $salt")

    // and the mitigated aggregate still equals the direct one
    val direct = skewedRows.groupBy("k").agg(count(lit(1)).as("n"), sum("id").as("s"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAgg(skewedRows, Seq("k"), salt)(
      partial = Seq(count(lit(1)).as("n_p"), sum("id").as("s_p")),
      merge = Seq(sum("n_p").as("n"), sum("s_p").as("s")))
      .orderBy("k").collect().toSeq
    assert(salted === direct)
  }

  test("feeding skewReport's suggested_salt into saltedJoin flattens the shuffle key") {
    val report = Skew.skewReport(skewedRows, "k").collect().head
    val salt = report.getLong(8).toInt
    val dim = (1L to 99L).map(k => (k, s"v$k")).toDF("k", "v")
    val joined = Skew.saltedJoin(skewedRows, dim, Seq("k"), salt)
    assert(joined.count() === skewedRows.count()) // every row matched once
    // the join's shuffle key is (k, __salt): replay the left side's
    // salting and check the hot key no longer lands on one reducer key
    val hash = xxhash64(skewedRows.columns.map(col).toSeq: _*)
    val maxSub = skewedRows
      .withColumn("__salt", pmod(hash, lit(salt.toLong)))
      .groupBy("k", "__salt").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxSub * salt < 2000L * 2,
      s"hot key still concentrated: max sub-group $maxSub at salt $salt")
  }
}
