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
}
