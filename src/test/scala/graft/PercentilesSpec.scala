package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Percentiles

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("histogram percentiles are bit-identical to Spark's percentile aggregate") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val hist = Percentiles.exactByHistogram(
      li, Seq("l_returnflag"), "l_quantity",
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99, "p0" -> 0.0, "p100" -> 1.0))
      .orderBy("l_returnflag").collect()
    val ref = li.groupBy("l_returnflag").agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("percentile(l_quantity, 0.99)").as("p99"),
        expr("percentile(l_quantity, 0.0)").as("p0"),
        expr("percentile(l_quantity, 1.0)").as("p100"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    assert(hist.length == ref.length && hist.nonEmpty)
    hist.zip(ref).foreach { case (h, r) =>
      assert(h.getString(0) == r.getString(0))
      (1 to 5).foreach { i =>
        assert(h.getDouble(i) == r.getDouble(i),
          s"flag ${h.getString(0)} col $i: ${h.getDouble(i)} vs ${r.getDouble(i)}")
      }
      assert(h.getLong(6) == r.getLong(6)) // n_l_quantity
    }
  }

  test("nulls are excluded and single-row groups work") {
    val rnd = new Random(3)
    val rows = (1 to 500).map { i =>
      val g = s"g${i % 7}"
      val v: java.lang.Double =
        if (rnd.nextInt(10) == 0) null else rnd.nextInt(40).toDouble
      (g, v)
    } :+ (("solo", java.lang.Double.valueOf(42.0)))
    val df = rows.toDF("g", "v")
    val hist = Percentiles.exactByHistogram(df, Seq("g"), "v",
      Seq("p25" -> 0.25, "p75" -> 0.75))
      .orderBy("g").collect()
    val ref = df.groupBy("g").agg(
        expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.75)").as("p75"),
        count(col("v")).as("n"))
      .orderBy("g").collect()
    assert(hist.length == ref.length)
    hist.zip(ref).foreach { case (h, r) =>
      assert(h.getString(0) == r.getString(0))
      assert(h.getDouble(1) == r.getDouble(1), s"${h.getString(0)} p25")
      assert(h.getDouble(2) == r.getDouble(2), s"${h.getString(0)} p75")
      assert(h.getLong(3) == r.getLong(3), s"${h.getString(0)} n")
    }
    val solo = hist.find(_.getString(0) == "solo").get
    assert(solo.getDouble(1) == 42.0 && solo.getDouble(2) == 42.0)
  }

  test("input validation") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException](
      Percentiles.exactByHistogram(df, Seq.empty, "v", Seq("p" -> 0.5)))
    intercept[IllegalArgumentException](
      Percentiles.exactByHistogram(df, Seq("g"), "v", Seq.empty))
    intercept[IllegalArgumentException](
      Percentiles.exactByHistogram(df, Seq("g"), "v", Seq("p" -> 1.5)))
  }
}
