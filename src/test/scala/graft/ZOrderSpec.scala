package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits LSB-first round-robin") {
    // x=0b11, y=0b01 with 2 bits: z = x0 + y0<<1 + x1<<2 + y1<<3
    //   = 1 + 2 + 4 + 0 = 7
    val got = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].head()
    assert(got == 7L)
    // identity in one dimension: interleaving a single column is a no-op
    val one = Seq(43L).toDF("x")
      .select(ZOrder.zValue(Seq(col("x")), 6).as("z")).as[Long].head()
    assert(one == 43L)
  }

  test("zValue and zValueSql agree term for term") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select((col("o_custkey") % 64).as("x"), (col("o_orderkey") % 64).as("y"))
    val viaColumns = df
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 6).as("z"))
    val viaSql = df.selectExpr(s"${ZOrder.zValueSql(Seq("x", "y"), 6)} AS z")
    assert(viaColumns.exceptAll(viaSql).isEmpty &&
      viaSql.exceptAll(viaColumns).isEmpty)
  }

  test("z-clustered layout prunes files on the NON-leading dimension") {
    // the point of z-order: a single-column sort only gives locality in
    // its leading column — a predicate on the other dimension touches
    // every file. The z-layout keeps both envelopes tight.
    val dir = Files.createTempDirectory("zorder").toString
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val files = 16

    orders
      .repartitionByRange(files, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.parquet(s"$dir/linear")
    ZOrder.cluster(orders, Seq("o_custkey", "o_totalprice"), bits = 8,
      numFiles = files)
      .write.parquet(s"$dir/zorder")

    def filesTouched(path: String): Long = {
      val d = spark.read.parquet(path)
      val Seq(lo, hi) = d.agg(
        expr("percentile(o_totalprice, 0.4)"),
        expr("percentile(o_totalprice, 0.6)")).head().toSeq.toSeq
          .map(_.toString.toDouble)
      d.filter(col("o_totalprice").between(lo, hi))
        .select(input_file_name()).distinct().count()
    }

    val linear = filesTouched(s"$dir/linear")
    val z = filesTouched(s"$dir/zorder")
    assert(linear == files,
      s"price band should hit every o_custkey-sorted file, got $linear/$files")
    assert(z < linear,
      s"z-clustering must bound the price envelope per file: $z vs $linear")
  }

  test("cluster preserves rows exactly and handles constant dimensions") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey")
      .withColumn("const", lit(5L))
    val clustered = ZOrder.cluster(df, Seq("o_custkey", "const"), bits = 4,
      numFiles = 4)
    assert(clustered.columns.toSeq == df.columns.toSeq)
    assert(clustered.exceptAll(df).isEmpty && df.exceptAll(clustered).isEmpty)
  }
}
