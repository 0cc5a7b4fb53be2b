package graft

import org.apache.spark.sql.functions._
import graft.operators.Sharding

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 2000L).map(i => (i, s"doc$i")).toDF("id", "payload")

  test("every row kept exactly once; positions are dense 1..size per shard") {
    val out = Sharding.shardAssign(docs, "id", numShards = 8, seed = 7L).cache()
    try {
      assert(out.count() == 2000L)
      assert(out.select("id").distinct().count() == 2000L)
      val perShard = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), min("shard_pos").as("lo"), max("shard_pos").as("hi"))
        .collect()
      assert(perShard.length == 8)
      perShard.foreach { r =>
        assert(r.getLong(2) == 1L && r.getLong(3) == r.getLong(1),
          s"shard ${r.getLong(0)} positions not dense: $r")
      }
    } finally out.unpersist()
  }

  test("assignment is layout-independent: repartitioned input yields identical (shard, pos)") {
    val a = Sharding.shardAssign(docs, "id", 8, 7L)
      .select("id", "shard", "shard_pos").collect().map(r =>
        (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val b = Sharding.shardAssign(docs.repartition(13), "id", 8, 7L)
      .select("id", "shard", "shard_pos").collect()
    assert(b.length == 2000)
    b.foreach(r => assert(a(r.getLong(0)) == ((r.getLong(1), r.getLong(2)))))
  }

  test("re-seeding re-shuffles: different seed moves most rows") {
    val a = Sharding.shardAssign(docs, "id", 8, 7L)
      .select(col("id"), col("shard").as("s1"))
    val b = Sharding.shardAssign(docs, "id", 8, 8L)
      .select(col("id"), col("shard").as("s2"))
    val moved = a.join(b, "id").filter(col("s1") =!= col("s2")).count()
    assert(moved > 1500, s"only $moved/2000 rows moved on re-seed") // E[moved] = 1750
  }

  test("shard sizes are near-uniform (hash balance)") {
    val sizes = Sharding.shardAssign(docs, "id", 8, 7L)
      .groupBy("shard").count().collect().map(_.getLong(1))
    // binomial(2000, 1/8): mean 250, sd ~14.8; 5 sd tolerance
    assert(sizes.forall(n => n > 175 && n < 325), sizes.mkString(","))
  }

  test("shardLayout + partitionBy writes exactly one file per shard") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Sharding.shardLayout(Sharding.shardAssign(docs, "id", 4, 7L))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    (0 until 4).foreach { sh =>
      val files = new java.io.File(s"$dir/shard=$sh")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $sh has ${files.length} files")
    }
    // and the read-back order within a shard file is position order
    val back = spark.read.parquet(dir).filter(col("shard") === 0)
      .select("shard_pos").collect().map(_.getLong(0))
    assert(back.sameElements(back.sorted), "shard file must be in position order")
  }

  test("shardLayout: each shard wholly in one task, contiguous and in position order") {
    val laid = Sharding.shardLayout(Sharding.shardAssign(docs, "id", 4, 7L))
    val parts = laid.select("shard", "shard_pos").rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val rows = it.map(r => (r.getLong(0), r.getLong(1))).toVector
        Iterator.single((pi, rows))
      }.collect()
    // a shard never splits across tasks => write.partitionBy("shard")
    // emits exactly one file per shard
    val owners = parts.flatMap { case (pi, rows) => rows.map(_._1).distinct.map(_ -> pi) }
    assert(owners.groupBy(_._1).forall(_._2.length == 1),
      s"shard split across tasks: ${owners.mkString(",")}")
    parts.foreach { case (_, rows) =>
      assert(rows == rows.sortBy(r => (r._1, r._2)),
        "rows not contiguous/sorted by (shard, pos) within task")
    }
  }
}
