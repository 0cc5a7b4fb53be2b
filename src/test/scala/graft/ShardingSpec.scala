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

  test("writeShards exports corpus + manifest that survives a recount") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "n_chars")
    val assigned = Sharding.shardAssign(docs, "doc_id", numShards = 4, seed = 5L)
    Sharding.writeShards(assigned, "doc_id", dir, tokenCountCol = Some("n_chars"))
    val (corpus, manifest) = Sharding.readShards(spark, dir)
    assert(corpus.count() == docs.count())
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .select(df.columns.map(c => col(c).cast("long")).toSeq: _*)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val m = asMap(manifest)
    assert(m.keySet == Set(0L, 1L, 2L, 3L))
    // recount from the written corpus: every manifest cell must agree
    // (the corpus' shard comes back as a partition-discovered int)
    val recount = asMap(corpus.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("shard_pos").as("mp"),
        sum("n_chars").cast("long").as("tok"),
        sum(graft.functions.TextFunctions.portableHash32(
          col("doc_id").cast("string"))).cast("long").as("ck")))
    assert(recount == m, s"manifest/recount divergence:\n$m\nvs\n$recount")
    // contiguity: max position equals row count per shard
    m.foreach { case (s, (n, mp, _, _)) => assert(n == mp, s"shard $s has gaps") }
    // a second export over a CHANGED corpus moves the checksum (the
    // atomic swap replaces the whole tree, so re-read, don't reuse the
    // first frame's file listing)
    Sharding.writeShards(
      Sharding.shardAssign(docs.filter(col("doc_id") =!= 0L), "doc_id", 4, 5L),
      "doc_id", dir, Some("n_chars"))
    val m2 = asMap(Sharding.readShards(spark, dir)._2)
    assert(m2.map(_._2._4) != m.map(_._2._4),
      "removing a document must move at least one shard checksum")
  }
}
