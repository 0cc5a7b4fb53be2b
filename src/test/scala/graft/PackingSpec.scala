package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text").cache()

  test("every document lands in exactly one pack, deterministically") {
    val a = Packing.packDocuments(docs, "doc_id", "text", 2048L, 8)
    val b = Packing.packDocuments(docs.repartition(17), "doc_id", "text", 2048L, 8)
    assert(a.count() == docs.count())
    val ka = a.select("doc_id", "shard", "pack_id", "pack_pos").collect().map(_.toSeq).toSet
    val kb = b.select("doc_id", "shard", "pack_id", "pack_pos").collect().map(_.toSeq).toSet
    assert(ka == kb, "pack assignment must not depend on input layout")
  }

  test("packs start within budget: first token of every doc is inside its pack") {
    val out = Packing.packDocuments(docs, "doc_id", "text", 2048L, 8)
    // reconstruct the running total and check the start-fit invariant
    val bad = out
      .withColumn("cum", sum("n_tokens").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("doc_id")
          .rowsBetween(Long.MinValue, 0)))
      .filter(floor((col("cum") - col("n_tokens")) / 2048L) =!= col("pack_id"))
    assert(bad.count() == 0)
  }

  test("a pack never overflows by a full document") {
    val out = Packing.packDocuments(docs, "doc_id", "text", 2048L, 8)
    val perPack = out.groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("total"), max("n_tokens").as("biggest"))
    // start-fit bound: total < budget + biggest member
    assert(perPack.filter(col("total") >= lit(2048L) + col("biggest")).count() == 0)
  }

  test("pack positions are contiguous from 1") {
    val out = Packing.packDocuments(docs, "doc_id", "text", 2048L, 8)
    val bad = out.groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n"), max("pack_pos").as("mx"), min("pack_pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0)
  }
}
