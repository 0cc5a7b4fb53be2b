package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Dedup}
import graft.streaming.ClusterStream

/** Incremental label maintenance must equal the from-scratch resolve
  * over every pair ever streamed — the star-edge trick preserves both
  * connectivity and min ids, so the parity is exact, not approximate.
  */
class ClusterStreamSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(rows: (Long, Long)*) = rows.toDF("id_a", "id_b")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long)].collect().toMap

  test("incremental labels equal the full resolve after every batch") {
    val dir = Files.createTempDirectory("clstate").toString
    // batch 0: two separate clusters; batch 1 joins them via a bridge
    // and adds a fresh cluster; batch 2 attaches a smaller min id to
    // an existing cluster (the min must propagate through old state)
    val batches = Seq(
      pairsOf((10L, 11L), (20L, 21L)),
      pairsOf((11L, 20L), (30L, 31L)),
      pairsOf((5L, 21L)))
    batches.zipWithIndex.foreach { case (b, i) =>
      ClusterStream.mergeBatch(b, dir, i.toLong)
      val expect = asMap(ConnectedComponents.resolve(
        batches.take(i + 1).reduce(_ unionByName _), "id_a", "id_b"))
      val got = asMap(ClusterStream.labels(spark, dir))
      assert(got == expect, s"batch $i: $got vs $expect")
    }
    // after batch 2, everything except 30/31 is one component rooted at 5
    val fin = asMap(ClusterStream.labels(spark, dir))
    assert(fin(21L) == 5L && fin(10L) == 5L && fin(30L) == 30L)
  }

  test("replaying a middle batch rewrites identical labels") {
    val dir = Files.createTempDirectory("clstate").toString
    val batches = Seq(
      pairsOf((1L, 2L)), pairsOf((2L, 3L)), pairsOf((7L, 8L)))
    batches.zipWithIndex.foreach { case (b, i) =>
      ClusterStream.mergeBatch(b, dir, i.toLong)
    }
    val before = asMap(ClusterStream.labels(spark, dir))
    ClusterStream.mergeBatch(batches(1), dir, 1L) // replay
    assert(asMap(ClusterStream.labels(spark, dir)) == before)
  }

  test("an empty batch carries the labels forward; empty state is empty") {
    val dir = Files.createTempDirectory("clstate").toString
    assert(ClusterStream.labels(spark, dir).isEmpty)
    ClusterStream.mergeBatch(pairsOf((1L, 2L)), dir, 0L)
    ClusterStream.mergeBatch(pairsOf(), dir, 1L)
    assert(asMap(ClusterStream.labels(spark, dir)) == Map(1L -> 1L, 2L -> 1L))
  }

  test("streamed minhash pairs resolve to the batch operator's clusters") {
    // end-to-end over the real fixture: feed the corpus's candidate
    // pairs in two halves; incremental labels must equal
    // q_dedup_clusters' from-scratch resolution
    val dir = Files.createTempDirectory("clstate").toString
    val corpus = Queries.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
      .filter(size(split(col("text"), " ")) >= 3)
    val (pairs, _) = Dedup.minHashCandidates(corpus, "text", "doc_id")
    val all = pairs.cache()
    try {
      ClusterStream.mergeBatch(all.filter(col("id_a") % 2 === 0), dir, 0L)
      ClusterStream.mergeBatch(all.filter(col("id_a") % 2 =!= 0), dir, 1L)
      val expect = asMap(ConnectedComponents.resolve(all, "id_a", "id_b"))
      assert(asMap(ClusterStream.labels(spark, dir)) == expect)
    } finally { all.unpersist(); () }
  }
}
