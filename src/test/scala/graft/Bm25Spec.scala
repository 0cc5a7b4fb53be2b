package graft

import graft.operators.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("term-bearing documents outrank term-free ones; tf saturates") {
    val docs = Seq(
      (1L, "hash hash hash hash join"),     // heavy on both terms
      (2L, "hash filter scan filter scan"), // one term, once
      (3L, "filter scan merge sort scan"),  // no terms
      (4L, "hash hash hash hash hash hash hash hash hash hash")) // spam
      .toDF("doc_id", "text")
    val scores = Bm25.score(docs, "doc_id", "text", Seq("hash", "join"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(scores(3L) == 0.0)
    assert(scores(1L) > scores(2L) && scores(2L) > scores(3L))
    // k1 saturation: 10x the tf must not give ~10x the per-term score
    assert(scores(4L) < scores(1L) * 2,
      s"tf must saturate, got $scores")
  }

  test("scores are layout-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val a = Bm25.score(docs, "doc_id", "text", Seq("hash", "join", "vector"))
      .collect().map(_.toSeq).toSet
    val b = Bm25.score(docs.repartition(13), "doc_id", "text", Seq("hash", "join", "vector"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
