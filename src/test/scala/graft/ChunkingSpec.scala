package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(texts: Seq[(Long, String)], maxTokens: Int, overlap: Int) =
    Chunking.chunkDocuments(
      texts.toDF("doc_id", "text"), "doc_id", "text", maxTokens, overlap)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("short documents yield exactly one whole chunk") {
    val out = chunk(Seq((1L, "one two three")), maxTokens = 8, overlap = 2)
    assert(out == Seq((1L, 0L, 3L, "one two three")))
  }

  test("coverage is complete, overlap is exact, and no redundant tail chunk") {
    for (n <- Seq(7, 8, 9, 12, 13, 20, 100); (max, ov) <- Seq((8, 4), (8, 0), (5, 2))) {
      val words = (1 to n).map(i => s"w$i")
      val out = chunk(Seq((1L, words.mkString(" "))), max, ov)
      val step = max - ov
      // every chunk starts where expected and carries the right words
      out.foreach { case (_, id, nt, text) =>
        val start = id.toInt * step // 0-based
        val expect = words.slice(start, start + max)
        assert(text == expect.mkString(" "), s"n=$n max=$max ov=$ov chunk $id")
        assert(nt == expect.length)
      }
      // complete coverage: the union of chunk ranges reaches word n
      val reach = out.map { case (_, id, nt, _) => id.toInt * step + nt.toInt }.max
      assert(reach == n, s"n=$n max=$max ov=$ov covered only $reach")
      // no chunk is fully contained in its predecessor's range
      out.sliding(2).foreach {
        case Seq((_, a, an, _), (_, b, bn, _)) =>
          assert(b.toInt * step + bn > a.toInt * step + an,
            s"n=$n max=$max ov=$ov: chunk $b adds no new words")
        case _ =>
      }
    }
  }

  test("chunk ids and text are layout independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val a = Chunking.chunkDocuments(docs, "doc_id", "text", 64, 16)
      .collect().map(_.toSeq).toSet
    val b = Chunking.chunkDocuments(docs.repartition(7), "doc_id", "text", 64, 16)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("invalid parameters are rejected") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Chunking.chunkDocuments(df, "doc_id", "text", 8, 8))
    intercept[IllegalArgumentException](
      Chunking.chunkDocuments(df, "doc_id", "text", 0, 0))
  }
}
