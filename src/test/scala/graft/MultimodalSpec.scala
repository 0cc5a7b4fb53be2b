package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("fromText wraps documents into the canonical media schema") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.fromText(docs, "doc_id", "text", "docs-fixture")
    assert(media.schema == Multimodal.mediaSchema ||
      media.schema.fieldNames.toSeq == Multimodal.mediaSchema.fieldNames.toSeq)
    val r = media.filter($"media_id" === 0).head()
    val meta = r.getStruct(2)
    assert(meta.getString(0) == "text/plain")
    assert(meta.getLong(2) > 0)
  }

  test("decodeFeatures runs the pluggable decoder per partition") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val media = Multimodal.fromText(docs, "doc_id", "text", "t")
      .as[Multimodal.MediaRecord](Multimodal.mediaEncoder)
    val feats = Multimodal.decodeFeatures(media, Multimodal.fakeDecode)
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(f => f.width >= 16 && f.height >= 16 && f.n_frames >= 1))
    assert(rows.forall(_.checksum.length == 64))
    // deterministic: same payload -> same features
    val again = Multimodal.decodeFeatures(media, Multimodal.fakeDecode).collect()
    assert(rows.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("stubDecode is a clearly-marked unsupported seam") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(1)
    val media = Multimodal.fromText(docs, "doc_id", "text", "t")
      .as[Multimodal.MediaRecord](Multimodal.mediaEncoder)
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(media).collect()
    }
    assert(ex.getMessage != null)
  }

  test("sampleFrameIndexes picks strided frames up to the cap") {
    val df = Seq(100, 1, 5).toDF("n")
    val got = df.select(Multimodal.sampleFrameIndexes($"n", stride = 10, maxFrames = 4))
      .as[Seq[Long]].collect().toSeq
    assert(got == Seq(Seq(0L, 10L, 20L, 30L), Seq(0L), Seq(0L)))
  }
}
