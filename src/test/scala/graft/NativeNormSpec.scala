package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.NativeNorm

/** Anchors the two [[NativeNorm]] kernels: NFC normalization (against
  * `java.text.Normalizer` ground truth through BOTH the interpreted
  * and codegen paths) and the deflate compression-ratio quality
  * signal (which has no DuckDB oracle — this spec IS its proof).
  */
class NativeNormSpec extends SparkSpec {
  import spark.implicits._

  private val decomposed = "caf" + "é" // e + combining acute
  private val composed = "café"

  test("NFC recomposes decomposed sequences; normalized text passes through") {
    assert(NativeNorm.nfcEval(UTF8String.fromString(decomposed)).toString == composed)
    val in = UTF8String.fromString(composed)
    // already-NFC input returns the same object — no allocation
    assert(NativeNorm.nfcEval(in) eq in)
    assert(NativeNorm.nfcEval(null) == null)
    assert(NativeNorm.nfcEval(UTF8String.fromString("")).toString == "")
  }

  test("NFC through the codegen'd column path matches Normalizer ground truth") {
    val rows = Seq(decomposed, composed, "plain ascii", "Å ring", "")
    val out = rows.toDF("t")
      .select(NativeNorm.nfc(col("t")).as("n"))
      .as[String].collect().toSeq
    val expected = rows.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(out == expected)
    // null stays null through the expression's null-safe path
    val nullOut = Seq[Option[String]](None).toDF("t")
      .select(NativeNorm.nfc(col("t"))).collect().head
    assert(nullOut.isNullAt(0))
  }

  test("the SQL registration surfaces both kernels") {
    NativeNorm.register(spark)
    val r = spark.sql(
      s"SELECT graft_nfc('$decomposed') AS n, " +
        "graft_compression_ratio('aaaaaaaaaaaaaaaaaaaaaaaa') AS c")
      .collect().head
    assert(r.getString(0) == composed)
    assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0)
  }

  test("repetitive text compresses far below shuffled text") {
    val repetitive = Seq.fill(200)("the same phrase again and").mkString(" ")
    // same characters, deterministically shuffled — entropy restored
    val shuffled = new scala.util.Random(7).shuffle(repetitive.toSeq).mkString
    val rep = NativeNorm.compressionRatioEval(UTF8String.fromString(repetitive))
    val shf = NativeNorm.compressionRatioEval(UTF8String.fromString(shuffled))
    assert(rep < 0.1, s"repetitive text must compress hard, got $rep")
    assert(shf > rep * 3, s"shuffled ($shf) must compress far worse than repetitive ($rep)")
  }

  test("compression ratio is deterministic, positive, and 1.0 on empty text") {
    val s = UTF8String.fromString("some ordinary sentence with words")
    val a = NativeNorm.compressionRatioEval(s)
    assert(a == NativeNorm.compressionRatioEval(s), "must be deterministic")
    assert(a > 0.0)
    assert(NativeNorm.compressionRatioEval(UTF8String.fromString("")) == 1.0)
  }

  test("the registered query is map-only (no shuffle, no collect)") {
    val df = Queries.all("q_compression_ratio")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a map-only plan:\n$plan")
    assert(df.count() > 0)
  }

  test("the registered query reproduces the oracle's pinned constants") {
    // THE q_compression_ratio adjudication: the oracle SQL carries
    // these exact (case_id, n_bytes, ratio) rows as VALUES, so any
    // JVM/zlib drift in the deflate kernel fails here locally before
    // it can fail the driver's hash compare
    val got = Queries.all("q_compression_ratio")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val pinned = Set(
      ("c1_empty", 0L, 1.0),
      ("c2_single_char", 1L, 3.0),
      ("c3_run_4096", 4096L, 0.005371),
      ("c4_phrase_repeat", 4320L, 0.016898),
      ("c5_prose", 484L, 0.595041),
      ("c6_hex_chain", 2048L, 0.561035))
    assert(got == pinned, s"kernel drifted from the pinned oracle: $got")
  }
}
