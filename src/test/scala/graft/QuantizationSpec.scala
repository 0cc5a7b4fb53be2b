package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.SimilaritySearch

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private val lo = -0.6
  private val hi = 0.6

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("quantized storage is tinyint and reconstruction error is bounded") {
    val q = emb.select(col("vec_id"),
      VectorFunctions.quantizeInt8(col("embedding"), lo, hi).as("qv"))
    assert(q.schema("qv").dataType.simpleString == "array<tinyint>")
    val err = emb.join(q, "vec_id")
      .select(VectorFunctions.dequantizeInt8(col("qv"), lo, hi).as("dq"),
        col("embedding").cast("array<double>").as("orig"))
      .select(aggregate(
        zip_with(col("dq"), col("orig"), (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("maxerr"))
      .agg(max("maxerr")).head().getDouble(0)
    // midpoint reconstruction: worst case one half-level = (hi-lo)/510
    assert(err <= (hi - lo) / 510.0 + 1e-12, s"max reconstruction error $err")
  }

  test("top-k over quantized vectors keeps high recall vs exact") {
    val deq = emb.select(col("vec_id"),
      VectorFunctions.dequantizeInt8(
        VectorFunctions.quantizeInt8(col("embedding"), lo, hi), lo, hi)
        .as("embedding"))
    val k = 10
    def topSet(df: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.bruteForceTopK(
        df.filter($"vec_id" < 10), df, "vec_id", "embedding", k)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
    val exact = topSet(emb.select(col("vec_id"), col("embedding")))
    val quant = topSet(deq)
    val recalls = exact.map { case (qid, s) =>
      quant.getOrElse(qid, Set.empty).intersect(s).size.toDouble / s.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@$k over quantized vectors was $mean")
  }

  test("out-of-range values clamp instead of wrapping") {
    val v = Seq((1L, Seq(-5.0, 5.0, 0.0))).toDF("id", "embedding")
    val q = v.select(VectorFunctions.quantizeInt8(col("embedding"), lo, hi).as("q"))
      .as[Seq[Byte]].head()
    assert(q(0) == -128 && q(1) == 127, s"clamped ends expected, got $q")
  }
}
