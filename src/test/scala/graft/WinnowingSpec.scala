package graft

import org.apache.spark.sql.functions._

import graft.operators.Winnowing
import graft.plans.NativeText

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("winnowEval: window minima, short-input and empty-input rules") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def winnow(xs: Seq[Long], w: Int): Seq[Long] = {
      val r = NativeText.winnowEval(new GenericArrayData(xs.toArray), w)
      (0 until r.numElements()).map(r.getLong)
    }
    // windows of 3 over [9,5,7,2,8,4]: mins 5,2,2,2 -> {2,5}
    assert(winnow(Seq(9L, 5L, 7L, 2L, 8L, 4L), 3) == Seq(2L, 5L))
    // shorter than w: single whole-array window
    assert(winnow(Seq(9L, 5L), 4) == Seq(5L))
    assert(winnow(Seq(7L), 1) == Seq(7L))
    assert(winnow(Nil, 4) == Nil)
    // duplicates collapse: constant array -> one fingerprint
    assert(winnow(Seq(3L, 3L, 3L, 3L, 3L), 2) == Seq(3L))
  }

  test("winnowEval matches the HOF window-min formulation on real docs") {
    NativeText.register(spark)
    val k = 2; val w = 4
    val hashes = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), NativeText.shingleHash32(
        split(graft.functions.TextFunctions.normalizeText(col("text")), " "), k).as("h"))
    val native = hashes
      .select(col("doc_id"), NativeText.winnowMin(col("h"), w).as("fps"))
    val hof = hashes.select(col("doc_id"),
      when(size(col("h")) === 0, array().cast("array<long>"))
        .otherwise(sort_array(array_distinct(
          transform(sequence(lit(1), greatest(size(col("h")) - (w - 1), lit(1))),
            i => array_min(slice(col("h"), i, lit(w))))))).as("fps"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), to_json(col("fps")).as("j"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows(native).sameElements(rows(hof)))
  }

  test("a lifted paragraph is guaranteed to share fingerprints") {
    // winnowing's core promise: any shared word run of length >=
    // w + k - 1 contributes at least one common fingerprint, however
    // different the surrounding documents are
    val k = 2; val w = 4
    val para = "the winnowed fingerprint of a shared paragraph survives verbatim inclusion"
    val a = s"completely unrelated preamble text here $para and some trailing words"
    val b = s"different framing entirely $para closing remarks of another nature"
    val c = "this document shares nothing with the others at all honestly"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Winnowing.overlapCandidates(
      df, "text", "doc_id", k, w, minShared = 1, maxDf = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "documents sharing a paragraph must pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "an unrelated document must not pair")
  }

  test("boilerplate fingerprints are dropped by the df cap") {
    val boiler = "subscribe to our newsletter for updates and offers today"
    val docs = (1L to 12L).map(i =>
      (i, s"unique content piece number $i $boiler")).toSeq
    val df = docs.toDF("doc_id", "text")
    // every doc shares the boilerplate run; with maxDf below the corpus
    // size those fingerprints identify nothing and must produce no pairs
    val strict = Winnowing.overlapCandidates(
      df, "text", "doc_id", k = 2, w = 4, minShared = 1, maxDf = 5)
    assert(strict.isEmpty,
      "fingerprints present in more than maxDf documents must not pair")
  }
}
