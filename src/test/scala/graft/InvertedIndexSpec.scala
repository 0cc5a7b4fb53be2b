package graft

import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("postings, df and cf on a hand corpus") {
    val idx = InvertedIndex.build(
      docs(
        1L -> "the cat sat",
        2L -> "the dog SAT  sat",
        3L -> "a dog"),
      "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(idx("the") == ((2L, 2L, "1,2")))
    assert(idx("sat") == ((2L, 3L, "1,2"))) // case-folded, tf 2 in doc 2
    assert(idx("dog") == ((2L, 2L, "2,3")))
    assert(idx("cat") == ((1L, 1L, "1")))
    assert(idx("a") == ((1L, 1L, "3")))
  }

  test("maxPostings truncates the list but never df/cf") {
    val many = docs((1L to 10L).map(i => i -> "word"): _*)
    val row = InvertedIndex.build(many, "doc_id", "text", maxPostings = 3)
      .collect().head
    assert(row.getLong(1) == 10L && row.getLong(2) == 10L)
    assert(row.getString(3) == "1,2,3") // the k SMALLEST ids
  }

  test("minDf drops rare terms after full-data stats") {
    val idx = InvertedIndex.build(
      docs(1L -> "common rare", 2L -> "common"),
      "doc_id", "text", minDf = 2L)
      .select("term").as[String].collect().toSet
    assert(idx == Set("common"))
  }

  test("matches the window formulation on random text") {
    val rnd = new scala.util.Random(3)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val corpus = docs((1L to 40L).map(i =>
      i -> Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")): _*)
    val got = InvertedIndex.build(corpus, "doc_id", "text", maxPostings = 5)
      .orderBy("term").collect().map(_.toSeq).toSeq

    val tf = corpus
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy("doc_id")
    val want = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      .join(
        tf.withColumn("rn", row_number().over(win)).filter(col("rn") <= 5)
          .groupBy("term")
          .agg(concat_ws(",", sort_array(collect_list("doc_id"))).as("postings")),
        "term")
      .select("term", "df", "cf", "postings")
      .orderBy("term").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("empty and whitespace-only docs contribute nothing") {
    val idx = InvertedIndex.build(
      docs(1L -> "  ", 2L -> "", 3L -> "x"), "doc_id", "text")
    assert(idx.collect().map(r => (r.getString(0), r.getString(3))).toSeq ==
      Seq(("x", "3")))
  }
}
