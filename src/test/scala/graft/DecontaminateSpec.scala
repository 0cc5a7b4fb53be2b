package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("benchmark members flag at full overlap; unrelated docs stay low") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter($"doc_id" % 13 === 0)
    val report = Decontaminate.overlapReport(docs, bench, "doc_id", "text").cache()
    val members = report.join(bench.select("doc_id"), "doc_id")
      .filter($"n_shingles" > 0)
    assert(members.filter(!$"contaminated").count() == 0,
      "every benchmark member with shingles must flag")
    assert(members.filter($"overlap_ratio" =!= 1.0).count() == 0)
    // the raw corpus has no planted near-dups: non-members must
    // overwhelmingly stay unflagged
    val others = report.join(bench.select("doc_id"), Seq("doc_id"), "left_anti")
    val flagged = others.filter($"contaminated").count()
    assert(flagged.toDouble / others.count() < 0.05, s"$flagged unrelated docs flagged")
  }

  test("short documents carry zero shingles and never flag") {
    val docs = Seq((1L, "two words"), (2L, "")).toDF("doc_id", "text")
    val bench = Seq((9L, "two words exactly")).toDF("doc_id", "text")
    val r = Decontaminate.overlapReport(docs, bench, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.forall(row => row.getLong(1) == 0L && !row.getBoolean(4)))
  }

  test("redactPii replaces emails, urls and phone shapes with placeholders") {
    val out = Seq("mail a.b+c@ex-ample.org see https://x.io/p?q=1 call +1 (555) 010-7788 end")
      .toDF("text")
      .select(TextFunctions.redactPii($"text")).as[String].head()
    assert(out == "mail <EMAIL> see <URL> call <PHONE> end", out)
  }

  test("redaction leaves clean text untouched") {
    val s = "no contact info here, just 42 words and punctuation!"
    val out = Seq(s).toDF("text")
      .select(TextFunctions.redactPii($"text")).as[String].head()
    assert(out == s)
  }
}
