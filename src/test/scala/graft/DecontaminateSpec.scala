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

  test("bloom-prefiltered report is row-identical to the exact report") {
    // false positives die in the confirm join; false negatives are
    // impossible — so the scale path must hash-match the exact one
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter($"doc_id" % 13 === 0)
    val exact = Decontaminate.overlapReport(docs, bench, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val bloom = Decontaminate.overlapReportBloom(docs, bench, "doc_id", "text",
      expectedShingles = 1L << 16, fpp = 0.01)
      .collect().map(_.toSeq).toSet
    assert(bloom == exact)
  }

  test("bloom path survives an aggressive undersized sketch") {
    // an underprovisioned filter only raises the false-positive rate —
    // correctness must not depend on the capacity guess
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(80)
    val bench = docs.filter($"doc_id" % 13 === 0)
    val exact = Decontaminate.overlapReport(docs, bench, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val bloom = Decontaminate.overlapReportBloom(docs, bench, "doc_id", "text",
      expectedShingles = 64, fpp = 0.5)
      .collect().map(_.toSeq).toSet
    assert(bloom == exact)
  }

  test("empty benchmark yields zero overlap through the bloom path") {
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = Decontaminate.overlapReportBloom(docs, bench, "doc_id", "text")
      .collect()
    assert(r.length == 1 && r(0).getLong(2) == 0L && !r(0).getBoolean(4))
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

  // --------------------------------------------- fuzzyOverlapReport

  test("a truncated near-copy of a benchmark item is caught fuzzily") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (1L, base),                                     // near-copy (superset)
      (2L, "totally different words about other things entirely here now"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, base.split(' ').dropRight(3).mkString(" "))) // truncated item
      .toDF("doc_id", "text")
    val r = Decontaminate.fuzzyOverlapReport(
      corpus, bench, "doc_id", "text").cache()
    val hit = r.filter($"doc_id" === 1L && $"bench_id" === 100L).collect()
    assert(hit.length == 1, "the near-copy pair must be a candidate")
    assert(hit.head.getAs[Boolean]("contaminated"),
      s"jaccard ${hit.head.getAs[Double]("jaccard")} must flag at 0.5")
    assert(r.filter($"doc_id" === 2L).isEmpty,
      "an unrelated doc must not even be a candidate")
  }

  test("jaccard equals the exact shingle-set computation") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val b = "w1 w2 w3 w4 w5 w6 w7 wX wY wZ"
    val corpus = Seq((1L, a)).toDF("doc_id", "text")
    val bench = Seq((9L, b)).toDF("doc_id", "text")
    val r = Decontaminate.fuzzyOverlapReport(
      corpus, bench, "doc_id", "text", threshold = 0.1).collect()
    if (r.nonEmpty) { // candidate only if a band collides
      // shingle sets: 8 trigrams each, 5 shared -> j = 5/11
      assert(r.head.getAs[Long]("inter") == 5L)
      assert(r.head.getAs[Long]("uni") == 11L)
      assert(math.abs(r.head.getAs[Double]("jaccard") - 5.0 / 11) < 1e-5)
    }
  }

  test("registered fuzzy query flags the planted truncated variants") {
    val r = Queries.all("q_decontaminate_fuzzy")(spark, "/root/testdata/sf0.001")
      .cache()
    // every planted bench item (id >= 1e6) is original_id + 1000000 and
    // shares all but ~15 chars with its source doc: the (source, plant)
    // pair must appear and flag
    val selfPairs = r.filter($"bench_id" === $"doc_id" + 1000000L)
    assert(selfPairs.count() > 0)
    assert(selfPairs.filter(!$"contaminated").count() == 0,
      "planted truncations must flag at jaccard >= 0.5")
    val js = r.select("jaccard").as[Double].collect()
    assert(js.forall(j => j >= 0.0 && j <= 1.0))
  }
}
