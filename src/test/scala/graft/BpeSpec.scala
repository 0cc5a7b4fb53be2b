package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich corpus: low x5, lower x2, newest x6, widest x3
  private def corpus = Seq(
    ("low " * 5).trim,
    ("lower " * 2).trim,
    ("newest " * 6).trim,
    ("widest " * 3).trim
  ).toDF("text")

  test("train reproduces the hand-computed merge sequence") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    assert(m.merges === Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("training is deterministic across runs") {
    val a = Bpe.train(corpus, "text", numMerges = 5)
    val b = Bpe.train(corpus, "text", numMerges = 5)
    assert(a.merges === b.merges)
  }

  test("applyMerges tokenizes an unseen word with trained subwords") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    val toks = Bpe.applyMerges(m, Seq("lowest").toDF("text"), "text")
      .select("tokens").as[Seq[String]].head()
    assert(toks === Seq("low", "est</w>"))
  }

  test("merge application is greedy left-to-right within a pass") {
    // merge (a,a) over 'aaaa' must give [aa, aa], over 'aaa' [aa, a, </w>-joined]
    val m = Bpe.Model(Seq(("a", "a")))
    val toks = Bpe.applyMerges(m, Seq("aaaa", "aaa").toDF("text"), "text")
      .select("tokens").as[Seq[String]].collect()
    assert(toks(0) === Seq("aa", "aa", "</w>"))
    assert(toks(1) === Seq("aa", "a", "</w>"))
  }

  test("merged tokens keep merging across ranks (chain to whole word)") {
    val m = Bpe.Model(Seq(("a", "b"), ("ab", "c"), ("abc", "</w>")))
    val toks = Bpe.applyMerges(m, Seq("abc").toDF("text"), "text")
      .select("tokens").as[Seq[String]].head()
    assert(toks === Seq("abc</w>"))
  }

  test("tokenCount matches the applied tokenization size") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    val df = Seq("the lowest and newest", "wide widest low").toDF("text")
    val counted = df.select(Bpe.tokenCount(m, col("text")).as("n"))
      .as[Int].collect()
    val applied = Bpe.applyMerges(m, df, "text")
      .select(size(col("tokens"))).as[Int].collect()
    assert(counted === applied)
  }

  test("more merges never increase the token count") {
    val short = Bpe.train(corpus, "text", numMerges = 2)
    val long = Bpe.train(corpus, "text", numMerges = 8)
    val doc = Seq(("newest lowest widest")).toDF("text")
    val a = doc.select(Bpe.tokenCount(short, col("text"))).as[Int].head()
    val b = doc.select(Bpe.tokenCount(long, col("text"))).as[Int].head()
    assert(b <= a)
  }

  test("collected and distributed training produce identical merges") {
    // a richer corpus (distinct frequencies, shared stems) so the two
    // paths face real tie-breaks and incremental-count updates
    val rich = Seq(
      ("low " * 5).trim, ("lower " * 2).trim, ("newest " * 6).trim,
      ("widest " * 3).trim, ("lowest " * 4).trim, ("newer " * 7).trim,
      ("wider " * 2).trim, ("news " * 5).trim).toDF("text")
    val local = Bpe.train(rich, "text", numMerges = 24)
    val dist = Bpe.train(rich, "text", numMerges = 24, collectThreshold = 0L)
    assert(local.merges.nonEmpty && local.merges.length >= 20)
    assert(local.merges === dist.merges,
      "the in-memory loop must replay the distributed trajectory exactly")
    // minCount parity too (the heap-top early stop vs the filter)
    val l3 = Bpe.train(rich, "text", numMerges = 24, minCount = 5L)
    val d3 = Bpe.train(rich, "text", numMerges = 24, minCount = 5L,
      collectThreshold = 0L)
    assert(l3.merges === d3.merges)
  }

  test("the collected path runs O(1) Spark jobs regardless of merge count") {
    val rich = Seq(
      ("low " * 5).trim, ("lower " * 2).trim, ("newest " * 6).trim,
      ("widest " * 3).trim, ("lowest " * 4).trim, ("newer " * 7).trim,
      ("wider " * 2).trim, ("news " * 5).trim).toDF("text")
    val sc = spark.sparkContext
    sc.setJobGroup("bpe-local-gate", "bpe job-count gate")
    val m = try Bpe.train(rich, "text", numMerges = 24)
    finally sc.clearJobGroup()
    assert(m.merges.length >= 20)
    // listener-fed tracker: give the bus a beat to drain
    var jobs = -1
    var tries = 0
    while (tries < 50 &&
        { jobs = sc.statusTracker.getJobIdsForGroup("bpe-local-gate").length
          jobs == 0 }) { Thread.sleep(100); tries += 1 }
    // word-table build + count + collect — a handful of jobs, versus
    // >= 2 per merge on the distributed path (the r16 'weak at scale')
    assert(jobs > 0 && jobs <= 8,
      s"collected BPE training ran $jobs jobs for 24 merges")
  }

  test("minCount stops training when no pair is frequent enough") {
    val tiny = Seq("ab").toDF("text")
    val m = Bpe.train(tiny, "text", numMerges = 10, minCount = 2L)
    assert(m.merges.isEmpty)
    val all = Bpe.train(tiny, "text", numMerges = 10, minCount = 1L)
    // a-b, then ab-</w>: two merges exhaust the single word
    assert(all.merges === Seq(("a", "b"), ("ab", "</w>")))
  }
}
