package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Blocklist
import graft.plans.AhoCorasick

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  /** Naive every-end-position reference: total hits counts each
    * occurrence of each term (overlapping and nested included);
    * distinct counts the terms present at least once.
    */
  private def naive(text: String, terms: Seq[String]): (Long, Long) = {
    var hits = 0L
    var distinct = 0L
    terms.foreach { term =>
      var i = text.indexOf(term)
      var any = false
      while (i >= 0) {
        hits += 1; any = true
        i = text.indexOf(term, i + 1) // +1, not +len: overlaps count
      }
      if (any) distinct += 1
    }
    (hits, distinct)
  }

  private def acEval(text: String, terms: Seq[String]): (Long, Long) = {
    val row = AhoCorasick.matchEval(
      if (text == null) null
      else org.apache.spark.unsafe.types.UTF8String.fromString(text),
      AhoCorasick.compile(terms))
    (row.getLong(0), row.getLong(1))
  }

  test("automaton matches naive scan on handpicked edge cases") {
    val terms = Seq("a", "aa", "aaa", "ab", "baa")
    for (text <- Seq("", "a", "aa", "aaaa", "abab", "baaa", "aabaa", "xyz",
        "aaabaaa", "b", "ba")) {
      assert(acEval(text, terms) == naive(text, terms), s"text=$text")
    }
  }

  test("self-overlapping terms count every end position") {
    // "aa" in "aaaa": ends at 1,2,3 -> 3 hits; naive agrees
    assert(acEval("aaaa", Seq("aa")) == ((3L, 1L)))
    // nested dictionary terms all fire via the output closure
    assert(acEval("slow scan", Seq("slow scan", "scan", "low")) == ((3L, 3L)))
  }

  test("randomized parity with the naive scanner") {
    val rnd = new Random(42)
    val alphabet = "abc"
    for (_ <- 1 to 200) {
      val nTerms = 1 + rnd.nextInt(6)
      val terms = Iterator.continually(
        (1 to (1 + rnd.nextInt(4)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
        .distinct.take(nTerms).toSeq
      val text = (1 to rnd.nextInt(60))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(acEval(text, terms) == naive(text, terms),
        s"terms=$terms text=$text")
    }
  }

  test("multi-byte UTF-8 terms match exactly, never mid-codepoint") {
    val terms = Seq("héllo", "é", "日本")
    val text = "héllo 日本語 naïve é"
    assert(acEval(text, terms) == naive(text, terms))
    // 'e' alone must not fire inside 'é' bytes
    assert(acEval("é", Seq("e")) == ((0L, 0L)))
  }

  test("null text scores as a zero-match row") {
    assert(acEval(null, Seq("x")) == ((0L, 0L)))
  }

  test("compile rejects empty and duplicate dictionaries") {
    intercept[IllegalArgumentException](AhoCorasick.compile(Seq.empty))
    intercept[IllegalArgumentException](AhoCorasick.compile(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasick.compile(Seq("a", "a")))
  }

  test("score: codegen and collected values agree with the naive scan") {
    val terms = Seq("slow scan", "scan", "stream")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Blocklist.score(docs, "doc_id", "text", terms)
      .orderBy("id").collect()
    val raw = docs.select(
        $"doc_id", trim(regexp_replace(lower($"text"), "\\s+", " ")).as("t"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out.length == raw.length && out.nonEmpty)
    out.zip(raw).foreach { case (row, (id, t)) =>
      val (hits, distinct) = naive(t, terms)
      assert(row.getLong(0) == id)
      assert(row.getLong(1) == hits, s"doc $id hits")
      assert(row.getLong(2) == distinct, s"doc $id terms")
      assert(row.getBoolean(3) == (distinct > 0), s"doc $id blocked")
    }
  }

  test("filterClean keeps exactly the zero-match rows") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("stream", "vector")
    val clean = Blocklist.filterClean(docs, "text", terms)
    val cleanIds = clean.select("doc_id").as[Long].collect().toSet
    val blockedIds = Blocklist.score(docs, "doc_id", "text", terms)
      .filter($"blocked").select("id").as[Long].collect().toSet
    val allIds = docs.select("doc_id").as[Long].collect().toSet
    assert(cleanIds.intersect(blockedIds).isEmpty)
    assert(cleanIds.union(blockedIds) == allIds)
  }

  test("interpreted eval matches codegen for the expression") {
    // force the interpreted path through a filter that Catalyst
    // evaluates without codegen (constant folding on literals)
    val terms = Seq("ab", "bc")
    val ac = AhoCorasick.compile(terms)
    val row = AhoCorasick.matchEval(
      org.apache.spark.unsafe.types.UTF8String.fromString("xabcx"), ac)
    assert((row.getLong(0), row.getLong(1)) == ((2L, 2L)))
  }
}
