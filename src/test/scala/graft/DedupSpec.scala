package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")

  test("exactDedup clusters case-variants together, uniques alone") {
    val corpus = docs
      .union(docs.filter($"doc_id" < 10)
        .select(($"doc_id" + 5000).as("doc_id"), upper($"text").as("text")))
    val out = Dedup.exactDedup(corpus, "text", "doc_id")
    val dups = out.filter($"is_duplicate").select("doc_id").as[Long].collect().sorted
    assert(dups.toSeq == (5000L until 5010L))
    assert(out.filter($"cluster_size" === 2).count() == 20)
    // representative is always the min id of the cluster
    assert(out.filter($"representative" > $"doc_id").count() == 0)
  }

  test("minhash LSH finds tail-truncated near-duplicates with high recall") {
    val variants = docs.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 5000).as("doc_id"),
        $"text".substr(lit(1), greatest(length($"text") - 15, lit(20))).as("text"))
    val corpus = docs.union(variants)
    val (pairs, dropped) = Dedup.minHashCandidates(corpus, "text", "doc_id")
    assert(dropped.count() == 0)
    val expected = docs.filter($"doc_id" % 7 === 0).select($"doc_id").as[Long]
      .collect().map(id => (id, id + 5000)).toSet
    val found = pairs.as[(Long, Long)].collect().toSet
    val recall = expected.count(found.contains).toDouble / expected.size
    assert(recall >= 0.9, s"recall $recall; found ${found.size} pairs")
  }

  test("ngram jaccard is 1.0 for identical docs, high for near-dups") {
    val variants = docs.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 5000).as("doc_id"),
        $"text".substr(lit(1), greatest(length($"text") - 15, lit(20))).as("text"))
    val self = docs.limit(5)
      .select($"doc_id".as("id_a"), $"doc_id".as("id_b"))
    val selfSim = Dedup.ngramJaccard(docs, self, "text", "doc_id")
    assert(selfSim.filter($"jaccard" =!= 1.0).count() == 0)
    val nearPairs = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id".as("id_a"), ($"doc_id" + 5000).as("id_b"))
    val near = Dedup.ngramJaccard(docs.union(variants), nearPairs, "text", "doc_id")
    val minJ = near.agg(min("jaccard")).head().getDouble(0)
    assert(minJ > 0.5, s"near-dup jaccard unexpectedly low: $minJ")
  }

  test("simhash: near-identical docs are Hamming-close, unrelated far") {
    val sig = Dedup.withSimHash(docs.limit(50), "text", "s")
      .select("doc_id", "s")
    val variant = Dedup.withSimHash(
      docs.limit(50).select($"doc_id", concat($"text", lit(" extra token")).as("text")),
      "text", "s2").select("doc_id", "s2")
    val joined = sig.join(variant, "doc_id")
      .select($"doc_id", bit_count($"s".bitwiseXOR($"s2")).as("d"))
    val maxNear = joined.agg(max("d")).head().getInt(0)
    assert(maxNear <= 8, s"near-dup simhash distance too large: $maxNear")
    // cross-document distances should typically be much larger
    val cross = sig.as("a").join(sig.as("b"), $"a.doc_id" < $"b.doc_id")
      .select(bit_count(col("a.s").bitwiseXOR(col("b.s"))).as("d"))
    val avgCross = cross.agg(avg("d")).head().getDouble(0)
    assert(avgCross > 8, s"cross-doc simhash distance suspiciously small: $avgCross")
  }

  test("native shingle-hash and minhash-sig match the HOF reference formulation") {
    graft.plans.NativeText.register(spark, Seq(32))
    val sample = docs.limit(100)
    val hof = sample.select(
      $"doc_id",
      Dedup.shingleHashes($"text", 3).as("h"))
      .select($"doc_id", Dedup.minHashSignature($"h", 32).as("sig"))
    val native = sample.select(
      $"doc_id",
      graft.plans.NativeText.shingleHash32(
        split(TextFunctions.normalizeText($"text"), " "), 3).as("h"))
      .select($"doc_id", graft.plans.NativeText.minHashSig($"h", 32).as("sig"))
    val a = hof.orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    val b = native.orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    assert(a == b)

    val hofBands = hof.select($"doc_id",
      Dedup.lshBandHashes($"sig", 8, 4).as("b"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    val nativeBands = native.select($"doc_id",
      graft.plans.NativeText.bandHashes($"sig", 8, 4).as("b"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(hofBands == nativeBands)
  }

  test("hashed ngram jaccard equals the string-comparison formulation") {
    val variants = docs.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 5000).as("doc_id"),
        $"text".substr(lit(1), greatest(length($"text") - 15, lit(20))).as("text"))
    val corpus = docs.union(variants)
    val pairs = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id".as("id_a"), ($"doc_id" + 5000).as("id_b"))
    val hashed = Dedup.ngramJaccard(corpus, pairs, "text", "doc_id")
      .orderBy("id_a").as[(Long, Long, Int, Int, Double)].collect().toSeq
    val exact = Dedup.ngramJaccardExact(corpus, pairs, "text", "doc_id")
      .orderBy("id_a").as[(Long, Long, Int, Int, Double)].collect().toSeq
    assert(hashed.nonEmpty && hashed == exact)
  }

  test("native simhash matches the HOF reference formulation") {
    graft.plans.NativeText.register(spark)
    val sample = docs.limit(100)
    val hashes = sample.select($"doc_id",
      graft.plans.NativeText.shingleHash32(
        split(TextFunctions.normalizeText($"text"), " "), 1).as("h"))
    val hof = hashes.select($"doc_id", Dedup.simHashFromHashes($"h").as("s"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val native = hashes.select($"doc_id", graft.plans.NativeText.simHash32($"h").as("s"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(hof == native)
  }

  test("minHashCandidates spreads a checkpointed small input across cores") {
    // a localCheckpoint'd frame plans as a LogicalRDD leaf whose size
    // stats default to defaultSizeInBytes (unknown = huge), which used
    // to silently skip the small-input repartition — exactly the shape
    // TrainingCorpusJob feeds in. The RDD's real partition count is
    // authoritative instead.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .coalesce(1).localCheckpoint(true)
    val (pairs, _) = Dedup.minHashCandidates(docs, "text", "doc_id")
    val spread = pairs.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
    }
    assert(spread.nonEmpty,
      "checkpointed 1-partition input must repartition before the CPU-bound hash stage")
  }

  test("wordShingles handles short texts (no descending-sequence bug)") {
    val df = Seq("one two", "a", "", "one two three four").toDF("t")
    val got = df.select(size(TextFunctions.wordShingles($"t", 3)).as("n"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 0, 0, 2))
  }

  test("source dedup matrix: canonical pairs, and totals equal the pair count") {
    val m = Queries.all("q_source_dedup_matrix")(spark, "/root/testdata/sf0.001")
      .cache()
    val rows = m.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "unordered pair canonical order")
      assert(r.getLong(2) > 0L)
    }
    // the matrix partitions the candidate pair set: totals must agree
    val corpusPairs = Queries.all("q_dedup_minhash")(spark, "/root/testdata/sf0.001")
      .count()
    assert(rows.map(_.getLong(2)).sum == corpusPairs,
      "every candidate pair lands in exactly one matrix cell")
    // planted near-dups inherit their original's source, so same-source
    // cells must carry most of the mass on this fixture
    val diag = rows.filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum
    assert(diag * 2 >= corpusPairs, s"diagonal $diag of $corpusPairs")
  }
}
