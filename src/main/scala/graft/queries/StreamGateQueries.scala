package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Queries.t
import graft.functions.TextFunctions
import graft.streaming.{CdcStream, ClusterStream, DecontaminationStream, DriftStream, IvfStream, KmvStream, LexiconStream, NoveltyStream, ReservoirStream, ScorecardStream, SkewStream, StreamingSketch, TransitionStream}

/** DRIVER-ORACLED streaming gates: each query folds a streaming
  * monitor's `foreachBatch` body over three deterministic id-ordered
  * slices of the fixture corpus — exactly what a micro-batch trigger
  * would deliver in crawl order — and returns the monitor's READ-SIDE
  * output. The DuckDB oracle is the corresponding BATCH query's SQL
  * over the whole table, so the driver itself adjudicates the
  * streamed-fold-equals-batch parity claim that was previously only
  * spec-anchored (ScorecardStreamSpec / NoveltyStreamSpec /
  * DriftStreamSpec remain the richer gates: replay, compaction, real
  * stream wiring).
  *
  * Each call folds into a FRESH temp store (unique directory), so
  * repeated invocations (bench passes, verify) are independent; the
  * stores are per-batch KB..MB-scale parquet, the same state the
  * production monitor would keep.
  */
object StreamGateQueries {

  /** Three contiguous doc-id ranges in nondecreasing order — the
    * parity precondition of the first-seen stores (crawl order). The
    * min/max probe is a 1-row driver read, bounded by construction.
    */
  private def idSlices(docs: DataFrame, idCol: String): Seq[DataFrame] = {
    val mm = docs.agg(min(col(idCol)), max(col(idCol))).collect().head
    if (mm.isNullAt(0)) return Seq(docs)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = hi - lo + 1L
    val cut1 = lo + span / 3
    val cut2 = lo + 2L * span / 3
    Seq(
      docs.filter(col(idCol) < cut1),
      docs.filter(col(idCol) >= cut1 && col(idCol) < cut2),
      docs.filter(col(idCol) >= cut2))
  }

  private def tempRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Three contiguous TIME ranges — the arrival order a real event
    * stream delivers (the transition monitor's parity precondition is
    * per-user time-ordered arrival; same-timestamp rows always land
    * in one batch because the cut is on the timestamp itself).
    */
  private def tsSlices(events: DataFrame, tsCol: String): Seq[DataFrame] = {
    val us = unix_micros(col(tsCol))
    val mm = events.agg(min(us), max(us)).collect().head
    if (mm.isNullAt(0)) return Seq(events)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = hi - lo + 1L
    val cut1 = lo + span / 3
    val cut2 = lo + 2L * span / 3
    Seq(
      events.filter(us < cut1),
      events.filter(us >= cut1 && us < cut2),
      events.filter(us >= cut2))
  }

  /** The live corpus scorecard after streaming the documents table in
    * three crawl-order batches; oracle = the batch q_corpus_scorecard
    * SQL. Every column — including the DECIMAL-folded means and the
    * first-owner dup attribution — must match the batch composition
    * exactly for the driver hash to hold.
    */
  def streamScorecard(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val root = tempRoot("graft_q_stream_scorecard")
    idSlices(docs, "doc_id").zipWithIndex.foreach { case (b, i) =>
      ScorecardStream.scorecardBatch(
        b, "doc_id", "source", "lang", "text",
        root, ScorecardStream.Config(), i.toLong)
    }
    ScorecardStream.scorecard(s, root)
      .getOrElse(s.emptyDataFrame)
  }

  /** Per-doc n-gram novelty from the streamed first-seen gram store
    * (the union of the three batch reports); oracle = the batch
    * q_ngram_novelty SQL. First-seen attribution must resolve
    * identically across the batch boundary for every doc.
    */
  def streamNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val state = tempRoot("graft_q_stream_novelty_state")
    val reports = tempRoot("graft_q_stream_novelty_reports")
    idSlices(docs, "doc_id").zipWithIndex.foreach { case (b, i) =>
      NoveltyStream.noveltyBatch(
        b, "doc_id", "text", state, reports,
        NoveltyStream.Config(), i.toLong)
    }
    NoveltyStream.reports(s, reports)
      .map(_.select("doc_id", "n_ngrams", "n_novel", "novelty"))
      .getOrElse(s.emptyDataFrame)
  }

  /** Incremental SCD maintenance adjudicated by the BATCH SCD oracle:
    * the q_scd_status snapshot table arrives as three date-ordered
    * micro-batches — the first classified from scratch, the next two
    * merged in with [[graft.operators.ScdIncremental.mergeBatch]]
    * (O(touched-entities) work per batch, never a full recompute) —
    * and the final history must equal the batch classification of the
    * whole table, change_status and changed_status_date included
    * (late-global-max Deleted flips across the batch boundary are the
    * hard part). Oracle = q_scd_status's SQL.
    */
  def streamScd(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Scd, ScdIncremental}
    import org.apache.spark.sql.expressions.Window
    val dedupW = Window.partitionBy("snapshot_date", "o_custkey")
      .orderBy(col("o_orderkey").desc)
    val snap = t(s, dir, "orders")
      .withColumn("snapshot_date", col("o_orderdate").cast("date"))
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .select("snapshot_date", "o_custkey", "o_orderstatus", "o_orderpriority")
    val mm = snap.agg(min("snapshot_date"), max("snapshot_date")).collect().head
    if (mm.isNullAt(0)) return s.emptyDataFrame
    val (lo, hi) = (mm.getDate(0).toLocalDate, mm.getDate(1).toLocalDate)
    val span = java.time.temporal.ChronoUnit.DAYS.between(lo, hi) + 1
    val cut1 = java.sql.Date.valueOf(lo.plusDays(span / 3))
    val cut2 = java.sql.Date.valueOf(lo.plusDays(2 * span / 3))
    val slices = Seq(
      snap.filter(col("snapshot_date") < lit(cut1)),
      snap.filter(col("snapshot_date") >= lit(cut1) &&
        col("snapshot_date") < lit(cut2)),
      snap.filter(col("snapshot_date") >= lit(cut2)))
    var hist = slices.head
      .transform(Scd.addRowHash(exclude = Seq("snapshot_date")))
      .transform(Scd.changeStatus(entityCols = Seq("o_custkey")))
      .drop(Scd.RowHash)
      .localCheckpoint()
    slices.tail.foreach { b =>
      val next = ScdIncremental.mergeBatch(hist, b, Seq("o_custkey"))
        .localCheckpoint()
      graft.operators.SimilaritySearch.dropCheckpointBlocks(hist)
      hist = next
    }
    hist.select("o_custkey", "snapshot_date", "change_status",
      "changed_status_date")
  }

  /** Incremental near-dup clustering adjudicated by the batch
    * recursive-CTE oracle: the minhash candidate PAIRS arrive in
    * three batches (a pair arrives when its LATER endpoint does —
    * crawl semantics), each folded by [[ClusterStream.mergeBatch]]
    * (prior labels re-enter as star edges, CC walks only the new
    * connections). The final labels must equal the from-scratch
    * resolve over every pair — q_dedup_clusters' oracle.
    */
  def streamCluster(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupQueries.dedupMinHash(s, dir)
      .select(col("id_a"), col("id_b"),
        greatest(col("id_a"), col("id_b")).as("__arr"))
    val state = tempRoot("graft_q_stream_cluster")
    idSlices(pairs, "__arr").zipWithIndex.foreach { case (b, i) =>
      ClusterStream.mergeBatch(b.select("id_a", "id_b"), state, i.toLong)
    }
    ClusterStream.labels(s, state)
      .withColumnRenamed("node", "doc_id")
  }

  /** Live benchmark-store decontamination: the eval set arrives in
    * three batches (benchmark releases — the side that actually
    * updates), each reduced to its distinct shingle hashes; gating
    * the corpus through the merged store must equal the batch
    * q_decontaminate report over the full benchmark — the semilattice
    * store argument, driver-checked.
    */
  def streamDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = docs.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id"), col("text"))
    val state = tempRoot("graft_q_stream_decontaminate")
    idSlices(bench, "doc_id").zipWithIndex.foreach { case (b, i) =>
      DecontaminationStream.mergeBatch(b, "doc_id", "text", state,
        DecontaminationStream.Config(shingleSize = 3, threshold = 0.8), i.toLong)
    }
    graft.operators.Decontaminate.overlapReportHashes(
      docs, DecontaminationStream.hashes(s, state), "doc_id", "text",
      shingleSize = 3, threshold = 0.8)
  }

  /** Streaming change-data-capture adjudicated by the batch snapshot
    * diff: the q_snapshot_diff query's "old" and "current" per-customer
    * latest-order snapshots arrive as two consecutive full-snapshot
    * micro-batches through [[CdcStream.snapshotDiffBatch]]; the
    * second batch's emitted change log must equal the batch
    * SnapshotDiff over the same pair — added/removed/changed and the
    * changed-column lists included.
    */
  def streamCdc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        "o_orderstatus")
    def latest(df: DataFrame): DataFrame = df
      .withColumn("__rn", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val old = latest(o.filter(
      col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
    val cur = latest(o.filter(
      col("o_orderdate") >= lit("1995-01-01").cast("timestamp")))
    val state = tempRoot("graft_q_stream_cdc_state")
    val changes = tempRoot("graft_q_stream_cdc_changes")
    val write = CdcStream.snapshotDiffBatch(state, changes, Seq("o_custkey")) _
    write(old, 0L)
    write(cur, 1L)
    s.read.parquet(s"$changes/batch_id=1")
      .select("o_custkey", "change_type", "changed_cols")
  }

  /** The live behavioral-transition matrix after the event stream
    * arrives in three TIME-ordered batches (boundary transitions —
    * a user's last event of batch N to their first of batch N+1 —
    * are exactly what the carried last-event store exists for);
    * oracle = the batch q_event_transitions SQL over the whole
    * stream, PMI and conditional probabilities included.
    */
  def streamTransitions(s: SparkSession, dir: String): DataFrame = {
    val evs = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val pairsDir = tempRoot("graft_q_stream_trans_pairs")
    val lastDir = tempRoot("graft_q_stream_trans_last")
    val write = TransitionStream.transitionBatch(
      "user_id", "ts", "event_type", "event_id", pairsDir, lastDir) _
    tsSlices(evs, "ts").zipWithIndex.foreach { case (b, i) => write(b, i.toLong) }
    TransitionStream.matrix(s, pairsDir)
  }

  /** The live weighted reservoir after the documents arrive in three
    * batches; oracle = the batch q_weighted_sample_grouped SQL. The
    * Efraimidis-Spirakis key is a pure function of (seed, id, weight),
    * so "k best per source" over merged candidate sets must equal the
    * one-pass batch sample EXACTLY — ranks included.
    */
  def streamReservoir(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("source", "doc_id", "n_chars")
    val state = tempRoot("graft_q_stream_reservoir")
    idSlices(docs, "doc_id").zipWithIndex.foreach { case (b, i) =>
      ReservoirStream.mergeBatch(b, "source", "doc_id", "n_chars", state,
        ReservoirStream.Config(k = 20, seed = 17L), i.toLong)
    }
    ReservoirStream.sample(s, state, ReservoirStream.Config(k = 20, seed = 17L))
      // the store carries weights as double (the E-S key domain); the
      // batch query's weights are the raw integral n_chars — cast back
      .select(col("source"), col("id").as("doc_id"),
        col("weight").cast("long").as("weight"), col("sample_rank"))
  }

  /** Fold the documents into a fresh streamed lexicon (unigram count)
    * store — ONE store serves all three live lexical signals below,
    * the "one mergeable representation, many metrics" design.
    */
  private def lexiconStore(s: SparkSession, dir: String): String = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
    val store = tempRoot("graft_q_stream_lexicon")
    val write = LexiconStream.lexiconBatch("source", "text", store) _
    idSlices(docs, "doc_id").zipWithIndex.foreach { case (b, i) => write(b, i.toLong) }
    store
  }

  /** Live per-source Zipf slope off the streamed lexicon store;
    * oracle = the batch q_zipf_slope SQL.
    */
  def streamZipf(s: SparkSession, dir: String): DataFrame =
    LexiconStream.zipfSlope(s, lexiconStore(s, dir))

  /** Live pairwise source JS divergence off the same store shape;
    * oracle = the batch q_source_divergence SQL.
    */
  def streamDivergence(s: SparkSession, dir: String): DataFrame =
    LexiconStream.jsDivergence(s, lexiconStore(s, dir))

  /** Live source-distinctive terms off the same store shape;
    * oracle = the batch q_distinctive_terms SQL.
    */
  def streamDistinctive(s: SparkSession, dir: String): DataFrame =
    LexiconStream.distinctiveTerms(s, lexiconStore(s, dir))

  /** The live IVF similarity index after the embeddings stream in as
    * three batches under a FIXED coarse quantizer (the versioned-model
    * production pattern); searching the streamed index must equal the
    * batch q_simsearch_ivf search — cell assignment is a pure function
    * of (model, vector), so the union of per-batch assignments IS the
    * batch index. Oracle = q_simsearch_ivf's full DuckDB replay
    * (centroids, probe set, candidate scoring, top-5).
    */
  def streamIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val model = graft.operators.IvfIndex.train(
      e, "vec_id", "embedding", k = 16, iters = 0)
    val state = tempRoot("graft_q_stream_ivf")
    idSlices(e.select(col("vec_id"), col("embedding")), "vec_id")
      .zipWithIndex.foreach { case (b, i) =>
        IvfStream.mergeBatch(b, "vec_id", "embedding", model, state, i.toLong)
      }
    IvfStream.search(e.filter(col("vec_id") < 10), s, state,
      "vec_id", "embedding", model, kNeighbors = 5, nprobe = 4)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** The live heavy-hitter verdicts off the merged per-batch count-min
    * sketches: CMS counters are LINEAR, so the merge of three batch
    * sketches is bit-identical to the one-pass corpus sketch — every
    * estimate, and therefore every within-bound verdict, must equal
    * the batch q_heavy_hitters row set. Oracle = that query's SQL.
    */
  def streamSketch(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    def words(df: DataFrame): DataFrame = df.select(
      explode(split(TextFunctions.normalizeText(col("text")), " ")).as("word"))
    val cfg = StreamingSketch.Config(eps = 0.001, confidence = 0.99, seed = 17)
    val state = tempRoot("graft_q_stream_sketch")
    idSlices(docs, "doc_id").zipWithIndex.foreach { case (b, i) =>
      StreamingSketch.mergeBatch(words(b), "word", state, cfg, i.toLong)
    }
    val exact = words(docs).groupBy("word").agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") >= 100)
    StreamingSketch.estimates(exact, "word", state, cfg)
      .select(col("word"), col("n_exact"),
        (col("cms_est") >= col("n_exact") &&
          col("cms_est") <= col("n_exact") + col("cms_slack"))
          .as("within_bound"))
  }

  /** The live cross-source KMV overlap matrix after streaming the
    * documents in three batches; oracle = the batch
    * q_source_overlap_sketch SQL. KMV sketches are a semilattice
    * (merge = k smallest distinct of the union), so the streamed
    * merge must reproduce the one-pass sketch — and therefore every
    * estimate — EXACTLY.
    */
  def streamKmvOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val state = tempRoot("graft_q_stream_kmv")
    idSlices(docs, "doc_id").zipWithIndex.foreach { case (b, i) =>
      KmvStream.mergeBatch(b, "source", "text", state,
        KmvStream.Config(n = 8, k = 256), i.toLong)
    }
    KmvStream.overlapMatrix(s, state, KmvStream.Config(n = 8, k = 256))
  }

  /** The live shuffle-key skew report after streaming both monitored
    * tables in three batches each; oracle = the batch q_skew_report
    * SQL. Per-key counts are additive, so the cumulative store's
    * report must equal the batch report to the last digit —
    * suggested_salt's integer ceil included.
    */
  def streamSkew(s: SparkSession, dir: String): DataFrame = {
    def fold(df: DataFrame, idCol: String, keyCol: String, name: String): DataFrame = {
      val state = tempRoot(s"graft_q_stream_skew_$name")
      val cols = Seq(idCol, keyCol).distinct.map(col)
      idSlices(df.select(cols: _*), idCol)
        .zipWithIndex.foreach { case (b, i) =>
          SkewStream.countBatch(b, keyCol, state, i.toLong)
        }
      SkewStream.report(s, state, keyCol).getOrElse(s.emptyDataFrame)
    }
    fold(t(s, dir, "events"), "event_id", "user_id", "events")
      .unionAll(fold(t(s, dir, "lineitem"), "l_orderkey", "l_orderkey", "li"))
  }

  /** The cumulative length-distribution chi-square after the third
    * micro-batch; oracle = the batch q_distribution_drift SQL (the
    * cumulative count store after batch N IS the whole corpus).
    */
  def streamDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
    val store = tempRoot("graft_q_stream_drift_store")
    val drift = tempRoot("graft_q_stream_drift_out")
    idSlices(docs, "doc_id").zipWithIndex.foreach { case (b, i) =>
      DriftStream.driftBatch(store, drift)(
        graft.operators.Drift.lengthBuckets(b, "source", "n_chars"), i.toLong)
    }
    DriftStream.driftLog(s, drift)
      .filter(col("batch_id") === 2L)
      .select("source", "n_docs", "chi2")
  }
}
