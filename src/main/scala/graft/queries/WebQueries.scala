package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Queries.t
import graft.functions.{TextFunctions, UrlFunctions}
import graft.plans.NativeHtml
import graft.sources.Warc

/** The crawl front door, oracled: WARC record extraction
  * ([[graft.sources.Warc]] + [[graft.plans.NativeHtml]]) and URL
  * canonicalization / registrable-domain rollups
  * ([[graft.functions.UrlFunctions]]). Registered via
  * [[graft.Queries.all]], oracled via [[graft.Queries.oracles]].
  */
object WebQueries {

  // ---- WARC fixture ------------------------------------------------
  //
  // DuckDB cannot gunzip WARC segments, so q_warc_extract follows the
  // multimodal pinned-row pattern: the query runs the REAL reader +
  // extractor over a deterministic fixture segment (written through
  // the real binaryFile path, multi-member gzip and all), and the
  // oracle carries the expected rows — the structural outputs
  // (n_blocks / kept_blocks / survivor text) hand-pinned, the fixture
  // dimensions (byte lengths, timestamps) interpolated from the same
  // constants that build the segment. WarcSpec asserts the identical
  // pinned rows locally, so extractor drift fails `sbt test` before
  // it can fail the driver gate.

  private[graft] val ArticleP1 =
    "This is the main article text, long enough to survive the " +
      "minimum length cut, with real prose."
  private[graft] val ArticleP2 =
    "A second paragraph of genuine content that also clears " +
      "twenty-five characters easily."

  /** Title/style stripped; nav (pure links) and footer (short, link
    * dense) fail the density/length cuts; the two `<p>`s survive.
    */
  private[graft] val ArticleHtml: String =
    "<html><head><title>Skip the title</title>" +
      "<style>p{color:red}</style></head>" +
      "<body><nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
      "<a href=\"/contact\">Contact us here</a></nav>" +
      s"<div><p>$ArticleP1</p><p>$ArticleP2</p></div>" +
      "<footer>&amp; <a href=\"/t\">Terms</a> <a href=\"/p\">Privacy</a></footer>" +
      "<script>var x = 1;</script></body></html>"

  /** Every block is anchor text below the length cut: nothing survives. */
  private[graft] val LinksHtml: String =
    "<html><body><ul><li><a href=\"/1\">First link here</a></li>" +
      "<li><a href=\"/2\">Second link item</a></li></ul></body></html>"

  private[graft] val JsonBody: String = """{"ok": true, "n": 7}"""

  private[graft] val ArticleUrl = "http://www.example.com/article"
  private[graft] val LinksUrl = "https://spam.example.net/links"
  private[graft] val JsonUrl = "http://www.example.com/data.json"

  /** Write the fixture segment (idempotent: same bytes every call)
    * and return the directory the query reads.
    */
  private[graft] def writeWarcFixture(): String = {
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_warc_fixture")
    java.nio.file.Files.createDirectories(dir)
    def rec(t: String, url: String, sec: Int, id: String, ct: String,
        payload: Array[Byte]) =
      Warc.writeRecord(t, url, f"2024-03-15T12:00:0${sec}Z", id, ct, payload)
    val records = Seq(
      rec("warcinfo", "", 0, "<urn:uuid:info-1>", "application/warc-fields",
        "software: graft-crawler/1.0\r\n".getBytes("UTF-8")),
      rec("request", ArticleUrl, 1, "<urn:uuid:req-1>",
        "application/http;msgtype=request",
        "GET /article HTTP/1.1\r\nHost: www.example.com\r\n\r\n"
          .getBytes("UTF-8")),
      rec("response", ArticleUrl, 1, "<urn:uuid:resp-1>",
        "application/http;msgtype=response",
        Warc.httpResponse(200, "OK", "text/html; charset=utf-8",
          ArticleHtml.getBytes("UTF-8"))),
      rec("response", LinksUrl, 2, "<urn:uuid:resp-2>",
        "application/http;msgtype=response",
        Warc.httpResponse(200, "OK", "text/html",
          LinksHtml.getBytes("UTF-8"))),
      rec("response", JsonUrl, 3, "<urn:uuid:resp-3>",
        "application/http;msgtype=response",
        Warc.httpResponse(200, "OK", "application/json",
          JsonBody.getBytes("UTF-8"))))
    java.nio.file.Files.write(dir.resolve("sample.warc.gz"),
      Warc.gzipMembers(records))
    dir.toString
  }

  /** WARC → documents: parse the fixture segment through the real
    * binaryFile + multi-member-gzip reader, split HTTP, and
    * boilerplate-extract the HTML responses
    * ([[graft.plans.NativeHtml]]). One map-only pass; at corpus scale
    * this is exactly the 100k-segment embarrassing parallel ingest.
    */
  def warcExtract(s: SparkSession, dir: String): DataFrame = {
    val path = writeWarcFixture()
    val ex = NativeHtml.htmlExtract(decode(col("body"), "UTF-8"))
    Warc.records(s, path)
      .filter(col("warc_type") === "response")
      .withColumn("ex", when(col("mime") === "text/html", ex))
      .select(col("url"), col("ts"),
        col("status").cast("long").as("status"), col("mime"),
        octet_length(col("body")).cast("long").as("body_len"),
        col("ex.n_blocks").as("n_blocks"),
        col("ex.kept_blocks").as("kept_blocks"),
        col("ex.text").as("text"))
  }

  val warcExtractSql: String = {
    val aLen = ArticleHtml.getBytes("UTF-8").length
    val lLen = LinksHtml.getBytes("UTF-8").length
    val jLen = JsonBody.getBytes("UTF-8").length
    s"""SELECT * FROM (VALUES
      |  ('$ArticleUrl', TIMESTAMP '2024-03-15 12:00:01', CAST(200 AS BIGINT),
      |   'text/html', CAST($aLen AS BIGINT), CAST(4 AS BIGINT),
      |   CAST(2 AS BIGINT), '$ArticleP1' || chr(10) || '$ArticleP2'),
      |  ('$LinksUrl', TIMESTAMP '2024-03-15 12:00:02', CAST(200 AS BIGINT),
      |   'text/html', CAST($lLen AS BIGINT), CAST(2 AS BIGINT),
      |   CAST(0 AS BIGINT), ''),
      |  ('$JsonUrl', TIMESTAMP '2024-03-15 12:00:03', CAST(200 AS BIGINT),
      |   'application/json', CAST($jLen AS BIGINT), CAST(NULL AS BIGINT),
      |   CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR))
      |) AS t(url, ts, status, mime, body_len, n_blocks, kept_blocks, text)""".stripMargin
  }

  // ---- messy-URL fixture over orders -------------------------------
  //
  // No raw-URL column ships in the testdata, so the fixture derives a
  // deterministically MESSY absolute URL from each order (the
  // linkage-dirty-feed pattern: both engines build the identical
  // input, the operator under audit is the canonicalization) —
  // uppercase schemes/hosts, userinfo, default and explicit ports,
  // missing paths, tracking params, fragments, and hosts spanning the
  // multi-label public-suffix table, IPv4 and generic TLDs.

  private[graft] def messyUrls(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val ks = k.cast("string")
    val scheme = when(k % 3 === 0, lit("HTTP"))
      .when(k % 3 === 1, lit("https")).otherwise(lit("http"))
    val user = when(k % 11 === 0, lit("user:pw@")).otherwise(lit(""))
    val host = when(k % 7 === 0, lit("WWW.Example.COM"))
      .when(k % 7 === 1, lit("news.site.co.uk"))
      .when(k % 7 === 2, lit("Sub.Shop.com.au"))
      .when(k % 7 === 3, lit("blog.example.org"))
      .when(k % 7 === 4, lit("10.0.0.1"))
      .when(k % 7 === 5, lit("CDN.Media.io"))
      .otherwise(lit("docs.example.co.jp"))
    val port = when(k % 5 === 0, lit(":80"))
      .when(k % 5 === 1, lit(":8080")).otherwise(lit(""))
    val path = when(k % 13 === 0, lit(""))
      .otherwise(concat(lit("/item/"), ks))
    val qs = when(k % 4 === 0, concat(lit("?utm_source=x&id="), ks))
      .when(k % 4 === 1,
        concat(lit("?id="), ks, lit("&utm_campaign=c&gclid=g")))
      .when(k % 4 === 2, lit("?utm_medium=m"))
      .otherwise(lit(""))
    val frag = when(k % 2 === 0, lit("#frag")).otherwise(lit(""))
    t(s, dir, "orders").select(k.as("o_orderkey"), col("o_totalprice"),
      concat(scheme, lit("://"), user, host, port, path, qs, frag).as("url"))
  }

  private[graft] val messyUrlsCte: String =
    """urls AS (SELECT o_orderkey, o_totalprice,
      |  (CASE o_orderkey % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
      |    ELSE 'http' END) || '://' ||
      |  (CASE WHEN o_orderkey % 11 = 0 THEN 'user:pw@' ELSE '' END) ||
      |  (CASE o_orderkey % 7 WHEN 0 THEN 'WWW.Example.COM'
      |    WHEN 1 THEN 'news.site.co.uk' WHEN 2 THEN 'Sub.Shop.com.au'
      |    WHEN 3 THEN 'blog.example.org' WHEN 4 THEN '10.0.0.1'
      |    WHEN 5 THEN 'CDN.Media.io' ELSE 'docs.example.co.jp' END) ||
      |  (CASE o_orderkey % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':8080'
      |    ELSE '' END) ||
      |  (CASE WHEN o_orderkey % 13 = 0 THEN ''
      |    ELSE '/item/' || CAST(o_orderkey AS VARCHAR) END) ||
      |  (CASE o_orderkey % 4
      |    WHEN 0 THEN '?utm_source=x&id=' || CAST(o_orderkey AS VARCHAR)
      |    WHEN 1 THEN '?id=' || CAST(o_orderkey AS VARCHAR) ||
      |      '&utm_campaign=c&gclid=g'
      |    WHEN 2 THEN '?utm_medium=m' ELSE '' END) ||
      |  (CASE WHEN o_orderkey % 2 = 0 THEN '#frag' ELSE '' END) AS url
      |FROM orders)""".stripMargin

  /** URL canonicalization ([[UrlFunctions.canonicalizeUrl]]): every
    * messy order URL with its canonical form, host and registrable
    * domain. Pure map-only projection — the DuckDB twin replays the
    * identical rewrite chain from the same constants.
    */
  def urlCanonical(s: SparkSession, dir: String): DataFrame = {
    val host = UrlFunctions.hostOf(col("url"))
    messyUrls(s, dir).select(
      col("o_orderkey"), col("url"),
      UrlFunctions.canonicalizeUrl(col("url")).as("canonical_url"),
      host.as("host"),
      UrlFunctions.registrableDomain(host).as("domain"))
  }

  val urlCanonicalSql: String =
    s"""WITH $messyUrlsCte,
      |h AS (SELECT o_orderkey, url,
      |  ${UrlFunctions.canonicalizeUrlSql("url")} AS canonical_url,
      |  ${UrlFunctions.hostOfSql("url")} AS host
      |FROM urls)
      |SELECT o_orderkey, url, canonical_url, host,
      |  ${UrlFunctions.registrableDomainSql("host")} AS domain
      |FROM h""".stripMargin

  /** Registrable-domain rollup: the per-source statistics a crawl
    * curation keys on once URLs are canonical — URL and distinct-host
    * counts plus the order mass per domain. ONE map-side-combined
    * aggregate (the distinct-host count is the only second exchange).
    */
  def domainStats(s: SparkSession, dir: String): DataFrame = {
    val host = UrlFunctions.hostOf(col("url"))
    messyUrls(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        UrlFunctions.registrableDomain(host).as("domain"), host.as("host"))
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_urls"),
        count_distinct(col("host")).as("n_hosts"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("mass"))
  }

  val domainStatsSql: String =
    s"""WITH $messyUrlsCte,
      |h AS (SELECT o_orderkey, o_totalprice,
      |  ${UrlFunctions.hostOfSql("url")} AS host FROM urls),
      |d AS (SELECT o_orderkey, o_totalprice, host,
      |  ${UrlFunctions.registrableDomainSql("host")} AS domain FROM h)
      |SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
      |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mass
      |FROM d GROUP BY domain""".stripMargin

  // ---- per-domain caps off DERIVED domains -------------------------

  /** Documents with a deterministically derived crawl URL (subdomain
    * by doc id, TLD by source parity — so each source maps 1:1 to a
    * registrable domain through the REAL canonicalization chain, not
    * a string copy).
    */
  private[graft] def docUrls(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val sub = when(id % 3 === 0, lit("WWW"))
      .when(id % 3 === 1, lit("cdn")).otherwise(lit("m"))
    val tld = when(
      regexp_extract(col("source"), "([0-9]+)$", 1).cast("long") % 2 === 0,
      lit(".com")).otherwise(lit(".co.uk"))
    val track = when(id % 4 === 0, lit("?utm_source=feed")).otherwise(lit(""))
    t(s, dir, "documents").select(id.as("doc_id"), col("text"),
      concat(lit("HTTPS://"), sub, lit("."), col("source"), tld,
        lit("/doc/"), id.cast("string"), track).as("url"))
  }

  private[graft] val docUrlsCte: String =
    """urls AS (SELECT doc_id, text,
      |  'HTTPS://' || (CASE doc_id % 3 WHEN 0 THEN 'WWW' WHEN 1 THEN 'cdn'
      |    ELSE 'm' END) || '.' || source ||
      |  (CASE WHEN CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 2 = 0
      |    THEN '.com' ELSE '.co.uk' END) ||
      |  '/doc/' || CAST(doc_id AS VARCHAR) ||
      |  (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed' ELSE '' END) AS url
      |FROM documents)""".stripMargin

  /** Per-source quota caps keyed on the DERIVED registrable domain
    * (the q_source_caps demonstration the crawl path needs: the
    * `source` column never enters — the quota key comes off the raw
    * URL through hostOf → registrableDomain). Top-10 quality docs per
    * domain via the exact window formulation.
    */
  def domainCaps(s: SparkSession, dir: String): DataFrame = {
    val host = UrlFunctions.hostOf(col("url"))
    val scored = docUrls(s, dir).select(
      col("doc_id"),
      UrlFunctions.registrableDomain(host).as("domain"),
      TextFunctions.qualityScore(col("text")).as("quality_score"))
    graft.operators.Curation.sourceCapsWindow(
      scored, "domain", "doc_id", "quality_score", cap = 10)
  }

  // ---- corpus-scale crawl ingest (raw bytes → domain rollup) -------

  /** End-to-end crawl ingest AT CORPUS SCALE — the fixture q_warc_extract
    * proves record-level parsing on 3 pinned rows; this proves the whole
    * raw-bytes pipeline on the full documents table:
    *
    *   1. test-harness side: every document is wrapped in a
    *      deterministic HTML page (nav + footer boilerplate around one
    *      `<p>` of real text) and written as 16 multi-member-gzip WARC
    *      segments BY A DISTRIBUTED JOB (one segment per partition,
    *      streamed record by record — the executor never holds a
    *      segment in memory; a production harness writes through the
    *      cluster FS at the same seam);
    *   2. measured side: binaryFile → [[graft.sources.Warc]] record
    *      iterator → [[graft.plans.NativeHtml]] boilerplate extraction
    *      → [[graft.functions.UrlFunctions]] host/domain derivation →
    *      join back to the source table → per-domain recovery rollup.
    *
    * `n_recovered` counts documents whose extracted main text is
    * BYTE-IDENTICAL to the source text — the corpus-scale round-trip
    * guarantee (the boilerplate vanished, the content survived, for
    * every document whose block clears the length cut — all of them
    * in this corpus, the oracle carries the ≥25 rule anyway).
    */
  /** Write (idempotently regenerate) the 16-segment crawl fixture for
    * `dir` and return its path: every document wrapped in a
    * deterministic HTML page — nav boilerplate carrying TWO
    * deterministic `/doc/N` outlinks (the link graph q_link_graph
    * recovers), one `<p>` of the real text, footer links — streamed
    * record by record into multi-member-gzip WARC segments by a
    * DISTRIBUTED job (one segment per partition; the executor never
    * holds a segment in memory; a production harness writes through
    * the cluster FS at the same seam). Shared by q_crawl_ingest and
    * q_link_graph.
    */
  /** Bump when the segment construction changes: the fingerprint file
    * keys fixture reuse, so a stale layout regenerates exactly once.
    */
  private val CrawlFixtureVersion = "v2-hadoopfs"

  private[graft] def crawlSegments(s: SparkSession, dir: String): String = {
    val segDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_crawl_${Integer.toHexString(dir.hashCode)}")
    val segPath = segDir.toString
    // generate ONCE per (generator version, source dir): the fixture is
    // harness input, and regenerating it inside every measured run would
    // time fixture IO, not the crawl pipeline (cluster-honesty: the
    // write itself goes through the Hadoop FS API below, so the same
    // harness runs against a real cluster FS unchanged)
    val marker = segDir.resolve("_fingerprint")
    val want = s"$CrawlFixtureVersion:$dir"
    if (java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        "UTF-8") == want) return segPath
    if (java.nio.file.Files.isDirectory(segDir)) {
      val it = java.nio.file.Files.list(segDir)
      try it.forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally it.close()
    }
    java.nio.file.Files.createDirectories(segDir)
    val out1 = (col("doc_id") * 7 + 1) % 1000
    val out2 = (col("doc_id") * 13 + 3) % 1000
    val bcConf = s.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        s.sparkContext.hadoopConfiguration))
    docUrls(s, dir)
      .select(col("doc_id"), col("url"),
        concat(
          lit("<html><body><nav><a href=\"/\">Home</a> " +
            "<a href=\"/all\">All documents here</a> "),
          lit("<a href=\"/doc/"), out1.cast("string"),
          lit("\">Related one</a> "),
          lit("<a href=\"/doc/"), out2.cast("string"),
          lit("\">Related two</a></nav><div><p>"),
          col("text"),
          lit("</p></div><footer><a href=\"/terms\">Terms</a> " +
            "<a href=\"/privacy\">Privacy</a></footer></body></html>"))
          .as("html"))
      .repartition(16, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val seg = new org.apache.hadoop.fs.Path(
            segPath, f"part-$pid%05d.warc.gz")
          val fs = seg.getFileSystem(bcConf.value.value)
          val out = fs.create(seg, true)
          try rows.foreach { r =>
            val rec = Warc.writeRecord("response", r.getAs[String]("url"),
              "2024-06-01T00:00:00Z",
              s"<urn:uuid:doc-${r.getAs[Long]("doc_id")}>",
              "application/http;msgtype=response",
              Warc.httpResponse(200, "OK", "text/html; charset=utf-8",
                r.getAs[String]("html").getBytes("UTF-8")))
            val gz = new java.util.zip.GZIPOutputStream(out)
            gz.write(rec); gz.finish()
          } finally out.close()
        }
      }
    java.nio.file.Files.write(marker, want.getBytes("UTF-8"))
    segPath
  }

  /** Raw WARC records → (doc_id, domain, extracted): the per-record
    * projection both the batch ingest and the STREAMING ingest's
    * per-batch body run (boilerplate extraction + host/domain
    * derivation; map-only).
    */
  private[graft] def extractedDocs(records: DataFrame): DataFrame = {
    val ex = NativeHtml.htmlExtract(decode(col("body"), "UTF-8"))
    val host = UrlFunctions.hostOf(col("url"))
    records
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("url"), "/doc/([0-9]+)", 1).cast("long")
          .as("doc_id"),
        UrlFunctions.registrableDomain(host).as("domain"),
        ex.getField("text").as("extracted"))
  }

  /** The per-domain recovery rollup over extracted docs — shared by
    * the batch and streaming ingest gates (same oracle).
    */
  private[graft] def recoveryRollup(
      docs: DataFrame, s: SparkSession, dir: String): DataFrame =
    docs
      .join(t(s, dir, "documents").select(col("doc_id"), col("text")),
        Seq("doc_id"))
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("extracted") === col("text"), lit(1)))
          .as("n_recovered"),
        sum(when(col("extracted") === col("text"), length(col("text"))))
          .cast("long").as("recovered_chars"))

  def crawlIngest(s: SparkSession, dir: String): DataFrame = {
    val segPath = crawlSegments(s, dir)
    // the measured pipeline: raw segments back to a domain rollup,
    // through the STREAMED decode (per-task memory = buffer + record)
    recoveryRollup(extractedDocs(Warc.recordsStreamed(s, segPath)), s, dir)
  }

  /** The crawl ingest LIVE: segments arrive as binaryFile micro-batches
    * through the real engine (AvailableNow, 4 files per trigger), each
    * batch parses + extracts with the SAME per-record projection as the
    * batch path and lands in a [[graft.sources.VersionedTable]] via the
    * txn-guarded streaming commit — exactly-once even if the engine
    * replays a batch. The final rollup reads the versioned table's
    * latest snapshot and must hash-equal q_crawl_ingest's oracle: a
    * duplicated batch append, a lost segment, or an extraction drift
    * between the batch and streaming bodies all break it. This is the
    * shape a production crawler runs continuously: segments in, a
    * versioned documents table out.
    */
  def streamCrawlIngest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val segPath = crawlSegments(s, dir)
    val root = StreamGateQueries.tempRoot("graft_q_stream_crawl_tbl")
    val ckpt = StreamGateQueries.tempRoot("graft_q_stream_crawl_ckpt")
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val stream = s.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", 4)
      .schema(binarySchema)
      .load(segPath)
    stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.VersionedTable.streamCommit(
          extractedDocs(Warc.recordsOf(batch)), root, "crawl", batchId)
        ()
      }
      .start().awaitTermination()
    recoveryRollup(
      graft.sources.VersionedTable.read(s, root), s, dir)
  }

  /** The crawl's LINK GRAPH recovered from raw bytes: parse the same
    * segment set, extract every `<a href>` with the native link walk
    * ([[graft.plans.NativeHtml.htmlLinks]]), keep the `/doc/N`
    * outlinks, and emit the distinct (src, dst) edge list — the input
    * [[graft.operators.Graph]] (PageRank / k-core / triangles) and
    * [[graft.operators.ConnectedComponents]] consume. The oracle
    * replays the fixture's two-outlink construction; boilerplate
    * links (`/`, `/all`, `/terms`, `/privacy`) must NOT survive the
    * pattern gate, and a missed or phantom href breaks the edge hash.
    */
  def linkGraph(s: SparkSession, dir: String): DataFrame = {
    val segPath = crawlSegments(s, dir)
    Warc.recordsStreamed(s, segPath)
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("url"), "/doc/([0-9]+)", 1).cast("long")
          .as("src"),
        explode(NativeHtml.htmlLinks(decode(col("body"), "UTF-8")))
          .as("href"))
      .filter(col("href").rlike("^/doc/[0-9]+$"))
      .select(col("src"),
        regexp_extract(col("href"), "^/doc/([0-9]+)$", 1).cast("long")
          .as("dst"))
      .distinct()
  }

  val linkGraphSql: String =
    """SELECT doc_id AS src, (doc_id * 7 + 1) % 1000 AS dst FROM documents
      |UNION
      |SELECT doc_id, (doc_id * 13 + 3) % 1000 FROM documents""".stripMargin

  val crawlIngestSql: String =
    s"""WITH $docUrlsCte,
      |h AS (SELECT doc_id, text, ${UrlFunctions.hostOfSql("url")} AS host
      |  FROM urls),
      |d AS (SELECT doc_id, text,
      |  ${UrlFunctions.registrableDomainSql("host")} AS domain FROM h)
      |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(CASE WHEN length(text) >= 25 THEN 1 END) AS BIGINT)
      |    AS n_recovered,
      |  CAST(sum(CASE WHEN length(text) >= 25 THEN length(text) END)
      |    AS BIGINT) AS recovered_chars
      |FROM d GROUP BY domain""".stripMargin

  val domainCapsSql: String =
    s"""WITH $docUrlsCte,
      |h AS (SELECT doc_id, text,
      |  ${UrlFunctions.hostOfSql("url")} AS host FROM urls),
      |d AS (SELECT doc_id, text,
      |  ${UrlFunctions.registrableDomainSql("host")} AS domain FROM h),
      |base AS (SELECT doc_id, domain,
      |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok,
      |  CAST(length(text) AS BIGINT) AS n_chr FROM d),
      |scored AS (SELECT doc_id, domain,
      |  round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |    (CASE WHEN awl BETWEEN 3 AND 10 THEN 1.0
      |          WHEN awl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS quality_score
      |  FROM (SELECT *, CASE WHEN n_tok > 0
      |      THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |      ELSE 0.0 END AS awl FROM base))
      |SELECT doc_id, domain, quality_score, CAST(rn AS BIGINT) AS src_rank
      |FROM (SELECT *, row_number() OVER (PARTITION BY domain
      |      ORDER BY quality_score DESC, doc_id) AS rn FROM scored)
      |WHERE rn <= 10""".stripMargin
}
