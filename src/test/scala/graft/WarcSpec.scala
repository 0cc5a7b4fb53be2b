package graft

import org.apache.spark.sql.functions._

import graft.queries.WebQueries
import graft.sources.Warc

/** WARC reader gates: multi-record multi-member-gzip parse through the
  * real binaryFile path, plain (uncompressed) segments, HTTP
  * splitting, and the LOUD-failure contract for truncated or
  * malformed records. Also asserts the q_warc_extract pinned oracle
  * rows locally (the MediaFixtures pattern), so extractor drift fails
  * `sbt test` before it can fail the driver gate.
  */
class WarcSpec extends SparkSpec {

  private def rec(t: String, url: String, ct: String, payload: Array[Byte]) =
    Warc.writeRecord(t, url, "2024-01-02T03:04:05Z", s"<urn:uuid:$t>",
      ct, payload)

  private val html = "<html><body><p>plain enough body text, well past the cut</p></body></html>"
  private val respRec = rec("response", "http://a.example/x",
    "application/http;msgtype=response",
    Warc.httpResponse(200, "OK", "text/html; charset=utf-8",
      html.getBytes("UTF-8")))
  private val infoRec = rec("warcinfo", "", "application/warc-fields",
    "software: test\r\n".getBytes("UTF-8"))

  test("multi-member gzip segment parses record by record") {
    val gz = Warc.gzipMembers(Seq(infoRec, respRec))
    val rs = Warc.parseSegment("seg.warc.gz", gz).toSeq
    assert(rs.map(_.warc_type) === Seq("warcinfo", "response"))
    assert(rs.map(_.rec_idx) === Seq(0L, 1L))
    val r = rs(1)
    assert(r.url === "http://a.example/x")
    assert(r.status === Some(200))
    assert(r.mime === "text/html")
    assert(new String(r.body, "UTF-8") === html)
    assert(r.ts.toInstant === java.time.Instant.parse("2024-01-02T03:04:05Z"))
  }

  test("plain (uncompressed) segments parse identically") {
    val plain = infoRec ++ respRec
    val rs = Warc.parseSegment("seg.warc", plain).toSeq
    assert(rs.map(_.warc_type) === Seq("warcinfo", "response"))
    assert(new String(rs(1).body, "UTF-8") === html)
  }

  test("a payload truncated mid-record fails loudly with the position") {
    val cut = respRec.take(respRec.length - 20)
    val e = intercept[java.io.IOException] {
      Warc.parseSegment("trunc.warc", cut).toSeq
    }
    assert(e.getMessage.contains("truncated"))
    assert(e.getMessage.contains("trunc.warc"))
  }

  test("a record missing its closing CRLFs fails loudly") {
    val noClose = respRec.take(respRec.length - 4) // drop \r\n\r\n
    val e = intercept[java.io.IOException] {
      Warc.parseSegment("f.warc", noClose).toSeq
    }
    assert(e.getMessage.contains("closing"))
  }

  test("a non-WARC prefix fails loudly (not silently skipped)") {
    val junk = "HELLO/1.0\r\n\r\n".getBytes("ISO-8859-1") ++ respRec
    val e = intercept[java.io.IOException] {
      Warc.parseSegment("f.warc", junk).toSeq
    }
    assert(e.getMessage.contains("version line"))
  }

  test("missing Content-Length fails loudly") {
    val bad = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      "WARC-Date: 2024-01-02T03:04:05Z\r\n\r\n").getBytes("ISO-8859-1")
    val e = intercept[java.io.IOException] {
      Warc.parseSegment("f.warc", bad).toSeq
    }
    assert(e.getMessage.contains("Content-Length"))
  }

  test("chunked transfer-encoding bodies de-chunk to the exact bytes") {
    def chunk(s: String) = f"${s.length}%x\r\n$s\r\n"
    val chunkedPayload =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" +
        chunk("<p>first piece ") + chunk("and the second piece</p>") +
        "0\r\nX-Trailer: dropped\r\n\r\n").getBytes("ISO-8859-1")
    val r = Warc.parseSegment("c.warc",
      rec("response", "http://a.example/c",
        "application/http;msgtype=response", chunkedPayload)).toSeq.head
    assert(new String(r.body, "UTF-8") ===
      "<p>first piece and the second piece</p>")
    assert(r.mime === "text/html")
  }

  test("a chunk overrunning the payload fails loudly") {
    val bad = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "ff\r\nonly a few bytes").getBytes("ISO-8859-1")
    val e = intercept[java.io.IOException] {
      Warc.parseSegment("c.warc",
        rec("response", "http://a.example/c",
          "application/http;msgtype=response", bad)).toSeq
    }
    assert(e.getMessage.contains("chunk"), e.getMessage)
  }

  test("the distributed read delivers every record of every segment") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_spec")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"),
      Warc.gzipMembers(Seq(infoRec, respRec)))
    java.nio.file.Files.write(dir.resolve("b.warc"), respRec)
    val got = Warc.records(spark, dir.toString)
    assert(got.count() === 3)
    assert(got.filter(col("warc_type") === "response").count() === 2)
    // non-response records carry the WARC-level content type, no status
    val info = got.filter(col("warc_type") === "warcinfo").collect().head
    assert(info.getAs[String]("mime") === "application/warc-fields")
    assert(info.isNullAt(info.fieldIndex("status")))
  }

  test("recordsStreamed == records, record for record, on mixed segments") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_streamed")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"),
      Warc.gzipMembers(Seq(infoRec, respRec)))
    java.nio.file.Files.write(dir.resolve("b.warc"), respRec)
    java.nio.file.Files.write(dir.resolve("ignored.txt"),
      "not a segment".getBytes("UTF-8"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .select(
        // file paths differ in scheme qualification; compare the names
        regexp_extract(col("file"), "([^/]+)$", 1).as("f"),
        col("rec_idx"), col("warc_type"), col("url"), col("ts"),
        col("record_id"), col("status"), col("mime"),
        sha2(col("body"), 256).as("body_sha"))
      .collect().map(_.toString).sorted.toSeq
    val a = canon(Warc.records(spark, dir.toString))
    val b = canon(Warc.recordsStreamed(spark, dir.toString))
    assert(a.nonEmpty && a === b)
  }

  test("recordsStreamed decodes a segment far larger than its read buffer") {
    // ~6 MB inflated across 2000 records, streamed through a 4 KB
    // buffer: per-task residency is |buffer| + |record|, never |segment|
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_big")
    val recs = (0 until 2000).map { i =>
      rec("response", s"http://big.example/doc/$i",
        "application/http;msgtype=response",
        Warc.httpResponse(200, "OK", "text/html",
          (s"<html><body><p>record $i " + "x" * 3000 + "</p></body></html>")
            .getBytes("UTF-8")))
    }
    java.nio.file.Files.write(dir.resolve("big.warc.gz"),
      Warc.gzipMembers(recs))
    val got = Warc.recordsStreamed(spark, dir.toString, bufferBytes = 4096)
    assert(got.count() === 2000L)
    val tail = got.filter(col("rec_idx") === 1999L).collect().head
    assert(tail.getAs[String]("url") === "http://big.example/doc/1999")
    assert(new String(tail.getAs[Array[Byte]]("body"), "UTF-8")
      .contains("record 1999"))
  }

  test("q_warc_extract emits exactly the pinned oracle rows") {
    val rows = WebQueries.warcExtract(spark, "unused")
      .orderBy("ts").collect()
    assert(rows.length === 3)
    val article = rows(0)
    assert(article.getAs[String]("url") === WebQueries.ArticleUrl)
    assert(article.getAs[Long]("n_blocks") === 4L)
    assert(article.getAs[Long]("kept_blocks") === 2L)
    assert(article.getAs[String]("text") ===
      WebQueries.ArticleP1 + "\n" + WebQueries.ArticleP2)
    val links = rows(1)
    assert(links.getAs[Long]("n_blocks") === 2L)
    assert(links.getAs[Long]("kept_blocks") === 0L)
    assert(links.getAs[String]("text") === "")
    val json = rows(2)
    assert(json.getAs[String]("mime") === "application/json")
    assert(json.isNullAt(json.fieldIndex("text")))
  }
}
