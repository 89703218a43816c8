package graft

import graft.sources.Warc
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** WARC ingest (sources.Warc): record walk, gzip layouts, HTTP
  * splitting, refusal behavior, and the crawl-pipeline composition
  * down to dedup — fixtures are hand-built per the public ISO 28500
  * framing, independent of the parser. */
class WarcSpec extends GraftSpec {

  private def record(wtype: String, uri: String, payload: Array[Byte],
                     date: String = "2024-01-01T00:00:00Z"): Array[Byte] = {
    val h = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $wtype\r\n")
      .append(if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "")
      .append(s"WARC-Date: $date\r\n")
      .append("Content-Type: application/http;msgtype=response\r\n")
      .append(s"Content-Length: ${payload.length}\r\n")
      .append("\r\n").toString.getBytes(ISO_8859_1)
    h ++ payload ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }

  private def httpHtml(html: String, status: Int = 200,
                       ct: String = "text/html; charset=utf-8"): Array[Byte] = {
    val body = html.getBytes(UTF_8)
    (s"HTTP/1.1 $status OK\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1) ++ body
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private val page =
    "<html><head><title>t</title></head><body><p>hello crawl world</p></body></html>"

  private def fixture: Array[Byte] =
    record("response", "http://EXAMPLE.com:80/a?utm_source=x", httpHtml(page)) ++
      record("request", "http://example.com/a",
        "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(ISO_8859_1)) ++
      record("response", "http://example.com/png", httpHtml("nothtml",
        ct = "image/png")) ++
      record("response", "http://example.com/404", httpHtml("gone", status = 404)) ++
      record("metadata", "", "k: v\r\n".getBytes(ISO_8859_1))

  test("record walk: envelope fields, HTTP split, all three gzip layouts") {
    for ((bytes, label) <- Seq(
        (fixture, "plain"),
        (gzip(fixture), "whole-file gzip"),
        // Common Crawl layout: one gzip member PER RECORD, concatenated
        (gzip(record("response", "http://EXAMPLE.com:80/a?utm_source=x", httpHtml(page))) ++
          gzip(record("request", "http://example.com/a",
            "GET /a HTTP/1.1\r\n\r\n".getBytes(ISO_8859_1))) ++
          gzip(record("response", "http://example.com/png",
            httpHtml("nothtml", ct = "image/png"))) ++
          gzip(record("response", "http://example.com/404",
            httpHtml("gone", status = 404))) ++
          gzip(record("metadata", "", "k: v\r\n".getBytes(ISO_8859_1))),
          "per-record gzip"))) {
      val rs = Warc.parseWarc(bytes)
      assert(rs.length == 5, s"$label: ${rs.length}")
      val first = rs.head
      assert(first.warcType == "response" &&
        first.targetUri == "http://EXAMPLE.com:80/a?utm_source=x" &&
        first.httpStatus == 200 &&
        first.httpContentType.startsWith("text/html"), s"$label: $first")
      assert(new String(first.body, UTF_8) == page, label)
      assert(rs(1).warcType == "request" && rs(1).httpStatus == 0, label)
      assert(rs(2).httpContentType == "image/png", label)
      assert(rs(3).httpStatus == 404, label)
      assert(rs(4).warcType == "metadata" && rs(4).targetUri.isEmpty, label)
    }
  }

  test("record walk is INCREMENTAL: first record pulled consumes one record, not the file") {
    val one = record("response", "http://example.com/a", httpHtml(page))
    val bytes = Array.fill(50)(one).reduce(_ ++ _)
    class CountingIn(b: Array[Byte]) extends java.io.ByteArrayInputStream(b) {
      def consumed: Int = pos
    }
    val cin = new CountingIn(bytes)
    val it = graft.sources.Warc.parseRecordsStream(cin)
    val first = it.next()
    assert(first.targetUri == "http://example.com/a")
    // one record (+ the next record's skipped blank-line/lookahead
    // sliver) — the other 49 stay unread until pulled
    assert(cin.consumed <= one.length + 8,
      s"consumed=${cin.consumed} of ${bytes.length}")
    assert(it.size == 49)
  }

  test("hostile and truncated inputs parse the well-formed prefix, never throw") {
    assert(Warc.parseWarc(Array.emptyByteArray).isEmpty)
    assert(Warc.parseWarc("random junk\r\n\r\n".getBytes(ISO_8859_1)).isEmpty)
    val rnd = new scala.util.Random(42)
    val noise = Array.fill(4096)(rnd.nextInt.toByte)
    // random bytes cannot start a WARC/ header line: zero records AND
    // no throw (the earlier `|| true` form asserted nothing)
    assert(Warc.parseWarc(noise).isEmpty)
    // truncated second record: the first survives
    val full = fixture
    val cut = java.util.Arrays.copyOfRange(full, 0,
      record("response", "http://EXAMPLE.com:80/a?utm_source=x",
        httpHtml(page)).length + 40)
    assert(Warc.parseWarc(cut).length == 1)
    // truncated gzip tail: prefix records survive
    val g = gzip(full)
    val gCut = java.util.Arrays.copyOfRange(g, 0, g.length - 8)
    assert(Warc.parseWarc(gCut).length >= 1)
    // Content-Length lies beyond EOF: record rejected cleanly
    val lying = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 99999\r\n\r\nshort").getBytes(ISO_8859_1)
    assert(Warc.parseWarc(lying).isEmpty)
  }

  test("transfer layers undone: chunked framing, content-encoding, charsets, dirty status") {
    // chunked: the html split across two chunks, framing stripped
    val html = "<p>chunked page body</p>"
    val (c1, c2) = html.splitAt(10)
    val chunked = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" +
      f"${c1.length}%x\r\n$c1\r\n${c2.length}%x\r\n$c2\r\n0\r\n\r\n").getBytes(ISO_8859_1)
    val r1 = Warc.parseWarc(record("response", "http://h/c", chunked)).head
    assert(new String(r1.body, UTF_8) == html, new String(r1.body, UTF_8))
    // content-encoding gzip: body arrives inflated
    val gzBody = gzip(html.getBytes(UTF_8))
    val enc = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Encoding: gzip\r\nContent-Length: ${gzBody.length}\r\n\r\n")
      .getBytes(ISO_8859_1) ++ gzBody
    val r2 = Warc.parseWarc(record("response", "http://h/g", enc)).head
    assert(new String(r2.body, UTF_8) == html)
    // malformed chunk framing falls back to the raw payload bytes
    // rather than dropping the body or throwing
    val badChunk = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\n\r\nzz-not-hex\r\ngarbage").getBytes(ISO_8859_1)
    val r3 = Warc.parseWarc(record("response", "http://h/bad", badChunk)).head
    assert(new String(r3.body, UTF_8) == "zz-not-hex\r\ngarbage")
    // declared non-UTF-8 charset decodes correctly (not mojibake), and
    // the media-type match is case-insensitive
    val cyr = "<p>Привет мир</p>"
    val cp1251 = cyr.getBytes(java.nio.charset.Charset.forName("windows-1251"))
    val ruResp = (s"HTTP/1.1  200 OK\r\nContent-Type: Text/HTML; charset=windows-1251\r\n" +
      s"Content-Length: ${cp1251.length}\r\n\r\n").getBytes(ISO_8859_1) ++ cp1251
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_enc")
    java.nio.file.Files.write(dir.resolve("ru.warc"),
      record("response", "http://h/ru", ruResp))
    val rows = Warc.htmlResponses(Warc.readWarc(spark, dir.toString + "/*"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // the double-spaced status line still parses as 200; the page
    // passes the Text/HTML filter and decodes via the declared charset
    assert(rows == Map("http://h/ru" -> cyr), rows.toString)
  }

  test("readWarc + htmlResponses: files to (url, html) rows, into the hygiene chain") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc")
    java.nio.file.Files.write(dir.resolve("seg-0.warc"), fixture)
    java.nio.file.Files.write(dir.resolve("seg-1.warc.gz"), gzip(
      record("response", "http://example.com/b", httpHtml(page))))
    // a dirty body: invalid UTF-8 mid-page must decode with
    // replacement, not raise (ANSI decode() would throw here)
    val dirty = "<p>ok ".getBytes(UTF_8) ++ Array(0xC3.toByte, 0x28.toByte) ++
      " end</p>".getBytes(UTF_8)
    java.nio.file.Files.write(dir.resolve("seg-2.warc"),
      record("response", "http://example.com/dirty",
        (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n").getBytes(ISO_8859_1) ++ dirty))
    val warc = Warc.readWarc(spark, dir.toString + "/*")
    assert(warc.count() == 7) // 5 + 1 + 1
    val html = Warc.htmlResponses(warc)
      .withColumn("url", graft.text.TextFunctions.canonicalizeUrl(col("url")))
      .withColumn("text", graft.text.TextFunctions.stripHtml(col("html")))
    val rows = html.select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // only 2xx text/html survives; URL canonicalized; boilerplate off;
    // the dirty body arrives with U+FFFD replacements, not an error
    assert(rows.keySet == Set("http://example.com/a", "http://example.com/b",
      "http://example.com/dirty"), rows.keySet.toString)
    assert(rows("http://example.com/a") == "t hello crawl world")
    assert(rows("http://example.com/b") == "t hello crawl world")
    assert(rows("http://example.com/dirty").startsWith("ok ") &&
      rows("http://example.com/dirty").contains("�") &&
      rows("http://example.com/dirty").endsWith(" end"), rows("http://example.com/dirty"))
    // and straight into corpus dedup: /a and /b are dups of the
    // corpus doc; only the dirty page is new content
    val corpus = Seq("t hello crawl world").toDF("text")
    val kept = graft.ml.Dedup.dedupAgainstExact(
      html.withColumn("text", col("text")), corpus, "text")
      .select("url").collect().map(_.getString(0))
    assert(kept.toSeq == Seq("http://example.com/dirty"), kept.mkString(","))
  }

  // ------------------------------------------------------------- robots

  test("parseRobotsTxt: star groups, comments, empty patterns, group boundaries") {
    val txt =
      """# corpus etiquette
        |User-agent: fancybot
        |Disallow: /private/
        |
        |User-agent: *
        |User-agent: otherbot
        |Disallow: /tmp/   # trailing comment
        |Allow: /tmp/ok
        |Disallow:
        |Crawl-delay: 10
        |
        |User-agent: *
        |Disallow: /drafts*$
        |""".stripMargin
    val rules = Warc.parseRobotsTxt(txt)
    // fancybot's group must contribute nothing; empty Disallow emits
    // nothing; BOTH star groups contribute
    assert(rules == Vector(
      (false, "/tmp/"), (true, "/tmp/ok"), (false, "/drafts*$")))
    // rules end a group: a User-agent line AFTER rules starts fresh
    val regrouped = Warc.parseRobotsTxt(
      "User-agent: *\nDisallow: /a\nUser-agent: bot\nDisallow: /b\n")
    assert(regrouped == Vector((false, "/a")))
  }

  test("repToRegex: literal escaping, * wildcard, trailing $ anchor") {
    assert("/x/y.html".matches(Warc.repToRegex("/x/") + ".*") ||
      "/x/y.html".matches(Warc.repToRegex("/x/"))) // start-anchored prefix
    assert(java.util.regex.Pattern.compile(Warc.repToRegex("/a*.php"))
      .matcher("/a/deep/run.php").find())
    val anchored = Warc.repToRegex("/exact$")
    assert(java.util.regex.Pattern.compile(anchored).matcher("/exact").find())
    assert(!java.util.regex.Pattern.compile(anchored).matcher("/exact/more").find())
    // regex metachars in paths stay literal
    assert(!java.util.regex.Pattern.compile(Warc.repToRegex("/a.b"))
      .matcher("/aXb").find())
  }

  test("robots patterns: octet-length precedence, star collapse, star-budget cap") {
    // precedence length is octets, not UTF-16 chars: "/é" is 3 bytes
    val bytes = "/é".getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(bytes == 3 && "/é".length == 2)
    // collapse is semantics-free and under-budget patterns survive
    assert(Warc.cappedPattern(allow = false, "/a***b") == Some("/a*b"))
    // over-budget Disallow truncates to an open prefix after the
    // cap-th star (blocks MORE — the safe direction)...
    val wild = "/x" + "*a" * (Warc.MaxStarsPerPattern + 3)
    val capped = Warc.cappedPattern(allow = false, wild).get
    assert(capped.count(_ == '*') == Warc.MaxStarsPerPattern, capped)
    assert(capped.endsWith("*") && wild.startsWith(capped), capped)
    // ...while an over-budget Allow drops entirely (allows LESS)
    assert(Warc.cappedPattern(allow = true, wild).isEmpty)
  }

  test("a path-less URL with a query is '/' for rule matching (Disallow: / catches it)") {
    import spark.implicits._
    val rules = Seq(("example.com", false, "/", "^/", 1))
      .toDF("host", "allow", "pattern", "rx", "plen")
    val pages = Seq(
      ("http://example.com?sid=1", "x"), // no path, query only
      ("http://example.com", "x"),       // no path at all
      ("http://other.org?sid=1", "x")).toDF("url", "html")
    val kept = Warc.filterRobotsAllowed(pages, "url", rules)
      .select("url").collect().map(_.getString(0)).toSet
    assert(kept == Set("http://other.org?sid=1"), kept.mkString(","))
  }

  test("e2e: crawl-archived robots.txt + noindex meta gate the page frame") {
    val robots =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/pub
        |Disallow: /tmp$
        |""".stripMargin
    val robotsPayload = {
      val b = robots.getBytes(UTF_8)
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        s"Content-Length: ${b.length}\r\n\r\n").getBytes(ISO_8859_1) ++ b
    }
    val noindexPage =
      "<html><head><META CONTENT=\"noindex, nofollow\" NAME=robots></head><body>secret</body></html>"
    val bytes =
      record("response", "http://Example.com/robots.txt", robotsPayload) ++
        record("response", "http://example.com/open", httpHtml(page)) ++
        record("response", "http://example.com/private/x", httpHtml(page)) ++
        // allow outranks disallow by LENGTH on this path
        record("response", "http://example.com/private/pub/ok", httpHtml(page)) ++
        record("response", "http://example.com/tmp", httpHtml(page)) ++
        // $-anchored rule must NOT catch the longer path
        record("response", "http://example.com/tmpextra", httpHtml(page)) ++
        // different host entirely: no rules -> allowed
        record("response", "http://other.org/private/x", httpHtml(page)) ++
        record("response", "http://example.com/meta", httpHtml(noindexPage))
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-robots")
    java.nio.file.Files.write(dir.resolve("seg.warc"), bytes)
    val warc = Warc.readWarc(spark, dir.toString + "/*")
    val rules = Warc.robotsRules(warc)
    assert(rules.count() == 3)
    val pages = Warc.htmlResponses(warc)
    val allowed = Warc.filterRobotsAllowed(pages, "url", rules)
    // a null-html row (outer-join product) carries no noindex marker
    // and must pass through, not vanish into three-valued logic
    val withNull = allowed.unionByName(
      spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row("http://x.org/nullhtml", null)),
        allowed.schema))
    val clean0 = Warc.dropNoindex(withNull, "html")
      .select("url").collect().map(_.getString(0)).sorted
    assert(clean0.contains("http://x.org/nullhtml"), clean0.mkString(","))
    val clean = Warc.dropNoindex(allowed, "html")
      .select("url").collect().map(_.getString(0)).sorted
    assert(clean.toSeq == Seq(
      "http://example.com/open",
      "http://example.com/private/pub/ok",
      "http://example.com/tmpextra",
      "http://other.org/private/x"), clean.mkString(","))
  }
}
