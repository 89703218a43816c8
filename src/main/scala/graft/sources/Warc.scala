package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 — the Common Crawl container) ingest:
  * the file format a crawl pipeline actually starts from, feeding the
  * text hygiene chain (`stripHtml` → `canonicalizeUrl` →
  * `dedupAgainst*` → quality/mixture).
  *
  * Format, restated from the public spec: a WARC file is a sequence of
  * records, each `WARC/1.x\r\n`, header lines (`Name: value`) up to a
  * blank line, exactly `Content-Length` payload bytes, then
  * `\r\n\r\n`. Crawl WARCs are usually gzipped with ONE GZIP MEMBER
  * PER RECORD concatenated back to back — `GZIPInputStream` consumes
  * multi-member streams natively, so one inflate pass covers both the
  * per-record and whole-file compression layouts, and plain WARC is
  * sniffed by magic bytes.
  *
  * Scale shape: one task per file (crawl WARCs are sized ~1 GB for
  * exactly this kind of unit-of-work processing; gzip is not
  * splittable anyway), each STREAMING its segment through an
  * incremental per-task JVM record walk (the correct tool — byte
  * protocol parsing has no Catalyst equivalent) so peak task memory
  * is one record, not the segment; everything after the parse is
  * ordinary columnar text. Hostile or truncated bytes end the walk
  * at the last well-formed record instead of throwing — a corrupt
  * crawl segment can never kill a task.
  */
object Warc {

  /** One parsed record: WARC envelope fields plus, for HTTP responses,
    * the parsed status / content type and the body AFTER the HTTP
    * headers (for non-HTTP records the raw payload). */
  final case class WarcRecord(warcType: String, targetUri: String,
                              date: String, contentType: String,
                              httpStatus: Int, httpContentType: String,
                              body: Array[Byte])

  private val MaxRecords = 1000000 // runaway-input backstop per file

  /** Inflation ceiling: JVM arrays cap at ~2 GB, and a gzip BOMB (or
    * an over-sized segment) must truncate to its prefix, not throw an
    * uncatchable allocation error mid-task. 1.5 GB leaves headroom
    * for the output array copy. */
  private val MaxInflatedBytes = 1500000000

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B

  private def inflate(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(b.length * 4, 1 << 16), 1 << 26))
    val buf = new Array[Byte](1 << 16)
    try {
      var n = in.read(buf)
      while (n > 0 && out.size() < MaxInflatedBytes) {
        out.write(buf, 0, n); n = in.read(buf)
      }
    } catch { case _: java.io.IOException => () } // truncated tail: keep prefix
    out.toByteArray
  }

  /** ASCII line starting at `from`, up to CRLF (or LF); returns
    * (line, indexAfterTerminator) or null at end of input. */
  private def readLine(b: Array[Byte], from: Int): (String, Int) = {
    if (from >= b.length) return null
    var i = from
    while (i < b.length && b(i) != '\n') i += 1
    if (i >= b.length) return null
    val end = if (i > from && b(i - 1) == '\r') i - 1 else i
    (new String(b, from, end - from, java.nio.charset.StandardCharsets.ISO_8859_1), i + 1)
  }

  /** ASCII line from a stream up to LF (CR stripped); null at EOF
    * before a terminator (dropping a trailing partial line, matching
    * the in-memory walk) or on a hostile unterminated >64 KB line. */
  private def readLineStream(in: java.io.InputStream): String = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n' && sb.length() <= 65536) {
      sb.append(c.toChar); c = in.read()
    }
    if (c != '\n') return null
    val len = sb.length()
    if (len > 0 && sb.charAt(len - 1) == '\r') sb.setLength(len - 1)
    sb.toString
  }

  /** INCREMENTAL record walk over an (already decompressed) WARC
    * stream: headers line by line, then exactly Content-Length
    * payload bytes — peak allocation is one RECORD, never the
    * segment, so a segment's size is unbounded (the old whole-byte[]
    * walk capped at the 2 GB JVM array limit). Malformed input or a
    * record over [[MaxInflatedBytes]] ends the iterator at the last
    * well-formed record, never throws — a corrupt crawl segment
    * cannot kill a task. */
  private[graft] def parseRecordsStream(in: java.io.InputStream)
      : Iterator[WarcRecord] = new scala.collection.AbstractIterator[WarcRecord] {
    private var n = 0
    private var done = false
    private var pending: WarcRecord = null
    private var advanced = false

    private def advance(): Unit = {
      pending = null
      if (n >= MaxRecords) { done = true; return }
      // skip inter-record blank lines
      var line = readLineStream(in)
      while (line != null && line.isEmpty) line = readLineStream(in)
      if (line == null || !line.startsWith("WARC/")) { done = true; return }
      var headers = Map.empty[String, String]
      var h = readLineStream(in)
      while (h != null && h.nonEmpty) {
        val idx = h.indexOf(':')
        if (idx > 0) headers += (h.substring(0, idx).trim.toLowerCase ->
          h.substring(idx + 1).trim)
        h = readLineStream(in)
      }
      if (h == null) { done = true; return }
      headers.get("content-length").flatMap(_.toLongOption) match {
        case Some(l) if l >= 0 && l <= MaxInflatedBytes =>
          val payload = new Array[Byte](l.toInt)
          if (FileStreams.readFully(in, payload, l.toInt) < l.toInt) {
            done = true // truncated payload: keep the records before it
          } else {
            val wtype = headers.getOrElse("warc-type", "")
            val (status, httpCt, body) =
              if (wtype == "response" || wtype == "revisit") parseHttp(payload)
              else (0, "", payload)
            pending = WarcRecord(wtype,
              headers.getOrElse("warc-target-uri", ""),
              headers.getOrElse("warc-date", ""),
              headers.getOrElse("content-type", ""),
              status, httpCt, body)
            n += 1
          }
        case _ => done = true // missing/bad/oversized length
      }
    }

    override def hasNext: Boolean = {
      if (!advanced && !done) { advance(); advanced = true }
      pending != null
    }
    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException("parseRecordsStream")
      advanced = false
      val r = pending
      pending = null
      r
    }
  }

  /** Gzip-sniff a stream: a `1F 8B` magic becomes a multi-member
    * GZIPInputStream (per-record members and whole-file gzip both
    * decode in one pass) wrapped in [[FileStreams.PrefixStream]], so
    * a truncated or corrupt compressed TAIL yields the records before
    * it (clean-prefix posture — the same contract the whole-buffer
    * inflate gave). Plain streams pass through unwrapped: a genuine
    * storage error on uncompressed bytes still fails the task. A
    * corrupt gzip HEADER right after the magic yields zero records. */
  private[graft] def maybeGunzip(in0: java.io.InputStream): java.io.InputStream = {
    val pb = new java.io.PushbackInputStream(in0, 2)
    val b0 = pb.read()
    val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    if (b0 == 0x1F && b1 == 0x8B)
      try new FileStreams.PrefixStream(
        new java.util.zip.GZIPInputStream(pb, 1 << 16))
      catch { case _: java.io.IOException =>
        new java.io.ByteArrayInputStream(Array.emptyByteArray) }
    else pb
  }

  /** Split an HTTP response payload into (status, content-type, body).
    * A payload that does not start with `HTTP/` passes through raw.
    * The transfer layers a crawler records as-transmitted are undone
    * here: `Transfer-Encoding: chunked` framing is stripped (hex
    * chunk-size lines would otherwise interleave the html) and a
    * `Content-Encoding: gzip|deflate` body is inflated — without
    * these, the "body" column carries wire framing, not the document.
    * Both undo steps fall back to the raw bytes on malformed input. */
  private def parseHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val first = readLine(payload, 0)
    if (first == null || !first._1.startsWith("HTTP/")) return (0, "", payload)
    // split on any whitespace run: dirty status lines double up spaces
    val status = first._1.trim.split("\\s+") match {
      case parts if parts.length >= 2 => parts(1).toIntOption.getOrElse(0)
      case _ => 0
    }
    var pos = first._2
    var ct = ""
    var te = ""
    var ce = ""
    var h = readLine(payload, pos)
    while (h != null && h._1.nonEmpty) {
      val idx = h._1.indexOf(':')
      if (idx > 0) {
        val name = h._1.substring(0, idx).trim
        val value = h._1.substring(idx + 1).trim
        if (name.equalsIgnoreCase("content-type")) ct = value
        else if (name.equalsIgnoreCase("transfer-encoding")) te = value.toLowerCase
        else if (name.equalsIgnoreCase("content-encoding")) ce = value.toLowerCase
      }
      pos = h._2
      h = readLine(payload, pos)
    }
    val bodyStart = if (h == null) payload.length else h._2
    var body = java.util.Arrays.copyOfRange(payload, bodyStart, payload.length)
    if (te.contains("chunked")) body = dechunk(body)
    if (ce.contains("gzip") && isGzip(body)) body = inflate(body)
    else if (ce.contains("deflate")) body = inflateZlib(body)
    (status, ct, body)
  }

  /** Undo HTTP/1.1 chunked framing: hex-size line, that many bytes,
    * CRLF, repeat until a 0-size chunk (trailers dropped). Malformed
    * framing returns the bytes decoded so far, falling back to the
    * raw payload when nothing decoded. */
  private def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var pos = 0
    var ok = true
    var done = false
    while (ok && !done) {
      val line = readLine(b, pos)
      if (line == null) ok = false
      else {
        // chunk extensions (";...") are legal; size is the hex prefix
        val sizeStr = line._1.split(';')(0).trim
        val size = try java.lang.Long.parseLong(sizeStr, 16).toInt
          catch { case _: Exception => -1 }
        if (size < 0 || line._2 + size > b.length) ok = false
        else if (size == 0) done = true
        else {
          out.write(b, line._2, size)
          pos = line._2 + size
          // skip the CRLF after the chunk data
          if (pos + 1 < b.length && b(pos) == '\r' && b(pos + 1) == '\n') pos += 2
          else if (pos < b.length && b(pos) == '\n') pos += 1
        }
      }
    }
    if (out.size() == 0 && !done) b else out.toByteArray
  }

  /** Inflate a zlib-wrapped (or, per the widespread server bug, raw)
    * deflate body; malformed input returns the original bytes. */
  private def inflateZlib(b: Array[Byte]): Array[Byte] = {
    def run(raw: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(raw)
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream(math.min(b.length * 4, 1 << 26))
      val buf = new Array[Byte](1 << 16)
      try {
        var n = inf.inflate(buf)
        while (n > 0 && out.size() < MaxInflatedBytes) {
          out.write(buf, 0, n); n = inf.inflate(buf)
        }
        out.toByteArray
      } catch { case _: java.util.zip.DataFormatException => null }
      finally inf.end()
    }
    val zlib = run(raw = false)
    if (zlib != null && zlib.nonEmpty) zlib
    else {
      val raw = run(raw = true)
      if (raw != null && raw.nonEmpty) raw else b
    }
  }

  /** Full parse of one (possibly gzipped) WARC file's bytes — eager
    * wrapper over [[parseRecordsStream]] (one walk code path). */
  def parseWarc(bytes: Array[Byte]): Vector[WarcRecord] = {
    val in = maybeGunzip(new java.io.ByteArrayInputStream(bytes))
    try parseRecordsStream(in).toVector
    finally in.close() // releases the gzip inflater's native buffers
  }

  // ------------------------------------------------- fixture builders

  /** Deterministic WARC record bytes for fixtures (ISO 28500 framing)
    * — the q_warc_ingest driver query writes its synthetic crawl
    * segments with these. (WarcSpec keeps its OWN generators so the
    * parser is still tested against independently hand-built bytes.) */
  private[graft] def fixtureRecord(wtype: String, uri: String, payload: Array[Byte],
                                   date: String = "2024-01-01T00:00:00Z"): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val h = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $wtype\r\n")
      .append(if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "")
      .append(s"WARC-Date: $date\r\n")
      .append("Content-Type: application/http;msgtype=response\r\n")
      .append(s"Content-Length: ${payload.length}\r\n")
      .append("\r\n").toString.getBytes(iso)
    h ++ payload ++ "\r\n\r\n".getBytes(iso)
  }

  /** HTTP response payload for [[fixtureRecord]]: status line +
    * Content-Type/-Length headers + body. */
  private[graft] def fixtureHttp(body: Array[Byte], status: Int = 200,
                                 ct: String = "text/html; charset=utf-8"): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    (s"HTTP/1.1 $status OK\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(iso) ++ body
  }

  /** Distributed WARC ingest: one row per record with the envelope
    * fields, HTTP status/type, and the payload body as binary. One
    * task per matched file ([[FileStreams.perFile]]), each walking
    * its segment INCREMENTALLY through [[parseRecordsStream]] — peak
    * task memory is one record, not the segment, so segments are no
    * longer capped by binaryFile's 2 GB whole-file byte[]. */
  def readWarc(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    // gunzip as the scaffold's decorator (not wrapped inside f): the
    // scaffold closes the OUTERMOST stream, so the inflater's native
    // buffers release at exhaustion instead of waiting on finalization
    val rdd = FileStreams.perFile(spark, pathGlob, "readWarc",
      decorate = (_, in) => maybeGunzip(in)) { (path, in) =>
      parseRecordsStream(in).map(r => (path, r.warcType,
        r.targetUri, r.date, r.contentType, r.httpStatus,
        r.httpContentType, r.body))
    }
    spark.createDataset(rdd)
      .toDF("path", "warc_type", "target_uri", "warc_date",
        "warc_content_type", "http_status", "http_content_type", "body")
  }

  /** The crawl-pipeline entry view: successful HTML responses as
    * (url, html) text rows — feed `TextFunctions.stripHtml` /
    * `canonicalizeUrl` / `Dedup.dedupAgainstHashes` directly. The
    * media-type match is case-insensitive (HTTP media types are; real
    * servers emit `Text/HTML`). Bodies decode using the DECLARED
    * `charset=` parameter when present and recognizable (a large
    * crawl fraction is windows-125x/Shift_JIS/GBK — decoding those as
    * UTF-8 would be systematic mojibake, garbling dedup and quality
    * downstream), falling back to UTF-8; decoding goes through the
    * JVM `String` constructor WITH REPLACEMENT, not SQL `decode` —
    * under ANSI (Spark 4 default) `decode` RAISES on malformed input,
    * and crawl bytes are dirty by nature. A corrupt body can never
    * kill a task; the quality gate judges what replacement leaves. */
  def htmlResponses(warc: DataFrame): DataFrame = {
    val spark = warc.sparkSession
    import spark.implicits._
    warc.filter(col("warc_type") === "response" &&
        col("http_status") >= 200 && col("http_status") < 300 &&
        lower(col("http_content_type")).startsWith("text/html"))
      .select(col("target_uri"), col("http_content_type"), col("body"))
      .as[(String, String, Array[Byte])]
      .map { case (url, ct, body) =>
        val declared = "(?i)charset=\"?([A-Za-z0-9_.:\\-]+)".r
          .findFirstMatchIn(ct).map(_.group(1))
          .flatMap(n => scala.util.Try(java.nio.charset.Charset.forName(n)).toOption)
        val cs = declared.getOrElse(java.nio.charset.StandardCharsets.UTF_8)
        (url, new String(body, cs))
      }
      .toDF("url", "html")
  }

  // ------------------------------------------------------------- robots

  /** Robots-exclusion rules (RFC 9309) recovered from the crawl
    * ITSELF: a WARC segment that archived a host's pages archived its
    * `/robots.txt` too, so exclusion filtering needs no live fetch.
    * Returns one row per `User-agent: *` Allow/Disallow rule:
    * (host, allow, pattern, rx, plen) — `rx` is the RFC match
    * pattern compiled to an anchored regex (`*` → `.*`, trailing `$`
    * → end anchor, everything else literal), `plen` the pattern
    * octet length that drives longest-match precedence. Duplicate
    * fetches of one robots.txt dedup; parse errors and non-2xx
    * robots responses contribute no rules (crawl-archive reality:
    * absent robots means allowed). */
  def robotsRules(warc: DataFrame): DataFrame = {
    val spark = warc.sparkSession
    import spark.implicits._
    warc.filter(col("warc_type") === "response" &&
        col("http_status") >= 200 && col("http_status") < 300 &&
        col("target_uri").rlike("(?i)^[a-z][a-z0-9+.-]*://[^/?#]+/robots\\.txt$"))
      .select(col("target_uri"), col("body")).as[(String, Array[Byte])]
      .flatMap { case (uri, body) =>
        val host = hostOf(uri)
        if (host.isEmpty || body == null) Iterator.empty
        else parseRobotsTxt(new String(body,
            java.nio.charset.StandardCharsets.UTF_8)) // replacement decode
          .iterator.flatMap { case (allow, pattern) =>
            // precedence length is OCTETS (RFC 9309 §2.2.2), not UTF-16
            // code units — a non-ASCII pattern tie-breaks by bytes
            val plen = pattern.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
            cappedPattern(allow, pattern).map(p =>
              (host, allow, pattern, repToRegex(p), plen))
          }
      }
      .toDF("host", "allow", "pattern", "rx", "plen")
      .distinct()
  }

  /** Robots patterns are CRAWL-CONTROLLED content compiled into a
    * regex evaluated per page — a pattern with many `*` wildcards
    * makes the backtracking match pathologically slow. Bound the
    * cost: collapse `*` runs (semantics-free), then cap the star
    * count at [[MaxStarsPerPattern]]. Both cap fallbacks err toward
    * EXCLUDING content (the safe direction for robots etiquette): an
    * over-budget Disallow truncates to an open prefix right after
    * the cap-th star (matches a superset → blocks more), an
    * over-budget Allow drops entirely (allows less). */
  private[graft] val MaxStarsPerPattern = 10
  private[graft] def cappedPattern(allow: Boolean, pattern: String): Option[String] = {
    val collapsed = pattern.replaceAll("\\*+", "*")
    if (collapsed.count(_ == '*') <= MaxStarsPerPattern) Some(collapsed)
    else if (allow) None
    else {
      var stars = 0; var i = 0
      while (stars < MaxStarsPerPattern) {
        if (collapsed.charAt(i) == '*') stars += 1
        i += 1
      }
      Some(collapsed.substring(0, i))
    }
  }

  /** Lowercased authority (host[:port]) of a URL, "" when unparseable. */
  private[graft] def hostOf(url: String): String = {
    val m = "(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)".r.findFirstMatchIn(url)
    m.map(_.group(1).toLowerCase(java.util.Locale.ROOT)).getOrElse("")
  }

  /** `User-agent: *` groups of a robots.txt body → (allow, pattern)
    * rules. Group semantics per RFC 9309: consecutive User-agent
    * lines open a group; rules attach to every named agent;
    * encountering User-agent after rules starts a NEW group. Empty
    * patterns carry no restriction and emit nothing. Comments (`#`)
    * strip; unknown directives are ignored (Crawl-delay, Sitemap). */
  private[graft] def parseRobotsTxt(text: String): Vector[(Boolean, String)] = {
    val out = Vector.newBuilder[(Boolean, String)]
    var uas = Set.empty[String]
    var sawRule = false
    text.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colonAt = line.indexOf(':')
      if (colonAt > 0) {
        val key = line.substring(0, colonAt).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colonAt + 1).trim
        key match {
          case "user-agent" =>
            if (sawRule) { uas = Set.empty; sawRule = false }
            uas += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            sawRule = true
            if (uas.contains("*") && value.nonEmpty)
              out += ((key == "allow", value))
          case _ => () // Sitemap, Crawl-delay, extensions: ignored
        }
      }
    }
    out.result()
  }

  /** RFC 9309 match pattern → anchored Java/RE2 regex: `*` matches
    * any run, a TRAILING `$` anchors the end, all else is literal
    * (prefix semantics — the regex is start-anchored and unanchored
    * at the end unless `$`). */
  private[graft] def repToRegex(p: String): String = {
    val endAnchor = p.endsWith("$")
    val core = if (endAnchor) p.dropRight(1) else p
    val sb = new StringBuilder("^")
    core.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[]{}()<>+-=!?^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (endAnchor) sb.append('$')
    sb.toString
  }

  /** Filter `pages` (any frame with a URL column) down to rows the
    * crawl's own robots rules ALLOW, RFC 9309 precedence: among the
    * host's rules matching the URL path, the LONGEST pattern wins,
    * allow winning length ties; no matching rule (or no rules for
    * the host at all) means allowed. Plan: rules broadcast (a
    * crawl's robots corpus is ≪ its page corpus), per-(page, rule)
    * regex test on the joined candidates only, one URL-keyed
    * aggregation for the longest-match verdict, then a broadcast
    * semi/anti join back — the page frame itself never shuffles. */
  def filterRobotsAllowed(pages: DataFrame, urlCol: String,
                          rules: DataFrame): DataFrame = {
    val hostEx = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
    val pathEx = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)"
    val urls = pages.select(col(urlCol).as("__url")).distinct()
      .withColumn("host", lower(regexp_extract(col("__url"), hostEx, 1)))
      // RFC 9309: an empty path is "/" — which must also hold for a
      // URL whose capture STARTS with the query ("http://h?x=1" →
      // "/?x=1"), or "Disallow: /" would never match it
      .withColumn("__raw", regexp_extract(col("__url"), pathEx, 1))
      .withColumn("__path",
        when(col("__raw").startsWith("/"), col("__raw"))
          .otherwise(concat(lit("/"), col("__raw"))))
      .drop("__raw")
    val verdicts = urls
      .join(broadcast(rules), Seq("host"))
      .filter(expr("__path rlike rx"))
      .groupBy(col("__url"))
      // longest pattern wins; allow beats disallow on equal length
      // (struct max orders by plen, then allow: false < true)
      .agg(max(struct(col("plen"), col("allow"))).as("__best"))
      .filter(!col("__best").getField("allow"))
      .select(col("__url"))
    pages.join(broadcast(verdicts),
      pages(urlCol) === verdicts("__url"), "left_anti")
  }

  /** Drop pages whose OWN markup opts out of indexing/ML use: a
    * `<meta name="robots">` (or the common `content`-first attribute
    * order) carrying `noindex`. Case-insensitive, lookaround-free
    * regex (RE2-portable like the scrub/strip chains) — map-only. */
  def dropNoindex(pages: DataFrame, htmlCol: String): DataFrame = {
    val nameFirst =
      "(?is)<meta[^>]*name\\s*=\\s*[\"']?robots[\"']?[^>]*content\\s*=\\s*[\"'][^\"']*noindex"
    val contentFirst =
      "(?is)<meta[^>]*content\\s*=\\s*[\"'][^\"']*noindex[^\"']*[\"'][^>]*name\\s*=\\s*[\"']?robots"
    // a NULL html column carries no noindex marker: it must pass
    // through (three-valued rlike would silently drop it)
    pages.filter(col(htmlCol).isNull ||
      (!col(htmlCol).rlike(nameFirst) && !col(htmlCol).rlike(contentFirst)))
  }
}
