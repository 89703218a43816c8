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
  * Scale shape: files load whole via Spark's `binaryFile` source (one
  * task per file — crawl WARCs are sized ~1 GB for exactly this kind
  * of unit-of-work processing; gzip is not splittable anyway), the
  * record walk is a per-partition JVM loop (the correct tool — byte
  * protocol parsing has no Catalyst equivalent), and everything after
  * the parse is ordinary columnar text. Hostile or truncated bytes
  * end the walk at the last well-formed record instead of throwing —
  * a corrupt crawl segment can never kill a task.
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

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B

  private def inflate(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream(math.max(b.length * 4, 1 << 16))
    val buf = new Array[Byte](1 << 16)
    try {
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
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

  /** Parse one uncompressed WARC stream into records. Malformed input
    * truncates the iterator, never throws. */
  private[sources] def parseRecords(bytes: Array[Byte]): Vector[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    var n = 0
    var ok = true
    while (ok && n < MaxRecords && pos < bytes.length) {
      // skip inter-record blank lines
      var line = readLine(bytes, pos)
      while (line != null && line._1.isEmpty) { pos = line._2; line = readLine(bytes, pos) }
      if (line == null || !line._1.startsWith("WARC/")) ok = false
      else {
        pos = line._2
        // envelope headers
        var headers = Map.empty[String, String]
        var h = readLine(bytes, pos)
        while (h != null && h._1.nonEmpty) {
          val idx = h._1.indexOf(':')
          if (idx > 0) headers += (h._1.substring(0, idx).trim.toLowerCase ->
            h._1.substring(idx + 1).trim)
          pos = h._2
          h = readLine(bytes, pos)
        }
        if (h == null) ok = false
        else {
          pos = h._2 // past the blank line
          val len = headers.get("content-length").flatMap(_.toLongOption)
          len match {
            case Some(l) if l >= 0 && pos + l <= bytes.length =>
              val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + l.toInt)
              pos += l.toInt
              val wtype = headers.getOrElse("warc-type", "")
              val (status, httpCt, body) =
                if (wtype == "response" || wtype == "revisit") parseHttp(payload)
                else (0, "", payload)
              out += WarcRecord(wtype,
                headers.getOrElse("warc-target-uri", ""),
                headers.getOrElse("warc-date", ""),
                headers.getOrElse("content-type", ""),
                status, httpCt, body)
              n += 1
            case _ => ok = false // missing/bad length or truncated payload
          }
        }
      }
    }
    out.result()
  }

  /** Split an HTTP response payload into (status, content-type, body).
    * A payload that does not start with `HTTP/` passes through raw. */
  private def parseHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val first = readLine(payload, 0)
    if (first == null || !first._1.startsWith("HTTP/")) return (0, "", payload)
    val status = first._1.split(' ') match {
      case parts if parts.length >= 2 => parts(1).toIntOption.getOrElse(0)
      case _ => 0
    }
    var pos = first._2
    var ct = ""
    var h = readLine(payload, pos)
    while (h != null && h._1.nonEmpty) {
      val idx = h._1.indexOf(':')
      if (idx > 0 && h._1.substring(0, idx).trim.equalsIgnoreCase("content-type"))
        ct = h._1.substring(idx + 1).trim
      pos = h._2
      h = readLine(payload, pos)
    }
    val bodyStart = if (h == null) payload.length else h._2
    (status, ct, java.util.Arrays.copyOfRange(payload, bodyStart, payload.length))
  }

  /** Full parse of one (possibly gzipped) WARC file's bytes. */
  def parseWarc(bytes: Array[Byte]): Vector[WarcRecord] =
    parseRecords(if (isGzip(bytes)) inflate(bytes) else bytes)

  /** Distributed WARC ingest: one row per record with the envelope
    * fields, HTTP status/type, and the payload body as binary.
    * `pathGlob` rides `binaryFile`'s glob pushdown (distributed file
    * listing, one task per file). */
  def readWarc(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        parseWarc(bytes).iterator.map(r => (path, r.warcType, r.targetUri,
          r.date, r.contentType, r.httpStatus, r.httpContentType, r.body))
      })
      .toDF("path", "warc_type", "target_uri", "warc_date",
        "warc_content_type", "http_status", "http_content_type", "body")
  }

  /** The crawl-pipeline entry view: successful HTML responses as
    * (url, html) text rows — feed `TextFunctions.stripHtml` /
    * `canonicalizeUrl` / `Dedup.dedupAgainstHashes` directly. Bodies
    * decode as UTF-8 WITH REPLACEMENT via the JVM `String`
    * constructor, not SQL `decode` — under ANSI (Spark 4 default)
    * `decode` RAISES on malformed input, and crawl charsets are dirty
    * by nature; replacement keeps the row and lets the quality gate
    * judge it, and a corrupt body can never kill a task. */
  def htmlResponses(warc: DataFrame): DataFrame = {
    val spark = warc.sparkSession
    import spark.implicits._
    warc.filter(col("warc_type") === "response" &&
        col("http_status") >= 200 && col("http_status") < 300 &&
        col("http_content_type").startsWith("text/html"))
      .select(col("target_uri"), col("body"))
      .as[(String, Array[Byte])]
      .map { case (url, body) =>
        (url, new String(body, java.nio.charset.StandardCharsets.UTF_8))
      }
      .toDF("url", "html")
  }
}
