package graft.sources

import graft.core.{CrysFrame, Inference}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest surface (reference: src/crysda/builder.cr).
  *
  * `readCsv` mirrors the reference's option set
  * (reference: src/crysda.cr:30-37, builder.cr:44-83): any delimiter,
  * quote char, skip lines, comment char, headerless mode (auto
  * `Col1..N`), NA sentinel, bool vocabularies — plus the Int32 → Int64 →
  * Float64 → Bool → String inference ladder over a 20-value peek
  * (reference: src/crysda/utils.cr:275-309). Gzip is handled natively
  * by Spark's text/csv sources.
  *
  * Scale note: the file is read as a distributed text/CSV scan; only the
  * 20-row inference sample is collected driver-side. The final typed
  * projection is one pass, fully codegen'd casts.
  */
object Readers {

  /** URL schemes the reference fetches driver-side
    * (reference: src/crysda/builder.cr:154-169 `read_url`). */
  private val UrlScheme = "^(?i)(https?|ftp)://.*".r

  /** Fetch a URL to a driver-local temp file (multiLine URL reads only
    * — see readCsv). The suffix keeps the extension (so .gz engages)
    * but is sanitized: query strings / glob metacharacters ('?', '[',
    * '{') in a URL would otherwise break Hadoop path resolution. */
  private def fetchToTemp(url: String): String = {
    val name = url.substring(url.lastIndexOf('/') + 1)
      .takeWhile(c => c != '?' && c != '#')
    val raw = if (name.contains('.')) name.substring(name.indexOf('.')) else ".csv"
    val suffix = raw.replaceAll("[^A-Za-z0-9.]", "")
    val tmp = java.nio.file.Files.createTempFile("graft_url_", suffix)
    val in = java.net.URI.create(url).toURL.openStream()
    try java.nio.file.Files.copy(in, tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    tmp.toFile.deleteOnExit()
    tmp.toString
  }

  /** `headerRow` mirrors the reference's INTEGER `header` option
    * (reference: src/crysda.cr:33, builder.cr:56-66): the 0-based
    * position of the header among surviving records — a file whose
    * header sits at line 3 reads with `headerRow = 2`, no manual
    * skip arithmetic. Routed through the existing skip machinery
    * (preamble records before the header are discarded), so it
    * composes with `skip`, blank-line rejection and comment lines
    * exactly like a plain read. Requires `header = true`. */
  def readCsv(spark: SparkSession, path: String,
              separator: String = ",",
              quoteChar: String = "\"",
              skip: Int = 0,
              comment: Character = '#',
              header: Boolean = true,
              naValue: String = "NA",
              trueValues: Set[String] = Inference.defaultTrue,
              falseValues: Set[String] = Inference.defaultFalse,
              multiLine: Boolean = false,
              skipBlankLines: Boolean = true,
              headerRow: Int = 0): CrysFrame = {
    require(headerRow == 0 || header,
      "headerRow positions the header line and needs header=true")
    require(headerRow >= 0, s"headerRow must be >= 0, got $headerRow")
    val effSkip = skip + headerRow
    // the skip/blank-line machinery is LINE-oriented (read-as-text then
    // re-parse): under multiLine a quoted record spanning lines would be
    // torn apart and silently corrupted — refuse the combination UP
    // FRONT, before any URL download happens
    require(!multiLine || (effSkip == 0 && skipBlankLines),
      "multiLine CSV cannot be combined with skip or skipBlankLines=false " +
        "(both preprocess line-by-line, which would tear quoted multi-line records)")
    // http/https/ftp input (reference: builder.cr:154-169): stream the
    // body driver-side and distribute the CONTENT (parallelized
    // dataset), not a driver-local temp path — executors on a real
    // cluster cannot read the driver's /tmp. Gzip auto-detected from
    // the magic bytes, matching the reference's gzip handling.
    // Exception: multiLine (quoted embedded newlines) needs a file
    // source, so that combination fetches to a temp file — local-master
    // only, like any driver-local path.
    path match {
      case UrlScheme(_) if !multiLine =>
        val in = java.net.URI.create(path).toURL.openStream()
        try return readCsvStream(spark, in, separator, quoteChar, effSkip,
          comment, header, naValue, trueValues, falseValues, skipBlankLines)
        finally in.close()
      case _ =>
    }
    val localPath = path match {
      case UrlScheme(_) => fetchToTemp(path)
      case _            => path
    }
    // multiLine=true parses newlines inside quoted fields (the
    // reference parser always does) but makes the scan non-splittable —
    // leave off unless the data needs it
    val reader = csvReader(spark, separator, quoteChar, comment, header,
      naValue, multiLine)
    val raw: DataFrame =
      if (effSkip == 0 && skipBlankLines) reader.csv(localPath)
      else {
        // Spark's CSV source has no skip-N-lines option and ALWAYS drops
        // blank lines: read as text, apply the reference's record
        // pipeline — blank-line rejection FIRST (so `skip` counts
        // surviving records, reference src/crysda/builder.cr:61-62),
        // then the preamble skip — and re-parse the remainder. With
        // skipBlankLines=false a blank line becomes an all-NA row (the
        // line is replaced by the NA sentinel: field 1 parses to the
        // sentinel → null, the missing rest null-fill in PERMISSIVE
        // mode), so blank-line-significant files keep their row count.
        import spark.implicits._
        val raw0 = spark.read.text(localPath).as[String].rdd
        val afterBlanks = if (skipBlankLines) raw0.filter(_.nonEmpty) else raw0
        val afterSkip = afterBlanks.zipWithIndex().filter(_._2 >= effSkip).map(_._1)
        val lines = if (skipBlankLines) afterSkip
          else afterSkip.map(l => if (l.isEmpty) naValue else l)
        reader.csv(spark.createDataset(lines))
      }
    inferAndType(raw, header, trueValues, falseValues)
  }

  /** CSV from an in-memory string — the reference's `read_csv(io : IO)`
    * / `from_csv` surface (reference: builder.cr:44-83, 154-160).
    * Content is parallelized driver-side; meant for literals and tests,
    * not bulk data. */
  def readCsvString(spark: SparkSession, content: String,
                    separator: String = ",",
                    quoteChar: String = "\"",
                    skip: Int = 0,
                    comment: Character = '#',
                    header: Boolean = true,
                    naValue: String = "NA",
                    trueValues: Set[String] = Inference.defaultTrue,
                    falseValues: Set[String] = Inference.defaultFalse,
                    skipBlankLines: Boolean = true,
                    headerRow: Int = 0): CrysFrame = {
    import spark.implicits._
    require(headerRow == 0 || header,
      "headerRow positions the header line and needs header=true")
    require(headerRow >= 0, s"headerRow must be >= 0, got $headerRow")
    // reference record pipeline: blank rejection before `skip`
    // (builder.cr:61-62); see readCsv for the all-NA substitution
    val afterBlanks =
      if (skipBlankLines) content.linesIterator.filter(_.nonEmpty)
      else content.linesIterator
    val lines = afterBlanks.drop(skip + headerRow)
      .map(l => if (!skipBlankLines && l.isEmpty) naValue else l).toSeq
    val reader = csvReader(spark, separator, quoteChar, comment, header,
      naValue, multiLine = false)
    inferAndType(reader.csv(spark.createDataset(lines)), header,
      trueValues, falseValues)
  }

  /** CSV from a stream (the reference's arbitrary-IO input); gzip
    * auto-detected from the 0x1f8b magic, matching the reference's
    * gzip handling (reference: builder.cr:161-169). The stream is
    * drained driver-side. */
  def readCsvStream(spark: SparkSession, in: java.io.InputStream,
                    separator: String = ",",
                    quoteChar: String = "\"",
                    skip: Int = 0,
                    comment: Character = '#',
                    header: Boolean = true,
                    naValue: String = "NA",
                    trueValues: Set[String] = Inference.defaultTrue,
                    falseValues: Set[String] = Inference.defaultFalse,
                    skipBlankLines: Boolean = true,
                    headerRow: Int = 0): CrysFrame =
    readCsvString(spark, drainMaybeGzip(in), separator, quoteChar, skip,
      comment, header, naValue, trueValues, falseValues, skipBlankLines,
      headerRow)

  /** Drain a stream to UTF-8 text, transparently gunzipping when the
    * 0x1f8b magic is present — the shared IO step behind every
    * stream/URL entry point. */
  private def drainMaybeGzip(in: java.io.InputStream): String = {
    val buf = new java.io.BufferedInputStream(in)
    buf.mark(2)
    val m1 = buf.read(); val m2 = buf.read()
    buf.reset()
    val data: java.io.InputStream =
      if (m1 == 0x1f && m2 == 0x8b) new java.util.zip.GZIPInputStream(buf) else buf
    new String(data.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
  }

  private def csvReader(spark: SparkSession, separator: String,
                        quoteChar: String, comment: Character,
                        header: Boolean, naValue: String,
                        multiLine: Boolean) = {
    var reader = spark.read
      .option("multiLine", multiLine)
      .option("sep", separator)
      .option("quote", quoteChar)
      .option("header", header)
      .option("nullValue", naValue)
      .option("inferSchema", false)
      .option("mode", "PERMISSIVE")
    if (comment != null) reader = reader.option("comment", comment.toString)
    reader
  }

  /** The inference + typed-projection pipeline shared by all CSV entry
    * points (see class doc). */
  private def inferAndType(raw0: DataFrame, header: Boolean,
                           trueValues: Set[String],
                           falseValues: Set[String]): CrysFrame = {
    var raw = raw0
    if (!header) raw = raw.toDF(raw.columns.indices.map(i => s"Col${i + 1}"): _*)

    // 20-value peek per column (reference: utils.cr:276) gives the
    // candidate; then ONE aggregate pass verifies every candidate over
    // the full column and falls down the ladder on any parse failure —
    // the reference's conversion-failure fallback (utils.cr:275-309),
    // e.g. "Unrated" past row 20 downgrades a numeric column to String.
    val sample = raw.take(20)
    val candidates = raw.columns.map { c =>
      c -> Inference.inferFromStrings(
        sample.map(_.getAs[String](c)).toSeq, trueValues, falseValues)
    }.toMap
    val toVerify = raw.columns.filter(c => candidates(c) != StringType)
    val verified: Map[String, DataType] =
      if (toVerify.isEmpty) candidates
      else {
        // bool vocab matching is case-insensitive via upcasing BOTH
        // sides — the reference's as_bool? contract (utils.cr:356-364)
        val boolVocabUp = (trueValues ++ falseValues).toSeq
          .map(graft.core.Inference.up).distinct
        val counters = toVerify.flatMap { c =>
          val qc = graft.core.qcol(c)
          Seq(
            count(when(qc.isNotNull && qc.try_cast("int").isNull, 1)).as(s"__bi_$c"),
            count(when(qc.isNotNull && qc.try_cast("long").isNull, 1)).as(s"__bl_$c"),
            count(when(qc.isNotNull &&
              regexp_replace(qc, ",", "").try_cast("double").isNull, 1)).as(s"__bd_$c"),
            count(when(qc.isNotNull &&
              !upper(qc).isin(boolVocabUp.map(x => x: Any): _*), 1)).as(s"__bb_$c"))
        }
        val row = raw.agg(counters.head, counters.tail.toIndexedSeq: _*).collect()(0)
        // fallback ladders mirror the reference EXACTLY: a numeric
        // candidate falls Int32 → Int64 → Float64 → String
        // (get_i64col || get_f64col || StringCol, utils.cr:282-289 —
        // never through Bool: an all-NA peek is an Int32 candidate,
        // and if the full column then turns out to be all "TRUE"/"F"
        // the reference strings it); a Bool candidate that fails the
        // full column degrades to String (documented divergence: the
        // reference RAISES there — BoolCol.new has no rescue,
        // utils.cr:290 — and a read that dies on row 21 is strictly
        // less useful than the reference's own ladder philosophy)
        candidates.map { case (c, cand) =>
          def bad(dt: DataType): Long = dt match {
            case IntegerType => row.getAs[Long](s"__bi_$c")
            case LongType    => row.getAs[Long](s"__bl_$c")
            case DoubleType  => row.getAs[Long](s"__bd_$c")
            case BooleanType => row.getAs[Long](s"__bb_$c")
            case _           => 0L
          }
          cand match {
            case StringType => c -> cand
            case BooleanType =>
              c -> (if (bad(BooleanType) == 0L) BooleanType else StringType)
            case _ =>
              val numeric = Seq[DataType](IntegerType, LongType, DoubleType, StringType)
              c -> numeric.drop(numeric.indexOf(cand))
                .find(dt => dt == StringType || bad(dt) == 0L).get
          }
        }
      }
    val typed = raw.columns.map { c =>
      val dt = verified(c)
      val qc = graft.core.qcol(c)
      dt match {
        case BooleanType =>
          when(upper(qc).isin(
            trueValues.toSeq.map(graft.core.Inference.up).distinct.map(x => x: Any): _*), lit(true))
            .when(upper(qc).isin(
              falseValues.toSeq.map(graft.core.Inference.up).distinct.map(x => x: Any): _*), lit(false))
            .otherwise(lit(null).cast(BooleanType)).as(c)
        case DoubleType => regexp_replace(qc, ",", "").cast(DoubleType).as(c)
        case StringType => qc.as(c)
        case other      => qc.cast(other).as(c)
      }
    }
    CrysFrame(raw.select(typed.toSeq: _*))
  }

  /** JSON array-of-objects → frame, recursively flattening nested
    * objects and exploding arrays-of-objects, ragged keys null-filled
    * (reference: src/crysda/builder.cr:101-152, 171-191). Spark's JSON
    * source already schema-unions + null-fills; we add the recursive
    * flatten (struct → `parent.*`, array<struct> → explode).
    * http/https/ftp URLs stream the body driver-side (gzip
    * auto-detected) and distribute the content, like `readCsv`
    * (reference URL read: spec/reader_spec.cr:99-116). */
  def readJson(spark: SparkSession, path: String,
               multiLine: Boolean = true): CrysFrame = path match {
    case UrlScheme(_) =>
      val in = java.net.URI.create(path).toURL.openStream()
      val content = try drainMaybeGzip(in) finally in.close()
      if (multiLine) fromJsonString(spark, content) // one document / array
      else {
        // NDJSON: one record per line, same as the file source's
        // multiLine=false mode
        import spark.implicits._
        CrysFrame(flattenAll(spark.read.json(
          spark.createDataset(content.linesIterator.toSeq))))
      }
    case _ =>
      CrysFrame(flattenAll(spark.read.option("multiLine", multiLine).json(path)))
  }

  def fromJsonString(spark: SparkSession, json: String): CrysFrame = {
    import spark.implicits._
    CrysFrame(flattenAll(spark.read.json(Seq(json).toDS())))
  }

  /** Columnar at-scale sources (scale extension — the reference reads
    * only text formats): schema from the file footers, predicate/
    * column pushdown and partition pruning for free via the native
    * sources. Pair with `CrysFrame.writeParquet/writeOrc(partitionBy)`
    * for layouts that prune at file-listing time. */
  def readParquet(spark: SparkSession, path: String): CrysFrame =
    CrysFrame(spark.read.parquet(path))

  def readOrc(spark: SparkSession, path: String): CrysFrame =
    CrysFrame(spark.read.orc(path))

  def flattenAll(df0: DataFrame): DataFrame = {
    // every name reference below is backtick-quoted (qcol): a prior
    // pass can mint literal dotted names for collisions ("s.a"), and a
    // bare col("s.a") would re-parse the dot as a struct path — the
    // next pass (e.g. after an array-of-struct explode surfaces a new
    // struct) then failed to resolve its own output (caught by the
    // json.flatten property)
    var df = df0
    var changed = true
    while (changed) {
      changed = false
      df.schema.fields.find(f => f.dataType.isInstanceOf[StructType]) match {
        case Some(f) =>
          val st = f.dataType.asInstanceOf[StructType]
          val taken = df.columns.toSet - f.name
          val expanded = st.fields.map { sf =>
            val outName = if (taken.contains(sf.name)) s"${f.name}.${sf.name}" else sf.name
            graft.core.qcol(f.name).getField(sf.name).as(outName)
          }
          val others = df.columns.filterNot(_ == f.name).map(graft.core.qcol)
          df = df.select((others ++ expanded).toSeq: _*)
          changed = true
        case None =>
          df.schema.fields.find(f => f.dataType match {
            case ArrayType(_: StructType, _) => true
            case _ => false
          }) match {
            case Some(f) =>
              df = df.withColumn(f.name, explode_outer(graft.core.qcol(f.name)))
              changed = true
            case None =>
          }
      }
    }
    df
  }

  /** JDBC resultset ingest (reference: src/crysda.cr:50-52 `from(DB::ResultSet)`).
    * Spark-native: partitionable parallel reads when bounds are given. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties = new java.util.Properties()): CrysFrame =
    CrysFrame(spark.read.jdbc(url, table, props))
}
