package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sharded dataset export — the training-dataloader handoff: a FIXED
  * shard count with a deterministic, content-stable row→shard map, so
  * every re-export lands each row in the same shard and downstream
  * loaders can address shards positionally. (Extension beyond the
  * reference surface.)
  *
  * The assignment reuses the pipeline's SQL-expressible Knuth hash
  * ([[graft.ml.Sampling.knuthHash]] — `((id · 2654435761 + seed) mod
  * 2^31−1) mod n`) rather than a Spark-internal hash, so an external
  * system can compute — and audit — the exact same layout (the driver
  * oracle does). Ids must be non-null (and below ~3.5e9, see
  * knuthHash).
  */
object Export {

  /** Append a `shard` column in [0, nShards). Map-only. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int,
                  seed: Long = 42L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("shard"),
      "shardAssign appends 'shard' — the input already has that column")
    graft.ml.Sampling.requireNumericId(df, idCol, "shardAssign")
    df.withColumn("shard",
      pmod(graft.ml.Sampling.knuthHash(col(idCol), seed), lit(nShards.toLong)))
  }

  /** Export `df` into hash-addressed subdirectories (`shard=K/`) under
    * `dir`, one file per non-empty shard, and return the (materialized)
    * manifest with one row for EVERY shard id in [0, nShards) —
    * including zero-row shards, which materialize no directory, so
    * loaders must consult the manifest, never a directory listing.
    *
    * Partitioning is an IDENTITY map shard→task (an RDD-level custom
    * `Partitioner`): exactly one write task per shard, each carrying
    * only its own shard's rows. A `repartition(nShards, col)` would
    * instead hash the shard id — balls-in-bins collisions put several
    * shards in one task (and leave ~1/e of tasks empty), breaking the
    * 100 TB / nShards task-sizing contract. The RDD hop costs one
    * serialization boundary on a write that is IO-bound anyway.
    *
    * The input lineage runs ONCE: rows stream through the shuffle to
    * the writer tasks, and the manifest is aggregated from the written
    * files themselves, so the counts describe exactly what landed on
    * disk. A null id fails fast with a descriptive error. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, dir: String,
                  format: String = "parquet", seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val sharded = shardAssign(df, idCol, nShards, seed)
    val schema = sharded.schema
    val shardIdx = schema.fieldIndex("shard")
    val identityPartitioned = sharded.rdd
      .map { r =>
        if (r.isNullAt(shardIdx))
          throw new IllegalArgumentException(
            s"writeShards: null $idCol — shard assignment needs non-null ids")
        (r.getLong(shardIdx), r)
      }
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = nShards
        override def getPartition(key: Any): Int = key.asInstanceOf[Long].toInt
      })
      .map(_._2)
    spark.createDataFrame(identityPartitioned, schema)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard").format(format).save(dir)
    val written = spark.read.format(format).load(dir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"))
    spark.range(nShards).select(col("id").as("shard"))
      .join(written, Seq("shard"), "left")
      .select(col("shard"), coalesce(col("n_rows"), lit(0L)).as("n_rows"))
      .orderBy(col("shard"))
  }

  /** CURRICULUM shard assignment: shard k is the k-th contiguous band
    * of the corpus in ascending `(scoreCol, idCol)` order — shard 0
    * the lowest-scored band, shard nShards−1 the highest. The
    * training-order complement of [[shardAssign]]'s hash layout: a
    * curriculum loader walks shards in order for easy→hard
    * progression, and quality-bucketed ablations read one band.
    *
    * The assignment is EXACT rank arithmetic — `shard = rank ·
    * nShards / n` (0-based rank under the (score, id) total order; id
    * breaks ties so the layout is deterministic) — which any engine
    * can recompute with a window rank, the same auditability contract
    * as the Knuth-hash layout (the driver oracle does exactly that).
    * Band sizes differ by at most one row.
    *
    * Scale shape: one RANGE exchange (Spark's distributed sort) and
    * an RDD `zipWithIndex` — never a single-partition window, which
    * is how a naive `row_number() OVER (ORDER BY score)` would
    * execute. The sorted RDD is persisted because zipWithIndex runs
    * one extra partition-counting job before the data pass; the
    * returned frame stays lazy, so the persist is released by LRU
    * eviction (same contract as keepBestPerCluster), not an eager
    * unpersist that would force a recompute on first read. Null
    * scores or ids refuse: Spark orders nulls first, SQL engines
    * default to nulls last — a silent cross-engine layout divergence
    * otherwise. */
  def curriculumAssign(df: DataFrame, idCol: String, scoreCol: String,
                       nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("shard"),
      "curriculumAssign appends 'shard' — the input already has that column")
    val spark = df.sparkSession
    val scoreType = df.schema(scoreCol).dataType
    val guarded = df.withColumn(scoreCol,
      when(col(scoreCol).isNull || col(idCol).isNull, raise_error(
        lit(s"curriculumAssign: null $scoreCol/$idCol — the rank order " +
          "would diverge across engines")).cast(scoreType))
        .otherwise(col(scoreCol)))
    val sorted = guarded.sort(col(scoreCol).asc, col(idCol).asc)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "shard", org.apache.spark.sql.types.LongType, nullable = false))
    val srdd = sorted.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = srdd.count()
    if (n == 0)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val k = nShards.toLong
      val rows = srdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i * k / n)
      }
      spark.createDataFrame(rows, schema)
    }
  }

  /** Shared scaffolding for the STREAMING shard writers (TFRecord,
    * WebDataset tar): shard assignment + content-stable (knuthHash,
    * id) in-shard order, null-id fail-fast, IDENTITY shard→task
    * partitioner (same reasoning as [[writeShards]]), a VALIDATE pass
    * over the whole shard BEFORE the file opens (no torn partial
    * shard on a data error), then one streamed file per non-empty
    * shard. The write job is materialized HERE, exactly once (the
    * per-shard counts collapse to ≤ nShards driver-side rows): the
    * returned manifest is a plain local frame, so dropping it cannot
    * skip the write and re-reading it cannot re-run the job — the
    * failure mode a lazy side-effecting RDD would invite after the
    * eager directory clear. */
  private[sources] def shardedStreamWrite(
      df: DataFrame, idCol: String, nShards: Int, dir: String, seed: Long,
      countCol: String,
      fileName: Long => String,
      validate: (Array[org.apache.spark.sql.Row],
                 org.apache.spark.sql.types.StructType) => Unit,
      write: (java.io.OutputStream, Array[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType) => Long): DataFrame = {
    val spark = df.sparkSession
    val sharded = shardAssign(df, idCol, nShards, seed)
      .withColumn("__ord", graft.ml.Sampling.knuthHash(col(idCol), seed))
    val schema = sharded.schema
    val shardIdx = schema.fieldIndex("shard")
    val idIdx = schema.fieldIndex(idCol)
    val ordIdx = schema.fieldIndex("__ord")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // clear any previous export (overwrite semantics, like writeShards)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fsRoot = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsRoot.exists(dirPath)) fsRoot.delete(dirPath, true)
    fsRoot.mkdirs(dirPath)
    val counts = sharded.rdd
      .map { r =>
        if (r.isNullAt(shardIdx) || r.isNullAt(idIdx))
          throw new IllegalArgumentException(
            s"sharded export: null $idCol — shard assignment needs non-null ids")
        (r.getLong(shardIdx), r)
      }
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = nShards
        override def getPartition(key: Any): Int = key.asInstanceOf[Long].toInt
      })
      .mapPartitionsWithIndex { (shard, rows) =>
        val buf = rows.map(_._2).toArray
        if (buf.isEmpty) Iterator.empty
        else {
          // content-stable in-shard order: (knuthHash(id), id)
          java.util.Arrays.sort(buf, (a: org.apache.spark.sql.Row,
                                      b: org.apache.spark.sql.Row) => {
            val c = java.lang.Long.compare(a.getLong(ordIdx), b.getLong(ordIdx))
            if (c != 0) c
            else java.lang.Long.compare(a.getAs[Number](idIdx).longValue(),
              b.getAs[Number](idIdx).longValue())
          })
          validate(buf, schema)
          val path = new org.apache.hadoop.fs.Path(dir, fileName(shard.toLong))
          val fs = path.getFileSystem(conf.value)
          val outS = new java.io.BufferedOutputStream(fs.create(path, true), 1 << 16)
          val n = try write(outS, buf, schema) finally outS.close()
          Iterator((shard.toLong, n))
        }
      }
      .collect().toMap // ≤ nShards tuples — the eager write action
    import spark.implicits._
    (0L until nShards.toLong).map(s => (s, counts.getOrElse(s, 0L)))
      .toDF("shard", countCol)
  }

  /** Masked CRC32C per the public TFRecord framing:
    * `rotr15(crc32c(bytes)) + 0xa282ead8` (mod 2^32). */
  private[sources] def maskedCrc32c(bytes: Array[Byte], len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, 0, len)
    val crc = c.getValue.toInt // low 32 bits
    val rot = (crc >>> 15) | (crc << 17)
    rot + 0xa282ead8
  }

  /** One framed TFRecord: u64le length, u32le masked-crc(length),
    * payload, u32le masked-crc(payload). */
  private[graft] def tfrecordFrame(payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + 4 + payload.length + 4)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(payload.length.toLong)
    bb.putInt(maskedCrc32c(out, 8)) // crc of the 8 length bytes
    bb.put(payload)
    bb.putInt(maskedCrc32c(payload, payload.length))
    out
  }

  /** Sharded TFRECORD export — the training-dataloader container
    * (TensorFlow's framed record format: u64le length + masked
    * CRC32C of length, payload bytes, masked CRC32C of payload; the
    * CRCs come from `java.util.zip.CRC32C`, no codec library). The
    * PAYLOAD is whatever the caller serialized into `payloadCol`
    * (UTF-8 JSON, a pre-built tf.Example, raw text) — the container
    * framing is real and reader-verifiable, the payload encoding is
    * deliberately not this library's business.
    *
    * Same identity shard→task layout as [[writeShards]]: one
    * `shard-NNNNN.tfrecord` file per non-empty shard, written
    * through the Hadoop FileSystem API (works on any Spark-reachable
    * filesystem), rows inside a shard in content-stable
    * (knuthHash(id), id) order so re-exports are byte-identical.
    * NULL payloads fail fast BEFORE the shard file opens — a
    * training export must never silently drop records or leave a
    * torn partial shard. The write is MATERIALIZED before this
    * returns (see [[shardedStreamWrite]]); the returned manifest is
    * the same every-shard-included shape as [[writeShards]]. */
  def writeShardsTfrecord(df: DataFrame, idCol: String, payloadCol: String,
                          nShards: Int, dir: String,
                          seed: Long = 42L, gzip: Boolean = false): DataFrame = {
    require(df.schema(payloadCol).dataType ==
        org.apache.spark.sql.types.BinaryType,
      s"writeShardsTfrecord: $payloadCol must be binary (serialize first)")
    shardedStreamWrite(
      df.select(col(idCol), col(payloadCol)), idCol, nShards, dir, seed,
      countCol = "n_rows",
      fileName = s => f"shard-$s%05d.tfrecord" + (if (gzip) ".gz" else ""),
      validate = (buf, schema) => {
        val payIdx = schema.fieldIndex(payloadCol)
        buf.foreach { r =>
          if (r.isNullAt(payIdx))
            throw new IllegalArgumentException(
              "writeShardsTfrecord: null payload — a training export " +
                "must not silently drop or write empty records")
        }
      },
      write = (raw, buf, schema) => {
        val payIdx = schema.fieldIndex(payloadCol)
        // GZIP is tf.data's standard TFRecord compression; the whole
        // stream compresses as one member
        val out: java.io.OutputStream =
          if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
        var n = 0L
        try buf.foreach { r =>
          out.write(tfrecordFrame(r.getAs[Array[Byte]](payIdx)))
          n += 1
        } finally out.close()
        n
      })
  }

  /** Parse one TFRecord stream: payloads of every VERIFIED frame. A
    * CRC mismatch or malformed length ends the walk at the last good
    * record (`strict = false`, the crawl-ingest posture: a torn tail
    * yields the clean prefix) or throws (`strict = true`, the
    * training-data posture: corruption must not silently shrink a
    * dataset). */
  private[graft] def parseTfrecords(bytes: Array[Byte],
                                    strict: Boolean): Vector[Array[Byte]] =
    // eager wrapper over the streaming walk — ONE code path (the
    // Warc.parseWarc precedent), so ingest (readTfrecords) and audit
    // (auditShards, which parses whole shard byte[]s) can never
    // diverge in posture; equivalence additionally property-pinned
    parseTfrecordStream(new java.io.ByteArrayInputStream(bytes), strict)
      .toVector

  /** Streaming twin of [[parseTfrecords]] — identical postures, but
    * peak allocation is ONE record: a multi-GB shard never
    * materializes as a byte[]. Strict mode refuses a partial header,
    * short payload/CRC tail, malformed length frame, or CRC mismatch;
    * non-strict ends the walk at the last verified record. */
  private[graft] def parseTfrecordStream(in: java.io.InputStream,
                                         strict: Boolean): Iterator[Array[Byte]] =
    new scala.collection.AbstractIterator[Array[Byte]] {
      private var pos = 0L
      private var pending: Array[Byte] = null
      private var done = false
      private val hdr = new Array[Byte](12)
      private def advance(): Unit = {
        if (pending != null || done) return
        val got = FileStreams.readFully(in, hdr, 12)
        if (got == 0) { done = true; return }
        def truncated(extra: Long): Unit = {
          if (strict) throw new IllegalArgumentException(
            s"parseTfrecords: $extra trailing bytes at byte $pos are not a record")
          done = true
        }
        if (got < 12) { truncated(got.toLong); return }
        val bb = java.nio.ByteBuffer.wrap(hdr)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val len = bb.getLong
        val lenCrc = bb.getInt
        if (!(len >= 0 && len <= Int.MaxValue - 16 &&
              lenCrc == maskedCrc32c(hdr, 8))) {
          if (strict) throw new IllegalArgumentException(
            s"parseTfrecords: malformed length frame at byte $pos")
          done = true
          return
        }
        val payload = new Array[Byte](len.toInt)
        val pGot = FileStreams.readFully(in, payload, len.toInt)
        val tail = new Array[Byte](4)
        val tGot = if (pGot == len.toInt) FileStreams.readFully(in, tail, 4) else 0
        if (pGot < len.toInt || tGot < 4) { truncated(12L + pGot + tGot); return }
        val payCrc = java.nio.ByteBuffer.wrap(tail)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        if (payCrc != maskedCrc32c(payload, payload.length)) {
          if (strict) throw new IllegalArgumentException(
            s"parseTfrecords: payload CRC mismatch at byte $pos")
          done = true
          return
        }
        pending = payload
        pos += 12L + len + 4L
      }
      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): Array[Byte] = {
        advance()
        if (pending == null)
          throw new NoSuchElementException("parseTfrecordStream")
        val r = pending
        pending = null
        r
      }
    }

  /** Converts DECODER-layer exceptions (truncated member →
    * EOFException, bad trailer / not-actually-gzip → ZipException)
    * into the strict-mode refusal — the message must name gzip so
    * the failure reads as the data defect it is. Any OTHER
    * IOException (a transient HDFS/object-store read failure, a
    * socket reset) is rethrown UNCHANGED: misreporting an
    * infrastructure error as data corruption would both lie to the
    * operator and defeat normal task-retry semantics, which key on
    * the exception's identity. */
  private final class GzStrictStream(in: java.io.InputStream)
      extends java.io.InputStream {
    private def refuse(e: java.io.IOException): Int = e match {
      case _: java.io.EOFException | _: java.util.zip.ZipException =>
        throw new IllegalArgumentException(
          "readTfrecords: truncated/corrupt gzip stream (strict mode)", e)
      case other => throw other
    }
    override def read(): Int =
      try in.read() catch { case e: java.io.IOException => refuse(e) }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      try in.read(b, off, len) catch { case e: java.io.IOException => refuse(e) }
    override def close(): Unit = in.close()
  }

  /** Read TFRecord files as (path, record_index, payload) rows — the
    * ingest twin of [[writeShardsTfrecord]], over the shared
    * [[FileStreams.perFile]] scaffold (same shape as the WARC/tar
    * readers: size-weighted task packing, incremental per-record walk
    * — peak task memory is ONE record, not the shard, so the old
    * binaryFile whole-file byte[] and its 2 GB ceiling are gone;
    * TFRecord is not splittable, so a file is still the atom of
    * work). Every frame's masked CRC32C is VERIFIED; `strict` picks
    * the posture — throw on corruption (default: a training set must
    * not silently shrink) or keep each file's clean prefix (crawl
    * tolerance).
    *
    * `compression`: "auto" (default) inflates files named `.gz` /
    * `.gzip` and reads everything else raw — by EXTENSION, never by
    * content magic, because a valid uncompressed file whose first
    * record length is 0x...8b1f (a 35615-byte payload, realistic)
    * starts with the gzip magic bytes by coincidence and a sniff
    * would fail it in both postures. "gzip" forces inflation
    * regardless of name (tf.data's `compression_type='GZIP'`
    * compresses without renaming — extension-less gzip shards need
    * this override); "none" forces raw. */
  def readTfrecords(spark: org.apache.spark.sql.SparkSession,
                    pathGlob: String, strict: Boolean = true,
                    compression: String = "auto"): DataFrame = {
    require(Set("auto", "gzip", "none")(compression),
      s"compression must be auto/gzip/none, got $compression")
    import spark.implicits._
    val comp = compression
    val rdd = FileStreams.perFile(spark, pathGlob, "readTfrecords",
      decorate = (path, in) => {
        val gz = comp match {
          case "gzip" => true
          case "none" => false
          case _      => path.endsWith(".gz") || path.endsWith(".gzip")
        }
        if (!gz) in
        else if (strict)
          // header validation happens in the ctor; read-time truncation
          // surfaces through GzStrictStream — both refuse with the
          // gzip-naming message (a torn member can end exactly on a
          // frame boundary, so the frame walk alone cannot catch it)
          try new GzStrictStream(new java.util.zip.GZIPInputStream(in, 1 << 16))
          catch { case e: java.io.IOException =>
            throw new IllegalArgumentException(
              "readTfrecords: truncated/corrupt gzip stream (strict mode)", e) }
        else
          // clean-prefix posture: corrupt header → zero records,
          // read-time corruption → EOF at the inflated prefix
          try new FileStreams.PrefixStream(
            new java.util.zip.GZIPInputStream(in, 1 << 16))
          catch { case _: java.io.IOException =>
            new java.io.ByteArrayInputStream(Array.emptyByteArray) }
      }) { (path, in) =>
      parseTfrecordStream(in, strict).zipWithIndex.map {
        case (payload, i) => (path, i.toLong, payload)
      }
    }
    spark.createDataset(rdd).toDF("path", "record_index", "payload")
  }

  /** Post-export INTEGRITY AUDIT: re-derive every shard's row count
    * from the files themselves and join it against the manifest the
    * writer returned — the operational check after replication, a
    * partial outage, or a suspect filesystem, before a training run
    * is allowed to start on the shard set. Returns one row per shard:
    * `(shard, n_manifest, n_actual, clean, ok)`, `ok = false` on ANY
    * divergence — a missing file reports 0 actual rows, a torn file
    * reports its clean-prefix count (the parses run NON-strict here
    * precisely so corruption is REPORTED instead of killing the audit
    * job; TFRecord counts are CRC-verified by construction), and
    * `clean` is a per-file STRICT re-parse verdict that catches tears
    * the count alone cannot: a tar cut at a file boundary inside a
    * multi-file sample keeps the sample count intact and only the
    * missing end-of-archive marker betrays it. Zero-row manifest
    * shards materialize no file by design and audit ok; an empty or
    * vanished export directory reports every manifest shard rather
    * than throwing on the empty glob.
    *
    * `format`: "tfrecord" ([[writeShardsTfrecord]] layout, gzip or
    * not; a tear at an exact frame boundary of an UNCOMPRESSED shard
    * is undetectable — the format has no footer — while gzip shards
    * catch it via the gzip trailer), "tar"
    * ([[graft.sources.TarShards.writeShardsTar]] — counts SAMPLES,
    * matching its manifest), or "parquet" ([[writeShards]]'s
    * hash-addressed directories, read with ignoreCorruptFiles so a
    * torn file surfaces as a shortfall). Caveat: on a bare-local
    * ChecksumFileSystem (`file://`), a file torn AFTER its `.crc`
    * sidecar was written fails the read with a ChecksumException
    * before any parser runs — production stores (HDFS/S3A/ABFS)
    * carry no client-side sidecars and report normally. Scale: the
    * data pass is one task per shard file; everything after is
    * nShards-sized. */
  def auditShards(spark: org.apache.spark.sql.SparkSession, dir: String,
                  manifest: DataFrame,
                  format: String = "tfrecord"): DataFrame = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    def globNonEmpty(pattern: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(pattern)
      val st = p.getFileSystem(hconf).globStatus(p)
      st != null && st.nonEmpty
    }
    // per-file (shard, count, structurally-clean) — a full outage or
    // an all-zero-row export matches nothing, which must REPORT (every
    // manifest shard ok=false resp. ok=true), never throw the
    // path-does-not-exist error an empty binaryFile glob raises. The
    // shard regex anchors on the FILE name (digits + the format
    // extension), so a directory component like 'shard-3-retry' in
    // `dir` cannot hijack the extraction.
    def fileAudit(glob: String, fileRe: String,
                  one: (String, Array[Byte]) => (Long, Boolean)): DataFrame =
      if (!globNonEmpty(glob))
        Seq.empty[(Long, Long, Boolean)].toDF("shard", "n_actual", "clean")
      else
        spark.read.format("binaryFile").load(glob)
          .select(col("path"), col("content")).as[(String, Array[Byte])]
          .map { case (p, b) => val (n, c) = one(p, b); (p, n, c) }
          .toDF("path", "n_actual", "clean")
          .select(regexp_extract(col("path"), fileRe, 1).cast("long").as("shard"),
            col("n_actual"), col("clean"))
    val actual = format match {
      case "tfrecord" =>
        fileAudit(s"$dir/*.tfrecord*", "shard-(\\d+)\\.tfrecord",
          (path, raw) => {
            val gz = path.endsWith(".gz") || path.endsWith(".gzip")
            val bytes = if (gz) gunzipAll(raw, strict = false) else raw
            val n = parseTfrecords(bytes, strict = false).size.toLong
            // clean = the strict walk accepts every byte (a tear at an
            // exact frame boundary of an UNcompressed shard is
            // undetectable — the format carries no footer; gzip shards
            // catch it via the gzip trailer)
            val clean =
              try {
                parseTfrecords(
                  if (gz) gunzipAll(raw, strict = true) else raw, strict = true)
                true
              } catch { case _: IllegalArgumentException => false }
            (n, clean)
          })
      case "tar" =>
        fileAudit(s"$dir/*.tar", "shard-(\\d+)\\.tar",
          (_, bytes) => {
            // count SAMPLES (consecutive key runs) to match the
            // manifest; `clean` catches the tear that loses FILES
            // without losing a whole sample — a prefix cut at a file
            // boundary keeps the sample count intact, and only the
            // missing end-of-archive marker betrays it
            var n = 0L
            var cur: String = null
            TarShards.parseTar(bytes, strict = false).foreach { case (nm, _) =>
              val d = nm.indexOf('.')
              val key = if (d < 0) nm else nm.substring(0, d)
              if (key != cur) { n += 1; cur = key }
            }
            val clean =
              try { TarShards.parseTar(bytes, strict = true); true }
              catch { case _: IllegalArgumentException => false }
            (n, clean)
          })
      case "parquet" =>
        // ignoreCorruptFiles gives parquet the same report-don't-die
        // posture: a torn file is skipped and surfaces as a shortfall
        if (!globNonEmpty(s"$dir/shard=*"))
          Seq.empty[(Long, Long, Boolean)].toDF("shard", "n_actual", "clean")
        else
          spark.read.option("ignoreCorruptFiles", "true").parquet(dir)
            .groupBy(col("shard").cast("long").as("shard"))
            .agg(count(lit(1)).as("n_actual"))
            .withColumn("clean", lit(true))
      case other => throw new IllegalArgumentException(
        s"auditShards: format must be tfrecord/tar/parquet, got $other")
    }
    manifest
      .select(col(manifest.columns(0)).cast("long").as("shard"),
        col(manifest.columns(1)).cast("long").as("n_manifest"))
      .join(actual, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_manifest"), lit(0L)).as("n_manifest"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("clean"), lit(true)).as("clean"))
      .withColumn("ok", col("n_manifest") === col("n_actual") && col("clean"))
      .orderBy(col("shard"))
  }

  /** Inflate a (possibly multi-member) gzip stream whole. `strict`
    * decides the truncation posture HERE, not just in the frame walk:
    * a torn gzip member can end exactly on a TFRecord frame boundary,
    * so if truncation were always swallowed, strict mode would accept
    * a silently-shrunk dataset — the precise failure the training
    * posture exists to refuse. Non-strict keeps the inflated prefix
    * (crawl tolerance). */
  private def gunzipAll(b: Array[Byte], strict: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(b.length * 4, 1 << 16))
    val buf = new Array[Byte](1 << 16)
    try {
      // the ctor itself validates the 10-byte gzip header — it must
      // sit INSIDE the try or header-level corruption would crash the
      // non-strict clean-prefix posture
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch {
      case e: java.io.IOException =>
        if (strict) throw new IllegalArgumentException(
          "readTfrecords: truncated/corrupt gzip stream (strict mode)", e)
    }
    out.toByteArray
  }
}
