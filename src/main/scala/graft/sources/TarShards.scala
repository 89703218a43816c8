package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shards — the multimodal training container
  * (a sample is a GROUP of files sharing a basename key:
  * `000017.jpg` + `000017.json` + `000017.txt`; trainers stream the
  * tar sequentially, so sample locality is the layout). Pure-JVM
  * USTAR framing (the public POSIX.1-1988 format: 512-byte headers,
  * octal sizes, space-initialized checksum, two zero blocks at end)
  * — no tar library exists in the JDK, so both sides are hand-rolled
  * and the spec verifies them against each other AND against
  * hand-built archive bytes.
  *
  * Writer layout mirrors [[Export.writeShardsTfrecord]]: identity
  * shard→task, content-stable in-shard sample order, byte-identical
  * re-exports, null entries refused. Reader mirrors the WARC/TFRecord
  * ingest: binaryFile source, one task per shard file, strict or
  * clean-prefix parse posture. */
object TarShards {

  private val Block = 512

  /** One USTAR header + padded payload appended to `out`. */
  private[graft] def writeTarEntry(out: java.io.OutputStream,
                                   name: String, data: Array[Byte]): Unit = {
    require(name.getBytes("UTF-8").length <= 100,
      s"tar entry name over 100 bytes: $name")
    require(data.length < (1L << 33), s"tar entry over 8 GB: $name")
    val h = new Array[Byte](Block)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, h, off, math.min(b.length, len))
    }
    put(name, 0, 100)
    put("0000644", 100, 8)             // mode
    put("0000000", 108, 8); put("0000000", 116, 8) // uid/gid
    put(f"${data.length}%011o", 124, 12)           // size, octal
    put("00000000000", 136, 12)        // mtime 0: byte-stable exports
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces first
    h(156) = '0'                       // regular file
    put("ustar", 257, 6)               // magic (NUL-terminated by zero fill)
    put("00", 263, 2)                  // version
    var sum = 0
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    put(f"$sum%06o", 148, 7)           // 6 octal digits…
    h(154) = 0                         // …then NUL, then space (POSIX layout)
    h(155) = ' '
    out.write(h)
    out.write(data)
    val pad = (Block - data.length % Block) % Block
    out.write(new Array[Byte](pad))
  }

  private[graft] def tarFooter: Array[Byte] = new Array[Byte](2 * Block)

  /** Parse a whole in-memory USTAR archive — thin eager wrapper over
    * [[parseTarStream]] (one verification code path) for callers that
    * already hold the bytes (the shard audit, specs). */
  private[graft] def parseTar(bytes: Array[Byte],
                              strict: Boolean): Vector[(String, Array[Byte])] =
    parseTarStream(new java.io.ByteArrayInputStream(bytes), strict).toVector

  /** INCREMENTAL USTAR walk: one 512-byte header, then that entry's
    * payload (the peak allocation — entry-sized, never shard-sized),
    * then padding, per step. Checksums are VERIFIED; `strict` throws
    * on corruption, else the walk ends at the last good entry
    * (clean-prefix posture). Strict additionally requires the
    * end-of-archive marker and zero-only bytes after it (a shard
    * truncated at an entry boundary loses its tail WITHOUT corrupting
    * any surviving header — only the missing footer betrays it, and a
    * training-data read must not silently shrink). The caller owns
    * the stream; exhausting the iterator reads to the relevant end
    * but does NOT close it. */
  private[graft] def parseTarStream(in: java.io.InputStream, strict: Boolean)
      : Iterator[(String, Array[Byte])] =
    new scala.collection.AbstractIterator[(String, Array[Byte])] {
      private var pos = 0L          // offset of the CURRENT header
      private var done = false
      private var pending: (String, Array[Byte]) = null
      private var advanced = false
      private val h = new Array[Byte](Block)

      private def fail(msg: String): Unit = {
        done = true
        if (strict) throw new IllegalArgumentException(s"parseTar: $msg at byte $pos")
      }

      private def readFully(buf: Array[Byte], n: Int): Int =
        FileStreams.readFully(in, buf, n)

      private def advance(): Unit = {
        pending = null
        while (pending == null && !done) {
          val got = readFully(h, Block)
          if (got == 0) {
            // clean EOF at a block boundary without the end marker:
            // truncation at an entry boundary
            done = true
            if (strict) throw new IllegalArgumentException(
              s"parseTar: missing end-of-archive marker (truncated?) at byte $pos " +
                s"of $pos")
          } else if (got < Block) {
            // trailing partial block
            done = true
            if (strict) throw new IllegalArgumentException(
              s"parseTar: missing end-of-archive marker (truncated?) at byte $pos " +
                s"of ${pos + got}")
          } else if (h.forall(_ == 0)) { // end marker
            done = true
            if (strict) {
              var at = pos + Block
              val chunk = new Array[Byte](8192)
              var r = in.read(chunk)
              while (r > 0) {
                var i = 0
                while (i < r) {
                  if (chunk(i) != 0) throw new IllegalArgumentException(
                    "parseTar: non-zero trailing bytes after end-of-archive " +
                      s"marker at byte ${at + i}")
                  i += 1
                }
                at += r
                r = in.read(chunk)
              }
            }
          } else {
            var sum = 0
            var i = 0
            while (i < Block) {
              sum += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff)
              i += 1
            }
            // octal fields terminate at NUL OR space (POSIX allows
            // both); the NAME field terminates at NUL ONLY — a space
            // is a legal filename byte ('cover image.jpg'), and
            // space-terminating it would silently truncate
            // round-tripped names
            def octal(off: Int, len: Int): String = {
              val end = (off until off + len)
                .find(j => h(j) == 0 || h(j) == ' ')
                .getOrElse(off + len)
              new String(h, off, end - off, "UTF-8")
            }
            val declared = scala.util.Try(
              java.lang.Long.parseLong(octal(148, 8).trim, 8)).getOrElse(-1L)
            val size = scala.util.Try(
              java.lang.Long.parseLong(octal(124, 12).trim, 8)).getOrElse(-1L)
            if (declared != sum) fail(s"header checksum $declared != $sum")
            else if (size < 0) fail(s"bad entry size $size")
            else if (size > Int.MaxValue - 16)
              // a JVM byte[] caps one ENTRY at 2 GB; shards themselves
              // are unbounded now that the walk streams
              fail(s"tar entry over 2 GB ($size bytes)")
            else {
              val data = new Array[Byte](size.toInt)
              val pad = ((Block - size % Block) % Block).toInt
              if (readFully(data, size.toInt) < size.toInt)
                fail(s"bad entry size $size")
              else if (pad > 0 && {
                  val pb = new Array[Byte](pad); readFully(pb, pad) < pad })
                fail(s"bad entry size $size")
              else {
                val nameEnd = (0 until 100).find(h(_) == 0).getOrElse(100)
                val name = new String(h, 0, nameEnd, "UTF-8")
                val isFile = h(156) == '0' || h(156) == 0
                pos += Block + size + pad
                // only regular files carry sample data; other types skip
                if (isFile) pending = (name, data)
              }
            }
          }
        }
      }

      override def hasNext: Boolean = {
        if (!advanced && !done) { advance(); advanced = true }
        pending != null
      }
      override def next(): (String, Array[Byte]) = {
        if (!hasNext) throw new NoSuchElementException("parseTarStream")
        advanced = false
        val e = pending
        pending = null
        e
      }
    }

  /** Export samples as WebDataset tar shards: `entriesCol` is
    * `array<struct<name: string, content: binary>>` — each element
    * becomes the file `<zero-padded id>.<name>` inside the sample's
    * shard, elements in array order, samples in content-stable
    * (knuthHash(id), id) order. One `shard-NNNNN.tar` per non-empty
    * shard; returns the every-shard manifest (samples, not files).
    *
    * Shares [[Export.shardedStreamWrite]]'s scaffolding: the write is
    * MATERIALIZED before this returns, and the whole shard is
    * validated BEFORE its file opens — null entries/names/content,
    * names over the 100-byte USTAR limit, and DUPLICATE names within
    * one sample all refuse without leaving a torn partial shard (a
    * duplicate-name sample would export "successfully" but then be
    * permanently unreadable by [[readTarSamples]]'s refuse-on-dup
    * contract — the writer must reject what its paired reader
    * rejects). Entries stream straight to the filesystem — never the
    * whole tar in memory, so shard size is bounded by the caller's
    * corpus/nShards, not a JVM array limit. */
  def writeShardsTar(df: DataFrame, idCol: String, entriesCol: String,
                     nShards: Int, dir: String, seed: Long = 42L): DataFrame =
    Export.shardedStreamWrite(
      df.select(col(idCol), col(entriesCol)), idCol, nShards, dir, seed,
      countCol = "n_samples",
      fileName = s => f"shard-$s%05d.tar",
      validate = (buf, schema) => {
        val idIdx = schema.fieldIndex(idCol)
        val entIdx = schema.fieldIndex(entriesCol)
        // buf arrives sorted by (knuthHash(id), id): duplicate ids are
        // ADJACENT, and two same-id samples would write consecutive
        // same-key files the reader merges — then refuses as duplicate
        // suffixes; refuse at the source instead
        var prevId = 0L
        var firstRow = true
        buf.foreach { r =>
          val idv = r.getAs[Number](idIdx).longValue()
          if (!firstRow && idv == prevId)
            throw new IllegalArgumentException(
              s"writeShardsTar: duplicate sample id $idv — two samples would " +
                "merge into one unreadable key on read")
          prevId = idv; firstRow = false
          val key = f"$idv%012d"
          val entries = r.getSeq[org.apache.spark.sql.Row](entIdx)
          if (entries == null)
            throw new IllegalArgumentException(
              "writeShardsTar: null entries — a training export must not " +
                "silently drop samples")
          if (entries.isEmpty)
            throw new IllegalArgumentException(
              s"writeShardsTar: EMPTY entries in sample $key — a zero-file " +
                "sample writes nothing, so the manifest would count a sample " +
                "the reader (and the shard audit) can never see")
          val seen = scala.collection.mutable.HashSet.empty[String]
          entries.foreach { e =>
            val nm = e.getAs[String]("name")
            if (nm == null || e.getAs[Array[Byte]]("content") == null)
              throw new IllegalArgumentException(
                "writeShardsTar: null entry name/content in sample " + key)
            if (!seen.add(nm))
              throw new IllegalArgumentException(
                s"writeShardsTar: duplicate entry name '$nm' in sample $key — " +
                  "readTarSamples would refuse the shard")
            if (s"$key.$nm".getBytes("UTF-8").length > 100)
              throw new IllegalArgumentException(
                s"writeShardsTar: tar entry name over 100 bytes: $key.$nm")
          }
        }
      },
      write = (outS, buf, schema) => {
        val idIdx = schema.fieldIndex(idCol)
        val entIdx = schema.fieldIndex(entriesCol)
        buf.foreach { r =>
          val key = f"${r.getAs[Number](idIdx).longValue()}%012d"
          r.getSeq[org.apache.spark.sql.Row](entIdx).foreach { e =>
            writeTarEntry(outS, s"$key.${e.getAs[String]("name")}",
              e.getAs[Array[Byte]]("content"))
          }
        }
        outS.write(tarFooter)
        buf.length.toLong
      })

  /** Read WebDataset tar shards back as SAMPLE rows: (path, key,
    * entries map name→bytes) — CONSECUTIVE files sharing a basename
    * key regroup into one sample, the WebDataset convention (the
    * format's whole point is that a sample's files are adjacent in
    * the stream, so trainers — and this reader — never need a
    * shuffle: grouping is a run-length walk inside the per-file
    * parse task, map-only; a `groupBy(key)` would instead move every
    * media byte through an exchange). Two same-key runs separated by
    * another key are two samples, exactly as a sequential trainer
    * would see them. A duplicate suffix within one sample refuses
    * (the map would silently drop a file). File rows (path, full
    * name, content) are available via [[readTarFiles]] when the
    * grouping is not wanted. */
  def readTarSamples(spark: SparkSession, pathGlob: String,
                     strict: Boolean = true): DataFrame = {
    import spark.implicits._
    val rdd = shardStreams(spark, pathGlob) { (path, files) =>
      // run-length sample grouping, ONE sample buffered at a time —
      // peak task memory is the largest sample, not the shard
      new scala.collection.AbstractIterator[(String, String, Map[String, Array[Byte]])] {
        private val buf = files.buffered
        private def keyOf(nm: String): String = {
          val dot = nm.indexOf('.')
          if (dot < 0) nm else nm.substring(0, dot)
        }
        override def hasNext: Boolean = buf.hasNext
        override def next(): (String, String, Map[String, Array[Byte]]) = {
          val key = keyOf(buf.head._1)
          var cur = Vector.empty[(String, Array[Byte])]
          while (buf.hasNext && keyOf(buf.head._1) == key) {
            val (nm, data) = buf.next()
            val dot = nm.indexOf('.')
            val suffix = if (dot < 0) "" else nm.substring(dot + 1)
            cur = cur :+ (suffix -> data)
          }
          val m = cur.toMap
          require(m.size == cur.size,
            s"readTarSamples: duplicate suffix within sample '$key' in $path")
          (path, key, m)
        }
      }
    }(strict)
    spark.createDataset(rdd).toDF("path", "key", "entries")
  }

  /** Flat file rows of tar shards: (path, name, content). */
  def readTarFiles(spark: SparkSession, pathGlob: String,
                   strict: Boolean = true): DataFrame = {
    import spark.implicits._
    val rdd = shardStreams(spark, pathGlob) { (path, files) =>
      files.map { case (nm, data) => (path, nm, data) }
    }(strict)
    spark.createDataset(rdd).toDF("path", "name", "content")
  }

  /** Streaming scaffold for the shard readers ([[FileStreams.perFile]]
    * + the incremental [[parseTarStream]] walk): one task per shard
    * file, peak task memory bounded by the largest ENTRY, no
    * binaryFile 2 GB whole-shard ceiling. */
  private def shardStreams[T: scala.reflect.ClassTag](
      spark: SparkSession, pathGlob: String)(
      f: (String, Iterator[(String, Array[Byte])]) => Iterator[T])(
      strict: Boolean): org.apache.spark.rdd.RDD[T] =
    FileStreams.perFile(spark, pathGlob, "readTar*") { (path, in) =>
      f(path, parseTarStream(in, strict))
    }
}
