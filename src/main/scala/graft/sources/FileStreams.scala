package graft.sources

import org.apache.spark.sql.SparkSession

/** sources-internal scaffolding shared by the STREAMING container
  * readers (tar shards, WARC segments): driver-side glob listing with
  * one task per file, per-task Hadoop FS input streams closed at task
  * completion (and eagerly at iterator exhaustion), plus small stream
  * utilities. Peak task memory with these readers is bounded by the
  * largest RECORD/ENTRY, never the file — the old binaryFile path
  * materialized the whole file as one byte[] (2 GB JVM ceiling). */
private[graft] object FileStreams {

  /** Read exactly n bytes into buf; returns the count actually read
    * (< n only at EOF). */
  def readFully(in: java.io.InputStream, buf: Array[Byte], n: Int): Int = {
    var off = 0
    var r = 0
    while (off < n && { r = in.read(buf, off, n - off); r >= 0 }) off += r
    off
  }

  /** Converts a decode-layer IOException (truncated/corrupt gzip
    * member, inflater error) into EOF — the clean-prefix posture: a
    * hostile or torn compressed tail yields the records before it
    * instead of killing the task. Wrap this around the DECODER, not
    * the raw filesystem stream, so genuine storage errors on
    * uncompressed data still fail the task honestly. */
  final class PrefixStream(in: java.io.InputStream) extends java.io.InputStream {
    private var dead = false
    override def read(): Int =
      if (dead) -1
      else try { val r = in.read(); if (r < 0) dead = true; r }
      catch { case _: java.io.IOException => dead = true; -1 }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      if (dead) -1
      else try { val r = in.read(b, off, len); if (r < 0) dead = true; r }
      catch { case _: java.io.IOException => dead = true; -1 }
    override def close(): Unit = in.close()
  }

  /** Pack (path, bytes) listings into tasks by cumulative size:
    * greedy size-descending into the currently-lightest bin (ties →
    * lowest bin), bin count = clamp(ceil(totalBytes/target),
    * min(floor, #files) .. min(#files, cap)). Within a task, files
    * keep lexical order. Deterministic: sorted by (-size, path), so a
    * task retry re-reads the identical file set. LPT-style bound: no
    * bin exceeds target + largest-single-file when byte count picks
    * the bin count (a single huge file is one task regardless — a
    * stream can't be split). */
  private[graft] def packBySize(sized: Seq[(String, Long)], target: Long,
                                floor: Int, cap: Int): Seq[Seq[String]] = {
    val total = sized.map(_._2).sum
    val byBytes = (total + target - 1) / math.max(1L, target)
    val withFloor = math.max(byBytes, math.min(floor, sized.size).toLong)
    val n = math.max(1L,
      math.min(withFloor, math.min(sized.size.toLong, cap.toLong))).toInt
    val bins = Array.fill(n)(
      scala.collection.mutable.ArrayBuffer.empty[String])
    val loads = Array.fill(n)(0L)
    sized.sortBy { case (p, s) => (-s, p) }.foreach { case (p, s) =>
      var b = 0
      var i = 1
      while (i < n) { if (loads(i) < loads(b)) b = i; i += 1 }
      bins(b) += p
      loads(b) += s
    }
    bins.toSeq.filter(_.nonEmpty).map(_.sorted.toSeq)
  }

  /** Matched files packed into tasks by cumulative byte size (default
    * target 1 GiB per task, task count capped): the old one-task-per-
    * file layout let a 10 GB crawl segment and a 1 KB robots file
    * cost one task each — stragglers — and a million-file glob made a
    * million-task stage. `f` receives (path, stream) per file and
    * returns the rows to emit; files in a task are walked
    * sequentially and each stream closes when its iterator exhausts
    * (plus a completion hook for early task exit). `decorate` wraps
    * the raw stream (e.g. gunzip) INSIDE the scaffold so the
    * OUTERMOST stream is what the hooks close — a caller-wrapped
    * decoder's close would never run, leaking its native inflater
    * buffers on long-lived executors. A glob matching nothing fails
    * loudly (as binaryFile did) — a typo'd path must not read an
    * empty corpus into a training run. */
  def perFile[T: scala.reflect.ClassTag](
      spark: SparkSession, pathGlob: String, what: String,
      decorate: (String, java.io.InputStream) => java.io.InputStream =
        (_, in) => in,
      targetTaskBytes: Long = 1L << 30,
      maxTasks: Int = 10000)(
      f: (String, java.io.InputStream) => Iterator[T])
      : org.apache.spark.rdd.RDD[T] = {
    val glob = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(glob)).map(_.toSeq).getOrElse(Seq.empty)
    val sized = matched
      .flatMap(st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st))
      .map(st => (st.getPath.toString, st.getLen))
      .sortBy(_._1)
    if (sized.isEmpty)
      throw new IllegalArgumentException(s"$what: no files match $pathGlob")
    val packed = packBySize(sized, targetTaskBytes,
      floor = spark.sparkContext.defaultParallelism, cap = maxTasks)
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.sparkContext
      .parallelize(packed, packed.size)
      .flatMap { group =>
        // one mutable close hook per task: points at the CURRENT
        // file's (decorated, raw) pair; iterator laziness means at
        // most one file is open at a time
        var closeCur: () => Unit = () => ()
        def closeOpen(): Unit = {
          val c = closeCur
          closeCur = () => ()
          try c() catch { case _: Throwable => () }
        }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null)
          tc.addTaskCompletionListener[Unit](_ => closeOpen())
        group.iterator.flatMap { path =>
          val hp = new org.apache.hadoop.fs.Path(path)
          val raw = new java.io.BufferedInputStream(
            hp.getFileSystem(bc.value.value).open(hp), 1 << 16)
          val in =
            try decorate(path, raw)
            catch { case e: Throwable => raw.close(); throw e }
          // decoder first, raw second: maybeGunzip's corrupt-header
          // branch returns a stream NOT wired to raw, so closing only
          // the decorated one could strand the file handle
          closeCur = () => { try in.close() finally raw.close() }
          val out = f(path, in)
          new scala.collection.AbstractIterator[T] {
            override def hasNext: Boolean = {
              val h = out.hasNext
              if (!h) closeOpen()
              h
            }
            override def next(): T = out.next()
          }
        }
      }
  }
}
