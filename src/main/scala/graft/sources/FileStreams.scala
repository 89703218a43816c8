package graft.sources

import org.apache.spark.sql.SparkSession

/** sources-internal scaffolding shared by the STREAMING container
  * readers (tar shards, WARC segments): driver-side glob listing with
  * one task per file, per-task Hadoop FS input streams closed at task
  * completion (and eagerly at iterator exhaustion), plus small stream
  * utilities. Peak task memory with these readers is bounded by the
  * largest RECORD/ENTRY, never the file — the old binaryFile path
  * materialized the whole file as one byte[] (2 GB JVM ceiling). */
private[sources] object FileStreams {

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

  /** One task per matched file; `f` receives (path, buffered stream)
    * and returns the rows to emit. The stream closes at task
    * completion, and eagerly once `f`'s iterator is exhausted. A
    * glob matching nothing fails loudly (as binaryFile did) — a
    * typo'd path must not read an empty corpus into a training run. */
  def perFile[T: scala.reflect.ClassTag](
      spark: SparkSession, pathGlob: String, what: String)(
      f: (String, java.io.InputStream) => Iterator[T])
      : org.apache.spark.rdd.RDD[T] = {
    val glob = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(glob)).map(_.toSeq).getOrElse(Seq.empty)
    val paths = matched
      .flatMap(st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st))
      .map(_.getPath.toString).sorted
    if (paths.isEmpty)
      throw new IllegalArgumentException(s"$what: no files match $pathGlob")
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .flatMap { path =>
        val hp = new org.apache.hadoop.fs.Path(path)
        val in = new java.io.BufferedInputStream(
          hp.getFileSystem(bc.value.value).open(hp), 1 << 16)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null)
          tc.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: Throwable => () })
        val out = f(path, in)
        new scala.collection.AbstractIterator[T] {
          override def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) { try in.close() catch { case _: Throwable => () } }
            h
          }
          override def next(): T = out.next()
        }
      }
  }
}
