package graft

import graft.sources.FileStreams

/** sources.FileStreams — size-weighted task packing for the streaming
  * container readers (WARC segments, tar shards). The contract at
  * crawl scale: a 10 GB segment and a 1 KB robots file must not cost
  * one task each (stragglers), and a huge glob must not make a
  * task-per-file stage; yet every file is read exactly once and a
  * task's file order is deterministic (retries re-read identical
  * sets). */
class FileStreamsSpec extends GraftSpec {

  private val GiB = 1L << 30

  test("skewed listing: huge file isolated, small files packed near target") {
    val huge = Seq(("seg-huge.warc.gz", 10 * GiB))
    val small = (0 until 1000).map(i => (f"robots-$i%04d.warc", 1L << 20))
    // floor below the byte-driven count so bytes pick the bin count:
    // ceil((10 GiB + 1000 MiB) / 1 GiB) = 11
    val packed = FileStreams.packBySize(huge ++ small, target = GiB,
      floor = 8, cap = 10000)
    assert(packed.size == 11, s"got ${packed.size} bins")
    // every file exactly once
    assert(packed.flatten.sorted == (huge ++ small).map(_._1).sorted)
    val sizeOf = (huge ++ small).toMap
    val loads = packed.map(_.map(sizeOf).sum)
    // the 10 GiB file rides alone: its bin is never the lightest again
    val hugeBin = packed.find(_.contains("seg-huge.warc.gz")).get
    assert(hugeBin.size == 1)
    // LPT bound for the rest: no bin above target + largest-packed-file
    loads.zip(packed).filterNot(_._2.contains("seg-huge.warc.gz"))
      .foreach { case (l, _) => assert(l <= GiB + (1L << 20), s"bin load $l") }
  }

  test("task-count cap holds against a listing that wants far more bins") {
    val files = (0 until 5000).map(i => (f"shard-$i%05d.tar", GiB))
    val packed = FileStreams.packBySize(files, target = GiB,
      floor = 32, cap = 100)
    assert(packed.size == 100)
    assert(packed.flatten.sorted == files.map(_._1))
    // even spread: 5000 equal files over 100 bins
    assert(packed.forall(_.size == 50))
  }

  test("small corpus keeps one file per task (parallelism floor)") {
    val files = (0 until 5).map(i => (s"f$i.warc", 100L))
    val packed = FileStreams.packBySize(files, target = GiB,
      floor = 32, cap = 10000)
    assert(packed.size == 5 && packed.forall(_.size == 1))
  }

  test("packing is deterministic and in-task order is lexical") {
    val files = (0 until 97).map(i => (f"f-$i%03d", (i % 7 + 1) * 1000L))
    val a = FileStreams.packBySize(files, 4000L, floor = 4, cap = 50)
    val b = FileStreams.packBySize(files, 4000L, floor = 4, cap = 50)
    assert(a == b)
    a.foreach(bin => assert(bin == bin.sorted))
  }

  test("multi-file task reads every file sequentially, content intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fs").toString
    val expect = (0 until 6).map { i =>
      val p = java.nio.file.Paths.get(dir, f"part-$i%02d.txt")
      val body = s"payload-$i-" + ("x" * (10 * (i + 1)))
      java.nio.file.Files.write(p, body.getBytes("UTF-8"))
      (p.toString, body)
    }
    // force ALL files through ONE task: the sequential open/read/close
    // walk is the path a packed crawl task takes
    val rows = FileStreams.perFile(spark, s"$dir/*.txt", "spec",
      targetTaskBytes = 1L, maxTasks = 1) { (path, in) =>
      val bytes = in.readAllBytes()
      Iterator.single((path, new String(bytes, "UTF-8")))
    }.collect()
    assert(rows.length == 6)
    // Hadoop listings come back scheme-qualified (file:/...)
    assert(rows.map { case (p, b) => (p.stripPrefix("file:"), b) }
      .sortBy(_._1).toSeq == expect.sortBy(_._1),
      "per-file content must survive the shared-task walk")
  }
}
