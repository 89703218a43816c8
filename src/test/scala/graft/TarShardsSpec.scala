package graft

import org.apache.spark.sql.functions._
import graft.sources.TarShards

/** sources.TarShards — WebDataset-style tar shards. The USTAR framing
  * is pinned three ways: writer→reader round-trip, a HAND-BUILT
  * archive (independent of the writer) through the reader, and the
  * writer's bytes against hand-computed header fields. */
class TarShardsSpec extends GraftSpec {

  import spark.implicits._

  private def sample(i: Long) = (i, Seq(
    ("json", s"""{"id":$i}""".getBytes("UTF-8")),
    ("txt", s"document $i text".getBytes("UTF-8"))))

  test("write -> read round-trip: samples regroup by key, entries byte-exact, manifest counts") {
    val df = (1L to 30L).map(sample).toDF("id", "entries")
      .withColumn("entries", expr(
        "transform(entries, e -> named_struct('name', e._1, 'content', e._2))"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tar").toString
    val manifest = TarShards.writeShardsTar(df, "id", "entries", nShards = 3, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manifest.values.sum == 30L && manifest.size == 3)
    val samples = TarShards.readTarSamples(spark, s"$dir/*.tar").collect()
    assert(samples.length == 30)
    samples.foreach { r =>
      val key = r.getAs[String]("key").toLong
      val entries = r.getAs[Map[String, Array[Byte]]]("entries")
      assert(entries.keySet == Set("json", "txt"), entries.keySet.toString)
      assert(new String(entries("json"), "UTF-8") == s"""{"id":$key}""")
      assert(new String(entries("txt"), "UTF-8") == s"document $key text")
    }
    // byte-stable re-export under different partitioning
    val f0 = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
      .minBy(_.getName)
    val before = java.nio.file.Files.readAllBytes(f0.toPath)
    TarShards.writeShardsTar(df.repartition(7), "id", "entries", 3, dir).collect()
    val after = java.nio.file.Files.readAllBytes(f0.toPath)
    assert(java.util.Arrays.equals(before, after))
  }

  test("GNU tar (a genuinely independent implementation) lists the written shards") {
    assume(new java.io.File("/usr/bin/tar").exists() ||
      new java.io.File("/bin/tar").exists(), "no system tar")
    val df = (1L to 6L).map(sample).toDF("id", "entries")
      .withColumn("entries", expr(
        "transform(entries, e -> named_struct('name', e._1, 'content', e._2))"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_gnu").toString
    TarShards.writeShardsTar(df, "id", "entries", nShards = 1, dir).collect()
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val p = new ProcessBuilder("tar", "-tf", shard.getAbsolutePath)
      .redirectErrorStream(true).start()
    val listed = scala.io.Source.fromInputStream(p.getInputStream).getLines().toVector
    assert(p.waitFor() == 0, listed.mkString("\n"))
    assert(listed.size == 12, listed.mkString(","))  // 6 samples × 2 files
    assert(listed.forall(n => n.endsWith(".json") || n.endsWith(".txt")), listed.head)
  }

  test("the writer's bytes ARE valid USTAR: hand-checked header fields") {
    val bos = new java.io.ByteArrayOutputStream()
    TarShards.writeTarEntry(bos, "000000000007.txt", "hello".getBytes("UTF-8"))
    val b = bos.toByteArray
    assert(b.length == 512 + 512) // header + one padded data block
    assert(new String(b, 0, 16, "UTF-8") == "000000000007.txt")
    assert(new String(b, 124, 11, "UTF-8") == "00000000005") // size 5 octal
    assert(new String(b, 257, 5, "UTF-8") == "ustar")
    assert(b(156) == '0')
    // checksum: recompute with the checksum field as spaces
    var sum = 0
    for (i <- 0 until 512) sum += (if (i >= 148 && i < 156) ' '.toInt else b(i) & 0xff)
    assert(Integer.parseInt(new String(b, 148, 6, "UTF-8"), 8) == sum)
    assert(new String(b, 512, 5, "UTF-8") == "hello")
    assert(b.slice(517, 1024).forall(_ == 0)) // zero padding to the block edge
  }

  test("a hand-built archive (independent bytes) parses; corruption obeys the posture") {
    // build an archive with the SPEC'S OWN header code, not the writer's
    def hdr(name: String, size: Int): Array[Byte] = {
      val h = new Array[Byte](512)
      def put(s: String, off: Int): Unit = {
        val bs = s.getBytes("UTF-8"); System.arraycopy(bs, 0, h, off, bs.length)
      }
      put(name, 0); put("0000644", 100); put("0000000", 108); put("0000000", 116)
      put(f"$size%011o", 124); put("00000000000", 136)
      for (i <- 148 until 156) h(i) = ' '
      h(156) = '0'; put("ustar", 257); put("00", 263)
      var s = 0; for (i <- 0 until 512) s += h(i) & 0xff
      put(f"$s%06o", 148); h(155) = ' '
      h
    }
    val data = "independent".getBytes("UTF-8")
    val pad = new Array[Byte](512 - data.length)
    val arch = hdr("k.txt", data.length) ++ data ++ pad ++ new Array[Byte](1024)
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_hand").toString
    java.nio.file.Files.write(new java.io.File(dir, "h.tar").toPath, arch)
    val rows = TarShards.readTarFiles(spark, s"$dir/*.tar").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("name") == "k.txt")
    assert(new String(rows(0).getAs[Array[Byte]]("content"), "UTF-8") == "independent")
    // corrupt the header: strict throws, tolerant yields the clean prefix (none)
    val bad = arch.clone(); bad(30) = 'X'
    val badDir = java.nio.file.Files.createTempDirectory("graft_tar_bad").toString
    java.nio.file.Files.write(new java.io.File(badDir, "b.tar").toPath, bad)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception](
      TarShards.readTarFiles(spark, s"$badDir/*.tar").count())
    assert(msgs(e).exists(_.contains("checksum")), msgs(e).take(3).mkString(" | "))
    assert(TarShards.readTarFiles(spark, s"$badDir/*.tar", strict = false).count() == 0)
  }

  test("e2e: WebDataset image shards -> sniff -> perceptual dedup across shards") {
    import graft.multimodal.Multimodal
    // samples: BMP image + JSON sidecar; half the corpus is PNG
    // RE-ENCODES of the other half's pixels under new ids (the
    // cross-container near-dup the perceptual hash exists to catch)
    val bmps = (0L until 6L).map(i => i -> Multimodal.bmpBytes(16, 12, i))
    def pngCopy(b: Array[Byte]): Array[Byte] = {
      val (w, h, px) = Multimodal.decodeBmp(b)
      Multimodal.pngFromBgr(w, h, px)
    }
    val rows = bmps.map { case (i, b) =>
      (i, Seq(("img", b), ("json", s"""{"id":$i}""".getBytes("UTF-8"))))
    } ++ bmps.map { case (i, b) =>
      (100L + i, Seq(("img", pngCopy(b)), ("json", s"""{"id":${100 + i}}""".getBytes("UTF-8"))))
    }
    val df = rows.toDF("id", "entries").withColumn("entries", expr(
      "transform(entries, e -> named_struct('name', e._1, 'content', e._2))"))
    val dir = java.nio.file.Files.createTempDirectory("graft_wds").toString
    TarShards.writeShardsTar(df, "id", "entries", nShards = 4, dir).collect()
    // ingest: samples -> media frame -> perceptual hash -> dedup
    val media = TarShards.readTarSamples(spark, s"$dir/*.tar")
      .select(col("key").cast("long").as("media_id"),
        col("entries")("img").as("content"))
    val hashed = Multimodal.withPerceptualHash(
      media.withColumn("kind", lit("image")))
    val dups = graft.ml.Dedup.hammingPairs(hashed, "media_id", "phash", maxDist = 0)
      .select(col("id_b").as("media_id")).distinct()
    val kept = hashed.join(dups, Seq("media_id"), "left_anti")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 6L).toSet,
      s"every PNG re-encode must collapse onto its BMP original: $kept")
  }

  test("tar walk is INCREMENTAL: first entry pulled consumes one entry, not the shard") {
    val bos = new java.io.ByteArrayOutputStream()
    for (i <- 0 until 100)
      TarShards.writeTarEntry(bos, f"$i%06d.bin", Array.fill(10000)(i.toByte))
    bos.write(TarShards.tarFooter)
    val bytes = bos.toByteArray
    class CountingIn(b: Array[Byte]) extends java.io.ByteArrayInputStream(b) {
      def consumed: Int = pos
    }
    val cin = new CountingIn(bytes)
    val it = TarShards.parseTarStream(cin, strict = true)
    val (nm, data) = it.next()
    assert(nm == "000000.bin" && data.length == 10000)
    // peak consumption after one pull: one header + one padded payload
    // (+ one lookahead header) — the other 99 entries are untouched,
    // so task memory is bounded by the ENTRY, not the shard
    assert(cin.consumed <= 2 * 512 + 10240,
      s"consumed=${cin.consumed} of ${bytes.length}")
    assert(it.size == 99)
  }

  test("sample ingest is MAP-ONLY: no Exchange — grouping rides tar adjacency") {
    val df = (1L to 4L).map(sample).toDF("id", "entries")
      .withColumn("entries", expr(
        "transform(entries, e -> named_struct('name', e._1, 'content', e._2))"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_plan").toString
    TarShards.writeShardsTar(df, "id", "entries", nShards = 1, dir).collect()
    val p = TarShards.readTarSamples(spark, s"$dir/*.tar")
      .queryExecution.executedPlan.toString
    // WebDataset's layout contract (a sample's files are consecutive)
    // means regrouping never needs a shuffle of the media bytes
    assert(!p.contains("Exchange"), p)
    // two same-key runs separated by another key are two samples —
    // the sequential-trainer view, pinned against regressions toward
    // a global groupBy
    val split = java.io.File.createTempFile("graft_split", ".tar",
      new java.io.File(dir))
    val bos = new java.io.ByteArrayOutputStream()
    TarShards.writeTarEntry(bos, "a.txt", "first".getBytes("UTF-8"))
    TarShards.writeTarEntry(bos, "b.txt", "mid".getBytes("UTF-8"))
    TarShards.writeTarEntry(bos, "a.json", "second-run".getBytes("UTF-8"))
    bos.write(TarShards.tarFooter)
    java.nio.file.Files.write(split.toPath, bos.toByteArray)
    val runs = TarShards.readTarSamples(spark, split.getAbsolutePath).collect()
    assert(runs.length == 3, runs.mkString(","))
    assert(runs.count(_.getAs[String]("key") == "a") == 2)
  }

  test("a space is a legal filename byte: names round-trip untruncated") {
    // POSIX terminates the NAME field at NUL only; space-terminating
    // (correct for the octal fields) would silently truncate
    // 'cover image.jpg' — pin the full round trip, reader and writer
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_space").toString
    val bos = new java.io.ByteArrayOutputStream()
    TarShards.writeTarEntry(bos, "cover image.jpg", "px".getBytes("UTF-8"))
    bos.write(TarShards.tarFooter)
    java.nio.file.Files.write(new java.io.File(dir, "s.tar").toPath, bos.toByteArray)
    val names = TarShards.readTarFiles(spark, s"$dir/*.tar")
      .collect().map(_.getAs[String]("name"))
    assert(names.toSeq == Seq("cover image.jpg"), names.mkString(","))
    // and through the sample writer/reader pair
    val df = Seq((7L, Seq(("cover image.jpg", "px".getBytes("UTF-8")))))
      .toDF("id", "entries").withColumn("entries", expr(
        "transform(entries, e -> named_struct('name', e._1, 'content', e._2))"))
    val dir2 = java.nio.file.Files.createTempDirectory("graft_tar_space2").toString
    TarShards.writeShardsTar(df, "id", "entries", 1, dir2)
    val entries = TarShards.readTarSamples(spark, s"$dir2/*.tar")
      .collect().head.getAs[Map[String, Array[Byte]]]("entries")
    assert(entries.keySet == Set("cover image.jpg"), entries.keySet.toString)
  }

  test("a duplicate suffix within one sample refuses (a map would drop a file)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_dup").toString
    val bos = new java.io.ByteArrayOutputStream()
    TarShards.writeTarEntry(bos, "k.txt", "one".getBytes("UTF-8"))
    TarShards.writeTarEntry(bos, "k.txt", "two".getBytes("UTF-8"))
    bos.write(TarShards.tarFooter)
    java.nio.file.Files.write(new java.io.File(dir, "d.tar").toPath, bos.toByteArray)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception](
      TarShards.readTarSamples(spark, s"$dir/*.tar").count())
    assert(msgs(e).exists(_.contains("duplicate suffix")),
      msgs(e).take(3).mkString(" | "))
    // the flat file view is the duplicate-tolerant escape hatch
    assert(TarShards.readTarFiles(spark, s"$dir/*.tar").count() == 2L)
  }

  test("the write is EAGER and exactly-once: files land even if the manifest is dropped") {
    val df = (1L to 5L).map(sample).toDF("id", "entries")
      .withColumn("entries", expr(
        "transform(entries, e -> named_struct('name', e._1, 'content', e._2))"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_eager").toString
    TarShards.writeShardsTar(df, "id", "entries", nShards = 2, dir) // manifest DROPPED
    val tars = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
    assert(tars.nonEmpty, "dropping the manifest must not skip the write")
    assert(TarShards.readTarSamples(spark, s"$dir/*.tar").count() == 5L)
  }

  test("a data error refuses BEFORE any shard file opens — no torn partial export") {
    def entriesDf(rows: Seq[(Long, Seq[(String, Array[Byte])])]) =
      rows.toDF("id", "entries").withColumn("entries", expr(
        "transform(entries, e -> named_struct('name', e._1, 'content', e._2))"))
    // duplicate entry name within one sample: the writer must reject
    // what readTarSamples rejects — an export that "succeeds" but can
    // never be read back is worse than a failure
    val dupDir = java.nio.file.Files.createTempDirectory("graft_tar_dupw").toString
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception](TarShards.writeShardsTar(
      entriesDf(Seq((1L, Seq(("txt", "a".getBytes("UTF-8")),
        ("txt", "b".getBytes("UTF-8")))))), "id", "entries", 1, dupDir))
    assert(msgs(e).exists(_.contains("duplicate entry name")),
      msgs(e).take(3).mkString(" | "))
    assert(new java.io.File(dupDir).listFiles().forall(!_.getName.endsWith(".tar")),
      "no torn shard may survive a validation failure")
    // an EMPTY entries array refuses: a zero-file sample would be
    // counted by the manifest but invisible to the reader and audit
    val emptyDir = java.nio.file.Files.createTempDirectory("graft_tar_empty").toString
    val e3 = intercept[Exception](TarShards.writeShardsTar(
      entriesDf(Seq((1L, Seq.empty[(String, Array[Byte])]))), "id", "entries",
      1, emptyDir))
    assert(msgs(e3).exists(_.contains("EMPTY entries")),
      msgs(e3).take(3).mkString(" | "))
    // a DUPLICATE sample id refuses: two same-id samples would write
    // consecutive same-key files the reader merges — then refuses
    val dupIdDir = java.nio.file.Files.createTempDirectory("graft_tar_dupid").toString
    val e4 = intercept[Exception](TarShards.writeShardsTar(
      entriesDf(Seq(
        (5L, Seq(("txt", "a".getBytes("UTF-8")))),
        (5L, Seq(("json", "b".getBytes("UTF-8")))))), "id", "entries",
      1, dupIdDir))
    assert(msgs(e4).exists(_.contains("duplicate sample id")),
      msgs(e4).take(3).mkString(" | "))
    // oversized name: same contract — caught in the validate pass, not
    // mid-stream after hundreds of samples already hit the file
    val bigDir = java.nio.file.Files.createTempDirectory("graft_tar_bigw").toString
    val e2 = intercept[Exception](TarShards.writeShardsTar(
      entriesDf(Seq((1L, Seq(("ok", "a".getBytes("UTF-8")))),
        (2L, Seq(("y" * 120, "b".getBytes("UTF-8")))))), "id", "entries", 1, bigDir))
    assert(msgs(e2).exists(_.contains("100 bytes")), msgs(e2).take(3).mkString(" | "))
    assert(new java.io.File(bigDir).listFiles().forall(!_.getName.endsWith(".tar")))
  }

  test("strict refuses a shard truncated at an entry boundary (missing footer)") {
    val bos = new java.io.ByteArrayOutputStream()
    TarShards.writeTarEntry(bos, "a.txt", "one".getBytes("UTF-8"))
    TarShards.writeTarEntry(bos, "b.txt", "two".getBytes("UTF-8"))
    val noFooter = bos.toByteArray // valid entries, footer never written
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_trunc").toString
    java.nio.file.Files.write(new java.io.File(dir, "t.tar").toPath, noFooter)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception](
      TarShards.readTarFiles(spark, s"$dir/*.tar").count())
    assert(msgs(e).exists(_.contains("end-of-archive")),
      msgs(e).take(3).mkString(" | "))
    // non-strict: the clean prefix survives (both entries parsed fine)
    assert(TarShards.readTarFiles(spark, s"$dir/*.tar", strict = false).count() == 2L)
  }

  test("null samples and oversized names are refused, not silently dropped") {
    val ok = Seq((1L, Seq(("txt", "x".getBytes("UTF-8"))))).toDF("id", "entries")
      .withColumn("entries", expr(
        "transform(entries, e -> named_struct('name', e._1, 'content', e._2))"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_null").toString
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val nullEntries = Seq((1L, null.asInstanceOf[Seq[(String, Array[Byte])]]))
      .toDF("id", "entries")
      .withColumn("entries", expr(
        "transform(entries, e -> named_struct('name', e._1, 'content', e._2))"))
    val e = intercept[Exception](
      TarShards.writeShardsTar(nullEntries, "id", "entries", 2, dir).collect())
    assert(msgs(e).exists(_.contains("null entries")), msgs(e).take(3).mkString(" | "))
    val e2 = intercept[Exception](TarShards.writeShardsTar(
      Seq((1L, Seq(("y" * 120, "x".getBytes("UTF-8"))))).toDF("id", "entries")
        .withColumn("entries", expr(
          "transform(entries, e -> named_struct('name', e._1, 'content', e._2))")),
      "id", "entries", 2, dir).collect())
    assert(msgs(e2).exists(_.contains("100 bytes")), msgs(e2).take(3).mkString(" | "))
    // and the happy path still writes
    assert(TarShards.writeShardsTar(ok, "id", "entries", 2, dir)
      .collect().map(_.getLong(1)).sum == 1L)
  }
}
