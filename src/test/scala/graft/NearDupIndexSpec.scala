package graft

import graft.ml.Dedup

/** Persisted near-dup corpus index: probe equivalence with the inline
  * path, probe-time threshold, params round-trip, layout. */
class NearDupIndexSpec extends GraftSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "pack my box with five dozen liquor jugs for the journey north"),
      (2L, "sphinx of black quartz judge my vow said the old librarian"))
      .toDF("doc_id", "text")
  }

  // batch: 10 near-copies of corpus doc 0 (small suffix edits), 10
  // fresh rows — the dup half must drop, the fresh half must survive
  private def batch = {
    import spark.implicits._
    ((0 until 10).map(i =>
      (100L + i, s"the quick brown fox jumps over the lazy dog again and again $i")) ++
      (0 until 10).map(i =>
        (200L + i, s"completely unrelated content number $i with its own words entirely")))
      .toDF("doc_id", "text")
  }

  test("indexed probe keeps exactly what the inline path keeps") {
    val dir = java.nio.file.Files.createTempDirectory("ndidx").toString
    val inline = Dedup.dedupAgainstNear(batch, corpus, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.7, shingleSize = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    Dedup.buildNearDupIndex(corpus, "doc_id", "text", dir,
      numHashes = 64, bands = 16, shingleSize = 4)
    val indexed = Dedup.dedupAgainstNearIndexed(batch, dir, "doc_id", "text",
        threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed == inline, s"indexed=$indexed inline=$inline")
    // and the dedup did real work: dup half dropped, fresh half kept
    assert(indexed == (200L until 210L).toSet, indexed.toString)
  }

  test("threshold stays a probe-time knob on one build") {
    val dir = java.nio.file.Files.createTempDirectory("ndidx").toString
    Dedup.buildNearDupIndex(corpus, "doc_id", "text", dir,
      numHashes = 64, bands = 16, shingleSize = 4)
    val strict = Dedup.dedupAgainstNearIndexed(batch, dir, "doc_id", "text",
      threshold = 0.999).count()
    val loose = Dedup.dedupAgainstNearIndexed(batch, dir, "doc_id", "text",
      threshold = 0.5).count()
    // 0.999 ≈ "signatures fully agree": only the near-copies whose
    // one-char suffix shifts NO minimum drop (a strict subset); 0.5
    // drops all 10 near-copies. The knob must act monotonically and
    // with real effect — without a rebuild.
    assert(loose == 10L, loose.toString)
    assert(strict > loose && strict <= 20L, s"strict=$strict loose=$loose")
  }

  test("banding params ride INSIDE the anchors table — one atomic write, no desync") {
    val dir = java.nio.file.Files.createTempDirectory("ndidx").toString
    Dedup.buildNearDupIndex(corpus, "doc_id", "text", dir,
      numHashes = 32, bands = 8, shingleSize = 3, maxPartners = 7)
    // single artifact: params are constant columns of the anchor rows
    // (an interrupted rebuild can never pair new anchors with stale
    // params), and there is no separate params file to drift
    assert(!new java.io.File(s"$dir/params").exists())
    val p = spark.read.parquet(s"$dir/anchors").collect().head
    assert(p.getAs[Int]("num_hashes") == 32 && p.getAs[Int]("bands") == 8 &&
      p.getAs[Int]("shingle_size") == 3 && p.getAs[Int]("max_partners") == 7)
    // and the probe runs green against the non-default banding
    val kept = Dedup.dedupAgainstNearIndexed(batch, dir, "doc_id", "text",
      threshold = 0.7).count()
    assert(kept == 10L, kept.toString)
  }

  test("an empty index keeps the whole batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ndidx").toString
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    Dedup.buildNearDupIndex(empty, "doc_id", "text", dir,
      numHashes = 64, bands = 16, shingleSize = 4)
    val kept = Dedup.dedupAgainstNearIndexed(batch, dir, "doc_id", "text",
      threshold = 0.7).count()
    assert(kept == 20L, kept.toString)
  }

  test("null batch ids survive the indexed probe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ndidx").toString
    Dedup.buildNearDupIndex(corpus, "doc_id", "text", dir,
      numHashes = 64, bands = 16, shingleSize = 4)
    val b = Seq(
      (java.lang.Long.valueOf(100L),
        "the quick brown fox jumps over the lazy dog again and again x"),
      (null.asInstanceOf[java.lang.Long],
        "the quick brown fox jumps over the lazy dog again and again y"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstNearIndexed(b, dir, "doc_id", "text",
        threshold = 0.7)
      .collect().map(r => Option(r.get(0))).toSet
    assert(kept == Set(None), kept.toString) // dup dropped, null survived
  }
}
