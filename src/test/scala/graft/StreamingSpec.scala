package graft

import graft.streaming.StreamVerbs
import graft.streaming.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp
import org.apache.spark.sql.functions.col

/** Structured Streaming verbs driven through MemoryStream + memory sink. */
class StreamingSpec extends GraftSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("tumbling window counts with watermark over a stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamVerbs.tumblingCounts(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(12), 2, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling").collect()
      assert(rows.length == 2)
      val clicks = rows.find(_.getAs[String]("event_type") == "click").get
      assert(clicks.getAs[Long]("n") == 2L)
      assert(clicks.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("hopping window counts: each event lands in window/slide overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamVerbs.hoppingCounts(in.toDF(), "20 minutes", "5 minutes", "5 minutes")
      .writeStream.format("memory").queryName("hopping")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(Event(1, ts(7), 1, "click", 2.0))
      q.processAllAvailable()
      val rows = spark.table("hopping")
        .select(col("window.start").cast("long").as("s"), col("n"), col("sum_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // 20m/5m = 4 windows contain minute 7; each counts the event once
      assert(rows.length == 4, rows.mkString(","))
      assert(rows.forall(r => r._2 == 1L && r._3 == 2.0))
      val starts = rows.map(_._1).sorted
      assert(starts.sliding(2).forall(p => p(1) - p(0) == 300), starts.mkString(","))
    } finally q.stop()
  }

  test("cross-codec audio dedup AT INGEST: a FLAC transcode collapses onto its WAV original") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.multimodal.Multimodal
    // broadband clip (the fingerprint's home turf), as WAV then FLAC
    val pcm = Array.tabulate[Short](16000) { j =>
      val t = j / 16000.0
      var s = 0.0
      for (h <- 1 to 10)
        s += (4500.0 / h) * (0.5 + 0.5 * math.sin(2 * math.Pi * (0.7 + 0.13 * h) * t)) *
          math.sin(2 * math.Pi * 350.0 * h * t)
      math.max(Short.MinValue, math.min(Short.MaxValue, math.rint(s).toLong)).toShort
    }
    val wav = Multimodal.pcmWavBytes(16000, pcm)
    val flac = graft.multimodal.Flac.flacBytes(16000, pcm)
    val distinct = Multimodal.pcmWavBytes(8000, Array.tabulate[Short](9000)(i =>
      (6000 * math.sin(i / 3.0) + 2000 * math.sin(i / 17.0)).toShort))
    val in = MemoryStream[(Long, Timestamp, Array[Byte])]
    val docs = in.toDF().toDF("media_id", "ts", "content")
    val q = StreamVerbs.streamingSignatureDedup(
        Multimodal.withAudioFingerprint(docs), "audio_fp", "ts", lateness = "1 hour")
      .select("media_id")
      .writeStream.format("memory").queryName("flac_ingest")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, ts(0), wav), (2L, ts(1), distinct))
      q.processAllAvailable()
      in.addData((100L, ts(10), flac)) // the archival re-encode arrives later
      q.processAllAvailable()
      val kept = spark.table("flac_ingest").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L), kept.toString) // FLAC copy collapsed exactly
    } finally q.stop()
  }

  test("streaming trending keys: bounded sketch per window, merged across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    // counters=2 with 3 distinct keys per window: evictions are ON the
    // path, and the guarantee (keys above n/(m+1) tracked, counts are
    // lower bounds) must hold over state merged across micro-batches
    val q = StreamVerbs.streamingTopK(in.toDF(), "event_type", "ts",
        "10 minutes", "5 minutes", counters = 2)
      .writeStream.format("memory").queryName("trending")
      .outputMode(OutputMode.Complete()).start()
    try {
      // window [0,10): click x4, view x2, misc x1 — two batches
      in.addData(
        Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 1.0),
        Event(3, ts(2), 1, "click", 1.0), Event(4, ts(3), 2, "click", 1.0))
      q.processAllAvailable()
      in.addData(
        Event(5, ts(4), 2, "misc", 1.0), Event(6, ts(5), 2, "view", 1.0),
        Event(7, ts(6), 3, "click", 1.0),
        // null key: IGNORED (batch HeavyHitters contract) — unfiltered
        // it would become a null sketch-map key and kill the query
        Event(10, ts(7), 3, null, 1.0),
        // window [10,20): one heavy key only
        Event(8, ts(12), 3, "buy", 1.0), Event(9, ts(13), 3, "buy", 1.0))
      q.processAllAvailable()
      val rows = spark.table("trending").collect()
        .map(r => r.getAs[Long]("n_total") ->
          r.getAs[Map[String, Long]]("counts")).sortBy(_._1)
      assert(rows.length == 2)
      val (n2, counts2) = rows.head // the buy window
      assert(n2 == 2L && counts2 == Map("buy" -> 2L))
      val (n1, counts1) = rows.last
      assert(n1 == 7L)
      assert(counts1.size <= 2, s"sketch exceeded its 2-counter budget: $counts1")
      // click (freq 4) > 7/3: guaranteed tracked, count a lower bound
      // undercounting by at most n/(m+1) = 2
      assert(counts1.contains("click"), s"lost the heavy key: $counts1")
      assert(counts1("click") <= 4L && counts1("click") >= 2L, counts1.toString)
    } finally q.stop()
  }

  test("gap-based sessionization closes sessions across the gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamVerbs.sessionize(in.toDS(), gapMs = 10 * 60000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // two bursts for user 1 separated by > gap, one event for user 2
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(30), 1, "view", 4.0),
        Event(4, ts(0), 2, "view", 9.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[Session].collect()
      // the first burst closed when the 30-min event arrived
      assert(sessions.length == 1)
      assert(sessions(0).user_id == 1 && sessions(0).n_events == 2
        && sessions(0).sum_value == 3.0)
    } finally q.stop()
  }

  test("streaming dedup drops key repeats within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamVerbs.streamingDedup(in.toDF(), Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("streaming content dedup drops textual duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamVerbs.streamingContentDedup(docs, "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("cdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, ts(0), "the quick brown fox"),
        (2L, ts(1), "The  quick   brown fox"), // normalizes to the same content
        (3L, ts(2), "something else entirely"))
      q.processAllAvailable()
      assert(spark.table("cdedup").count() == 2)
    } finally q.stop()
  }

  test("streaming surgical decontamination cuts shared spans, batch-identical, stateless") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val reference = Seq(s"QUESTION: $passage ANSWER: 42").toDF("text")
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamVerbs.streamCutAgainst(docs, "text", reference, "text", minLen = 40)
      .writeStream.format("memory").queryName("cut_against")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, ts(0), s"my own intro then $passage and my own outro"),
        (2L, ts(1), "entirely original writing with no benchmark overlap"))
      q.processAllAvailable()
      in.addData((3L, ts(2), s"second batch quoting $passage too"))
      q.processAllAvailable()
      val out = spark.table("cut_against").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("clean_text"), r.getAs[Int]("dup_spans"))).toMap
      assert(out(2L)._2 == 0)
      assert(out(1L)._2 == 1 && !out(1L)._1.contains("quick brown fox"))
      assert(out(3L)._2 == 1 && !out(3L)._1.contains("quick brown fox"))
      // batch-identical via the join path on the same rows
      val batch = Seq(
        (1L, s"my own intro then $passage and my own outro"),
        (2L, "entirely original writing with no benchmark overlap"),
        (3L, s"second batch quoting $passage too")).toDF("doc_id", "text")
      val bk = graft.text.ExactSubstr
        .cutAgainst(batch, "doc_id", "text", reference, "text", minLen = 40)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("clean_text"), r.getAs[Int]("dup_spans"))).toMap
      assert(bk == out)
    } finally q.stop()
  }

  test("stream dedup against a standing corpus: the live ingest loop, batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "an existing corpus document")).toDF("doc_id", "text")
    val hashes = graft.ml.Dedup.corpusContentHashes(corpus, "text", "content_hash")
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamVerbs.streamDedupAgainstCorpus(docs, hashes, "text")
      .writeStream.format("memory").queryName("cdedup_against")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        // normalization-equal to corpus 10: dropped
        (1L, ts(0), "  The QUICK brown fox jumps over the lazy   dog"),
        (2L, ts(1), "genuinely new content"))
      q.processAllAvailable()
      in.addData(
        (3L, ts(2), "an existing corpus document"), // corpus 11: dropped
        (4L, ts(3), "genuinely new content"))       // NOT intra-stream deduped
      q.processAllAvailable()
      val kept = spark.table("cdedup_against").collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(2L, 4L), kept.mkString(","))
      // batch-identical keep-set via the batch twin on the same rows
      val batch = Seq((1L, "  The QUICK brown fox jumps over the lazy   dog"),
        (2L, "genuinely new content"), (3L, "an existing corpus document"),
        (4L, "genuinely new content")).toDF("doc_id", "text")
      val bk = graft.ml.Dedup.dedupAgainstExact(batch, corpus, "text")
        .collect().map(_.getLong(0)).sorted
      assert(bk.toSeq == kept.toSeq)
    } finally q.stop()
    // refuse-early: a stream already carrying the hash column must not
    // be silently overwritten-and-dropped
    val clash = in.toDF().toDF("doc_id", "ts", "text")
      .withColumn("content_hash", org.apache.spark.sql.functions.lit(1L))
    val e = intercept[IllegalArgumentException] {
      StreamVerbs.streamDedupAgainstCorpus(clash, hashes, "text")
    }
    assert(e.getMessage.contains("content_hash"))
  }

  test("semantic blocklist drops near-eval vectors from a live stream, keeps nulls") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, when}
    // blocklist direction (1,0) PLUS a zero vector: zero-norm cosines
    // are NaN, and Spark orders NaN above every double — unguarded,
    // `NaN >= t` is TRUE and the zero entry would drop the whole
    // stream. A scaled copy (cos=1) and a nearby vector (cos≈0.95)
    // must drop; an orthogonal one must survive.
    val block = Seq(Tuple1(Seq(1.0f, 0.0f)), Tuple1(Seq(0.0f, 0.0f))).toDF("vec")
    val in = MemoryStream[(Long, Seq[Float])]
    val docs = in.toDF().toDF("doc_id", "emb")
      .withColumn("emb", when(col("doc_id") === 4L,
        lit(null).cast("array<float>")).otherwise(col("emb")))
    val q = StreamVerbs.streamSemanticBlocklist(docs, block, "emb", "vec",
        threshold = 0.9)
      .writeStream.format("memory").queryName("semblock")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, Seq(5.0f, 0.0f)),   // scaled copy of the blocked direction
        (2L, Seq(1.0f, 0.33f)),  // cos ≈ 0.95: blocked
        (3L, Seq(0.0f, 1.0f)),   // orthogonal: survives
        (4L, Seq(9.0f, 9.0f)))   // vector nulled above: survives
      q.processAllAvailable()
      val kept = spark.table("semblock").collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(3L, 4L), kept.mkString(","))
    } finally q.stop()
  }

  test("stream-static enrich broadcast-joins a dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "trial")).toDF("user_id", "tier")
    val in = MemoryStream[Event]
    val q = StreamVerbs.enrich(in.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 9, "view", 2.0)) // no dim row -> null tier
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
      assert(rows.length == 2)
      assert(rows.find(_.getAs[Long]("user_id") == 1L).get.getAs[String]("tier") == "gold")
      assert(rows.find(_.getAs[Long]("user_id") == 9L).get.getAs[String]("tier") == null)
    } finally q.stop()
  }

  test("stream-stream interval join matches only within the time range") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val lIn = MemoryStream[Event]
    val rIn = MemoryStream[Event]
    // impressions ↔ clicks: key user_id, click within 10 min after the
    // impression; non-key columns renamed disjoint per the verb contract
    val imps = lIn.toDF().select(col("user_id"), col("ts"),
      col("event_id").as("imp_id"))
    val clicks = rIn.toDF().select(col("user_id"), col("ts").as("ts_r"),
      col("event_id").as("click_id"))
    val q = StreamVerbs.intervalJoin(imps, "ts", clicks, "ts_r", Seq("user_id"),
        before = "0 minutes", after = "10 minutes", lateness = "30 minutes")
      .writeStream.format("memory").queryName("ijoin")
      .outputMode(OutputMode.Append()).start()
    try {
      lIn.addData(
        Event(10, ts(0), 1, "imp", 0.0),
        Event(11, ts(0), 2, "imp", 0.0))
      rIn.addData(
        Event(20, ts(5), 1, "click", 0.0),  // in range → the one match
        Event(21, ts(25), 1, "click", 0.0), // outside [ts, ts+10m]
        Event(22, ts(5), 3, "click", 0.0))  // no impression for user 3
      q.processAllAvailable()
      val rows = spark.table("ijoin").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("imp_id") == 10L &&
        rows(0).getAs[Long]("click_id") == 20L &&
        rows(0).getAs[Long]("user_id") == 1L)
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched rows after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val lIn = MemoryStream[Event]
    val rIn = MemoryStream[Event]
    val imps = lIn.toDF().select(col("user_id"), col("ts"),
      col("event_id").as("imp_id"))
    val clicks = rIn.toDF().select(col("user_id"), col("ts").as("ts_r"),
      col("event_id").as("click_id"))
    val q = StreamVerbs.intervalJoin(imps, "ts", clicks, "ts_r", Seq("user_id"),
        before = "0 minutes", after = "5 minutes", lateness = "10 minutes",
        joinType = "left_outer")
      .writeStream.format("memory").queryName("ojoin")
      .outputMode(OutputMode.Append()).start()
    try {
      lIn.addData(
        Event(10, ts(0), 1, "imp", 0.0),  // will match
        Event(11, ts(0), 2, "imp", 0.0))  // never matches
      rIn.addData(Event(20, ts(2), 1, "click", 0.0))
      q.processAllAvailable()
      // advance both watermarks far past imp@0's join range so the
      // unmatched left row is provably partnerless and must emit
      lIn.addData(Event(30, ts(120), 9, "imp", 0.0))
      rIn.addData(Event(31, ts(120), 9, "click", 0.0))
      q.processAllAvailable()
      lIn.addData(Event(32, ts(121), 9, "imp", 0.0))
      rIn.addData(Event(33, ts(121), 9, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("ojoin").collect()
      val matched = rows.filter(r => r.getAs[Long]("imp_id") == 10L)
      val unmatched = rows.filter(r => r.getAs[Long]("imp_id") == 11L)
      assert(matched.length == 1 && matched(0).getAs[Long]("click_id") == 20L)
      assert(unmatched.length == 1 && unmatched(0).isNullAt(
        unmatched(0).fieldIndex("click_id")))
      assert(unmatched(0).getAs[Long]("user_id") == 2L) // coalesced key
    } finally q.stop()
  }

  test("full-outer interval join keeps the key on BOTH unmatched sides") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val lIn = MemoryStream[Event]
    val rIn = MemoryStream[Event]
    val imps = lIn.toDF().select(col("user_id"), col("ts"),
      col("event_id").as("imp_id"))
    val clicks = rIn.toDF().select(col("user_id"), col("ts").as("ts_r"),
      col("event_id").as("click_id"))
    // spaced joinType spelling exercises the normalization too
    val q = StreamVerbs.intervalJoin(imps, "ts", clicks, "ts_r", Seq("user_id"),
        before = "0 minutes", after = "5 minutes", lateness = "10 minutes",
        joinType = "FULL OUTER")
      .writeStream.format("memory").queryName("fjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      lIn.addData(Event(40, ts(0), 1, "imp", 0.0))   // unmatched left
      rIn.addData(Event(41, ts(0), 2, "click", 0.0)) // unmatched right
      q.processAllAvailable()
      for (m <- Seq(120, 121)) { // advance both watermarks past range
        lIn.addData(Event(50L + m, ts(m), 9, "imp", 0.0))
        rIn.addData(Event(60L + m, ts(m), 9, "click", 0.0))
        q.processAllAvailable()
      }
      val rows = spark.table("fjoin").collect()
      val lUn = rows.filter(r => !r.isNullAt(r.fieldIndex("imp_id")) &&
        r.getAs[Long]("imp_id") == 40L)
      val rUn = rows.filter(r => !r.isNullAt(r.fieldIndex("click_id")) &&
        r.getAs[Long]("click_id") == 41L)
      assert(lUn.length == 1 && lUn(0).isNullAt(lUn(0).fieldIndex("click_id")))
      assert(lUn(0).getAs[Long]("user_id") == 1L)
      // the unmatched RIGHT row's key must come from the right side
      // through the coalesce — the case left_outer never exercises
      assert(rUn.length == 1 && rUn(0).isNullAt(rUn(0).fieldIndex("imp_id")))
      assert(rUn(0).getAs[Long]("user_id") == 2L)
    } finally q.stop()
  }

  test("map-only batch verbs compose on streams: hashSplit labels a live stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // a pure per-row function needs no streaming-specific variant —
    // the same operator labels a stream, and content stability means
    // the stream assigns the SAME split the batch path would
    val in = MemoryStream[Event]
    val q = graft.ml.Sampling.hashSplit(in.toDF(), "event_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .writeStream.format("memory").queryName("streamsplit")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L to 50L).map(i => Event(i, ts(i.toInt), i % 3, "e", 1.0)): _*)
      q.processAllAvailable()
      val rows = spark.table("streamsplit").collect()
      assert(rows.length == 50)
      assert(rows.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
      val batch = graft.ml.Sampling.hashSplit(
          (1L to 50L).map(i => Event(i, ts(i.toInt), i % 3, "e", 1.0)).toDF(),
          "event_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("split")).toMap
      assert(rows.forall(r =>
        batch(r.getAs[Long]("event_id")) == r.getAs[String]("split")))
    } finally q.stop()
  }

  test("e2e on files: the FULL ingest composite — strip → corpus dedup → quality gate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import graft.text.TextFunctions
    // the whole crawl loop as ONE streaming query: HTML pages land as
    // parquet files, get boilerplate-stripped, deduped against the
    // standing corpus hash set, quality-gated, and sunk to parquet
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val corpus = Seq("an existing corpus document that is long enough to score.")
      .toDF("text")
    val hashes = graft.ml.Dedup.corpusContentHashes(corpus, "text")
    val goodText = "A genuinely new crawled page with enough words to pass the gate."
    val pages = Seq(
      // dup of the corpus doc, HTML-wrapped: dropped by the anti-join
      (1L, ts(0), "<html><p>An existing CORPUS document that is long enough to score.</p></html>"),
      // new and long enough: kept
      (2L, ts(1), s"<html><!-- hdr --><p>$goodText</p><script>var x;</script></html>"),
      // junk after stripping (no words at all): dropped by the gate
      (3L, ts(2), "<html><p>?!? #@! ...</p></html>"))
    pages.toDF("doc_id", "ts", "html").write.mode("append").parquet(s"$root/in")
    val stream = spark.readStream
      .schema("doc_id LONG, ts TIMESTAMP, html STRING")
      .parquet(s"$root/in")
      .withColumn("text", TextFunctions.stripHtml(col("html")))
    val deduped = StreamVerbs.streamDedupAgainstCorpus(stream, hashes, "text")
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
      .select("doc_id", "text", "quality")
    val q = deduped.writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append()).start()
    assert(q.awaitTermination(120000L), "AvailableNow drain did not finish in 120s")
    val out = spark.read.parquet(s"$root/out").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L), out.mkString(","))
    assert(out.head.getString(1) == goodText)
  }

  test("e2e on files: perceptual near-dedup at ingest via AvailableNow, batch-identical keep-set") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.streaming.Trigger
    import graft.multimodal.Multimodal
    // the LLM-pipeline ingest loop: media files land as parquet, a
    // file-source stream hashes them perceptually and drops re-encoded
    // duplicates before they reach the corpus. BMP originals arrive
    // first; PNG RE-ENCODES OF THE SAME PIXELS arrive later under new
    // ids — different bytes (content hash misses them), same decoded
    // image (perceptual hash catches them)
    val root = java.nio.file.Files.createTempDirectory("graft_pdedup").toString
    def pngCopy(bmp: Array[Byte]): Array[Byte] = {
      val (w, h, px) = Multimodal.decodeBmp(bmp)
      Multimodal.pngFromBgr(w, h, px)
    }
    val originals = (0 until 4).map(i =>
      (i.toLong, ts(i), Multimodal.bmpBytes(16 + i, 12 + i, i.toLong)))
    val reEncodes = (0 until 4).map(i =>
      (100L + i, ts(10 + i), pngCopy(originals(i)._3)))
    val junk = Seq((200L, ts(20), "not an image".getBytes)) // null phash row
    def drain(): Unit = {
      val stream = spark.readStream
        .schema("media_id LONG, ts TIMESTAMP, content BINARY")
        .parquet(s"$root/in")
      val q = StreamVerbs.streamingSignatureDedup(
          Multimodal.withPerceptualHash(stream), "phash", "ts",
          lateness = "1 hour")
        .select("media_id", "phash")
        .writeStream.format("parquet")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .outputMode(OutputMode.Append()).start()
      assert(q.awaitTermination(120000L), "AvailableNow drain did not finish in 120s")
    }
    // ingest happens in two real arrivals: originals land, the drain
    // checkpoints its signature state, THEN the re-encodes arrive — a
    // later drain on the same checkpoint must collapse every one of
    // them against state it restored, not recomputed
    (originals ++ junk).toDF("media_id", "ts", "content")
      .write.mode("append").parquet(s"$root/in")
    drain()
    val afterFirst = spark.read.parquet(s"$root/out")
      .collect().map(_.getLong(0)).toSet
    assert(afterFirst == Set(0L, 1L, 2L, 3L, 200L), afterFirst.toString)
    reEncodes.toDF("media_id", "ts", "content")
      .write.mode("append").parquet(s"$root/in")
    drain()
    val kept = spark.read.parquet(s"$root/out")
      .collect().map(_.getLong(0)).toSet
    // every re-encode collapsed onto its original; the undecodable row
    // survives (null signature passes through)
    assert(kept == Set(0L, 1L, 2L, 3L, 200L), kept.toString)
    // batch-identical keep-set: Dedup.exact on the same signature
    // (min-id per phash = first-arrival here, since originals id- and
    // time-precede their copies)
    val batchKept = graft.ml.Dedup.exact(
        Multimodal.withPerceptualHash(
          (originals ++ reEncodes ++ junk).toDF("media_id", "ts", "content"))
          .filter(col("phash").isNotNull),
        "media_id", Seq(col("phash")))
      .collect().map(_.getLong(0)).toSet + 200L
    assert(kept == batchKept, s"stream $kept vs batch $batchKept")
    // and the content-hash path would NOT have caught these: all nine
    // byte payloads are distinct
    val distinctBytes = (originals ++ reEncodes ++ junk)
      .map(r => java.util.Arrays.hashCode(r._3)).distinct.size
    assert(distinctBytes == 9, "fixture error: payload bytes must all differ")
  }

  test("e2e on files: readEventStream → intervalJoin → parquet sink via AvailableNow") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    // the full production loop on the one entry point the MemoryStream
    // cases bypass: parquet in → file-source stream → stateful join →
    // exactly-once parquet out, drained by Trigger.AvailableNow
    val root = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    Seq(Event(10, ts(0), 1, "imp", 1.0),   // matched by click 20
        Event(11, ts(0), 2, "imp", 2.0),   // click 30 min later: outside range
        Event(12, ts(0), 9, "imp", 9.0))   // no click at all
      .toDS().write.parquet(s"$root/imps")
    Seq(Event(20, ts(5), 1, "click", 0.5),
        Event(21, ts(30), 2, "click", 0.7),
        Event(22, ts(2), 7, "click", 0.9)) // no impression
      .toDS().write.parquet(s"$root/clicks")
    val clicks = StreamVerbs.readEventStream(spark, s"$root/clicks")
      .select(col("event_id").as("click_id"), col("ts").as("cts"), col("user_id"))
    val imps = StreamVerbs.readEventStream(spark, s"$root/imps")
      .select(col("event_id").as("imp_id"), col("ts").as("its"),
        col("user_id"), col("value").as("imp_value"))
    // a click attributes to an impression of the SAME user within the
    // 10 minutes BEFORE the click
    val q = StreamVerbs.intervalJoin(clicks, "cts", imps, "its", Seq("user_id"),
        before = "10 minutes", after = "0 seconds", lateness = "5 minutes")
      .writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append()).start()
    assert(q.awaitTermination(120000L), "AvailableNow drain did not finish in 120s")
    val out = spark.read.parquet(s"$root/out").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("click_id") == 20L)
    assert(out(0).getAs[Long]("imp_id") == 10L)
    assert(out(0).getAs[Long]("user_id") == 1L)
    assert(out(0).getAs[Double]("imp_value") == 1.0)
    // restart on the same checkpoint: exactly-once means no re-emission
    val q2 = StreamVerbs.intervalJoin(clicks, "cts", imps, "its", Seq("user_id"),
        before = "10 minutes", after = "0 seconds", lateness = "5 minutes")
      .writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append()).start()
    assert(q2.awaitTermination(120000L), "restarted drain did not finish in 120s")
    assert(spark.read.parquet(s"$root/out").count() == 1)
  }

  test("nearDupIngest ≡ the batch probe+append loop, chunk for chunk") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dirStream = java.nio.file.Files.createTempDirectory("ndstream").toString
    val dirBatch = java.nio.file.Files.createTempDirectory("ndbatch").toString
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "pack my box with five dozen liquor jugs for the journey north"))
      .toDF("doc_id", "text")
    graft.ml.Dedup.buildNearDupIndex(corpus, "doc_id", "text", dirStream,
      numHashes = 64, bands = 16, shingleSize = 4)
    graft.ml.Dedup.buildNearDupIndex(corpus, "doc_id", "text", dirBatch,
      numHashes = 64, bands = 16, shingleSize = 4)
    // chunk 1: one near-copy of the corpus (drops) + one fresh doc
    // (survives AND is appended); chunk 2: a near-copy of chunk 1's
    // SURVIVOR — it can only drop if the stream really appended
    // generation N before batch N+1 probed (probe-under-append), plus
    // one more fresh doc
    val chunk1 = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again 1"),
      (101L, "distributed query engines shuffle partitioned data across many executors"))
    val chunk2 = Seq(
      (200L, "distributed query engines shuffle partitioned data across many executors 2"),
      (201L, "vectorized columnar execution amortizes dispatch over entire batches"))
    // --- streaming: MemoryStream drained once per chunk, so each
    // chunk is its own micro-batch
    val streamKept = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(StreamVerbs.nearDupIngest(dirStream, "doc_id", "text",
        threshold = 0.7) { (kept, batchId) =>
        streamKept ++= kept.select("doc_id").collect()
          .map(r => (batchId, r.getLong(0)))
        ()
      })
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(chunk1: _*); q.processAllAvailable()
      in.addData(chunk2: _*); q.processAllAvailable()
    } finally q.stop()
    // --- batch twin: the documented recurring-ingest loop
    val batchKept = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    Seq(chunk1, chunk2).zipWithIndex.foreach { case (chunk, i) =>
      val kept = graft.ml.Dedup.dedupAgainstNearIndexed(
        chunk.toDF("doc_id", "text"), dirBatch, "doc_id", "text",
        threshold = 0.7)
      batchKept ++= kept.select("doc_id").collect().map(r => (i.toLong, r.getLong(0)))
      graft.ml.Dedup.appendToNearDupIndex(kept, "doc_id", "text", dirBatch)
    }
    assert(streamKept.toSet == batchKept.toSet,
      s"stream=$streamKept batch=$batchKept")
    // the semantics the fixture encodes really happened: 100 dropped
    // (corpus near-copy), 101 survived, 200 dropped (near-copy of the
    // APPENDED survivor — generation N visible to batch N+1), 201 kept
    assert(streamKept.map(_._2).toSet == Set(101L, 201L), streamKept.toString)
    // and the two index states are interchangeable: a third batch
    // probes identically against either
    val probe3 = Seq(
      (300L, "vectorized columnar execution amortizes dispatch over entire batches 3"),
      (301L, "completely unrelated content with its own vocabulary entirely"))
      .toDF("doc_id", "text")
    def keptIds(dir: String) =
      graft.ml.Dedup.dedupAgainstNearIndexed(probe3, dir, "doc_id", "text",
        threshold = 0.7).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds(dirStream) == keptIds(dirBatch))
    assert(keptIds(dirStream) == Set(301L))
  }
}
