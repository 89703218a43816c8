package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PqKernels

/** Product quantization for similarity search at memory-bound scale
  * (Jégou et al., TPAMI 2011 — the standard billion-vector ANN
  * compression): a D-float embedding becomes `m` bytes (e.g. 64
  * floats = 256 B → 8 B, 32×), and query scoring becomes `m` table
  * lookups per candidate instead of D multiplies (asymmetric
  * distance: the query side stays exact, only the corpus is
  * quantized). Composed with the existing IVF pruning
  * ([[Similarity]]) this is IVF-PQ — the architecture a 100-TB
  * embedding corpus actually ships: inverted lists bound the
  * candidates, PQ codes bound the bytes per candidate, an optional
  * exact re-rank of the short list restores precision.
  *
  * Spark-first shape:
  *  - [[train]]: deterministic hash-ordered seed sample, then Lloyd
  *    rounds where assignment is the row-local [[PqKernels.pqCodes]]
  *    kernel (the codebook broadcasts inside the expression) and the
  *    update is ONE per-(subspace, code, dim) mean aggregation —
  *    each round moves N×D values through one exchange, the same IO
  *    as any corpus pass. Train on a sample at real scale; the
  *    model is data, not plan.
  *  - [[encode]]: map-only projection (codes + true norm). The norm
  *    is kept EXACT so the only cosine error is the quantized
  *    direction, and gain-scaled duplicates still rank identically.
  *  - [[adcTopK]] / [[ivfPqTopK]]: per-query m×k table once, then
  *    lookups; candidates fold into the bounded [[TopK]] partial
  *    aggregate — queries × tasks × k rows to the shuffle, never the
  *    corpus.
  *
  * Cosine scores are approximate by construction (recall/precision
  * spec-pinned, like IVF); exactness-critical paths should re-rank
  * (`rerank` > 0) or use the exact kernels. */
object Pq {

  /** Trained model: flat codebook laid out [sub][centroid][dim]. */
  case class PqModel(m: Int, k: Int, subDim: Int, codebook: Array[Double]) {
    def dim: Int = m * subDim
  }

  /** Train per-subspace codebooks. `k ≤ 256` (byte codes); `dim`
    * must divide evenly into `m` subspaces. The corpus must hold at
    * least `k` non-null vectors (seed sample = first k in
    * deterministic xxhash64(id) order — content-stable on any
    * partitioning). `iters` Lloyd rounds refine; empty cells keep
    * their previous centroid (standard practice). Only the iters=0
    * codebook is BIT-reproducible: Lloyd means come from a
    * distributed double avg whose value depends on accumulation
    * order (deterministic up to float round-off). */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            m: Int = 8, k: Int = 256, iters: Int = 2,
            seed: Long = 42L): PqModel = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(k >= 1 && k <= 256, s"k must be in [1, 256] (byte codes), got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // Determinism note: the SEED SAMPLE is bit-reproducible on any
    // partitioning (hash-ordered limit), so iters=0 codebooks are
    // bit-identical across runs. Lloyd rounds aggregate centroid means
    // with a distributed avg over doubles, whose result depends on
    // partition-level accumulation order — refined codebooks are
    // deterministic up to float round-off, not bit-identical.
    val vecs = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .filter(col("__v").isNotNull)
    if (iters > 0) vecs.persist() // read once per Lloyd round + the seed scan
    // deterministic seed sample: first k vectors in hash order
    val sample = vecs
      .orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
      .limit(k)
      .select(col("__v").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length == k,
      s"Pq.train: corpus holds only ${sample.length} non-null vectors — " +
        s"k=$k needs at least k; lower k or widen the corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(sample.forall(_.length == dim),
      "Pq.train: seed sample contains ragged vector lengths")
    val subDim = dim / m
    var codebook = new Array[Double](m * k * subDim)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < k) {
        System.arraycopy(sample(j), mi * subDim, codebook,
          (mi * k + j) * subDim, subDim)
        j += 1
      }
      mi += 1
    }
    var it = 0
    while (it < iters) {
      // assign (row-local kernel) → per-(sub, code, dim) means
      val assigned = vecs.select(
        posexplode(PqKernels.pqCodes(col("__v"), codebook, m, k, subDim,
          asInts = true)).as(Seq("__mi", "__code")),
        col("__v"))
        .select(col("__mi"), col("__code"),
          posexplode(slice(col("__v"), col("__mi") * subDim + 1,
            lit(subDim))).as(Seq("__d", "__x")))
      val means = assigned
        .groupBy(col("__mi"), col("__code"), col("__d"))
        .agg(avg(col("__x").cast("double")).as("__mean"))
        .collect()
      val next = codebook.clone() // empty cells keep previous centroids
      means.foreach { r =>
        val mi2 = r.getInt(0); val c = r.getInt(1); val d = r.getInt(2)
        next((mi2 * k + c) * subDim + d) = r.getDouble(3)
      }
      codebook = next
      it += 1
    }
    if (iters > 0) vecs.unpersist()
    PqModel(m, k, subDim, codebook)
  }

  /** Append `codesCol` (m bytes) and `normCol` (exact ‖v‖) — the
    * compressed index rows. Map-only; null/ragged vectors yield null
    * codes (auditable, never dropped silently). */
  def encode(corpus: DataFrame, vecCol: String, model: PqModel,
             codesCol: String = "pq_codes", normCol: String = "pq_norm"): DataFrame =
    corpus
      .withColumn(codesCol, PqKernels.pqCodes(col(vecCol), model.codebook,
        model.m, model.k, model.subDim))
      .withColumn(normCol, sqrt(Similarity.dot(col(vecCol), col(vecCol))))

  // -------------------------------------------------------------------
  // shared ADC plumbing (one code path for adcTopK / ivfPqTopK /
  // ivfPqTopKIndexed — the next ADC change lands once)
  // -------------------------------------------------------------------

  /** Collect a tiny frame into a driver-local relation. Small frames
    * referenced more than once (centroid tables, probe sets) become
    * LocalRelations instead of persisted plans — every consumer reads
    * them for free and nothing accumulates in the session cache
    * across repeated calls in a long-lived session. */
  private def localize(df: DataFrame): (DataFrame, Array[org.apache.spark.sql.Row]) = {
    val rows = df.collect()
    (df.sparkSession.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema),
      rows)
  }

  /** Query side of an ADC probe: per-query m×k lookup table + EXACT
    * query norm (the only approximation stays in the corpus codes). */
  private def adcQuerySide(queries: DataFrame, qidCol: String, qvecCol: String,
                           model: PqModel): DataFrame =
    queries.select(col(qidCol).as("query_id"), col(qvecCol).as("__q"))
      .withColumn("__table", PqKernels.pqTable(col("__q"), model.codebook,
        model.m, model.k, model.subDim))
      .withColumn("__qn", sqrt(Similarity.dot(col("__q"), col("__q"))))

  /** ADC cosine for a candidate row carrying codes `__c`, norm `__n`
    * and the query side's `__table`/`__qn`. */
  private def adcCos(pqK: Int): org.apache.spark.sql.Column =
    when(col("__n") > 0 && col("__qn") > 0,
      PqKernels.pqAdcScore(col("__c"), col("__table"), pqK) /
        (col("__n") * col("__qn")))
      .otherwise(lit(0.0)).as("cos_sim")

  /** Rank IVF lists per query against the (tiny) centroid table, keep
    * the top `nProbe` — the probe set. Returned as a driver-local
    * relation (queries × nProbe rows; the query side is
    * broadcast-small by contract) because it is consumed two ways —
    * partition-pruning literal and broadcast candidate join — and a
    * LocalRelation serves both without a persist leaking into the
    * session cache. Also returns the distinct probed list ids. */
  private def probeSet(q: DataFrame, cents: DataFrame, nProbe: Int)
      : (DataFrame, Seq[Long]) = {
    val qLists = q.crossJoin(broadcast(cents))
      .withColumn("__sim", Similarity.cosine(col("__q"), col("cvec")))
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("__sim").desc, col("list_id"))))
      .filter(col("__r") <= nProbe)
      .select(col("query_id"), col("__table"), col("__qn"), col("list_id"))
    val (local, rows) = localize(qLists)
    (local, rows.map(_.getAs[Long]("list_id")).distinct.toSeq)
  }

  /** Shared candidate scoring + bounded top-k + optional exact
    * re-rank. `cands` carries (nn_id, __c, __n, list_id); the probe
    * side joins in by list id via broadcast. `rerank > 0` re-scores
    * the top-max(rerank, k) ADC survivors with exact cosine against
    * `vecSource` (`srcIdCol`, `srcVecCol`) — a queries×rerank-row
    * join back, negligible next to the scan it replaces. */
  private def adcScoreTopK(cands: DataFrame, qProbe: DataFrame, pqK: Int,
                           k: Int, rerank: Int,
                           vecSource: DataFrame, srcIdCol: String, srcVecCol: String,
                           queries: DataFrame, qidCol: String, qvecCol: String): DataFrame = {
    val cand = cands
      .filter(col("__c").isNotNull)
      .join(broadcast(qProbe), Seq("list_id"))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"), adcCos(pqK))
    if (rerank <= 0) TopK.perQuery(cand, k)
    else {
      val shortList = TopK.perQuery(cand, math.max(rerank, k))
        .select(col("query_id"), col("nn_id"))
      val withVecs = shortList
        .join(vecSource.select(col(srcIdCol).as("nn_id"),
          col(srcVecCol).as("__v")), Seq("nn_id"))
        .join(queries.select(col(qidCol).as("query_id"), col(qvecCol).as("__q")),
          Seq("query_id"))
        .select(col("query_id"), col("nn_id"),
          Similarity.cosine(col("__v"), col("__q")).as("cos_sim"))
      TopK.perQuery(withVecs, k)
    }
  }

  /** Full-scan ADC top-k over an [[encode]]d corpus: approximate
    * cosine = (Σ table lookups) / (‖v‖·‖q‖). The corpus pays m
    * lookups + one divide per candidate — no vector math. */
  def adcTopK(encoded: DataFrame, idCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              model: PqModel, k: Int = 10, excludeSelf: Boolean = true,
              codesCol: String = "pq_codes", normCol: String = "pq_norm",
              queryBudget: Long = Similarity.DefaultQueryBudget): DataFrame = {
    Similarity.guardQueryBroadcast(queries, qvecCol, queryBudget, "adcTopK")
    val q = adcQuerySide(queries, qidCol, qvecCol, model)
    val paired = encoded
      .select(col(idCol).as("nn_id"), col(codesCol).as("__c"), col(normCol).as("__n"))
      .filter(col("__c").isNotNull)
      .crossJoin(broadcast(q))
    val scored = (if (excludeSelf) paired.filter(col("nn_id") =!= col("query_id"))
      else paired)
      .select(col("query_id"), col("nn_id"), adcCos(model.k))
    TopK.perQuery(scored, k)
  }

  /** Persist an IVF-PQ index: codebook + geometry (one model row —
    * the parameters live IN the index and are read back at probe
    * time, so build and probe cannot desync; the NearDupIndex
    * contract), IVF centroids, and the encoded corpus partitioned by
    * list id (16-byte codes + norm per row — the 100-TB layout: a
    * probe opens only the probed list partitions, and each holds
    * bytes, not vectors). Vectors are NOT stored — that is the point
    * of PQ; exact re-rank at probe time joins back to whatever
    * source-of-truth table holds them. */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      path: String, m: Int = 16, pqK: Int = 256,
                      nLists: Int = 0, iters: Int = 2,
                      seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    val lists = if (nLists > 0) nLists
      else Similarity.autoNLists(corpus.count()) // nLists <= 0: √N self-sizing
    val model = train(corpus, idCol, vecCol, m, pqK, iters, seed)
    import spark.implicits._
    Seq((model.m, model.k, model.subDim, model.codebook.toSeq))
      .toDF("m", "k", "sub_dim", "codebook")
      .write.mode("overwrite").parquet(s"$path/model")
    val cents = Similarity.centroids(corpus, idCol, vecCol, lists,
      refineIters = 1, seed = seed)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    val (assigned, obs) = IndexStats.observed(Similarity.assignListsWithSim(
      corpus.select(col(idCol), col(vecCol)), idCol, vecCol, cents),
      "graft_ivfpq_build")
    encode(assigned, vecCol, model)
      .select(col(idCol), col("pq_codes"), col("pq_norm"), col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
    // drift baseline (generation 0) for appendToIvfPqIndex — observed
    // on the write job, no extra corpus pass
    IndexStats.write(spark, path, generation = 0L,
      IndexStats.fromObs(obs), overwrite = true)
  }

  /** Append a batch to a persisted [[buildIvfPqIndex]] index without
    * retraining: the batch is encoded under the FROZEN stored codebook
    * and assigned under the FROZEN stored centroids (both read back
    * from the index — build and probe cannot desync, and neither can
    * an append), then written as delta partitions into the same
    * `list_id=` layout. Partition pruning and every probe path work
    * unchanged over the union of build + append files.
    *
    * Drift accounting is the IVF contract ([[Similarity
    * .appendToIvfIndex]]): per-batch mean angular D² to the assigned
    * centroid vs the build baseline stored in `path/stats`;
    * drift > 1.5 logs the rebuild recommendation and
    * `rebuildRecommended` flags it to callers. Note the CODEBOOK ages
    * too — centroid drift is its leading indicator (both are trained
    * on the same distribution), which is why the one statistic covers
    * the rebuild decision for the whole index. */
  def appendToIvfPqIndex(batch: DataFrame, idCol: String, vecCol: String,
                         path: String): graft.ml.IndexAppendStats = {
    val spark = batch.sparkSession
    val mrow = spark.read.parquet(s"$path/model").collect()(0)
    val model = PqModel(mrow.getAs[Int]("m"), mrow.getAs[Int]("k"),
      mrow.getAs[Int]("sub_dim"), mrow.getAs[Seq[Double]]("codebook").toArray)
    // fail-fast frozen-geometry contract (r12 ADVICE): the stored
    // codebook fixes the vector dim (m × subDim); a mismatched batch
    // would encode garbage codes that surface only as silently wrong
    // neighbors. Element type is unconstrained here — PQ stores codes,
    // not vectors, and pqCodes casts per element.
    IndexStats.validateBatch(batch, vecCol, expectedDim = Some(model.dim),
      expectedElem = None, caller = "appendToIvfPqIndex")
    val cents = spark.read.parquet(s"$path/centroids")
    val (assigned, obs) = IndexStats.observed(Similarity.assignListsWithSim(
      batch.select(col(idCol), col(vecCol)), idCol, vecCol, cents),
      "graft_ivfpq_append")
    encode(assigned, vecCol, model)
      .select(col(idCol), col("pq_codes"), col("pq_norm"), col("list_id"))
      .write.mode("append").partitionBy("list_id").parquet(s"$path/lists")
    IndexStats.appendAndReport(spark, path, IndexStats.fromObs(obs),
      caller = "appendToIvfPqIndex")
  }

  /** Rebuild a persisted [[buildIvfPqIndex]] index — the action its
    * drift signal ([[graft.ml.IndexAppendStats.rebuildRecommended]])
    * points at. UNLIKE the IVF rebuild, this one needs the vector
    * SOURCE OF TRUTH handed back in: the PQ index stores m-byte codes
    * and norms, never vectors (that is the point of PQ), so retraining
    * the codebook and centroids must re-read the real embeddings —
    * the same `(corpus, idCol, vecCol)` a probe-time re-rank joins.
    * Geometry (m, pqK) is read from the STORED model so a rebuild
    * cannot silently change the compression contract; `nLists <= 0`
    * re-derives √N from the rebuild corpus. The new index is built in
    * a sibling directory and swapped in (delete + rename per subdir;
    * single-writer contract), and the drift series resets to a fresh
    * generation-0 baseline. */
  def rebuildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                        path: String, nLists: Int = 0, iters: Int = 2,
                        seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    val mrow = spark.read.parquet(s"$path/model").collect()(0)
    val tmp = s"$path/.rebuild"
    buildIvfPqIndex(corpus, idCol, vecCol, tmp,
      m = mrow.getAs[Int]("m"), pqK = mrow.getAs[Int]("k"),
      nLists = nLists, iters = iters, seed = seed)
    IndexStats.swapIn(spark, path, tmp,
      Seq("model", "centroids", "lists", "stats"))
  }

  /** Probe a persisted IVF-PQ index: rank lists against the tiny
    * centroid table, scan ONLY the probed list partitions (the
    * `isin` literal prunes at file listing), score by ADC lookups,
    * optionally re-rank the short list with exact cosine against
    * `rerankFrom` (the vector source of truth — `(idCol, vecCol)`
    * columns). Geometry and codebook come from the index itself. */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, qidCol: String, qvecCol: String,
                       k: Int = 10, nProbe: Int = 0, rerank: Int = 0,
                       rerankFrom: DataFrame = null,
                       rerankIdCol: String = null, rerankVecCol: String = null,
                       queryBudget: Long = Similarity.DefaultQueryBudget): DataFrame = {
    require(rerank <= 0 ||
        (rerankFrom != null && rerankIdCol != null && rerankVecCol != null),
      "ivfPqTopKIndexed: rerank > 0 needs rerankFrom + rerankIdCol + " +
        "rerankVecCol (the index stores codes, not vectors)")
    Similarity.guardQueryBroadcast(queries, qvecCol, queryBudget,
      "ivfPqTopKIndexed")
    val mrow = spark.read.parquet(s"$path/model").collect()(0)
    val model = PqModel(mrow.getAs[Int]("m"), mrow.getAs[Int]("k"),
      mrow.getAs[Int]("sub_dim"), mrow.getAs[Seq[Double]]("codebook").toArray)
    val cents = spark.read.parquet(s"$path/centroids")
    // nProbe <= 0: co-scale with the index's list count (autoNProbe)
    val probes =
      if (nProbe > 0) nProbe else Similarity.autoNProbe(cents.count().toInt)
    val q = adcQuerySide(queries, qidCol, qvecCol, model)
    val (qProbe, probed) = probeSet(q, cents, probes)
    val lists = spark.read.parquet(s"$path/lists")
      .filter(col("list_id").isin(probed: _*))
    val idCol = lists.columns
      .filterNot(c => c == "list_id" || c == "pq_codes" || c == "pq_norm").head
    val cands = lists.select(col(idCol).as("nn_id"), col("pq_codes").as("__c"),
      col("pq_norm").as("__n"), col("list_id"))
    adcScoreTopK(cands, qProbe, model.k, k, rerank,
      rerankFrom, rerankIdCol, rerankVecCol, queries, qidCol, qvecCol)
  }

  /** IVF-PQ with optional exact re-rank: IVF centroids bound WHICH
    * candidates are touched (nProbe/nLists of the corpus), PQ codes
    * bound the BYTES per candidate, and `rerank > 0` re-scores the
    * top-`rerank` ADC survivors with exact cosine against the true
    * vectors (a queries×rerank-row join back — negligible next to
    * the scan it replaces). rerank ≥ k restores bruteForce ordering
    * whenever ADC's top-rerank contains the true top-k. */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int = 10, m: Int = 8, pqK: Int = 256,
                nLists: Int = 0, nProbe: Int = 0,
                iters: Int = 2, seed: Long = 42L,
                rerank: Int = 0,
                queryBudget: Long = Similarity.DefaultQueryBudget): DataFrame = {
    Similarity.guardQueryBroadcast(queries, qvecCol, queryBudget, "ivfPqTopK")
    val lists = if (nLists > 0) nLists
      else Similarity.autoNLists(corpus.count()) // nLists <= 0: √N self-sizing
    val probes = // nProbe <= 0: co-scale with the list space (autoNProbe)
      if (nProbe > 0) nProbe else Similarity.autoNProbe(lists)
    val model = train(corpus, idCol, vecCol, m, pqK, iters, seed)
    // nLists rows: a driver-local relation lets both consumers (list
    // assignment + probe ranking) read the heavy centroid aggregation
    // once, with nothing persisted into the session cache
    val (cents, _) = localize(Similarity.centroids(corpus, idCol, vecCol,
      lists, refineIters = 1, seed = seed))
    val assigned = Similarity.assignLists(corpus, idCol, vecCol, cents)
    val encoded = encode(assigned, vecCol, model)
    val q = adcQuerySide(queries, qidCol, qvecCol, model)
    val (qProbe, _) = probeSet(q, cents, probes)
    val cands = encoded.select(col(idCol).as("nn_id"), col("pq_codes").as("__c"),
      col("pq_norm").as("__n"), col("list_id"))
    adcScoreTopK(cands, qProbe, model.k, k, rerank,
      corpus, idCol, vecCol, queries, qidCol, qvecCol)
  }

  /** IVF-PQ with RUNTIME recall calibration — the two-knob counterpart
    * of [[Similarity.ivfTopKCalibrated]]. The r12 ×64 stress measured
    * all-defaults IVF-PQ recall@10 = 0.354 on the rotation-amplified
    * fixture (sweeps/r12_stress_x64_vectors.json, ivf_pq_auto) — worse
    * than even the uncalibrated IVF's 0.41, because PQ stacks TWO
    * independent recall losses: probed lists that miss true neighbors
    * (the IVF loss — more probes buy it back) and ADC quantization
    * error misranking candidates the probes DID reach (the PQ loss —
    * more probes buy nothing; only a deeper exact re-rank does).
    *
    * Mechanism: train the codebook + centroids and encode/assign the
    * corpus ONCE (the compact codes frame is persisted — every
    * escalation step re-probes it), take a bounded deterministic query
    * sample, build its brute-force ground truth in ONE corpus scan,
    * then escalate from (autoNProbe, 4·k rerank) toward
    * (`maxProbeFactor`×, `maxRerankFactor`×) caps. KNOB POLICY: double
    * nProbe while probe doublings keep moving sampled recall; when a
    * probe doubling moves it by < 0.02 (the plateau — at that point the
    * true neighbors are IN the candidate set but ADC misranks them),
    * double the re-rank depth instead. The full query set then runs
    * once at the calibrated pair, with `measured_recall`,
    * `calibrated_nprobe` and `calibrated_rerank` riding every row — the
    * same proceed-with-evidence contract as the IVF op: if both caps
    * land below target the shortfall is visible in-band (stderr warns),
    * and a pipeline that must not ship under-target neighbors asserts
    * on the column (the q_ann_pq_cal driver query does exactly that).
    *
    * Cost model: train + encode + assign once (the dominant IVF-PQ
    * cost), one bounded brute-force truth pass, one sample-sized ADC
    * probe per escalation step (≤ log2(maxProbeFactor) +
    * log2(maxRerankFactor) steps), one calibrated full-set probe.
    * Re-rank depth is a per-query SHORT-LIST bound (queries × rerank
    * rows join back to true vectors), so even the rerank cap stays
    * negligible next to the corpus scan it replaces. */
  def ivfPqTopKCalibrated(corpus: DataFrame, idCol: String, vecCol: String,
                          queries: DataFrame, qidCol: String, qvecCol: String,
                          k: Int = 10, targetRecall: Double = 0.7,
                          sampleQueries: Int = 20,
                          m: Int = 8, pqK: Int = 256,
                          nLists: Int = 0, nProbe: Int = 0, rerank: Int = 0,
                          maxProbeFactor: Int = 16, maxRerankFactor: Int = 16,
                          iters: Int = 2, seed: Long = 42L,
                          queryBudget: Long = Similarity.DefaultQueryBudget): DataFrame = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in (0,1]: $targetRecall")
    require(sampleQueries >= 1, s"sampleQueries must be >= 1: $sampleQueries")
    require(maxProbeFactor >= 1, s"maxProbeFactor must be >= 1: $maxProbeFactor")
    require(maxRerankFactor >= 1, s"maxRerankFactor must be >= 1: $maxRerankFactor")
    Similarity.guardQueryBroadcast(queries, qvecCol, queryBudget,
      "ivfPqTopKCalibrated")
    val lists = if (nLists > 0) nLists
      else Similarity.autoNLists(corpus.count())
    val startProbe = if (nProbe > 0) nProbe else Similarity.autoNProbe(lists)
    val startRerank = if (rerank > 0) rerank else 4 * k
    val probeCap = math.min(lists.toLong,
      startProbe.toLong * maxProbeFactor).toInt
    val rerankCap = (startRerank.toLong * maxRerankFactor)
      .min(Int.MaxValue.toLong).toInt
    val model = train(corpus, idCol, vecCol, m, pqK, iters, seed)
    val (cents, _) = localize(Similarity.centroids(corpus, idCol, vecCol,
      lists, refineIters = 1, seed = seed))
    // compact probe target (m bytes + norm + list id per row), read by
    // every escalation step and the final probe — persist THIS, never
    // the vectors
    val cands = encode(Similarity.assignLists(corpus, idCol, vecCol, cents),
        vecCol, model)
      .select(col(idCol).as("nn_id"), col("pq_codes").as("__c"),
        col("pq_norm").as("__n"), col("list_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic content-stable sample, localized (≤ sampleQueries
    // rows feed each escalation eval twice — probe side + rerank join)
    val (sampleDf, _) = localize(queries
      .select(col(qidCol).as("query_id"), col(qvecCol).as("__q"))
      .orderBy(xxhash64(col("query_id"), lit(seed)), col("query_id"))
      .limit(sampleQueries))
    val truth = Similarity.bruteForceTopK(corpus, idCol, vecCol,
        sampleDf, "query_id", "__q", k, queryBudget = 0)
      .select(col("query_id"), col("nn_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truthPairs = truth.count()
    def sampledRecall(probe: Int, rr: Int): Double = {
      val (qProbe, _) = probeSet(
        adcQuerySide(sampleDf, "query_id", "__q", model), cents, probe)
      val hits = adcScoreTopK(cands, qProbe, model.k, k, rr,
          corpus, idCol, vecCol, sampleDf, "query_id", "__q")
        .select(col("query_id"), col("nn_id"))
        .join(truth, Seq("query_id", "nn_id"), "left_semi").count()
      hits.toDouble / truthPairs
    }
    var probe = math.min(startProbe, probeCap)
    var rr = math.min(startRerank, rerankCap)
    // empty truth (no sample / empty corpus): vacuous
    var recall = if (truthPairs == 0L) 1.0 else sampledRecall(probe, rr)
    var prevRecall = recall
    var lastWasProbe = false
    val plateauEps = 0.02
    while (truthPairs != 0L && recall < targetRecall &&
        (probe < probeCap || rr < rerankCap)) {
      if (lastWasProbe && recall - prevRecall < plateauEps && rr < rerankCap) {
        // probe doubling plateaued: the ADC loss is the binder now
        rr = math.min(rr.toLong * 2, rerankCap.toLong).toInt
        lastWasProbe = false
      } else if (probe < probeCap) {
        probe = math.min(probe.toLong * 2, probeCap.toLong).toInt
        lastWasProbe = true
      } else {
        rr = math.min(rr.toLong * 2, rerankCap.toLong).toInt
        lastWasProbe = false
      }
      prevRecall = recall
      recall = sampledRecall(probe, rr)
    }
    if (recall < targetRecall)
      System.err.println(
        f"[graft] ivfPqTopKCalibrated: caps reached (nProbe $probe/$lists " +
          f"lists, rerank $rr) at sampled recall $recall%.3f < target " +
          f"$targetRecall%.3f — this corpus needs larger caps or the exact " +
          "kernels; the shortfall rides the measured_recall column")
    val q = adcQuerySide(queries, qidCol, qvecCol, model)
    val (qProbe, _) = probeSet(q, cents, probe)
    // queries × k rows: materialize eagerly so the corpus-scale codes
    // persist and the truth sample release HERE (the ivfTopKCalibrated
    // unpersist contract)
    val out = adcScoreTopK(cands, qProbe, model.k, k, rr,
        corpus, idCol, vecCol, queries, qidCol, qvecCol)
      .withColumn("measured_recall", lit(recall))
      .withColumn("calibrated_nprobe", lit(probe))
      .withColumn("calibrated_rerank", lit(rr))
      .localCheckpoint()
    cands.unpersist()
    truth.unpersist()
    out
  }
}
