package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  * (Extension beyond the reference surface — SURVEY §7.2 step 8.)
  *
  * Kernels are expression-only (`zip_with` + `aggregate`), computed in
  * double precision. Two search paths:
  *   - brute force: broadcast the (small) query set against the corpus —
  *     the exact baseline, one map-side pass over the corpus, top-k via
  *     per-query window;
  *   - IVF: deterministic centroid sample → assign corpus rows to the
  *     nearest centroid (map-only vs broadcast centroids) → probe only
  *     `nProbe` inverted lists per query. Search cost drops by
  *     ~nLists/nProbe; same plan shape a 1000-executor cluster wants.
  */
object Similarity {

  /** Σ a_i b_i in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Single-pass custom kernel (graft.functions.CosineSimExpr) —
    * bit-identical to `dot(a,b)/(norm(a)*norm(b))` but one tight JVM
    * loop per pair instead of three interpreted HOF folds. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.Kernels.cosineSim(a, b)

  /** Exact brute-force cosine top-k.
    * `queries(qid, qvec)` is broadcast (must be driver-manageable —
    * typically thousands of rows); the corpus is scored in one map-side
    * pass and folded into per-(query, task) top-k buffers by a partial
    * aggregate (graft.ml.TopKAgg) — only `queries × tasks × k` rows
    * reach the shuffle, never the corpus. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int = 10, excludeSelf: Boolean = true): DataFrame = {
    val paired = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(queries.select(col(qidCol).as("query_id"), col(qvecCol).as("__q"))))
    // excludeSelf drops nn_id == query_id — right when queries ARE
    // corpus rows probing for neighbors; set false when query ids live
    // in a separate namespace (e.g. hybrid retrieval probes), where an
    // accidental id collision must not hide a corpus document
    val scored = (if (excludeSelf) paired.filter(col("nn_id") =!= col("query_id"))
      else paired)
      .select(col("query_id"), col("nn_id"), cosine(col("__v"), col("__q")).as("cos_sim"))
    TopK.perQuery(scored, k)
  }

  /** Deterministic IVF centroids: seeded from the `nLists` lowest-id
    * corpus vectors, then refined with `refineIters` Lloyd iterations
    * (assign → per-list dimension means). Each iteration is one
    * assign pass (map-only vs broadcast centroids) plus a posexplode +
    * two-level aggregation whose cardinality is nLists × dim — tiny
    * regardless of corpus size. */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
                nLists: Int = 16, refineIters: Int = 1): DataFrame = {
    var cents = corpus.orderBy(col(idCol)).limit(nLists)
      .select(monotonically_increasing_id().as("list_id"),
        col(vecCol).cast("array<double>").as("cvec"))
    var it = 0
    while (it < refineIters) {
      val assigned = assignLists(
        corpus.select(col(idCol), col(vecCol)), idCol, vecCol, cents)
      cents = assigned
        .select(col("list_id"), posexplode(col(vecCol)).as(Seq("pos", "__x")))
        .groupBy(col("list_id"), col("pos"))
        .agg(avg(col("__x")).as("__mean"))
        .groupBy(col("list_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("__mean")))).as("__ps"))
        .select(col("list_id"),
          transform(col("__ps"), p => p.getField("__mean")).as("cvec"))
      it += 1
    }
    cents
  }

  /** Assign each row to its nearest centroid list (map-only: centroids
    * broadcast, argmax computed with a max_by over the centroid array). */
  def assignLists(corpus: DataFrame, idCol: String, vecCol: String,
                  cents: DataFrame): DataFrame = {
    val centArr = cents.agg(collect_list(struct(col("list_id"), col("cvec"))).as("cs"))
    corpus.crossJoin(broadcast(centArr))
      .withColumn("list_id",
        array_max(transform(col("cs"), c =>
          struct(cosine(col(vecCol), c.getField("cvec")).as("sim"),
            c.getField("list_id").as("list_id")))).getField("list_id"))
      .drop("cs")
  }

  /** IVF top-k: probe the `nProbe` nearest lists per query only.
    * Recall < 1 by construction; the exactness knob is nProbe/nLists. */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int = 10, nLists: Int = 16, nProbe: Int = 4,
              refineIters: Int = 1): DataFrame = {
    val cents = centroids(corpus, idCol, vecCol, nLists, refineIters).cache()
    val assigned = assignLists(corpus, idCol, vecCol, cents)
    // nProbe nearest lists per query
    val qLists = queries.select(col(qidCol).as("query_id"), col(qvecCol).as("__q"))
      .crossJoin(broadcast(cents))
      .withColumn("__sim", cosine(col("__q"), col("cvec")))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("__sim").desc)))
      .filter(col("__r") <= nProbe)
      .select(col("query_id"), col("__q"), col("list_id"))
    val cand = assigned.select(col(idCol).as("nn_id"), col(vecCol).as("__v"), col("list_id"))
      .join(broadcast(qLists), Seq("list_id"))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"), cosine(col("__v"), col("__q")).as("cos_sim"))
    TopK.perQuery(cand, k)
  }

  /** Random-hyperplane LSH bucket key for cosine similarity: `nBits`
    * sign bits of projections onto deterministic pseudo-random
    * hyperplanes (hash-derived, no stored planes). Near-neighbors
    * collide with prob 1 - angle/π per bit. */
  def cosineLshKey(vec: Column, dim: Int, nBits: Int = 16, seed: Long = 42L): Column = {
    val bits = (0 until nBits).map { b =>
      // pseudo-random ±1 plane component per (bit, dim index), derived
      // from a deterministic hash — row-local, no plane table needed
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") *
            when(xxhash64(lit(seed), lit(b), i).bitwiseAND(lit(1L)) =!= 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Persist an IVF index: the assigned corpus written as parquet
    * PARTITIONED BY list_id (one directory per inverted list) plus the
    * centroid table. Build once, query many: a probe of nProbe lists
    * becomes a partition-pruned scan that READS only nProbe/nLists of
    * the corpus bytes — the property that makes IVF pay at 100 TB
    * (pruning is visible in the scan's PartitionFilters; asserted in
    * PlanQualitySpec). */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    path: String, nLists: Int = 16,
                    refineIters: Int = 1): Unit = {
    val cents = centroids(corpus, idCol, vecCol, nLists, refineIters)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    assignLists(corpus.select(col(idCol), col(vecCol)), idCol, vecCol, cents)
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
  }

  /** Query a persisted IVF index: rank lists per query against the
    * (tiny) centroid table, then scan ONLY the probed list partitions.
    * The `isin` filter prunes at the file-listing level — untouched
    * lists are never opened. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int = 10, nProbe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val qLists = queries.select(col(qidCol).as("query_id"), col(qvecCol).as("__q"))
      .crossJoin(broadcast(cents))
      .withColumn("__sim", cosine(col("__q"), col("cvec")))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("__sim").desc)))
      .filter(col("__r") <= nProbe)
      .select(col("query_id"), col("__q"), col("list_id"))
    // probed list ids are tiny (queries × nProbe): collect for a
    // partition-pruning literal filter, then bucket-join candidates
    val probed = qLists.select(col("list_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val lists = spark.read.parquet(s"$path/lists")
      .filter(col("list_id").isin(probed: _*))
    val idCol = lists.columns.filterNot(c => c == "list_id" || lists.schema(c).dataType
      .isInstanceOf[org.apache.spark.sql.types.ArrayType]).head
    val vecCol = lists.columns.filterNot(c => c == "list_id" || c == idCol).head
    val cand = lists.select(col(idCol).as("nn_id"), col(vecCol).as("__v"), col("list_id"))
      .join(broadcast(qLists), Seq("list_id"))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"), cosine(col("__v"), col("__q")).as("cos_sim"))
    TopK.perQuery(cand, k)
  }

  /** Banded LSH approximate neighbor pairs within the corpus — the
    * embedding-space counterpart of MinHash banding: `bands` independent
    * hyperplane sketches of `nBits` each (graft.functions
    * CosineLshBandsExpr, one JVM loop per row), candidates from the
    * (band, key) bucket join, exact-cosine verify. A pair at cosine c
    * misses all bands with prob (1-p^nBits)^bands, p = 1-acos(c)/π —
    * e.g. c=0.95, 16×6-bit bands → miss ≈ 6e-6. Shuffle discipline as
    * in MinHash: bare (id, band, key) through the explode; vectors join
    * back on the deduplicated candidate pairs only.
    *
    * Bucket sizing: hyperplane buckets partition SPACE, so expected
    * bucket size is n/2^nBits and the per-band self-join is quadratic
    * in it — size nBits with the corpus (e.g. 2^nBits ≈ n/1000 keeps
    * buckets ~1000 rows) and spend recall budget on more bands. */
  def lshNeighborPairs(corpus: DataFrame, idCol: String, vecCol: String,
                       nBits: Int = 6, bands: Int = 16,
                       threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    // persisted like Dedup.sigFrame: the banding explode feeds BOTH
    // sides of the candidate self-join — without the persist the LSH
    // kernel would run twice per row — and both verify joins re-read
    // the vectors (LRU-evicted under pressure)
    val keyed = corpus.select(col(idCol).as("__id"),
      graft.functions.Kernels.cosineLshBands(col(vecCol), bands, nBits, seed).as("__keys"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = keyed.select(col("__id"),
      posexplode(col("__keys")).as(Seq("__band", "__key")))
    val cand = banded.select(col("__id").as("id_a"), col("__band"), col("__key"))
      .join(banded.select(col("__id").as("id_b"), col("__band"), col("__key")),
        Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val vecs = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cand
      .join(vecs.select(col("__id").as("id_a"), col("__v").as("va")), Seq("id_a"))
      .join(vecs.select(col("__id").as("id_b"), col("__v").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
