package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents sharing long word
  * n-grams with an evaluation set — the classic 13-gram overlap check
  * run before training so eval answers don't leak into the corpus.
  * (Extension beyond the reference surface — a training-data pipeline
  * staple alongside dedup.)
  *
  * Scale shape:
  *   - the eval side reduces to a DISTINCT set of 8-byte n-gram hashes
  *     (one explode + one distinct on the SMALL side);
  *   - the corpus side hashes each document's distinct n-grams right
  *     after the explode and joins on the 8-byte key only — no n-gram
  *     STRINGS ever reach a shuffle;
  *   - AQE turns the join broadcast when the eval dictionary fits
  *     (typical: eval sets are orders of magnitude smaller than the
  *     corpus); above that it's a plain hash join on longs;
  *   - short documents (< n words) survive with zero counts via
  *     `explode_outer`, so the output covers the whole corpus.
  *
  * Tokenization is the BM25 one (lowercase, whitespace-collapsed,
  * single-space split) — mirror it exactly in any oracle. Counting is
  * over each document's DISTINCT n-grams (xxhash64 keys; collision
  * probability at even 10^9 distinct n-grams is ~10^-2 per corpus for
  * a COUNT of 1 — and irrelevant to the contaminated FLAG unless the
  * colliding gram is the document's only hit).
  */
object Decontaminate {

  /** Per-window 64-bit n-gram hashes (stride 1, start order) via the
    * rolling-hash kernel — one O(len) JVM loop per document, no
    * per-window string building (the HOF slice→join→hash formulation
    * is interpreted and allocates an O(n)-char string per window).
    * Every consumer in this object keys on these hashes only; the
    * DuckDB oracles mirror the join SEMANTICS on gram strings, so the
    * hash function needs self-consistency, not cross-engine equality
    * (a collision would surface as an oracle mismatch — the green IS
    * the collision check at each SF). */
  private def winHashes(toks: Column, n: Int): Column =
    graft.functions.Kernels.wordNgramHashes(toks, n)

  /** Distinct window hashes — the per-document DISTINCT-gram set used
    * by the profile/overlap counters (kernel output is empty for docs
    * shorter than n, matching the old string formulation). */
  private def distinctWinHashes(toks: Column, n: Int): Column =
    array_distinct(winHashes(toks, n))

  private def toks(text: Column): Column = TextFunctions.wsTokens(text)

  /** Streaming decontamination: the ids of incoming documents sharing
    * any word n-gram with the STATIC eval set, as they arrive. The
    * n-gram explode and the semi-join against the (small, static)
    * dictionary are STATELESS on a stream; the only state is the
    * per-id dedup — 8 bytes per contaminated doc (add a watermark on
    * an event-time column upstream to bound it on unbounded streams).
    * The flags agree with the batch [[ngramOverlap]] by construction
    * (same tokenizer, same hashes). */
  def contaminatedIdsStream(docs: DataFrame, idCol: String, textCol: String,
                            bench: DataFrame, benchTextCol: String,
                            n: Int = 13): DataFrame = {
    val benchDict = bench
      .select(toks(col(benchTextCol)).as("__toks"))
      .select(distinctWinHashes(col("__toks"), n).as("__hs"))
      .select(explode_outer(col("__hs")).as("__h"))
      .filter(col("__h").isNotNull)
      .distinct()
    docs
      .select(col(idCol).cast("long").as("doc_id"), toks(col(textCol)).as("__toks"))
      .select(col("doc_id"), distinctWinHashes(col("__toks"), n).as("__hs"))
      .select(col("doc_id"), explode_outer(col("__hs")).as("__h"))
      .filter(col("__h").isNotNull)
      .join(benchDict, Seq("__h"), "left_semi")
      .select(col("doc_id"))
      .dropDuplicates("doc_id")
  }

  /** Corpus-internal duplicated-passage profile: for each document,
    * how many of its distinct word n-grams appear in at least one
    * OTHER document — the "fraction of the corpus that is duplicated
    * text" signal used to size near-dedup passes (and to find
    * boilerplate) before training.
    *
    * Output: (doc_id, n_ngrams, n_duplicated, dup_fraction) with
    * dup_fraction = n_duplicated / n_ngrams (0.0 for gram-less docs;
    * raw IEEE division of exact longs — bit-stable cross-engine).
    *
    * Scale shape: two shuffles of 8-byte keys — (hash → distinct doc
    * count) then the count joined back to the exploded corpus on the
    * same hash key (co-partitioned, no strings move); per-doc
    * reduction is a plain count aggregation. */
  def duplicatedPassageStats(docs: DataFrame, idCol: String, textCol: String,
                             n: Int = 13): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2 (got $n)")
    // persisted: the hash dictionary AND the join-back both consume
    // this frame — uncached, the O(len × n) n-gram string transform
    // runs twice per document (same reasoning as Dedup.sigFrame; the
    // cache is (doc_id, 8-byte hash) rows, ages out by LRU)
    val grams = docs
      .select(col(idCol).cast("long").as("doc_id"), toks(col(textCol)).as("__toks"))
      .select(col("doc_id"), distinctWinHashes(col("__toks"), n).as("__hs"))
      .select(col("doc_id"), size(col("__hs")).cast("long").as("n_ngrams"),
        explode_outer(col("__hs")).as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // grams are distinct per doc, so count(*) per hash = distinct docs
    val docCounts = grams.filter(col("__h").isNotNull)
      .groupBy(col("__h")).agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") > 1)
    grams
      .join(docCounts, Seq("__h"), "left")
      .groupBy(col("doc_id"))
      .agg(first(col("n_ngrams")).as("n_ngrams"),
        coalesce(sum(when(col("__docs").isNotNull, 1L)), lit(0L)).as("n_duplicated"))
      .select(col("doc_id"), col("n_ngrams"), col("n_duplicated"),
        when(col("n_ngrams") > 0,
          col("n_duplicated").cast("double") / col("n_ngrams").cast("double"))
          .otherwise(lit(0.0)).as("dup_fraction"))
  }

  /** Duplicated-passage REMOVAL — the transform counterpart of
    * [[duplicatedPassageStats]] (Lee et al.-style): every token covered
    * by a word n-gram window that occurs in MORE THAN ONE document is
    * removed from ALL documents, and each document is rebuilt from its
    * surviving tokens. Cross-document boilerplate (headers, footers,
    * license blocks) disappears corpus-wide; text duplicated only
    * WITHIN one document stays (that is repetition, not duplication —
    * see `TextFunctions.repetitionStats`), and whole-document
    * near-dups are [[graft.ml.Dedup.minhashDedupCC]]'s keep-one job,
    * not this pass's remove-all.
    *
    * Output: (doc_id, n_tokens, n_removed, clean_text) for EVERY input
    * row — clean_text is the surviving tokens re-joined with single
    * spaces (the tokenizer's normalized form), "" when everything was
    * duplicated or the document had no tokens.
    *
    * Scale shape: window hashes ride two 8-byte-key shuffles (the
    * ≥2-doc dictionary, then the semi-join back); covered positions
    * explode from DUPLICATED windows only (∝ duplicated text, not the
    * corpus); the one corpus-volume shuffle is the per-document
    * rebuild (posexplode → anti-join → collect_list) — unavoidable for
    * a transform whose OUTPUT is the corpus, and keyed by doc_id so it
    * partitions evenly. Determinism: exact token positions and counts,
    * no floats anywhere. */
  def removeDuplicatedPassages(docs: DataFrame, idCol: String, textCol: String,
                               n: Int = 13): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2 (got $n)")
    // one persisted projection carries the tokens AND the per-doc
    // window-hash array: four consumers (dup dictionary, coverage,
    // token explode, final counts) would otherwise re-run the
    // tokenizer four times and the O(len × n) window kernel twice.
    // The cache is corpus-shaped (tokens + 8 bytes/window) —
    // MEMORY_AND_DISK like sigFrame, ages out by LRU; one-shot batch
    // callers can clearCache after (the bench does)
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"), toks(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"), winHashes(col("__toks"), n).as("__whs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // every window START (not distinct — coverage needs each position)
    val wins = base
      .select(col("doc_id"),
        posexplode_outer(col("__whs")).as(Seq("__start", "__h")))
      .filter(col("__h").isNotNull)
    // grams present in >= 2 documents (per-doc distinct, then count)
    val dupDict = wins.select(col("doc_id"), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") > 1)
      .select(col("__h"))
    val covered = wins.join(dupDict, Seq("__h"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("__start"), col("__start") + lit(n - 1))).as("__pos"))
      .distinct()
    // posexplode_outer keeps tokenless docs present as a (null, null) row
    val kept = base
      .select(col("doc_id"), posexplode_outer(col("__toks")).as(Seq("__pos", "__tok")))
      .join(covered, Seq("doc_id", "__pos"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(
            when(col("__pos").isNotNull, struct(col("__pos"), col("__tok"))))),
          x => x.getField("__tok")), " ").as("clean_text"),
        coalesce(sum(when(col("__tok").isNotNull, 1L)), lit(0L)).as("__n_kept"))
    base
      .select(col("doc_id"), coalesce(size(col("__toks")), lit(0)).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Per-document overlap with the eval set:
    * (doc_id, n_ngrams, n_contaminated, contaminated) — the distinct
    * word-n-gram count, how many of them appear anywhere in `bench`,
    * and the flag. Every corpus row appears in the output. */
  def ngramOverlap(docs: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchTextCol: String,
                   n: Int = 13): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2 (got $n)")

    // explode_outer + post-filter: plain explode's inferred size-filter
    // pushdown would duplicate the whole n-gram computation (see
    // LangModel scaladoc note; measured 2x on the eval-side scan)
    val benchDict = bench
      .select(toks(col(benchTextCol)).as("__toks"))
      .select(distinctWinHashes(col("__toks"), n).as("__hs"))
      .select(explode_outer(col("__hs")).as("__h"))
      .filter(col("__h").isNotNull)
      .distinct()
      .withColumn("__hit", lit(1L))

    val corpusGrams = docs
      .select(col(idCol).cast("long").as("doc_id"), toks(col(textCol)).as("__toks"))
      .select(col("doc_id"), distinctWinHashes(col("__toks"), n).as("__hs"))
      .select(col("doc_id"), size(col("__hs")).cast("long").as("n_ngrams"),
        explode_outer(col("__hs")).as("__h"))

    corpusGrams
      .join(benchDict, Seq("__h"), "left")
      .groupBy(col("doc_id"))
      .agg(first(col("n_ngrams")).as("n_ngrams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_contaminated"))
      .select(col("doc_id"), col("n_ngrams"), col("n_contaminated"),
        (col("n_contaminated") > 0).as("contaminated"))
  }
}
