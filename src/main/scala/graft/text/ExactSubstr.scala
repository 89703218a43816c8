package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Kernels

/** Exact-substring deduplication — remove every maximal character
  * span of length ≥ `minLen` that occurs at least `minCount` times
  * across the corpus (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better": their ExactSubstr cut trains
  * measurably better LMs than document-level dedup alone).
  *
  * The published implementation builds one giant suffix array over
  * the concatenated corpus — a single-machine design. Re-expressed
  * Spark-first, duplicated-span discovery is a HASH-GROUPING problem:
  * a span of length ≥ L is duplicated iff every one of its L-char
  * windows is duplicated, so marking each position whose L-window
  * occurs ≥ minCount times (exact 64-bit rolling hashes,
  * [[Kernels.charNgramHashes]] — collision odds ~2^-64 per gram
  * pair keep the expected corpus-wide error below one even at 10^10
  * grams) and merging the covered positions into maximal islands
  * yields exactly the ExactSubstr spans. Overlapping and adjacent
  * windows merge, so each emitted span is maximal and the removed
  * text matches a lag-based SQL island formulation char for char.
  *
  * Plan shape (the 100-TB audit):
  *  - one row per character position (hash + pos, 20 bytes) — the
  *    honest linear cost of exact-substring semantics, the same O(n)
  *    the suffix array pays, but partitioned instead of monolithic;
  *  - ONE full-width shuffle, on the gram hash, with the duplicate
  *    test as a partition-local window count (groupBy + self-join
  *    would shuffle the gram set twice);
  *  - covered positions (usually ≪ corpus) shuffle a second time,
  *    on the doc id, into per-doc sorted span lists;
  *  - the cut itself is one [[Kernels.cutSpans]] pass per doc; the
  *    span list joins back to the docs co-partitioned on the id (AQE
  *    broadcasts it when small).
  *  - skew: a pathological gram repeated 10^6 times lands its
  *    positions in one partition; the window only COUNTS them
  *    (constant state), so the skew cost is IO, not memory.
  *
  * Returns the input columns plus `clean_text`, `dup_spans`,
  * `removed_chars`. Rows whose text is null pass through with null
  * outputs. `idCol` must identify rows uniquely (it keys the
  * span-list join back).
  */
object ExactSubstr {

  def dedup(docs: DataFrame, idCol: String, textCol: String,
            minLen: Int = 40, minCount: Int = 2): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val grams = positionHashes(docs, idCol, textCol, minLen)
    val covered = grams
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("cnt") >= minCount)
    applyCut(docs, idCol, textCol, covered, minLen)
  }

  /** Cross-corpus surgical decontamination: cut from `docs` every
    * maximal span of length ≥ `minLen` that ALSO appears in
    * `reference` (an eval benchmark, a blocklist corpus) — the
    * span-level twin of drop-the-whole-document decontamination
    * ([[Decontaminate.ngramOverlap]]): a 10k-char document that
    * quotes one 60-char benchmark answer loses the quote, not the
    * document. Same plan economics as [[dedup]], except the
    * duplicate test is a LEFT SEMI join of corpus grams against the
    * reference gram hashes — reference grams dedup to 8-byte keys
    * before the join, and AQE broadcasts them when the reference is
    * benchmark-sized (the common case), making the whole test
    * map-side. */
  def cutAgainst(docs: DataFrame, idCol: String, textCol: String,
                 reference: DataFrame, refTextCol: String,
                 minLen: Int = 40): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val refGrams = reference
      .select(explode(Kernels.charNgramHashes(col(refTextCol), minLen)).as("h"))
      .distinct()
    val covered = positionHashes(docs, idCol, textCol, minLen)
      .join(refGrams, Seq("h"), "left_semi")
    applyCut(docs, idCol, textCol, covered, minLen)
  }

  /** Compile a reference corpus into its sorted distinct gram-hash
    * array for the map-only cut path ([[cutAgainstCompiled]] /
    * streaming). Size-guarded: a reference with more than `maxGrams`
    * distinct windows raises — at that size the broadcast-array
    * pattern is the wrong tool and [[cutAgainst]]'s join path is the
    * right one (same refuse-early contract as the compiled NB
    * scorer's vocabulary budget). The hashes are computed by the
    * SAME Spark expression the join path uses, so the two paths
    * cannot desync. ~8 MB per million grams. */
  def compileReference(reference: DataFrame, refTextCol: String,
                       minLen: Int = 40, maxGrams: Int = 2000000): Array[Long] = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    require(maxGrams >= 1, s"maxGrams must be >= 1, got $maxGrams")
    val arr = reference
      .select(explode(Kernels.charNgramHashes(col(refTextCol), minLen)).as("h"))
      .distinct()
      .limit(maxGrams + 1) // detects overflow without counting everything
      .collect().map(_.getLong(0))
    require(arr.length <= maxGrams,
      s"compileReference: reference exceeds maxGrams=$maxGrams distinct " +
        s"$minLen-char windows — use cutAgainst (the join path) for " +
        "corpus-scale references, or raise the budget deliberately")
    java.util.Arrays.sort(arr)
    arr
  }

  /** Map-only twin of [[cutAgainst]]: the compiled reference rides
    * inside one [[Kernels.cutSharedSpans]] expression, so the whole
    * decontamination cut is a single stateless projection — no
    * explode, no shuffle. Bit-identical output to the join path
    * (spec-pinned), and because it is stateless it composes onto a
    * STREAM unchanged ([[graft.streaming.StreamVerbs.streamCutAgainst]]). */
  def cutAgainstCompiled(docs: DataFrame, textCol: String,
                         compiledRef: Array[Long], minLen: Int = 40): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val cut = Kernels.cutSharedSpans(col(textCol), compiledRef, minLen).as("__cut")
    docs.withColumn("__cut", cut)
      .select((docs.columns.map(col) :+
        col("__cut.clean_text") :+
        col("__cut.dup_spans") :+
        col("__cut.removed_chars")).toIndexedSeq: _*)
  }

  /** One row per character position: (id, pos, h) with h the 64-bit
    * rolling hash of the `minLen`-char window at pos. */
  private def positionHashes(docs: DataFrame, idCol: String, textCol: String,
                             minLen: Int): DataFrame =
    docs.select(
      col(idCol),
      posexplode(Kernels.charNgramHashes(col(textCol), minLen)).as(Seq("pos", "h")))

  /** Merge covered positions into per-doc sorted span lists and cut. */
  private def applyCut(docs: DataFrame, idCol: String, textCol: String,
                       covered: DataFrame, minLen: Int): DataFrame = {
    val spans = covered.groupBy(idCol)
      .agg(sort_array(collect_list(col("pos"))).as("__starts"))
    val cut = Kernels.cutSpans(col(textCol), col("__starts"), minLen).as("__cut")
    docs.join(spans, Seq(idCol), "left")
      .withColumn("__cut", cut)
      .select((docs.columns.map(col) :+
        col("__cut.clean_text") :+
        col("__cut.dup_spans") :+
        col("__cut.removed_chars")).toIndexedSeq: _*)
  }

  /** Profile variant: the maximal duplicated spans themselves —
    * (id, span_start, span_len, span_text), one row per span, for
    * auditing WHAT the cut would remove before committing to it.
    * Same plan as [[dedup]] up to the island merge. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      minLen: Int = 40, minCount: Int = 2): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val covered = positionHashes(docs, idCol, textCol, minLen)
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("cnt") >= minCount)
      .select(col(idCol), col("pos"))
    // island merge per doc: new span when pos > lag(pos) + minLen
    // (fixed-width windows make the running max equal the last end)
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
    val islands = covered
      .withColumn("brk",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(byDoc), lit(Int.MinValue).cast("int")) + minLen, 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("island"))
      .agg(min("pos").as("span_start"),
        (max("pos") - min("pos") + minLen).as("span_len"))
    islands.join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .select(col(idCol), col("span_start"), col("span_len"),
        expr(s"substring($textCol, span_start + 1, span_len)").as("span_text"))
  }
}
