package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over a distributed corpus —
  * the statistics side of building a subword vocabulary (Sennrich et
  * al., ACL '16), re-expressed for Spark's execution model.
  *
  * Scale discipline: the corpus is touched EXACTLY ONCE (the word
  * frequency aggregation — same shape as the LangModel vocabularies:
  * distinct words ≪ corpus tokens ≪ corpus bytes). Every merge round
  * then runs over the WORD-FREQUENCY table only: one pair-count
  * aggregation (vocab-sized, 8-byte-free but tiny) plus one in-place
  * symbol rewrite, with the frame `localCheckpoint`ed every few
  * rounds so the iterative plan cannot nest one round inside the next
  * (the same lineage-bounding recipe as the distributed
  * connected-components loop). A 100-TB corpus and a 100-GB corpus
  * differ only in the first aggregation; the loop costs the same.
  *
  * Determinism: merge selection ties break on (count desc, pair
  * lexicographic asc), so training is reproducible on any cluster
  * shape — required for the merge table to be a shippable artifact.
  */
object Bpe {

  /** End-of-word marker symbol (a separate trailing symbol, so merges
    * can learn word-final units like `est</w>` distinctly). */
  val EndOfWord = "</w>"

  /** (word, n) frequencies via the ONE pipeline tokenizer
    * ([[TextFunctions.wsTokens]] — lowercased, whitespace-split).
    * The only corpus-scale aggregation in BPE training. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.wsTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Initial symbol decomposition: per-character split plus the
    * [[EndOfWord]] marker. `split(word, "")` is character-based
    * (codepoints), matching the oracle's `substring` walk. */
  def initialSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** Weighted adjacent-pair counts: for each word, pairs
    * (syms(i), syms(i+1)) weighted by n; grouped sum. No join — the
    * pair array is built row-local and exploded once. Words already
    * merged down to ONE symbol are filtered first: they have no pairs,
    * and `sequence(0, -1)` would count DOWN and index out of bounds
    * under ANSI (`element_at(syms, 2)` on a 1-element array). */
  def adjacentPairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("n"), explode(F.transform(
        sequence(lit(0), size(col("syms")) - 2),
        i => struct(element_at(col("syms"), i + 1).as("a"),
          element_at(col("syms"), i + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))

  /** Greedy left-to-right merge of adjacent (a, b) into the fused
    * symbol within one symbol array — the per-round vocabulary
    * rewrite. Fold semantics: append each symbol, but when the
    * accumulator's LAST element is `a` and the incoming symbol is `b`,
    * replace that last element with `a+b`. Overlaps resolve leftmost
    * ("aaa" under (a,a) → [aa, a]), matching the reference algorithm.
    * Fused text can never re-trigger within the round (the check is
    * against the literal `a`, and a just-fused element equals `a+b`,
    * never `a` — `b` is non-empty). */
  def mergeAdjacent(syms: Column, a: String, b: String): Column = {
    val fused = a + b
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === a && s === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused))))
        .otherwise(concat(acc, array(s))))
  }

  /** Train `numMerges` BPE merges. Returns the learned merge table in
    * rank order. `minCount` stops early when the best pair's weighted
    * count falls below it (no useful statistics left).
    *
    * Each round is one vocab-sized aggregation + a one-row argmax to
    * the driver (the merge decision is inherently sequential — this
    * is the standard structure, not a shortcut; the corpus itself is
    * never re-read). Suitable for merge budgets in the hundreds-to-
    * low-thousands per job; production tokenizers at 30k+ merges
    * batch rounds exactly the same way, just longer. */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int,
               minCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var vocab = wordFreqs(df, textCol)
      .withColumn("syms", initialSymbols(col("word")))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val best = adjacentPairCounts(vocab)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minCount) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        vocab = vocab.withColumn("syms", mergeAdjacent(col("syms"), a, b))
        // bound lineage exactly like the CC loop: without this the
        // plan nests one round's aggregate-HOF inside the next's
        if ((round + 1) % 4 == 0) vocab = vocab.localCheckpoint()
      }
      round += 1
    }
    merges.toSeq
  }

  /** Encode text with a learned merge table: tokenize, then per token
    * apply merges greedily in RANK order (lowest rank first, the
    * standard BPE inference loop) until no listed pair remains.
    * Row-local kernel ([[graft.functions.BpeEncodeExpr]]) — map-only,
    * merges ship inside the expression (they are the model, a few
    * hundred KB at production vocabulary sizes — broadcast-sized). */
  def encodeBpe(text: Column, merges: Seq[(String, String)]): Column =
    // EndOfWord passed EXPLICITLY: training appends this object's
    // marker (initialSymbols); relying on the kernel's default string
    // staying in sync would let the two silently diverge
    graft.functions.Kernels.bpeEncode(
      TextFunctions.wsTokens(text), merges, EndOfWord)
}
