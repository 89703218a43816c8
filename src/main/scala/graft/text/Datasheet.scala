package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus datasheet — the first questions asked of any training
  * corpus ("how big, how long, how duplicated, what languages?"),
  * answered as TWO aggregation passes over the text (one global, one
  * per-language), every number cross-engine exact so the sheet can
  * be regenerated anywhere and compared byte-for-byte:
  *
  *  - token counts via the whitespace tokenizer (integer-exact sums);
  *  - length percentiles EXACT (`percentile` — linear interpolation,
  *    the same definition as DuckDB's `quantile_cont`), not the
  *    sketch variant, because a datasheet is a published artifact
  *    (the approx path stays available through `Ctx.percentileApprox`
  *    where in-flight speed matters);
  *  - the duplicate rate from distinct 8-byte content hashes of
  *    NORMALIZED text (the same normalization the dedup operators
  *    key on — so `dup_fraction` predicts what exact dedup would
  *    remove, not just byte-identical copies).
  *
  * Scale: one shuffle per frame (global agg / lang agg); the
  * percentile aggregation is the only per-doc-row state and operates
  * on LENGTHS (8 bytes/doc), never text. */
object Datasheet {

  /** One-row corpus summary. Null texts count as documents with zero
    * length/tokens (they are corpus rows; hiding them would misstate
    * n_docs). */
  def describe(docs: DataFrame, textCol: String): DataFrame = {
    val len = coalesce(length(col(textCol)), lit(0)).cast("long")
    val toks = TextFunctions.tokenCountWs(coalesce(col(textCol), lit(""))).cast("long")
    val normHash = xxhash64(TextFunctions.normalizeText(coalesce(col(textCol), lit(""))))
    docs.agg(
      count(lit(1)).as("n_docs"),
      sum(len).as("total_chars"),
      sum(toks).as("total_tokens"),
      round(percentile(len, lit(0.5)), 6).as("p50_chars"),
      round(percentile(len, lit(0.95)), 6).as("p95_chars"),
      countDistinct(normHash).as("distinct_docs"))
      .withColumn("dup_fraction",
        round((col("n_docs") - col("distinct_docs")).cast("double") /
          greatest(col("n_docs"), lit(1L)), 6))
  }

  /** Per-language breakdown: (lang, n_docs, total_tokens, share). The
    * share denominator comes from a window over the (tiny,
    * language-cardinality) aggregated frame — the corpus scans ONCE,
    * not once for the groupBy plus once for a count(). */
  def byLang(docs: DataFrame, textCol: String, langCol: String): DataFrame = {
    val toks = TextFunctions.tokenCountWs(coalesce(col(textCol), lit(""))).cast("long")
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy() // one partition of ≤ |languages| rows
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    docs.groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"), sum(toks).as("total_tokens"))
      .withColumn("share",
        round(col("n_docs").cast("double") /
          greatest(sum(col("n_docs")).over(all), lit(1L)), 6))
  }
}
