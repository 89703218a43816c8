package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the audit view of incremental ingest:
  * given two versions of a corpus, which documents were ADDED,
  * REMOVED, or CHANGED? The recurring-pipeline questions ("what did
  * this crawl cycle actually contribute?", "did the cleaning rerun
  * mutate anything it shouldn't have?") reduce to this one frame.
  *
  * Scale shape: both sides project to (id, 8-byte content hash)
  * BEFORE the join, so the only corpus-wide movement is two slim
  * column frames co-partitioned on the id — document text never
  * reaches the shuffle. UNCHANGED rows (the overwhelming majority of
  * a real diff) are filtered out by default right after the join, so
  * the result is delta-sized; pass `includeUnchanged = true` for the
  * full accounting. Content equality is hash equality (xxhash64 —
  * ~2^-64 per-pair false-unchanged odds, the same budget every hash
  * join here runs on). Spark's `xxhash64` is non-nullable — NULL
  * text hashes to the seed constant — so null↔null compares
  * `unchanged` and null↔text `changed`, while missing ROWS (the
  * added/removed cases) are detected by the join's genuinely-null
  * sides, never by content hashing. */
object SnapshotDiff {

  /** One row per differing id: (id, status) with status ∈
    * {"added", "removed", "changed"} (+ "unchanged" when requested). */
  def diff(oldCorpus: DataFrame, newCorpus: DataFrame,
           idCol: String, contentCol: String,
           includeUnchanged: Boolean = false): DataFrame = {
    def hashed(df: DataFrame, side: String) = df
      .select(col(idCol), xxhash64(col(contentCol)).as(s"__h_$side"))
    val joined = hashed(oldCorpus, "old")
      .join(hashed(newCorpus, "new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") === col("__h_new"), "unchanged")
          .otherwise("changed").as("status"))
    if (includeUnchanged) joined
    else joined.filter(col("status") =!= "unchanged")
  }

  /** The one-row summary a pipeline dashboard stores per cycle:
    * (added, removed, changed, unchanged) counts in a single
    * aggregation over the full diff. */
  def summary(oldCorpus: DataFrame, newCorpus: DataFrame,
              idCol: String, contentCol: String): DataFrame =
    diff(oldCorpus, newCorpus, idCol, contentCol, includeUnchanged = true)
      .agg(
        count(when(col("status") === "added", 1)).as("added"),
        count(when(col("status") === "removed", 1)).as("removed"),
        count(when(col("status") === "changed", 1)).as("changed"),
        count(when(col("status") === "unchanged", 1)).as("unchanged"))
}
