package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** One-pass pipeline accounting — "where did my documents go?" for a
  * multi-gate ingest chain (quality gate → language gate → length
  * gate → …), answered WITHOUT re-scanning per stage.
  *
  * The naive audit runs `count()` after every gate: N gates = N + 1
  * jobs, each re-reading everything upstream — at 100 TB that
  * multiplies the whole pipeline cost by the gate count. This verb
  * threads Spark's `Observation` API through the chain instead: each
  * gate registers (rows_in, rows_out) aggregates that ride the SAME
  * job that produces the output — the metrics are computed by the
  * executors as the data streams past, and reading them afterwards
  * costs nothing. One action, full accounting.
  *
  * Usage:
  * {{{
  * val audit = new Audit.Pipeline()
  * val kept = audit.gate(docs, "quality", col("q") >= 0.5)
  * val en   = audit.gate(kept, "lang", col("lang") === "en")
  * en.write.parquet(out)          // ONE job
  * audit.report()                 // Seq((gate, rows_in, rows_out))
  * }}}
  *
  * A row whose predicate evaluates null is dropped by the gate and
  * counted as dropped (same three-valued semantics as `filter`).
  * `report()` blocks until an action has run the chain; the
  * invariant `rows_in(gate k+1) == rows_out(gate k)` holds along any
  * linear chain and is the self-check a pipeline dashboard wants. */
object Audit {

  final class Pipeline {
    private val gates =
      scala.collection.mutable.ArrayBuffer.empty[(String, Observation)]

    /** Filter `df` by `keep`, observing (rows_in, rows_out) in the
      * enclosing job. Gate names must be unique per Pipeline, and the
      * predicate must be DETERMINISTIC — it evaluates once in the
      * observation and once in the filter, so a rand()-style gate
      * would report counts for a different subset than it passes
      * (refused at build time rather than corrupting the report). */
    def gate(df: DataFrame, name: String, keep: Column): DataFrame = {
      require(!gates.exists(_._1 == name), s"duplicate gate name: $name")
      // the Column holds an UNRESOLVED tree (deterministic defaults
      // true there) — analyze a throwaway projection to see the real
      // expression; analysis plans nothing and runs no job
      require(df.select(keep).queryExecution.analyzed.expressions
          .forall(_.deterministic),
        s"gate '$name': nondeterministic predicate — the observation and " +
          "the filter would evaluate it independently and disagree")
      val o = new Observation(s"graft_audit_$name")
      gates += ((name, o))
      df.observe(o,
          count(lit(1)).as("rows_in"),
          count(when(keep, 1)).as("rows_out"))
        .filter(keep)
    }

    /** (gate, rows_in, rows_out) in gate order; call AFTER an action
      * has executed the gated frame. */
    def report(): Seq[(String, Long, Long)] =
      gates.toSeq.map { case (name, o) =>
        val m = o.get
        (name, m("rows_in").asInstanceOf[Long], m("rows_out").asInstanceOf[Long])
      }

    /** The report as a DataFrame — joinable/storable like any metric
      * table. Runs `action` first (any trigger — count, write) so
      * the observations are populated, then materializes the rows. */
    def reportFrame(spark: org.apache.spark.sql.SparkSession,
                    action: => Unit): DataFrame = {
      import spark.implicits._
      action
      report().toDF("gate", "rows_in", "rows_out")
    }
  }

  /** Health report for a persisted dedup/ANN index — the operational
    * signals the append paths measure (drift vs the build baseline,
    * per-bucket anchor pile-up, generation count), surfaced as a metric
    * TABLE instead of stderr lines (r12 verdict #6: the audit surface
    * is where a 100-TB operator looks; logs are where signals go to be
    * missed). One row per (component, metric) with the documented
    * threshold and the concrete remediation op when crossed.
    *
    * Detects the index family from its layout: `anchors/` = near-dup
    * MinHash index ([[graft.ml.Dedup.buildNearDupIndex]]); `stats/` =
    * IVF drift series ([[graft.ml.Similarity.buildIvfIndex]] /
    * [[graft.ml.Pq.buildIvfPqIndex]], told apart by `model/`). Costs a
    * few tiny scans of index METADATA (anchor table, stats series,
    * centroid count) — never the corpus-scale `lists/` data.
    *
    * Columns: component, metric, value (double), threshold (null when
    * the metric is informational), breached, recommended_action (null
    * until breached). */
  def indexHealth(spark: org.apache.spark.sql.SparkSession,
                  path: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    def exists(sub: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      p.getFileSystem(conf).exists(p)
    }
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Double, Option[Double], Boolean, Option[String])]
    def add(component: String, metric: String, value: Double,
            threshold: Option[Double], action: String): Unit = {
      val breached = threshold.exists(t => value > t)
      rows += ((component, metric, value, threshold, breached,
        if (breached) Some(action) else None))
    }
    if (exists("anchors")) {
      val anchors = spark.read.parquet(s"$path/anchors")
      val agg = anchors.groupBy(col("__bkey"))
        .agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n")), lit(0L)).as("rows"),
          count(lit(1)).as("buckets"),
          coalesce(max(col("__n")), lit(0L)).as("maxrows"))
        .head()
      add("neardup", "anchor_rows", agg.getLong(0).toDouble, None, "")
      add("neardup", "occupied_buckets", agg.getLong(1).toDouble, None, "")
      add("neardup", "max_anchor_rows_per_bucket", agg.getLong(2).toDouble,
        Some(graft.ml.Dedup.CompactAnchorRowsThreshold.toDouble),
        "compactNearDupIndex: re-fold the append generations to the " +
          "fresh-build bounded anchor set (anchor table only, never the corpus)")
    }
    if (exists("stats")) {
      val component = if (exists("model")) "ivf_pq" else "ivf"
      val rebuildOp =
        if (component == "ivf_pq")
          "rebuildIvfPqIndex: retrain codebook+centroids from the vector " +
            "source of truth (the index stores codes, not vectors)"
        else "rebuildIvfIndex: retrain from the index's own stored rows"
      val stats = spark.read.parquet(s"$path/stats")
        .select(col("generation"), col("mean_d2")).collect()
        .sortBy(_.getLong(0))
      add(component, "generations", stats.length.toDouble, None, "")
      stats.find(_.getLong(0) == 0L).foreach { base =>
        add(component, "base_mean_d2", base.getDouble(1), None, "")
        stats.lastOption.filter(_.getLong(0) > 0L).foreach { latest =>
          add(component, "latest_mean_d2", latest.getDouble(1), None, "")
          // degenerate build baseline (base_mean_d2 == 0, e.g. nLists ≈
          // rows on a tiny index): latest/base is NaN or Infinity, and
          // NaN > threshold is FALSE — a genuinely drifted index would
          // read breached=false (r13 ADVICE). Map to Infinity (breached)
          // when any drift exists, 1.0 (no drift) when latest is 0 too.
          val baseD2 = base.getDouble(1)
          val drift =
            if (baseD2 == 0.0) {
              if (latest.getDouble(1) > 0.0) Double.PositiveInfinity else 1.0
            } else latest.getDouble(1) / baseD2
          add(component, "latest_drift", drift,
            Some(graft.ml.IndexAppendStats.RebuildDriftThreshold), rebuildOp)
        }
      }
      if (exists("centroids"))
        add(component, "lists", spark.read.parquet(s"$path/centroids")
          .count().toDouble, None, "")
    }
    require(rows.nonEmpty,
      s"indexHealth: no graft index layout found at $path (expected " +
        "anchors/ for a near-dup index or stats/ for an IVF-family index)")
    rows.toSeq.toDF("component", "metric", "value", "threshold", "breached",
      "recommended_action")
  }
}
