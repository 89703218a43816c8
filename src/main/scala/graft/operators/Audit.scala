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
}
