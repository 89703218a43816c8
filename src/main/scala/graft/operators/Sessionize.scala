package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the batch twin of
  * `streaming.StreamVerbs.sessionize` (absent from the reference,
  * which has no event/session tooling at all; standard SQL
  * sessionization is the semantic oracle: lag → gap flag → running
  * sum).
  *
  * A session is a maximal run of a key's events where each
  * consecutive gap is ≤ `gapMs`. Timestamp arithmetic is integer
  * MICROSECONDS (`unix_micros`) end to end: no epoch-double rounding
  * can flip a boundary comparison, so the result is bit-reproducible
  * across engines (the DuckDB oracle uses `epoch_us` and the same
  * strict `>` comparison).
  *
  * Scale shape: ONE hash exchange on the keys; the lag and the running
  * sum share the same (keys × order) window spec, so Catalyst plans
  * one sort with stacked Window operators — no second exchange. Memory
  * is bounded by the largest single key's events (the same bound any
  * per-key ordered pass implies); a degenerate hot key (one user with
  * a billion events) should be pre-split by coarse time range first.
  * `sessionStats` adds a map-side-combined aggregation on
  * (keys, session_index) that REUSES the window's hash partitioning
  * (the keys co-locate every session of a key), so the whole operator
  * costs exactly one shuffle — asserted in WindowJoinsSpec.
  *
  * Determinism: pass `tieBreak` columns that make (keys, ts, tieBreak)
  * unique — equal-timestamp events otherwise take engine-dependent lag
  * order. Null timestamps sort first WITHIN their key (Spark default)
  * and extend no gap; sessionization over null times is not meaningful
  * — filter them upstream when the data allows them.
  */
object Sessionize {

  /** Append a 0-based `session_index` per key — input rows preserved,
    * one new column. */
  def assignSessions(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     gapMs: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "sessionize needs at least one key column")
    require(gapMs >= 0, s"gapMs must be >= 0, got $gapMs")
    require(!df.columns.contains("session_index"),
      "assignSessions appends 'session_index' — the input already has " +
        "that column (drop or rename it first; silently overwriting " +
        "previously assigned sessions would corrupt re-labeling runs)")
    val order: Seq[Column] = col(tsCol) +: tieBreak.map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val us = unix_micros(col(tsCol))
    val prevUs = lag(us, 1).over(w)
    // strict >: a gap of exactly gapMs stays in-session, matching the
    // streaming sessionizer's `t - last <= gapMs` continuation rule
    val newSession = when(prevUs.isNull.or(us - prevUs > gapMs * 1000L), 1L)
      .otherwise(0L)
    df.withColumn("session_index",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)) - 1L)
  }

  /** One row per session: epoch-second start/end (integer-truncated —
    * hash-stable across engines), event count, and an exact
    * decimal-accumulated sum of `valueCol` surfaced as a scale-2
    * double (order-insensitive, so the composite hashes identically
    * regardless of partitioning). */
  def sessionStats(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   gapMs: Long, valueCol: String,
                   tieBreak: Seq[String] = Nil): DataFrame = {
    val assigned = assignSessions(df, keyCols, tsCol, gapMs, tieBreak)
    assigned.groupBy((keyCols :+ "session_index").map(col): _*)
      .agg(
        min(col(tsCol).cast("long")).as("start_s"),
        max(col(tsCol).cast("long")).as("end_s"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("decimal(28,2)")
          .cast("double").as("sum_value"))
  }
}
