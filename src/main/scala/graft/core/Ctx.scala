package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._

/** Expression context handed to `addColumn` / `filter` / `summarize`
  * closures — the Spark counterpart of the reference's
  * `ExpressionContext` (reference: src/crysda/context.cr:136-174).
  *
  * Group-relative helpers (`lead`/`lag`/`cumsum`/`rowNumber`/`rank`)
  * resolve against the frame's grouping keys and ordering columns:
  * the reference relies on implicit physical row order; on Spark that
  * becomes an explicit `Window.partitionBy(groups).orderBy(ord)`.
  * When the frame is ungrouped the window has no partitioning — fine
  * on small frames, a deliberate single-partition bottleneck at scale
  * (same semantics as a global running total anywhere).
  */
final class Ctx private[core] (
    private[core] val groupedBy: Seq[String],
    private[core] val ordCols: Seq[Column]) {

  /** Column by name, `ctx("x")` (literal — dotted names stay one
    * identifier). */
  def apply(name: String): Column = graft.core.qcol(name)

  // ---- window plumbing -------------------------------------------------
  private def grouped: Boolean = groupedBy.nonEmpty
  private def base: WindowSpec = Window.partitionBy(groupedBy.map(graft.core.qcol): _*)

  private[core] def wOrdered: WindowSpec = {
    requireOrd()
    base.orderBy(ordCols: _*)
  }
  private def wRunning: WindowSpec =
    wOrdered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
  private def requireOrd(): Unit =
    require(ordCols.nonEmpty,
      "order-sensitive expression needs an ordered frame " +
        "(sortBy first, or ingest through CrysFrame which captures row order)")

  // Ungrouped order-sensitive verbs REGISTER their semantics here and
  // return references to helper columns; the frame verb that owns this
  // Ctx (addColumn / filter) materializes them through the scale-safe
  // GlobalWindows machinery — a partition-less window would funnel the
  // whole frame through one task.
  private val gwCalls = scala.collection.mutable.ListBuffer.empty[GlobalWindows.Call]
  private var gwN = 0
  private[core] def globalCalls: Seq[GlobalWindows.Call] = gwCalls.toList

  /** Verbs that never materialize global-window helpers (sortByExpr /
    * sortByOrder / summarize*) call this after evaluating their
    * closures: a registered-but-discarded call would otherwise surface
    * as an unresolved `__gw_N` column far from the cause. */
  private[core] def assertNoGlobalCalls(verb: String): Unit =
    if (gwCalls.nonEmpty)
      throw new IllegalArgumentException(
        s"$verb cannot evaluate ungrouped order-sensitive expressions (" +
          gwCalls.map(_.getClass.getSimpleName).distinct.mkString(", ") +
          "): materialize them into a column first with addColumn/" +
          s"addColumns, then $verb the result")
  private def reg(mk: String => GlobalWindows.Call): Column = {
    gwN += 1
    val c = mk(s"__gw_$gwN")
    gwCalls += c
    graft.core.qcol(c.name)
  }

  // ---- order-sensitive vector fns (reference: src/crysda/columns.cr) ---

  /** reference: src/crysda/columns.cr:326-356 */
  def lead(c: Column, n: Int = 1, default: Any = null): Column =
    if (grouped) F.lead(c, n, default).over(wOrdered)
    else {
      requireOrd()
      val h = reg(GlobalWindows.Shift(_, c, n))
      // struct-null = row absent (edge) → default; present-but-null stays null
      when(h.isNull, lit(default)).otherwise(h.getField("v"))
    }

  def lag(c: Column, n: Int = 1, default: Any = null): Column =
    if (grouped) F.lag(c, n, default).over(wOrdered)
    else {
      requireOrd()
      val h = reg(GlobalWindows.Shift(_, c, -n))
      when(h.isNull, lit(default)).otherwise(h.getField("v"))
    }

  /** Running sum with the reference's NA-poisoning: one null poisons the
    * rest of the vector (reference: src/crysda/columns.cr:298-318).
    * Spark's window `sum` skips nulls, so we mask with a running
    * has-null flag. */
  def cumsum(c: Column): Column =
    if (grouped)
      when(max(when(c.isNull, 1).otherwise(0)).over(wRunning) === 1, lit(null))
        .otherwise(sum(c).over(wRunning))
    else {
      requireOrd()
      val flag = reg(GlobalWindows.RunningAgg(_, when(c.isNull, 1).otherwise(0), "max"))
      val run = reg(GlobalWindows.RunningAgg(_, c, "sum"))
      when(flag === 1, lit(null)).otherwise(run)
    }

  /** `(x / lag(x)) - 1` (reference: src/crysda/columns.cr:320-324) */
  def pctChange(c: Column): Column = c / lag(c, 1) - 1

  /** 1-based (reference: src/crysda/dataframe.cr:401-403) */
  def rowNumber: Column =
    if (grouped) F.row_number().over(wOrdered)
    else { requireOrd(); reg(GlobalWindows.RowNum(_)) }

  def rank(c: Column): Column =
    if (grouped) F.rank().over(base.orderBy(c))
    else reg(GlobalWindows.Rank(_, c))

  // ---- vectorized helpers (reference: src/crysda/context.cr) -----------

  /** np.where-style conditional (reference: src/crysda/context.cr:152-161) */
  def where(cond: Column, ifTrue: Column, ifFalse: Column): Column =
    when(cond, ifTrue).otherwise(ifFalse)

  /** Broadcast scalar (reference: src/crysda/context.cr:171-173) */
  def const(v: Any): Column = lit(v)

  def isNa(c: Column): Column = c.isNull
  def isNotNa(c: Column): Column = c.isNotNull

  /** NA-aware text match (reference: src/crysda/columns.cr:359-361):
    * null text matches nothing (false, not null). */
  def matching(c: Column, re: String): Column =
    coalesce(c.rlike(re), lit(false))

  /** Zip-concatenate two columns with a space, nulls stringified to
    * "NA" like the reference's AnyVal#to_s
    * (reference: src/crysda/extension.cr:58-61, utils.cr:115-117). */
  def concatenate(a: Column, b: Column): Column =
    concat(coalesce(a.cast("string"), lit("NA")), lit(" "),
      coalesce(b.cast("string"), lit("NA")))

  /** null→false, CrysDA's `nil_as_false` (reference: src/crysda/extension.cr:30-38) */
  def nilAsFalse(c: Column): Column = coalesce(c, lit(false))

  /** false→null, CrysDA's `false_as_nil` (reference: src/crysda/extension.cr:40-48) */
  def falseAsNil(c: Column): Column = when(c === false, lit(null)).otherwise(c)

  /** Rolling window aggregate over the trailing `width` rows (inclusive)
    * in the frame's explicit order — capability upgrade beyond the
    * reference (its only frames are implicit whole-prefix ones). */
  def rollingSum(c: Column, width: Int): Column = rolling(c, "sum", width)
  def rollingMean(c: Column, width: Int): Column = rolling(c, "avg", width)
  def rollingMin(c: Column, width: Int): Column = rolling(c, "min", width)
  def rollingMax(c: Column, width: Int): Column = rolling(c, "max", width)

  private def rolling(c: Column, fn: String, width: Int): Column =
    if (grouped) {
      val w = wOrdered.rowsBetween(-(width - 1).toLong, Window.currentRow)
      fn match {
        case "sum" => F.sum(c).over(w)
        case "avg" => avg(c).over(w)
        case "min" => F.min(c).over(w)
        case "max" => F.max(c).over(w)
      }
    } else {
      requireOrd()
      reg(GlobalWindows.Rolling(_, c, fn, width))
    }

  /** Index permutation of a column's sort order, 1-based — the
    * reference's `order` (reference: src/crysda/columns.cr:144-158). */
  def order(c: Column): Column =
    if (grouped)
      F.row_number().over(base.orderBy(c.asc_nulls_last))
    else reg(GlobalWindows.OrderIdx(_, c.asc_nulls_last))
}

/** Strict-NA aggregate helpers, the Spark counterpart of the reference's
  * `remove_na` flag: `removeNa=false` (the reference default) raises on
  * any NA in the aggregated column (reference: src/crysda/columns.cr:196-296,
  * utils.cr:127-148); `removeNa=true` skips NAs — which is Spark's
  * native null-skipping behavior.
  *
  * The strict mode embeds the check in the aggregate itself
  * (`raise_error` when any null observed) so it costs no extra pass.
  */
object Agg {
  private def strict(c: Column, agg: Column): Column =
    when(F.count(when(c.isNull, 1)) > 0,
      raise_error(lit("MissingValueException: NA in aggregated column")))
      .otherwise(agg)

  private def wrap(c: Column, agg: Column, removeNa: Boolean): Column =
    if (removeNa) agg else strict(c, agg)

  def mean(c: Column, removeNa: Boolean = false): Column = wrap(c, avg(c), removeNa)
  def sum(c: Column, removeNa: Boolean = false): Column = wrap(c, F.sum(c), removeNa)
  def min(c: Column, removeNa: Boolean = false): Column = wrap(c, F.min(c), removeNa)
  def max(c: Column, removeNa: Boolean = false): Column = wrap(c, F.max(c), removeNa)
  /** Exact median = percentile 0.5 with interpolation — the reference
    * averages the two middle values on even counts
    * (reference AggFuncs.median, src/crysda/columns.cr:34-56,
    * extension.cr:63-106), which `F.percentile` reproduces.
    * `percentile_approx` does NOT (it always returns an observed value),
    * so the approximate variant is opt-in under its own name. */
  def median(c: Column, removeNa: Boolean = false): Column =
    wrap(c, F.percentile(c, lit(0.5)), removeNa)
  def medianExact(c: Column, removeNa: Boolean = false): Column =
    median(c, removeNa)
  /** Sketch-based approximate median — scale-friendly (mergeable sketch,
    * no full sort) but NOT reference semantics on even counts. */
  def medianApprox(c: Column, removeNa: Boolean = false): Column =
    wrap(c, percentile_approx(c, lit(0.5), lit(10000)), removeNa)
  /** Exact interpolating percentile at arbitrary p ∈ [0,1] — the
    * generalization of [[median]] (SQL `percentile_cont` semantics,
    * matching DuckDB's `quantile_cont`). Exact percentile sorts each
    * group's values; for corpus-scale quantiles where an error bound
    * is acceptable use [[percentileApprox]] (mergeable sketch). */
  def percentile(c: Column, p: Double, removeNa: Boolean = false): Column = {
    require(p >= 0.0 && p <= 1.0, s"percentile p must be in [0,1], got $p")
    wrap(c, F.percentile(c, lit(p)), removeNa)
  }
  def percentileApprox(c: Column, p: Double, accuracy: Int = 10000,
                       removeNa: Boolean = false): Column = {
    require(p >= 0.0 && p <= 1.0, s"percentile p must be in [0,1], got $p")
    wrap(c, percentile_approx(c, lit(p), lit(accuracy)), removeNa)
  }
  /** sample sd, n-1 denominator (reference: src/crysda/extension.cr:96-106) */
  def sd(c: Column, removeNa: Boolean = false): Column = wrap(c, stddev_samp(c), removeNa)
  def sv(c: Column, removeNa: Boolean = false): Column = wrap(c, var_samp(c), removeNa)
  def n: Column = F.count(lit(1))
  def na(c: Column): Column = F.count(when(c.isNull, 1))
}
