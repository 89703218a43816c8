package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftkit.Bridge
import org.apache.spark.sql.types._

/** Thin immutable dplyr-style facade over a lazy Spark `DataFrame` —
  * the engine's core value type (SURVEY §7.1).
  *
  * Carries:
  *   - `df`       the underlying lazy plan (never materialized by verbs)
  *   - `groupedBy` grouping keys as metadata — the reference keeps a
  *     grouped frame as a first-class value supporting all verbs
  *     per-group (reference: src/crysda/groupdf.cr:22-30); on Spark,
  *     stateless verbs are group-invariant so the keys only influence
  *     aggregation and window partitioning.
  *   - `ordCols`  explicit ordering columns. The reference relies on
  *     implicit physical row order (reference: src/crysda/dataframe.cr:768-795);
  *     distributed Spark has none, so order-sensitive verbs
  *     (lead/lag/cumsum/slice/take/bindCols/print) require an order,
  *     captured at ingest via `monotonically_increasing_id` the first
  *     time it is needed, or replaced by `sortBy` keys.
  *
  * Every verb returns a new CrysFrame; all transformations stay lazy so
  * Catalyst sees the whole plan (pushdown, pruning, join selection for
  * free — SURVEY §4).
  *
  * Reserved namespace: column names starting with `__graft_` are the
  * engine's internal channel (ingest ordinal, carried sort refs) and
  * are invisible to `names`/`schema`/`out` — ingest data must not use
  * that prefix.
  */
final class CrysFrame private (
    val df: DataFrame,
    val groupedBy: Seq[String],
    private[core] val ords: Seq[CrysFrame.Ord]) {

  import CrysFrame._

  private def spark: SparkSession = df.sparkSession

  // ---------------------------------------------------------------------
  // introspection (reference: src/crysda/dataframe.cr:11-59)
  // ---------------------------------------------------------------------

  /** Visible column names (hidden internals excluded). */
  def names: Seq[String] = df.columns.toSeq.filterNot(isHidden)
  def numCol: Int = names.size
  /** Action. */
  def numRow: Long = df.count()
  def schema: StructType =
    StructType(df.schema.fields.filterNot(f => isHidden(f.name)))
  /** Underlying frame without internal columns, with the frame's
    * ordering applied — what sinks/actions observe. The sort is LAZY:
    * `sortBy` only records the keys, so grouped window verbs never pay
    * a useless global sort; the orderBy lands here, at observation
    * points, where Catalyst turns head-style access into
    * TakeOrderedAndProject. (The hidden ingest ordinal is physical
    * order already — no sort needed for it.) Hidden columns (the ingest
    * ordinal and ordering refs a projection carried along) are sorted
    * on, then dropped. */
  def out: DataFrame = {
    val sorted =
      if (ords.nonEmpty && !ingestOrderOnly) df.orderBy(ords.map(_.key): _*)
      else df
    val hiddenCols = sorted.columns.filter(isHidden)
    if (hiddenCols.nonEmpty) sorted.drop(hiddenCols.toSeq: _*) else sorted
  }

  /** True when the only ordering is the hidden ingest ordinal — physical
    * order already, no sort needed at observation points. */
  private def ingestOrderOnly: Boolean =
    ords.size == 1 && ords.head.refs == Seq(ORD)

  def isGrouped: Boolean = groupedBy.nonEmpty

  private def requireCols(cs: Seq[String]): Unit = {
    val missing = cs.filterNot(names.contains)
    if (missing.nonEmpty)
      throw new SelectException(s"Unknown column(s): ${missing.mkString(", ")}")
  }

  private def keep(newDf: DataFrame): CrysFrame = {
    val live = ords.filter(_.refs.forall(newDf.columns.contains))
    new CrysFrame(newDf, groupedBy, live)
  }

  private[core] def ctx: Ctx = new Ctx(groupedBy, ords.map(_.key))

  /** Ensure an explicit ordering exists (capture ingest order lazily).
    * Over a NARROW plan (scan / project / filter / union — nothing that
    * plans an exchange) the capture is `monotonically_increasing_id`:
    * free, codegen'd, pushdown-transparent, and stable because such
    * plans have one deterministic physical layout. Above anything wide
    * (join / aggregate / repartition / limit) mono_id is NOT stable:
    * AQE re-plans each referencing subtree independently, so two
    * branches of one query (or two observations) can see different
    * partition coalescing and therefore different ids — a self-join
    * over `take` of a repartitioned frame silently disagreed on which
    * rows were taken (fuzzer seed 2100). Wide plans capture through
    * the RDD zipWithIndex instead, whose `.rdd` freezes ONE physical
    * realization that every downstream branch shares (same soundness
    * argument as [[Joins]]' `Binds.withIdx` scaladoc) — and the
    * stamped result is PERSISTED: zipWithIndex freezes the lineage,
    * not the evaluation, so without a cache two separate actions over
    * the stamped frame would each re-fetch the upstream shuffle in
    * their own nondeterministic within-partition order and could
    * disagree on which row got which ordinal (the seed-2100 class,
    * one level up). Same MEMORY_AND_DISK / LRU contract as the
    * frozen-draw `take` and [[GlobalWindows]] persists; as there,
    * eviction re-rolls the capture for later consumers — the
    * stability guarantee is as durable as the cache entry.
    * `lazy val`, not `def` (r9): two order-sensitive verbs on the
    * same instance then share ONE capture (and one cache entry)
    * instead of stamping — and persisting — twice. */
  private lazy val ordered: CrysFrame =
    if (ords.nonEmpty) this
    else if (df.columns.contains(ORD))
      new CrysFrame(df, groupedBy, Seq(ingestOrd))
    else {
      val stamped =
        if (narrowDeterministic(df.queryExecution.analyzed))
          df.withColumn(ORD, monotonically_increasing_id())
        else
          Binds.withIdxAs(df, ORD)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      new CrysFrame(stamped, groupedBy, Seq(ingestOrd))
    }

  // ---------------------------------------------------------------------
  // projection (reference: src/crysda/dataframe.cr:465-495, select.cr)
  // ---------------------------------------------------------------------

  /** Keep columns in argument order; errors on missing / duplicate
    * selection (reference: src/crysda/dataframe.cr:465-481).
    * The frame's ordering survives the projection even when a sort key
    * is projected away (the reference physically reordered rows at sort
    * time, so select never loses order): un-selected ordering refs ride
    * along as hidden columns and are dropped at observation points. */
  def select(cols: String*): CrysFrame = {
    requireCols(cols)
    if (cols.distinct.size != cols.size)
      throw new SelectException(s"Duplicate selection: ${cols.mkString(", ")}")
    val keepOrd = if (df.columns.contains(ORD)) Seq(ORD) else Nil
    val rideAlong = ords.flatMap(_.refs).distinct
      .filterNot(r => cols.contains(r) || r == ORD)
      .filter(df.columns.contains)
    val aliasMap = rideAlong.map(r => r -> hiddenAlias(r)).toMap
    val projected = df.select(
      ((cols ++ keepOrd).map(qcol) ++
        rideAlong.map(r => qcol(r).as(aliasMap(r)))): _*)
    new CrysFrame(projected, groupedBy, ords.map(_.remap(aliasMap)))
  }

  def select(selector: ColumnSelector): CrysFrame =
    select(selector.resolve(names, schema): _*)

  /** Drop by names (reference: src/crysda/dataframe.cr:342-367).
    * Routed through `select` so the frame's ordering survives. */
  def reject(cols: String*): CrysFrame = {
    requireCols(cols)
    select(names.filterNot(cols.contains): _*)
  }
  def reject(selector: ColumnSelector): CrysFrame =
    reject(selector.resolve(names, schema): _*)

  /** Rename old→new preserving positions; renames to the same name are
    * ignored (reference: src/crysda/dataframe.cr:370-398). */
  def rename(pairs: (String, String)*): CrysFrame = {
    val real = pairs.filter { case (o, n) => o != n }
    requireCols(real.map(_._1))
    val m = real.toMap
    val renamed = df.withColumnsRenamed(m)
    new CrysFrame(renamed,
      groupedBy.map(g => m.getOrElse(g, g)),
      ords.map(_.remap(m)))
  }

  /** Replace all names (reference: src/crysda/dataframe.cr:488-495). */
  def setNames(newNames: String*): CrysFrame = {
    require(newNames.size == numCol, s"need ${numCol} names")
    rename(names.zip(newNames): _*)
  }

  /** reference: src/crysda/dataframe.cr:323-332 */
  def moveLeft(cols: String*): CrysFrame = {
    requireCols(cols)
    select((cols ++ names.filterNot(cols.contains)): _*)
  }
  def moveRight(cols: String*): CrysFrame = {
    requireCols(cols)
    select((names.filterNot(cols.contains) ++ cols): _*)
  }

  // ---------------------------------------------------------------------
  // mutate (reference: src/crysda/dataframe.cr:71-88, simpledf.cr:70-78)
  // ---------------------------------------------------------------------

  /** Add or replace a column. Scalars broadcast via `lit`; group-relative
    * expressions (ctx.cumsum, ctx.lead, ...) window over the grouping
    * keys automatically (reference: src/crysda/groupdf.cr:77-79). */
  def addColumn(name: String)(expr: Ctx => Column): CrysFrame = {
    val cx = ctx
    val c = expr(cx)
    new CrysFrame(withGlobalWindows(cx)(_.withColumn(name, c)), groupedBy, ords)
  }

  /** Materialize any scale-safe global-window helpers the closure's
    * Ctx registered (ungrouped cumsum/lead/lag/rank/... — see
    * [[GlobalWindows]]), apply `body` while the helper columns are in
    * scope, then drop them. No registered calls → `body(df)` as-is. */
  private def withGlobalWindows(cx: Ctx)(body: DataFrame => DataFrame): DataFrame = {
    val calls = cx.globalCalls
    if (calls.isEmpty) body(df)
    else {
      val (aug, temps) = GlobalWindows.materialize(df, cx.ordCols, calls)
      body(aug).drop(temps: _*)
    }
  }

  /** Capture the current physical row order as the frame's explicit
    * ordering (the reference's implicit row order, materialized). */
  def withRowOrder: CrysFrame = ordered

  def addColumns(exprs: (String, Ctx => Column)*): CrysFrame = {
    // ONE shared Ctx: every column's global-window helpers materialize
    // in a single GlobalWindows pass (one sort + index), instead of
    // once per column. Exception: a global call whose expression reads
    // a sibling column introduced (or replaced) EARLIER in this same
    // call can't resolve against the pre-addColumns frame the shared
    // pass uses — those fall back to the chained per-column form, which
    // matches the reference's sequential add_column semantics (one
    // GlobalWindows pass per dependent column: correctness over the
    // single-pass economy; closures must be pure, they re-evaluate).
    val cx = ctx
    var seen = 0
    // lowercase on both sides: Spark resolution is case-insensitive by
    // default, so `col("DBL")` DOES read a sibling introduced as "dbl"
    val introduced = scala.collection.mutable.HashSet.empty[String]
    var sequential = false
    val cols = exprs.map { case (n, e) =>
      val c = e(cx)
      val newCalls = cx.globalCalls.drop(seen)
      seen += newCalls.size
      if (!sequential && introduced.nonEmpty && newCalls.exists { call =>
            val (refs, opaque) = GlobalWindows.callRefs(call)
            // opaque (expr("..."), star) → references unknowable
            // without a session → assume the worst and go sequential
            opaque || refs.exists(r => introduced.contains(r.toLowerCase))
          })
        sequential = true
      introduced += n.toLowerCase
      n -> c
    }
    if (sequential)
      exprs.foldLeft(this) { case (f, (n, e)) => f.addColumn(n)(e) }
    else
      new CrysFrame(withGlobalWindows(cx)(d =>
        cols.foldLeft(d) { case (dd, (n, c)) => dd.withColumn(n, c) }),
        groupedBy, ords)
  }

  /** addColumns then keep only those (reference: src/crysda/dataframe.cr:594-596). */
  def transmute(exprs: (String, Ctx => Column)*): CrysFrame =
    addColumns(exprs: _*).select(exprs.map(_._1): _*)

  /** Prepend a 1-based row-number column (reference: src/crysda/dataframe.cr:100-102).
    * Scale-safe: range sort on the frame's ordering + RDD zipWithIndex
    * (`Binds.withRowNumber`) — never a partition-less `Window.orderBy`,
    * which would funnel every row through a single task. */
  def addRowNumber(name: String = "row_number"): CrysFrame = {
    val c = ordered
    val numbered = Binds.withRowNumber(c.df.orderBy(c.ords.map(_.key): _*), name)
    new CrysFrame(numbered, groupedBy, c.ords).moveLeft(name)
  }

  // ---------------------------------------------------------------------
  // filter / row subsetting (reference: src/crysda/dataframe.cr:238-274)
  // ---------------------------------------------------------------------

  /** Boolean-mask filter; in the reference a null comparison filters the
    * row out — identical to Catalyst 3VL filter semantics
    * (reference: src/crysda/simpledf.cr:80-105). */
  def filter(pred: Ctx => Column): CrysFrame = {
    val cx = ctx
    val c = pred(cx)
    new CrysFrame(withGlobalWindows(cx)(_.filter(c)), groupedBy, ords)
  }

  /** Row-wise lambda filter (reference: src/crysda/dataframe.cr:252-274).
    * Not codegen'd — prefer `filter` with Column predicates. */
  def filterByRow(p: Row => Boolean): CrysFrame = keep(df.filter(p))

  /** Row-wise filter with the 0-based row index in the frame's order
    * (reference: src/crysda/dataframe.cr:262-274). Indexing uses RDD
    * zipWithIndex — no single-partition window; the predicate row
    * carries the visible schema. */
  def filterByRowWithIndex(p: (Row, Long) => Boolean): CrysFrame = {
    val base = out
    val visSchema = base.schema
    val withIdx = Binds.withIdx(base)
    CrysFrame(withIdx.filter { r =>
      p(new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        r.toSeq.init.toArray, visSchema), r.getLong(r.length - 1))
    }.drop(IDX))
  }

  /** Row-wise transformation escape hatch — the reference's `map{}`
    * over cells (reference: src/crysda/columns.cr:170-182). Distributed
    * via mapPartitions but NOT codegen'd: prefer Column expressions for
    * anything hot. */
  def mapRows(outSchema: StructType)(f: Row => Row): CrysFrame =
    CrysFrame(out.mapPartitions(_.map(f))(
      org.apache.spark.sql.Encoders.row(outSchema)).toDF())

  /** Re-infer a string column's type (the reference's `convert_type`,
    * reference: src/crysda/reshape.cr:249-253): Long → Double → Boolean
    * probed over all values in one aggregate pass. */
  def convertType(column: String): CrysFrame = Reshape.convertType(this, column)

  /** Select rows by 1-based position, per group when grouped
    * (reference: src/crysda/dataframe.cr:503-510). */
  def slice(idx: Int*): CrysFrame = sliceWhere(_.isin(idx.map(Integer.valueOf): _*))
  def slice(r: Range): CrysFrame = sliceWhere(c => c.between(r.head, r.last))

  private def sliceWhere(cond: Column => Column): CrysFrame = {
    val c = ordered
    val tagged =
      if (groupedBy.nonEmpty) {
        // per-group ordinal: the window is PARTITIONED on the keys, so
        // each group's rows stay on one task — scale-safe as long as no
        // single group is executor-sized
        val w = Window.partitionBy(groupedBy.map(qcol): _*)
          .orderBy(c.ords.map(_.key): _*)
        c.df.withColumn(RN, F.row_number().over(w))
      } else
        // ungrouped global ordinal: range sort + RDD zipWithIndex — a
        // partition-less Window.orderBy would collapse to one task
        Binds.withRowNumber(c.df.orderBy(c.ords.map(_.key): _*), RN)
    new CrysFrame(c.restoreOrder(tagged.filter(cond(col(RN))).drop(RN)),
      groupedBy, c.ords)
  }

  /** The window/limit machinery physically reorders rows; when the
    * frame's ordering is the ingest ordinal, `out` trusts physical
    * order (it skips the sort), so the REDUCED result must be put back
    * in ordinal order here — a sort of the already-shrunk output, not
    * the input. Frames ordered by real sort keys re-sort at `out`
    * anyway, so this is skipped for them. */
  private def restoreOrder(reduced: DataFrame): DataFrame =
    if (ingestOrderOnly) reduced.orderBy(ords.map(_.key): _*) else reduced

  /** First n rows — per group when grouped (reference: src/crysda/dataframe.cr:317-320).
    * Ungrouped with an order: `orderBy(keys).limit(n)` compiles to
    * TakeOrderedAndProject (per-partition heap + driver merge) — same
    * rows as the row_number window, no single-task global sort.
    *
    * Ordering-less: a bare `limit(n)` reads its single-partition
    * shuffle in block-fetch order, so two evaluations of the same lazy
    * plan could return DIFFERENT subsets — a self-join over `take`
    * silently lost rows (fuzzer seed 2100). The selection is
    * arbitrary either way (the frame has no defined order), so the fix
    * is to make it arbitrary-but-STABLE: `.rdd` freezes ONE physical
    * realization of the limit that every consumer shares (the
    * [[Joins]] `Binds.withIdx` soundness argument), and the ≤n-row
    * result is persisted so later jobs re-read the same draw rather
    * than re-fetching shuffle blocks in a new order (bounded by the
    * caller's own n; LRU-evicted like the other documented persist
    * sites — NOTE: eviction silently RE-ROLLS the draw for consumers
    * that evaluate after it, so the stability guarantee holds exactly
    * as long as the cache entry does; callers needing draw stability
    * across heavy memory pressure should checkpoint or write out the
    * taken rows). This keeps limit's early-stop — an ordinal capture
    * (`ordered`) would evaluate the upstream twice and turn head-style
    * peeking at a scan into a full pass. The ingest ordinal stamped on
    * the single-partition result pins the draw's row order for
    * downstream order-sensitive verbs. */
  def take(n: Int): CrysFrame =
    if (groupedBy.nonEmpty) slice(1 to n)
    else if (ords.nonEmpty || df.columns.contains(ORD)) {
      val c = ordered
      c.keep(c.restoreOrder(c.df.orderBy(c.ords.map(_.key): _*).limit(n)))
    } else {
      val lim = df.limit(n)
      val frozen = spark.createDataFrame(lim.rdd, lim.schema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      new CrysFrame(frozen.withColumn(ORD, monotonically_increasing_id()),
        groupedBy, Seq(ingestOrd))
    }
  def head(n: Int = 5): CrysFrame = take(n)

  /** Last n rows (reference: src/crysda/dataframe.cr:581-591).
    * Ungrouped: TakeOrderedAndProject on the REVERSED keys — the frame
    * keeps its forward ordering, so observation re-sorts the ≤n rows. */
  def takeLast(n: Int): CrysFrame =
    if (groupedBy.isEmpty) {
      val c = ordered
      c.keep(c.restoreOrder(c.df.orderBy(c.ords.map(_.rev): _*).limit(n)))
    } else {
      val c = ordered
      val w = Window.partitionBy(groupedBy.map(qcol): _*).orderBy(c.ords.map(_.rev): _*)
      val tagged = c.df.withColumn(RN, F.row_number().over(w))
      new CrysFrame(c.restoreOrder(tagged.filter(col(RN) <= n).drop(RN)),
        groupedBy, c.ords)
    }

  /** Exact-n random sample, per group when grouped
    * (reference: src/crysda/dataframe.cr:414-440). Window-over-rand:
    * statistically different RNG from the reference (only cardinalities
    * are spec'd there). */
  def sampleN(n: Int, seed: Long = 42L, replace: Boolean = false): CrysFrame = {
    if (n < 0)
      throw new CrysdaException(s"Sample size must be greater equal than 0 but was $n")
    if (n == 0) new CrysFrame(df.limit(0), groupedBy, Nil)
    else if (replace) sampleWithReplacement(_ => lit(n), seed)
    else if (groupedBy.isEmpty) {
      // reference raises EAGERLY on ungrouped over-sampling
      // (dataframe.cr:428, spec/core_spec.cr:320-326); the count job is
      // the price of the exact-n error contract
      if (n > numRow)
        throw new CrysdaException(s"can not over-sample data without replace (num_row<$n)")
      sampleWhere(_ => lit(n))
    } else
      // grouped: the guard rides inside the query — no extra job, no
      // driver round trip; a too-small group raises at action time
      sampleWhere(cnt => when(lit(n) > cnt,
        raise_error(lit(s"can not over-sample data without replace (num_row<$n)")))
        .otherwise(lit(n)))
  }

  /** Exact-fraction sample: bround(frac × group size) rows per group
    * (the reference delegates to sample_n((frac*num_row).round) per
    * group — dataframe.cr:414-419 — and Crystal's Float#round is
    * ties-to-even, hence `bround`), NOT Bernoulli row-flipping. A
    * fraction whose rounded target exceeds a group raises the
    * over-sample error like the reference's sample_n. The grouped form
    * is partition-parallel; ungrouped it pays a count job plus a
    * range sort on rand (exact global sampling is count-shaped by
    * nature — use `sampleFracApprox` for scan-speed sampling). */
  def sampleFrac(frac: Double, seed: Long = 42L, replace: Boolean = false): CrysFrame = {
    if (frac < 0)
      throw new CrysdaException(s"fraction must be greater equal than 0 but was $frac")
    if (replace) sampleWithReplacement(m => F.bround(m * frac), seed)
    else sampleWhere { cnt =>
      val target = F.bround(cnt * frac)
      when(target > cnt,
        raise_error(lit("can not over-sample data without replace"))).otherwise(target)
    }
  }

  /** Without-replacement machinery: keep the first `targetOf(groupSize)`
    * rows per group in random order. Like the reference, the sampled
    * frame's prior ordering is DISCARDED — sample_n materializes rows
    * in shuffled order (simpledf via shuf_idx, dataframe.cr:430-439),
    * the same contract as `shuffle()`.
    *
    * Grouped: a window PARTITIONED on the keys (each group on one
    * task). Ungrouped: a partition-less window would funnel the whole
    * frame through a single task, so the global ordinal comes from a
    * range sort on rand + RDD zipWithIndex instead, with the target
    * count evaluated once from a count job (exact sampling pays
    * counts by contract — `sampleFracApprox` is the scan-speed
    * variant).
    *
    * Cross-branch caveat (grouped form only): `rand(seed)` is seeded
    * per physical partition, so over a post-shuffle frame two
    * AQE-re-planned references to the same sample inside one query can
    * draw different MEMBERS (counts stay exact — the count window rides
    * the same partition). The ungrouped form is immune (zipWithIndex
    * freezes one realization — see `ordered`). Self-joining a grouped
    * sample is the only way to observe this; persist the sample first
    * if that matters. */
  private def sampleWhere(targetOf: Column => Column, seed: Long = 42L): CrysFrame = {
    if (groupedBy.nonEmpty) {
      val part = Window.partitionBy(groupedBy.map(qcol): _*)
      new CrysFrame(df
        .withColumn(RN, F.row_number().over(part.orderBy(rand(seed))))
        .withColumn(CNT, targetOf(F.count(lit(1)).over(part)))
        .filter(col(RN) <= col(CNT))
        .drop(RN, CNT), groupedBy, Nil)
    } else {
      val n = df.count()
      // one-row evaluation of the target expression — raise_error
      // guards (over-sample refusal) fire HERE, eagerly
      val target = spark.range(1)
        .select(targetOf(lit(n)).cast("long").as("__t")).collect()(0).getLong(0)
      val kept = Binds.withRowNumber(df.orderBy(rand(seed)), RN)
        .filter(col(RN) <= target).drop(RN)
      new CrysFrame(kept, groupedBy, Nil)
    }
  }

  /** With-replacement machinery: `targetOf(groupSize)` uniform draws per
    * group joined back by row number — two small shuffles, no
    * driver-side state (reference: src/crysda/dataframe.cr:414-440). */
  private def sampleWithReplacement(targetOf: Column => Column, seed: Long): CrysFrame = {
    val keys = groupedBy
    if (keys.nonEmpty) {
      val numbered = df.withColumn(RN, F.row_number().over(
        Window.partitionBy(keys.map(qcol): _*).orderBy(rand(seed + 1))))
      val sizes = numbered.groupBy(keys.map(qcol): _*).agg(F.max(col(RN)).as("__m"))
      val target = targetOf(col("__m")).cast("int")
      val draws = sizes
        // sequence(1, 0) would DESCEND to [1, 0]; a zero/negative target
        // must contribute no draws at all
        .withColumn("__draw", explode(when(target >= 1, sequence(lit(1), target))
          .otherwise(array().cast("array<int>"))))
        .withColumn(RN, (floor(rand(seed) * col("__m")) + 1).cast("int"))
        .drop("__m", "__draw")
      new CrysFrame(numbered.join(draws, keys :+ RN).drop(RN), groupedBy, Nil)
    } else {
      // ungrouped: no partition-less window for the ordinal (range
      // sort + zipWithIndex), no global max-aggregate for the size
      // (one count job), and the draws come from spark.range — a
      // DISTRIBUTED sequence, so a billion-draw resample never
      // generates all its draws on one task the per-group explode
      // would use
      val m = df.count()
      val target = spark.range(1)
        .select(targetOf(lit(m)).cast("long").as("__t")).collect()(0).getLong(0)
      val numbered = Binds.withRowNumber(df.orderBy(rand(seed + 1)), RN)
      val draws = spark.range(math.max(0L, target))
        .select((floor(rand(seed) * m) + 1).cast("int").as(RN))
      new CrysFrame(numbered.join(draws, Seq(RN)).drop(RN), groupedBy, Nil)
    }
  }

  /** Bernoulli per-row sampling — approximate cardinality, map-only,
    * the scale-friendly variant (Spark-native `df.sample`). */
  def sampleFracApprox(frac: Double, seed: Long = 42L): CrysFrame =
    keep(df.sample(withReplacement = false, frac, seed))

  /** reference: src/crysda/dataframe.cr:498-500 */
  def shuffle(seed: Long = 42L): CrysFrame =
    new CrysFrame(df.orderBy(rand(seed)), groupedBy, Nil)

  /** Unique rows by key subset, keeping the first full row per key —
    * matches Spark's `dropDuplicates` exactly
    * (reference: src/crysda/dataframe.cr:216-223). The reference
    * defines distinct as `group_by(selects).slice(1).ungroup`, and its
    * grouped `group_by` UNGROUPS first (groupdf.cr:85-87) — so distinct
    * always dedups globally (prior grouping ignored) and returns an
    * UNGROUPED frame; found by the grouped-equivalence property test. */
  def distinct(cols: String*): CrysFrame = {
    def ungrouped(newDf: DataFrame): CrysFrame =
      new CrysFrame(newDf, Nil, ords.filter(_.refs.forall(newDf.columns.contains)))
    if (cols.isEmpty)
      ungrouped(df.drop(df.columns.filter(isHidden).toSeq: _*).dropDuplicates())
    else {
      requireCols(cols)
      if (ords.nonEmpty && !ingestOrderOnly) {
        // keep the FIRST row per key in the frame's order — the
        // deterministic version of dropDuplicates' keep-first
        val w = Window.partitionBy(cols.map(qcol): _*).orderBy(ords.map(_.key): _*)
        ungrouped(df.withColumn(RN, F.row_number().over(w)).filter(col(RN) === 1).drop(RN))
      } else ungrouped(df.dropDuplicates(cols))
    }
  }

  // ---------------------------------------------------------------------
  // sorting (reference: src/crysda/dataframe.cr:514-547, simpledf.cr:149-165)
  // ---------------------------------------------------------------------

  /** Stable multi-key ascending sort, NAs always last
    * (reference: src/crysda/columns.cr:447-457). The sort keys become
    * the frame's explicit ordering for subsequent window verbs. */
  def sortBy(cols: String*): CrysFrame = {
    requireCols(cols)
    new CrysFrame(df, groupedBy, stabilized(cols.map(c =>
      Ord(qcol(c).asc_nulls_last, qcol(c).desc_nulls_first, Seq(c)))))
  }

  /** Descending, still NAs last (reference: spec/core_spec.cr:290-301). */
  def sortDescBy(cols: String*): CrysFrame = {
    requireCols(cols)
    new CrysFrame(df, groupedBy, stabilized(cols.map(c =>
      Ord(qcol(c).desc_nulls_last, qcol(c).asc_nulls_first, Seq(c)))))
  }

  /** The reference sort is STABLE (ties keep PRIOR row order,
    * reference: src/crysda/simpledf.cr:149-165). Distributed sort is
    * not — so the frame's previous ordering (which itself ends in the
    * ingest ordinal when one was captured) rides along as the
    * tiebreaker chain: sortBy("a").sortBy("b") leaves b-ties in
    * a-order, exactly like re-sorting physically ordered rows. Keys
    * re-sorted on are dropped from the chain. Frames without any
    * captured order (e.g. straight off parquet) have no prior order to
    * preserve. */
  private def stabilized(keys: Seq[Ord]): Seq[Ord] = {
    val prior =
      if (ords.nonEmpty) ords
      else if (df.columns.contains(ORD)) Seq(ingestOrd)
      else Nil
    keys ++ prior.filterNot(p =>
      p.refs.nonEmpty && keys.exists(_.refs == p.refs))
  }

  /** Sort by fully-specified orderings (caller supplies direction, e.g.
    * `c("x").desc` — the reference's `desc(col)` sort helper,
    * reference: src/crysda/context.cr:177-193). */
  def sortByOrder(exprs: (Ctx => Column)*): CrysFrame = {
    val cx = ctx
    val cols = exprs.map(e => e(cx))
    cx.assertNoGlobalCalls("sortByOrder")
    sortMaterialized(cols)(ordOf) { (c, h) =>
      val (_, reApply) = Bridge.sortSpec(c)
      ordOf(reApply(qcol(h)))
    }(c => Bridge.sortSpec(c)._1)
  }

  /** Sort by computed expressions (reference: src/crysda/dataframe.cr:530-547). */
  def sortByExpr(exprs: (Ctx => Column)*): CrysFrame = {
    val cx = ctx
    val cols = exprs.map(e => e(cx))
    cx.assertNoGlobalCalls("sortByExpr")
    sortMaterialized(cols)(c =>
      Ord(c.asc_nulls_last, c.desc_nulls_first, refsOf(c))) { (_, h) =>
      Ord(qcol(h).asc_nulls_last, qcol(h).desc_nulls_first, Seq(h))
    }(identity)
  }

  /** Shared tail of sortByOrder/sortByExpr. A plain-attribute key (bare
    * or direction-wrapped — what [[Bridge.renameAttr]] can rebuild)
    * stays a direct reference: remappable on rename, resolvable through
    * any lineage. A COMPUTED key is materialized as a hidden
    * `__graft_sortkey_N` column at sort time instead of being carried
    * as a live expression: a node-backed composite Column cannot be
    * rewritten on rename, and Spark's missing-attribute fallback that
    * used to resolve the stale reference is severed by the first RDD
    * boundary downstream (e.g. a global-window materialization's
    * zipWithIndex → createDataFrame), leaving the frame's ordering
    * unresolvable far from the sort call (found by the verb-chain
    * fuzzer, seed 1215). Materializing also pins SNAPSHOT semantics —
    * the key is computed over the columns as they were at sort time,
    * exactly like the reference's physical sort — instead of silently
    * re-binding to a later same-named column. Hidden key columns of
    * orderings this sort supersedes are dropped so chained sorts don't
    * accumulate them. */
  private def sortMaterialized(cols: Seq[Column])(
      mkPlain: Column => Ord)(
      mkOrd: (Column, String) => Ord)(value: Column => Column): CrysFrame = {
    var newDf = df
    val ords2 = cols.map { c =>
      if (Bridge.renameAttr(c, Map.empty).isDefined) mkPlain(c)
      else {
        val h = freshSortKey()
        newDf = newDf.withColumn(h, value(c))
        mkOrd(c, h)
      }
    }
    val ords3 = stabilized(ords2)
    val liveSk = ords3.flatMap(_.refs).filter(_.startsWith(SK)).toSet
    val staleSk = newDf.columns.filter(n => n.startsWith(SK) && !liveSk(n))
    if (staleSk.nonEmpty) newDf = newDf.drop(staleSk.toSeq: _*)
    new CrysFrame(newDf, groupedBy, ords3)
  }

  // ---------------------------------------------------------------------
  // grouping & aggregation (reference: src/crysda/groupdf.cr, simpledf.cr:107-125)
  // ---------------------------------------------------------------------

  /** Lazy grouping annotation — no physical partitioning happens here;
    * the shuffle (if any) belongs to the downstream aggregation, which
    * Catalyst executes partial-then-final (reference materializes
    * per-group sub-frames instead: src/crysda/simpledf.cr:167-198). */
  def groupBy(cols: String*): CrysFrame = {
    requireCols(cols)
    new CrysFrame(df, cols, ords)
  }

  /** Group by computed expression(s), materialized as `group_by_1..k`
    * (reference: src/crysda/dataframe.cr:298-315). */
  def groupByExpr(exprs: (Ctx => Column)*): CrysFrame = {
    val withCols = exprs.zipWithIndex.foldLeft(this) { case (f, (e, i)) =>
      f.addColumn(s"group_by_${i + 1}")(e)
    }
    withCols.groupBy(exprs.indices.map(i => s"group_by_${i + 1}"): _*)
  }

  /** reference: src/crysda/groupdf.cr:89-92 */
  def ungroup: CrysFrame = new CrysFrame(df, Nil, ords)

  /** Distinct key tuples (reference: src/crysda/groupdf.cr:94-97). */
  def groupedKeys: CrysFrame = {
    require(isGrouped, "not grouped")
    CrysFrame(df.select(groupedBy.map(qcol): _*).distinct())
  }

  /** Each row its own group (reference: src/crysda/dataframe.cr:406-412):
    * on Spark row-scoped expressions are the default, so rowwise just
    * clears grouping. */
  def rowwise: CrysFrame = ungroup

  /** Aggregate to one row per group (reference: src/crysda/groupdf.cr:104-110,
    * simpledf.cr:107-125). Catalyst runs partial aggregation before the
    * shuffle and final after — one job, no per-group materialization. */
  def summarize(rules: (String, Ctx => Column)*): CrysFrame = {
    val c = new Ctx(groupedBy, Nil)
    val aggs = rules.map { case (n, e) => e(c).as(n) }
    c.assertNoGlobalCalls("summarize")
    val res =
      try {
        if (groupedBy.isEmpty) out.agg(aggs.head, aggs.tail: _*)
        else out.groupBy(groupedBy.map(qcol): _*).agg(aggs.head, aggs.tail: _*)
      } catch {
        // a rule that is a bare column / row-level expression does not
        // reduce to one scalar per group — surface the reference-shaped
        // error (reference: columns.cr:27-31, spec core_spec.cr:313-317)
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.startsWith("MISSING_AGGREGATION") ||
                c.startsWith("MISSING_GROUP_BY") ||
                c.startsWith("UNRESOLVED_ALL_IN_GROUP_BY") ||
                c.contains("GROUP_BY")) =>
          throw new NonScalarValueException(
            s"summarize() expression did not evaluate into a scalar value: ${e.getMessage}")
      }
    CrysFrame(res)
  }

  /** CUBE aggregation — subtotals over every key subset (capability
    * upgrade beyond the reference, SURVEY §2.5 note; Catalyst expands
    * grouping sets before the shuffle, still one pass). */
  def summarizeCube(cols: Seq[String], rules: (String, Ctx => Column)*): CrysFrame = {
    requireCols(cols)
    val c = new Ctx(Nil, Nil)
    val aggs = rules.map { case (n, e) => e(c).as(n) }
    c.assertNoGlobalCalls("summarizeCube")
    CrysFrame(out.cube(cols.map(qcol): _*).agg(aggs.head, aggs.tail: _*))
  }

  /** ROLLUP aggregation — hierarchical subtotals. */
  def summarizeRollup(cols: Seq[String], rules: (String, Ctx => Column)*): CrysFrame = {
    requireCols(cols)
    val c = new Ctx(Nil, Nil)
    val aggs = rules.map { case (n, e) => e(c).as(n) }
    c.assertNoGlobalCalls("summarizeRollup")
    CrysFrame(out.rollup(cols.map(qcol): _*).agg(aggs.head, aggs.tail: _*))
  }

  /** Apply aggregate fns over a column selection; result names
    * `col.suffix` (reference: src/crysda/dataframe.cr:561-579). */
  def summarizeAt(selector: ColumnSelector, fns: (String, Column => Column)*): CrysFrame = {
    val cols = selector.resolve(names, schema)
    val rules = for (cn <- cols; (suffix, f) <- fns)
      yield s"$cn.$suffix" -> ((_: Ctx) => f(qcol(cn)))
    summarize(rules: _*)
  }

  /** Cross-tabulation count; respects existing grouping
    * (reference: src/crysda/dataframe.cr:184-204). */
  def count(cols: String*): CrysFrame = {
    val keys = groupedBy ++ cols.filterNot(groupedBy.contains)
    if (keys.isEmpty) CrysFrame(out.agg(F.count(lit(1)).as("n")))
    else { requireCols(cols); CrysFrame(out.groupBy(keys.map(qcol): _*).agg(F.count(lit(1)).as("n"))) }
  }

  /** Per-group sub-frames as first-class (lazy) values — the
    * reference's `groups` accessor (reference: src/crysda/groupdf.cr:99-103).
    * The distinct key tuples are collected driver-side; each sub-frame
    * is a lazy filtered view (no data is materialized here). Driver
    * memory scales with the NUMBER OF GROUPS — for per-group
    * computation at scale prefer `transformGroupsRows` or plain
    * grouped verbs, which never leave the cluster. */
  def groups: Seq[(Seq[Any], CrysFrame)] = {
    require(isGrouped, "groups requires grouping")
    groupedKeys.collectRows().map { key =>
      val tuple = groupedBy.map(k => key.getAs[Any](k))
      val cond = groupedBy.zip(tuple).map { case (k, v) =>
        if (v == null) qcol(k).isNull else qcol(k) === lit(v)
      }.reduce(_ && _)
      tuple -> new CrysFrame(df.filter(cond), Nil, ords)
    }
  }

  /** Per-group user logic over whole sub-frames — the scalable
    * counterpart of the reference's `transform_groups`
    * (reference: src/crysda/groupdf.cr:99-114). Runs distributed via
    * `flatMapGroups`; each group must fit in one task's memory. */
  def transformGroupsRows(f: (Row, Iterator[Row]) => Iterator[Row], outSchema: StructType): CrysFrame = {
    require(isGrouped, "transformGroups requires grouping")
    val keyCols = groupedBy
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // injective key encoding: nulls get their own marker (distinct from
    // the string "null"), values are prefixed and separator-escaped, so
    // ("a|b","c") and ("a","b|c") can never collide
    val grouped = out.groupByKey { r =>
      keyCols.map { k =>
        val v = r.getAs[Any](k)
        if (v == null) "\u0000"
        else "=" + String.valueOf(v).replace("\\", "\\\\").replace("|", "\\|")
      }.mkString("|")
    }(org.apache.spark.sql.Encoders.STRING)
    val res = grouped.flatMapGroups { (_, it: Iterator[Row]) =>
      val rows = it.toSeq
      f(rows.head, rows.iterator)
    }(enc)
    CrysFrame(res.toDF())
  }

  // ---------------------------------------------------------------------
  // joins (reference: src/crysda/joins.cr)
  // ---------------------------------------------------------------------

  def leftJoin(right: CrysFrame, by: Seq[String] = null,
               byPairs: Seq[(String, String)] = Nil,
               suffices: (String, String) = (".x", ".y")): CrysFrame =
    Joins.join(this, right, "left", Option(by), byPairs, suffices)

  def rightJoin(right: CrysFrame, by: Seq[String] = null,
                byPairs: Seq[(String, String)] = Nil,
                suffices: (String, String) = (".x", ".y")): CrysFrame =
    Joins.join(this, right, "right", Option(by), byPairs, suffices)

  def innerJoin(right: CrysFrame, by: Seq[String] = null,
                byPairs: Seq[(String, String)] = Nil,
                suffices: (String, String) = (".x", ".y")): CrysFrame =
    Joins.join(this, right, "inner", Option(by), byPairs, suffices)

  def outerJoin(right: CrysFrame, by: Seq[String] = null,
                byPairs: Seq[(String, String)] = Nil,
                suffices: (String, String) = (".x", ".y")): CrysFrame =
    Joins.join(this, right, "full_outer", Option(by), byPairs, suffices)

  /** Filter left to keys present in right — `left_semi`, no suffixing,
    * no duplicate rows (reference: src/crysda/joins.cr:39-55). */
  def semiJoin(right: CrysFrame, by: Seq[String] = null): CrysFrame =
    Joins.filterJoin(this, right, "left_semi", Option(by))

  /** NOT EXISTS — absent from the reference, free on Spark (SURVEY §2.7). */
  def antiJoin(right: CrysFrame, by: Seq[String] = null): CrysFrame =
    Joins.filterJoin(this, right, "left_anti", Option(by))

  def crossJoin(right: CrysFrame,
                suffices: (String, String) = (".x", ".y")): CrysFrame =
    Joins.join(this, right, "cross", Some(Nil), Nil, suffices)

  // ---------------------------------------------------------------------
  // binding (reference: src/crysda/dataframe.cr:104-182)
  // ---------------------------------------------------------------------

  /** Union by column name; union of all names, missing columns
    * null-filled; grouping discarded; conflicting column types re-infer
    * like the reference (reference: src/crysda/dataframe.cr:104-160,
    * widening at dataframe.cr:694-714): integral+integral → Long,
    * numeric+numeric → Double, anything else → String. */
  def bindRows(others: CrysFrame*): CrysFrame =
    CrysFrame(others.foldLeft(out)((acc, o) => Binds.unionWidened(acc, o.out)))

  /** Positional column concat; duplicate names suffixed `_1, _2…`
    * (reference: src/crysda/dataframe.cr:162-182, 754-766).
    * Implemented as an RDD zipWithIndex join — no single-partition
    * window, scales to any row count. */
  def bindCols(other: CrysFrame): CrysFrame = {
    val l = Binds.withIdx(out)
    val r = Binds.withIdx(other.out)
    val rRenamed = Binds.dedupNames(l.columns.filterNot(_ == IDX).toSeq, r)
    CrysFrame(l.join(rRenamed, Seq(IDX), "inner").drop(IDX))
  }

  /** Append one literal row, length-checked (reference: src/crysda/dataframe.cr:92-97). */
  def addRow(values: Any*): CrysFrame = {
    require(values.size == numCol, s"row arity ${values.size} != $numCol columns")
    val one = spark.createDataFrame(
      java.util.List.of(Row(values: _*)), StructType(schema.map(f => f.copy(nullable = true))))
    CrysFrame(out.unionByName(one))
  }

  // ---------------------------------------------------------------------
  // reshape — delegate to Reshape (src/crysda/reshape.cr)
  // ---------------------------------------------------------------------

  def spread(key: String, value: String, fill: Any = null,
             convert: Boolean = false, verify: Boolean = false): CrysFrame =
    Reshape.spread(this, key, value, Option(fill), convert, verify)

  def gather(key: String, value: String, selector: ColumnSelector = sel.all,
             convert: Boolean = false): CrysFrame =
    Reshape.gather(this, key, value, selector, convert)

  def separate(column: String, into: Seq[String], sep: String = "[^\\w]",
               remove: Boolean = true, convert: Boolean = false): CrysFrame =
    Reshape.separate(this, column, into, sep, remove, convert)

  def unite(name: String, selector: ColumnSelector, sep: String = "_",
            remove: Boolean = true): CrysFrame =
    Reshape.unite(this, name, selector, sep, remove)

  def nest(selector: ColumnSelector = sel.all, packedName: String = "data"): CrysFrame =
    Reshape.nest(this, selector, packedName)

  def unnest(column: String): CrysFrame = Reshape.unnest(this, column)

  def expand(cols: String*): CrysFrame = Reshape.expand(this, cols)

  def complete(cols: String*): CrysFrame = Reshape.complete(this, cols)

  // ---------------------------------------------------------------------
  // actions / sinks
  // ---------------------------------------------------------------------

  def collectRows(): Seq[Row] = out.collect().toSeq

  /** CSV writer, nulls as NA (reference: src/crysda/dataframe.cr:675-692). */
  def writeCsv(path: String, separator: String = ",",
               quoteChar: String = "\""): Unit =
    out.write.mode("overwrite")
      .option("sep", separator).option("quote", quoteChar)
      .option("nullValue", "NA").option("header", true)
      // Spark's CSV SINK trims cell whitespace by default (its
      // ignoreLeading/TrailingWhiteSpace default true on write, unlike
      // read) — the reference writes values verbatim, and a trimmed
      // write breaks write→read round-trips of padded strings
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
      .csv(path)

  /** SINGLE-file CSV — the reference's "write me one .csv" surface
    * (reference: src/crysda/dataframe.cr:675-692, which writes to any
    * IO). `coalesce(1)` funnels the whole frame through ONE task, so
    * this is for driver-sized results (reports, samples, oracle dumps)
    * — at scale use [[writeCsv]] (a directory of part files) and let
    * the consumer glob. The part file Spark produces is renamed onto
    * `path` via the Hadoop FileSystem API, so any supported filesystem
    * works, not just local disk. */
  def writeCsvFile(path: String, separator: String = ",",
                   quoteChar: String = "\""): Unit = {
    val hconf = out.sparkSession.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(hconf)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__graft_tmp__")
    out.coalesce(1).write.mode("overwrite")
      .option("sep", separator).option("quote", quoteChar)
      .option("nullValue", "NA").option("header", true)
      .option("ignoreLeadingWhiteSpace", false) // verbatim, see writeCsv
      .option("ignoreTrailingWhiteSpace", false)
      .csv(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(part, target))
      throw new IllegalStateException(s"rename $part -> $target failed")
    fs.delete(tmp, true)
  }

  /** CSV to an in-memory string — the write-side twin of
    * `Readers.readCsvString` and the closest Spark analogue of the
    * reference's arbitrary-IO writer (dataframe.cr:675-692). Collects
    * driver-side: small frames only. Quoting matches the CSV sink's
    * univocity defaults — fields containing the separator, quote, or a
    * newline are quoted, and embedded quotes/backslashes are
    * BACKSLASH-escaped (Spark's `escape` default, NOT RFC-4180
    * doubling) so the output parses back through `readCsvString`
    * byte-faithfully — EXCEPT fields containing embedded newlines:
    * `readCsvString` is line-oriented and tears them (its spec pins
    * that limitation); round-trip those through the multiLine file
    * reader (`readCsv` on a written file) instead. Nulls print as
    * NA. */
  def toCsvString(separator: String = ",", quoteChar: String = "\""): String = {
    val sb = new StringBuilder
    def field(v: String): String =
      if (v == null) "NA"
      else if (v.contains(separator) || v.contains(quoteChar) ||
               v.contains("\\") || v.contains("\n") || v.contains("\r"))
        quoteChar + v.replace("\\", "\\\\")
          .replace(quoteChar, "\\" + quoteChar) + quoteChar
      else v
    sb.append(names.map(field).mkString(separator)).append('\n')
    out.collect().foreach { r =>
      sb.append(names.indices.map(i =>
        field(if (r.isNullAt(i)) null else r.get(i).toString))
        .mkString(separator)).append('\n')
    }
    sb.result()
  }

  /** Columnar sink for at-scale storage: parquet with optional
    * partition columns — a partitioned layout is what lets later
    * reads prune at file-listing time (`PartitionFilters` in the
    * scan), the single biggest lever for 100 TB re-reads. Scale
    * extension beyond the reference's CSV-only sink surface. */
  def writeParquet(path: String, partitionBy: Seq[String] = Nil,
                   mode: String = "overwrite"): Unit = {
    requireCols(partitionBy)
    val w = out.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC sink — same contract as [[writeParquet]]. */
  def writeOrc(path: String, partitionBy: Seq[String] = Nil,
               mode: String = "overwrite"): Unit = {
    requireCols(partitionBy)
    val w = out.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Pretty console render (reference: src/crysda/dataframe.cr:604-664). */
  def printFrame(title: String = "A DataFrame", maxRows: Int = 10): String =
    Formatters.printFrame(this, title, maxRows)

  def schemaString(maxDigits: Int = 3, maxWidth: Int = 100): String =
    Formatters.schemaString(this, maxDigits, maxWidth)

  /** Single-column peek (reference: `df["col"].to_s`,
    * golden spec/core_spec.cr:454-458). */
  def columnString(name: String, maxDigits: Int = 3, maxWidth: Int = 100): String = {
    requireCols(Seq(name))
    Formatters.columnString(this, name, maxDigits, maxWidth)
  }
}

object CrysFrame {
  /** Hidden ingest-order ordinal. */
  private[core] val ORD = "__graft_ord"
  private[core] val RN = "__graft_rn"
  private[core] val IDX = "__graft_idx"
  private[core] val CNT = "__graft_cnt"
  /** Prefix for materialized computed sort keys (see sortMaterialized). */
  private[core] val SK = "__graft_sortkey_"
  private val skCounter = new java.util.concurrent.atomic.AtomicLong()
  private[core] def freshSortKey(): String = SK + skCounter.incrementAndGet()

  /** All internal columns share the prefix; `names`/`schema`/`out`
    * exclude them. */
  private[core] def isHidden(n: String): Boolean = n.startsWith("__graft_")

  /** True when every node of the plan is narrow and layout-deterministic
    * — no exchange anywhere, so position-capture expressions
    * (monotonically_increasing_id) see the same physical layout on
    * every evaluation of every referencing subtree. Conservative: any
    * node not on the whitelist counts as wide. */
  private[core] def narrowDeterministic(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case _: LeafNode => true
      case _: Project | _: Filter | _: SubqueryAlias | _: Union |
           _: Generate | _: Expand | _: LocalLimit | _: Sample =>
        p.children.forall(narrowDeterministic)
      case _ => false
    }
  }

  /** Stable hidden alias for an ordering ref carried through a
    * projection (already-hidden names pass through unchanged). */
  private[core] def hiddenAlias(r: String): String =
    if (isHidden(r)) r
    else "__graft_ordref_" + r.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + Integer.toHexString(r.hashCode)

  def apply(df: DataFrame): CrysFrame = new CrysFrame(df, Nil, Nil)

  /** Rebuild a frame keeping its grouping annotation (dropping keys no
    * longer present) — for verbs like separate/unite/convertType that
    * change columns but must not silently ungroup. */
  private[core] def regrouped(df: DataFrame, groupedBy: Seq[String]): CrysFrame =
    new CrysFrame(df, groupedBy.filter(df.columns.contains), Nil)

  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.graftkit.Bridge

  /** Structured ordering metadata: a fully-directed sort key, its
    * reverse, and the source column names the key references — carried
    * explicitly instead of parsed back out of `Column.toString` (which
    * misreads backtick-quoted dotted names and computed sort keys,
    * silently dropping the frame's ordering on select/rename). */
  private[core] final case class Ord(key: Column, rev: Column, refs: Seq[String]) {
    /** Rewrite references after a rename — covers plain, dotted, and
      * computed sort keys alike. */
    private[core] def remap(m: Map[String, String]): Ord =
      if (!refs.exists(m.contains)) this
      else Ord(remapCol(key, m), remapCol(rev, m), refs.map(r => m.getOrElse(r, r)))
  }

  private[core] def ingestOrd: Ord = Ord(col(ORD), col(ORD).desc, Seq(ORD))

  /** Source column names referenced by a column expression (unresolved
    * attributes are what `qcol`/user expressions produce; resolved ones
    * appear when a caller passes `df("name")`). Spark 4 Columns carry a
    * ColumnNode tree whose catalyst conversion happens at ANALYSIS —
    * `Bridge.expression(c).collect` sees only an opaque
    * ColumnNodeExpression leaf and finds nothing inside a composite
    * column — so this walks the NODE tree, descending into embedded
    * catalyst expressions (and back into nodes those may wrap). */
  private[core] def refsOf(c: Column): Seq[String] = Bridge.refs(c)

  /** Reverse a (possibly direction-carrying) sort key, flipping both the
    * direction and the null ordering. Node-level ([[Bridge.reverseSort]]):
    * the old match on the CONVERTED expression never fired on Spark 4
    * (conversion happens at analysis), so a desc key fell through to
    * `.desc` — a nested SortOrder that died at codegen. */
  private[core] def revOf(c: Column): Column = Bridge.reverseSort(c)

  private[core] def ordOf(c: Column): Ord = Ord(c, revOf(c), refsOf(c))

  /** Rewrite a sort key's references after a rename. Spark-4 reality:
    * a NODE-backed composite key cannot be rewritten generically (node
    * trees expose no transform), so only the plain single-attribute
    * key — what sortBy produces — rewrites here
    * ([[Bridge.renameAttr]]); catalyst-backed keys (df("name")) go
    * through the expression transform. Composite keys never reach this
    * point anymore: sortByExpr/sortByOrder materialize them as hidden
    * `__graft_sortkey_N` columns at sort time (see sortMaterialized),
    * so every carried key is a plain reference. */
  private def remapCol(c: Column, m: Map[String, String]): Column =
    Bridge.renameAttr(c, m).getOrElse(
      Bridge.column(Bridge.expression(c).transform {
        case ua: UnresolvedAttribute if m.contains(ua.nameParts.mkString(".")) =>
          UnresolvedAttribute(Seq(m(ua.nameParts.mkString("."))))
        case ar: AttributeReference if m.contains(ar.name) =>
          UnresolvedAttribute(Seq(m(ar.name)))
      }))

  /** In-memory literal frame (reference: src/crysda.cr:60-93). A column
    * whose cells span incompatible families (the reference's mixed
    * `AnyCol`, context.cr:54) becomes a [[Variant]] struct column. */
  def of(spark: SparkSession, header: Seq[String], rows: Seq[Seq[Any]]): CrysFrame = {
    require(rows.forall(_.size == header.size), "ragged rows")
    val cols = header.indices.map(i => rows.map(_(i)))
    val fields = header.zip(cols).map { case (n, vs) =>
      if (Inference.isMixed(vs)) StructField(n, Variant.schema, nullable = true)
      else StructField(n, Inference.inferType(vs), nullable = true)
    }
    val schema = StructType(fields)
    // normalize Int→Long / Float→Double where inference widened;
    // mixed-family cells encode to (tag, repr) variants
    val norm = rows.map { r =>
      Row(r.zipWithIndex.map { case (v, i) =>
        (v, fields(i).dataType) match {
          case (x, dt) if Variant.isVariantType(dt) => Variant.encode(x)
          case (x: Int, LongType)     => x.toLong
          case (x: Int, DoubleType)   => x.toDouble
          case (x: Long, DoubleType)  => x.toDouble
          case (x: Float, DoubleType) => x.toDouble
          case (x, _)                 => x
        }
      }: _*)
    }
    CrysFrame(spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(norm).asJava, schema))
  }

  def empty(spark: SparkSession): CrysFrame = CrysFrame(spark.emptyDataFrame)

  /** Frames with arbitrary-object columns — the reference's
    * `CustomColumnValue` / `ArrayList` cells
    * (reference: src/crysda/context.cr:48-52,76-119): case classes with
    * product encoders become struct/array columns, groupable and
    * unnestable by value. Spark's value semantics replace the
    * reference's run-stable `hashcode` contract (which only existed to
    * make grouping order deterministic — grouping here is by value). */
  def ofDataset[T <: Product](spark: SparkSession, values: Seq[T])(
      implicit enc: org.apache.spark.sql.Encoder[T]): CrysFrame =
    CrysFrame(spark.createDataset(values)(enc).toDF())
}
