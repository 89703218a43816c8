package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reshape verbs (reference: src/crysda/reshape.cr, 255 LoC). */
private[core] object Reshape {

  /** Long→wide pivot (reference: src/crysda/reshape.cr:12-63).
    * `verify=true` reproduces the reference's uniqueness-of-(rest, key)
    * error contract (reshape.cr:24) at the cost of one extra job;
    * off by default for scale. Distinct key values are collected
    * driver-side (they become column names — inherently a driver
    * concern; cardinality should be small by construction). */
  def spread(f: CrysFrame, key: String, value: String, fill: Option[Any],
             convert: Boolean, verify: Boolean): CrysFrame = {
    val rest = f.names.filterNot(c => c == key || c == value)
    // null keys become the "NA" column (the reference's nil print
    // convention) instead of silently dropping those values
    val keyTmp = "__graft_spread_key"
    val df = f.out.withColumn(keyTmp,
      coalesce(qcol(key).cast(StringType), lit("NA")))
    if (verify) {
      val dup = df.groupBy((rest :+ keyTmp).map(qcol): _*)
        .agg(F.count(lit(1)).as("__graft_n"))
        .filter(col("__graft_n") > 1).limit(1).count()
      if (dup > 0) throw new IllegalArgumentException(
        s"spread: ($key) is not unique per row group")
    }
    // collect pivot values driver-side so the pivot is single-pass and
    // the resulting column order is deterministic (sorted, like the
    // reference's sorted distinct keys). The collect is capped at
    // Spark's own pivot ceiling (spark.sql.pivotMaxValues, default
    // 10000): keys become COLUMN NAMES, so a high-cardinality key is a
    // user error — fail with the count bound, not an OOM'd driver.
    val maxKeys = f.out.sparkSession.conf
      .get("spark.sql.pivotMaxValues", "10000").toInt
    val keyVals0 = df.select(col(keyTmp)).distinct().limit(maxKeys + 1)
      .collect().map(_.getString(0))
    if (keyVals0.length > maxKeys) throw new IllegalArgumentException(
      s"spread: ($key) has more than $maxKeys distinct values — each " +
        s"becomes a column, which cannot be what you want. Aggregate or " +
        s"filter the key first (or raise spark.sql.pivotMaxValues).")
    val keyVals = keyVals0.sorted.toSeq
    var out = df.drop(key).groupBy(rest.map(qcol): _*)
      .pivot(keyTmp, keyVals).agg(F.first(col(value)))
    // typed per-column fill: DataFrameNaFunctions.fill(String, cols)
    // silently skips non-string columns, so coalesce with the fill
    // value cast to each pivot column's own type
    fill.foreach { fv =>
      keyVals.foreach { c =>
        out = out.withColumn(c,
          coalesce(qcol(c), lit(fv).cast(out.schema(c).dataType)))
      }
    }
    val res = CrysFrame(out)
    if (convert) keyVals.foldLeft(res)((acc, c) => convertType(acc, c)) else res
  }

  /** Wide→long melt (reference: src/crysda/reshape.cr:73-99). Uses
    * Spark's native unpivot; mixed-type value columns are cast to the
    * tightest common type, else string (reference coerces to AnyCol). */
  def gather(f: CrysFrame, key: String, value: String,
             selector: ColumnSelector, convert: Boolean): CrysFrame = {
    val gatherCols = selector.resolve(f.names, f.schema)
    require(gatherCols.nonEmpty, "gather: empty column selection")
    val ids = f.names.filterNot(gatherCols.contains)
    val types = gatherCols.map(c => f.schema(c).dataType).distinct
    val df0 = f.out
    val df =
      if (types.size > 1) {
        val target =
          if (types.forall(t => t == DoubleType || t == IntegerType || t == LongType || t == FloatType))
            DoubleType else StringType
        gatherCols.foldLeft(df0)((d, c) => d.withColumn(c, qcol(c).cast(target)))
      } else df0
    val long = df.unpivot(ids.map(qcol).toArray, gatherCols.map(qcol).toArray, key, value)
    val res = CrysFrame(long)
    if (convert) convertType(res, key) else res
  }

  /** Split one string column into k by regex
    * (reference: src/crysda/reshape.cr:131-153). `NA` literal → null.
    *
    * Ragged splits are a parity-PLUS extension: a row with fewer
    * parts than `into` null-pads the tail (tidyr's documented fill
    * behavior) and extra parts are dropped — the reference refuses
    * both shapes outright (reshape.cr:140-141 raises on unequal or
    * mismatched splits), and a refusal is strictly less useful on
    * real ragged data. Access MUST go through `get()` (the
    * null-past-the-end element accessor): `getItem(i)` raises
    * INVALID_ARRAY_INDEX under ANSI mode the moment any row splits
    * short — found by the r9 fuzzer the first time a padded-`into`
    * chain was actually observed (separate's own oracle query splits
    * every row at full arity, so the edge never evaluated). */
  def separate(f: CrysFrame, column: String, into: Seq[String], sep: String,
               remove: Boolean, convert: Boolean): CrysFrame = {
    // materialize the split of the ORIGINAL column once — deriving each
    // part from qcol(column) would re-resolve against an already
    // overwritten column when `into` contains the source name
    val sepTmp = "__graft_sep"
    var df = f.out.withColumn(sepTmp, split(qcol(column), sep))
    into.zipWithIndex.foreach { case (n, i) =>
      val v = get(col(sepTmp), lit(i))
      df = df.withColumn(n, when(v === "NA" || v === "", lit(null)).otherwise(v))
    }
    df = df.drop(sepTmp)
    if (remove && !into.contains(column)) df = df.drop(column)
    val res = CrysFrame.regrouped(df, f.groupedBy)
    if (convert) into.foldLeft(res)((acc, c) => convertType(acc, c)) else res
  }

  /** Concatenate columns into one string column; nulls render as "NA"
    * inside the result (reference: src/crysda/reshape.cr:109-122 +
    * AnyVal#to_s utils.cr:115-117) — `concat_ws` would skip nulls, so
    * coalesce each part to the literal first. */
  def unite(f: CrysFrame, name: String, selector: ColumnSelector,
            sep: String, remove: Boolean): CrysFrame = {
    val cols = selector.resolve(f.names, f.schema)
    require(cols.nonEmpty, "unite: empty column selection")
    val parts = cols.map(c => coalesce(qcol(c).cast(StringType), lit("NA")))
    var df = f.out.withColumn(name, concat_ws(sep, parts: _*))
    if (remove) df = df.drop(cols.filterNot(_ == name): _*)
    CrysFrame.regrouped(df, f.groupedBy)
  }

  /** Pack selected columns into a per-group list-of-structs column
    * (reference: src/crysda/reshape.cr:169-185). Result list is sorted
    * for determinism (the reference preserves row order; we have none). */
  def nest(f: CrysFrame, selector: ColumnSelector, packedName: String): CrysFrame = {
    val nested = selector.resolve(f.names, f.schema)
    val keys = if (f.isGrouped) f.groupedBy else f.names.filterNot(nested.contains)
    val toPack = f.names.filterNot(keys.contains)
    require(keys.nonEmpty, "nest: no key columns left")
    CrysFrame(f.out.groupBy(keys.map(qcol): _*)
      .agg(sort_array(collect_list(struct(toPack.map(qcol): _*))).as(packedName)))
  }

  /** Explode a list-/frame-column back to rows; null → one null row
    * (reference: src/crysda/reshape.cr:188-212). */
  def unnest(f: CrysFrame, column: String): CrysFrame = {
    val dt = f.schema(column).dataType
    dt match {
      case ArrayType(_: StructType, _) =>
        val others = f.names.filterNot(_ == column)
        CrysFrame(f.out
          .withColumn(column, explode_outer(qcol(column)))
          .select((others.map(qcol) :+ col("`" + column + "`.*")): _*))
      case _: ArrayType =>
        CrysFrame(f.out.withColumn(column, explode_outer(qcol(column))))
      case other =>
        throw new IllegalArgumentException(s"unnest: $column is $other, not a list")
    }
  }

  /** Cartesian product of per-column distinct values, sorted
    * (reference: src/crysda/reshape.cr:221-229). */
  def expand(f: CrysFrame, cols: Seq[String]): CrysFrame = {
    require(cols.nonEmpty, "expand: no columns")
    val distincts = cols.map(c => f.out.select(qcol(c)).distinct())
    val crossed = distincts.reduce(_.crossJoin(_))
    CrysFrame(crossed.orderBy(cols.map(c => qcol(c).asc_nulls_last): _*))
  }

  /** expand + left_join back (reference: src/crysda/reshape.cr:215-217). */
  def complete(f: CrysFrame, cols: Seq[String]): CrysFrame =
    expand(f, cols).leftJoin(CrysFrame(f.out), by = cols)

  /** Re-infer a (string) column's type, the reference's `convert_type`
    * (reference: src/crysda/reshape.cr:249-253): try Long → Double →
    * Boolean over all values in ONE aggregate pass, cast to the first
    * type with zero parse failures. */
  def convertType(f: CrysFrame, column: String): CrysFrame = {
    // variant (mixed "AnyCol") columns: homogeneous time tags cast back
    // to a real timestamp column; anything else materializes the repr
    // string and re-enters the ladder below (so an all-"i32"-tag
    // variant lands on Long, etc.)
    if (Variant.isVariantType(f.schema(column).dataType)) {
      val vc = qcol(column)
      val nonTime = f.out.agg(
        F.count(when(Variant.tag(vc).isNotNull && Variant.tag(vc) =!= "time", 1)))
        .collect()(0).getLong(0)
      return if (nonTime == 0)
        CrysFrame.regrouped(
          f.out.withColumn(column, Variant.asTimestamp(vc)), f.groupedBy)
      else convertType(CrysFrame.regrouped(
        f.out.withColumn(column, Variant.repr(vc)), f.groupedBy), column)
    }
    if (f.schema(column).dataType != StringType) return f
    val c = qcol(column)
    val probe = f.out.agg(
      F.count(when(c.isNotNull && try_cast(c, "long").isNull, 1)).as("badLong"),
      F.count(when(c.isNotNull && try_cast(c, "double").isNull, 1)).as("badDouble"),
      F.count(when(c.isNotNull && !lower(c).isin("true", "false", "t", "f"), 1)).as("badBool"),
      F.count(when(c.isNotNull, 1)).as("nonNull")
    ).collect()(0)
    val (badLong, badDouble, badBool, nonNull) =
      (probe.getLong(0), probe.getLong(1), probe.getLong(2), probe.getLong(3))
    val df =
      if (nonNull == 0) f.out
      else if (badLong == 0) f.out.withColumn(column, c.cast(LongType))
      else if (badDouble == 0) f.out.withColumn(column, c.cast(DoubleType))
      else if (badBool == 0) f.out.withColumn(column,
        when(lower(c).isin("true", "t"), lit(true))
          .when(lower(c).isin("false", "f"), lit(false)))
      else f.out
    CrysFrame.regrouped(df, f.groupedBy)
  }

  private def try_cast(c: Column, t: String): Column = c.try_cast(t)
}
