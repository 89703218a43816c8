package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join verbs (reference: src/crysda/joins.cr, 225 LoC).
  *
  * The reference implements a hash-sorted merge with per-group cartesian
  * expansion (joins.cr:70-131) — obsolete on Spark: we declare the join
  * and Catalyst/AQE pick broadcast-hash / shuffled-hash / sort-merge,
  * including runtime skew handling. What we keep from the reference is
  * the *API semantics*: natural-key default, unequal-key pairs,
  * empty-`by` → cross product, and `.x`/`.y` suffixing of common
  * non-key columns (joins.cr:133-166).
  */
private[core] object Joins {

  /** `by = null` → natural join on the name intersection
    * (reference: src/crysda/joins.cr:133-135). */
  private def defaultBy(l: CrysFrame, r: CrysFrame): Seq[String] =
    l.names.filter(r.names.toSet)

  /** Suffix common non-key columns on both sides
    * (reference: src/crysda/joins.cr:149-166). */
  private def suffixed(l: DataFrame, r: DataFrame, by: Seq[String],
                       suffices: (String, String)): (DataFrame, DataFrame) = {
    val common = l.columns.toSet.intersect(r.columns.toSet) -- by
    val ln = common.foldLeft(l)((d, c) => d.withColumnRenamed(c, c + suffices._1))
    val rn = common.foldLeft(r)((d, c) => d.withColumnRenamed(c, c + suffices._2))
    (ln, rn)
  }

  def join(l: CrysFrame, r: CrysFrame, how: String,
           by: Option[Seq[String]], byPairs: Seq[(String, String)],
           suffices: (String, String)): CrysFrame = {
    // unequal-key pairs: rename right's key to left's name first
    // (reference: src/crysda/joins.cr:144-147)
    val rAligned =
      if (byPairs.nonEmpty)
        byPairs.foldLeft(r.out) { case (d, (ln, rn)) => d.withColumnRenamed(rn, ln) }
      else r.out
    val keys =
      if (byPairs.nonEmpty) byPairs.map(_._1)
      else by.getOrElse(defaultBy(l, r))
    if (keys.isEmpty || how == "cross") {
      // empty-`by` degenerates to a cross product
      // (reference: spec/joins_spec.cr:96-125)
      val (ld, rd) = suffixed(l.out, rAligned, Nil, suffices)
      CrysFrame(ld.crossJoin(rd))
    } else {
      val (ld, rd) = suffixed(l.out, rAligned, keys, suffices)
      CrysFrame(nullSafeEquiJoin(ld, rd, keys, how))
    }
  }

  private def q(k: String): String = "`" + k.replace("`", "``") + "`"

  /** Equi-join with NULL-SAFE key matching (`<=>`): the reference joins
    * by grouping both sides on the key tuple, so NA keys match NA keys
    * (reference: src/crysda/joins.cr:70-131; golden
    * spec/joins_spec.cr:63-66 counts on it). Catalyst's hash joins
    * support EqualNullSafe, so the physical plan is unchanged vs `=`. */
  private def nullSafeEquiJoin(ld: DataFrame, rd: DataFrame,
                               keys: Seq[String], how: String): DataFrame = {
    val la = ld.as("__gl")
    val ra = rd.as("__gr")
    val cond = keys.map(k => col("__gl." + q(k)) <=> col("__gr." + q(k))).reduce(_ && _)
    val joined = la.join(ra, cond, how)
    val keyCols = keys.map { k =>
      how match {
        case "right"      => col("__gr." + q(k)).as(k)
        case "full_outer" => coalesce(col("__gl." + q(k)), col("__gr." + q(k))).as(k)
        case _            => col("__gl." + q(k)).as(k)
      }
    }
    val lRest = ld.columns.filterNot(keys.contains).map(c => col("__gl." + q(c)))
    val rRest = rd.columns.filterNot(keys.contains).map(c => col("__gr." + q(c)))
    joined.select((keyCols ++ lRest ++ rRest): _*)
  }

  /** semi/anti: result carries only left columns — no suffixing needed
    * (reference: src/crysda/joins.cr:39-55). */
  def filterJoin(l: CrysFrame, r: CrysFrame, how: String,
                 by: Option[Seq[String]]): CrysFrame = {
    val keys = by.getOrElse(defaultBy(l, r))
    require(keys.nonEmpty, "semi/anti join requires at least one key")
    val la = l.out.as("__gl")
    val ra = r.out.select(keys.map(qcol): _*).as("__gr")
    val cond = keys.map(k => col("__gl." + q(k)) <=> col("__gr." + q(k))).reduce(_ && _)
    CrysFrame(la.join(ra, cond, how))
  }
}

/** bind_cols helpers (reference: src/crysda/dataframe.cr:162-182). */
private[core] object Binds {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

  /** Stable 0-based row index via RDD zipWithIndex — one extra job to
    * count partition sizes, but no single-partition shuffle (scales,
    * unlike a global row_number window).
    *
    * DO NOT "optimize" this into a pure-Catalyst two-level build
    * (monotonically_increasing_id → per-partition counts → broadcast
    * offsets): it was tried (r8) and is UNSOUND. The counting subtree
    * and the main pass are planned and evaluated INDEPENDENTLY, so
    * the nondeterministic position capture can land on two different
    * physical layouts (AQE re-coalesces per evaluation) and the
    * offset join silently drops almost every row. zipWithIndex is
    * immune because `.rdd` freezes ONE physical realization that both
    * its jobs share. The real costs stay: the count job re-evaluates
    * the (uncached) upstream a second time, and both passes pay Row
    * conversion — acceptable because consumers that re-read the
    * ordinals persist the RESULT (GlobalWindows), and upstream here
    * is usually a sort whose recompute beats spilling a corpus-sized
    * cached copy. */
  def withIdx(df: DataFrame): DataFrame = withIdxAs(df, CrysFrame.IDX)

  /** [[withIdx]] with a caller-chosen column name (e.g. the ingest
    * ordinal for wide-plan order capture — see CrysFrame.ordered). */
  def withIdxAs(df: DataFrame, name: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(name, LongType, false))
    df.sparkSession.createDataFrame(
      df.rdd.zipWithIndex().map { case (row, i) => Row.fromSeq(row.toSeq :+ i) },
      schema)
  }

  /** 1-based Int row number in the df's CURRENT physical order — the
    * same zipWithIndex pattern as [[withIdx]] (range-sort upstream,
    * then a narrow per-partition map), never a partition-less
    * `Window.orderBy` that funnels every row through one task.
    * Int to match the reference's Int32 ordinal; raises rather than
    * silently wrapping past 2^31-1 rows. */
  def withRowNumber(df: DataFrame, name: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(name, IntegerType, false))
    df.sparkSession.createDataFrame(
      df.rdd.zipWithIndex().map { case (row, i) =>
        if (i >= Int.MaxValue)
          throw new ArithmeticException(s"$name overflows Int32 at row ${i + 1}")
        Row.fromSeq(row.toSeq :+ (i + 1).toInt)
      }, schema)
  }

  /** Union by name with the reference's conflicting-type re-inference
    * (reference: bind_col_data, src/crysda/dataframe.cr:694-714):
    * integral+integral widen to Long, numeric+numeric to Double, and
    * any other conflict falls back to String (the reference's AnyCol
    * worst case). `unionByName` would otherwise throw on e.g.
    * Int vs String. */
  def unionWidened(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, NumericType, ShortType, StringType}
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    def widened(x: DataType, y: DataType): Option[DataType] = (x, y) match {
      case _ if x == y                       => None
      case _ if integral(x) && integral(y)   => Some(LongType)
      case (_: NumericType, _: NumericType)  => Some(DoubleType)
      case _                                 => Some(StringType)
    }
    val bt = b.schema.fields.map(f => f.name -> f.dataType).toMap
    val conflicts = a.schema.fields.flatMap { f =>
      bt.get(f.name).flatMap(widened(f.dataType, _)).map(f.name -> _)
    }.toMap
    def cast(df: DataFrame) = conflicts.foldLeft(df) { case (d, (c, t)) =>
      d.withColumn(c, qcol(c).cast(t))
    }
    cast(a).unionByName(cast(b), allowMissingColumns = true)
  }

  /** `name` → `name_1`, `name_2`… on collision
    * (reference: DuplicateNameResolver, src/crysda/dataframe.cr:754-766). */
  def dedupNames(taken: Seq[String], r: DataFrame): DataFrame = {
    val used = scala.collection.mutable.Set[String](taken: _*)
    val renames = r.columns.filterNot(_ == CrysFrame.IDX).flatMap { c =>
      if (!used.contains(c)) { used += c; None }
      else {
        var i = 1
        while (used.contains(s"${c}_$i")) i += 1
        used += s"${c}_$i"
        Some(c -> s"${c}_$i")
      }
    }
    renames.foldLeft(r) { case (d, (o, n)) => d.withColumnRenamed(o, n) }
  }
}
