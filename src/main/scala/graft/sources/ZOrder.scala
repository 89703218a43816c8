package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-column data skipping for
  * 100-TB scans. (Extension beyond the reference surface; the public
  * technique behind Delta Lake's `OPTIMIZE ZORDER BY` and ClickHouse /
  * Databricks multi-dimensional clustering.)
  *
  * A sort by `(a, b)` clusters files tightly on `a` but scatters `b`:
  * a filter on `b` alone — or on a box in `(a, b)` — overlaps every
  * file's min/max range and prunes nothing. Interleaving the BITS of
  * per-column quantile ranks orders rows along a space-filling curve,
  * so each written file covers a small hyper-rectangle of the key
  * space and parquet footer min/max stats prune box queries on ANY
  * subset of the z-columns (~N^(1-1/d) of files touched for a
  * d-dimensional box instead of all of them).
  *
  * Mechanics, all scale-shaped:
  *   1. per-column cut points from ONE `approx_percentile` pass over
  *      all columns together (a driver-held array of ≤ 2^bits − 1
  *      doubles per column — quantile ranks, not min/max scaling, so
  *      skewed columns still spread over the full bucket range);
  *   2. bucket index = count of cuts ≤ value (broadcast literal array;
  *      the column operand is a plain attribute so the per-element
  *      lambda cost is one row-slot read — see the HOF caveat on
  *      [[graft.text.TextFunctions.shinglesFromNormalized]]);
  *   3. z-value = codegen'd shift/mask bit interleave (a pure `long`
  *      expression tree, no UDF);
  *   4. `repartitionByRange` + `sortWithinPartitions` on the z-value —
  *      one range exchange (sampled boundaries, same machinery as a
  *      global sort) and the layout column is dropped before the write.
  *
  * NULL z-column values rank below every cut (bucket 0), so they
  * cluster together in the lowest files instead of poisoning the
  * interleave.
  */
object ZOrder {

  /** Max interleave bits per column: 16 columns × 4 bits or 4 × 16 all
    * fit the 64-bit z-value; the guard keeps the product ≤ 63. */
  private def checkArgs(cols: Seq[String], bits: Int): Unit = {
    require(cols.nonEmpty, "zOrder needs at least one column")
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    require(cols.size * bits <= 63,
      s"${cols.size} columns x $bits bits exceeds the 63-bit z-value; " +
        "lower `bits` or drop columns")
  }

  /** Quantile cut points for each column, one aggregation job for all
    * columns together. Returned arrays are ascending, length ≤ 2^bits−1
    * (approx_percentile may repeat a value on low-cardinality columns —
    * the bucket expression handles plateaus by construction). */
  private[graft] def cutPoints(df: DataFrame, cols: Seq[String],
                                 bits: Int): Map[String, Array[Double]] = {
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val cuts = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    cols.zip(cuts).toMap
  }

  /** Bucket index in [0, 2^bits): how many cut points the value clears.
    * Monotone in the value, total (nulls → 0), plateau-safe.
    *
    * One binary-search kernel per row ([[graft.functions.Kernels
    * .bucketIdx]], r14). The history of this expression is the round's
    * measurement lesson in miniature: the interpreted
    * `aggregate(lit(cuts), ...)` HOF walked all 2^bits−1 cuts per row
    * (19 s at sf0.1); the r7 fix compiled a binary-search TREE of
    * nested `when`s — bits comparisons per row, but the 2^bits-branch
    * CASE expression still evaluated at ~1 µs/row/column (the z
    * projection alone measured 1.36 s over 600k rows, most of the
    * x_zorder_write entry); the r14 kernel does the same upper-bound
    * rank as a JVM binary search inside whole-stage codegen. Null →
    * bucket 0 via coalesce (the when-tree's null contract). */
  private[graft] def bucketOf(c: Column, cuts: Array[Double]): Column =
    coalesce(
      graft.functions.Kernels.bucketIdx(c.cast("double"), cuts), lit(0L))

  /** Interleave the low `bits` of each bucket column into one long:
    * bit `b` of column `i` lands at position `b * ncols + i`, so all
    * columns' high bits dominate jointly — the Morton curve. */
  private[graft] def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val terms = for {
      b <- 0 until bits
      (v, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(v, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** The z-value column for `df` over `cols` (numeric / date / time
    * columns — anything castable to double). Exposed for diagnostics;
    * pipelines normally call [[zOrderBy]] / [[writeZOrdered]]. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    checkArgs(cols, bits)
    val cuts = cutPoints(df, cols, bits)
    interleave(cols.map(c => bucketOf(col(c), cuts(c))), bits)
  }

  /** `df` re-clustered along the Morton curve of `cols`: `numFiles`
    * range partitions, rows sorted by z-value within each, layout
    * column dropped. Each downstream write task then covers one tight
    * hyper-rectangle of the key space.
    *
    * Partitioning stays `repartitionByRange` — its boundary-sampling
    * pass re-executes the scan + z projection once, but the r14
    * alternatives measured WORSE at sf0.1: a direct equal-z-width
    * assignment through an RDD identity partitioner (the writeShards
    * pattern) pays external-Row serialization on the whole corpus
    * (4.79 s vs 4.18 s full-entry), and staging the bucket columns as
    * separate projections was codegen-CSE-neutral. The fix that paid
    * was the bucket KERNEL ([[bucketOf]]), which cheapens both the
    * sampling pass and the main pass. Numbers in OPTIMIZATION_r14.md. */
  def zOrderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
               bits: Int = 8): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    val z = zValue(df, cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Z-order `df` by `cols` and write it as parquet — the layout step
    * before handing a corpus to repeated multi-dimensional slicing. */
  def writeZOrdered(df: DataFrame, dir: String, cols: Seq[String],
                    numFiles: Int, bits: Int = 8): Unit =
    zOrderBy(df, cols, numFiles, bits)
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Per-file min/max ranges of `cols` for a written dataset — the
    * same stats a parquet reader's footer pruning consults, surfaced
    * as a frame so layout effectiveness is measurable (and testable)
    * without instrumenting the scan. One row per file. */
  def fileRanges(spark: SparkSession, dir: String,
                 cols: Seq[String]): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(cols.head)).as(s"min_${cols.head}"),
        (max(col(cols.head)).as(s"max_${cols.head}") +:
          cols.tail.flatMap(c =>
            Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))): _*)

  /** How many files a box query must touch under the written layout:
    * files whose [min, max] overlaps [lo, hi] on EVERY queried column
    * (exactly the footer-stats pruning rule). Driver-side over one row
    * per file — bounded by `numFiles`. */
  def filesTouched(ranges: DataFrame,
                   box: Map[String, (Double, Double)]): Long =
    box.foldLeft(ranges) { case (acc, (c, (lo, hi))) =>
      acc.where(col(s"max_$c").cast("double") >= lo &&
        col(s"min_$c").cast("double") <= hi)
    }.count()
}
