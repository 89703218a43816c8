package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) — with [[AsOfJoin]], the second of
  * the classic temporal joins Spark SQL lacks as a first-class
  * operator: naively, `l JOIN r ON l.k = r.k AND l.p BETWEEN r.lo AND
  * r.hi` plans a BroadcastNestedLoopJoin (or worse, a cartesian) whose
  * per-key cost is |points| × |intervals|.
  *
  * This implementation BINS the domain: every interval explodes to the
  * fixed-width bins it overlaps, every point maps to exactly ONE bin,
  * and the join becomes a plain equi-join on (keys, bin) + a residual
  * range filter. Each qualifying (point, interval) pair meets in
  * exactly one bin — the point's — so no dedup pass is needed. Cost:
  * one shuffle of each side on (keys, bin); the explode factor is
  * ceil(interval span / binWidth) + 1, so size `binWidth` near the
  * TYPICAL interval span (~1-2 bins per interval). A mis-sized call
  * (an interval spanning > `maxBinsPerInterval` bins) raises a
  * descriptive error instead of silently exploding the shuffle — the
  * same fail-at-plan-shape-time contract as embeddingDedup's bucket
  * guard.
  *
  * Columns are NUMERIC (long) domains — epoch seconds/micros or any
  * monotone encoding; floor-division bin math is exact for |value| <
  * 2^53 (the year ~2255 in microseconds). Intervals with null or
  * inverted bounds match nothing; null points match nothing.
  * Non-key column names must be disjoint, like `intervalJoin`. */
object RangeJoin {

  /** Inner point-in-interval join: rows of `left` paired with every
    * `right` interval of the same keys containing `pointCol`
    * (`[lo, hi]` when `inclusiveHi`, else `[lo, hi)`). */
  def pointInInterval(left: DataFrame, pointCol: String,
                      right: DataFrame, loCol: String, hiCol: String,
                      by: Seq[String], binWidth: Long,
                      inclusiveHi: Boolean = true,
                      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireDisjoint(left, right, by, "rangeJoin")
    val l = left.withColumn(bin, floorDiv(col(pointCol), binWidth))
    val r = explodeBins(right, loCol, hiCol, binWidth, maxBinsPerInterval,
      "rangeJoin", strictBounds = false)
    val residual =
      if (inclusiveHi) col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol)
      else col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol)
    l.join(r, (by :+ bin).toSeq, "inner").filter(residual).drop(bin)
  }

  private val bin = "__range_bin"

  /** Floor-division bin id — exact for |value| < 2^53. */
  private def floorDiv(c: Column, binWidth: Long): Column =
    ((c - pmod(c, lit(binWidth))) / lit(binWidth)).cast("long")

  private def requireDisjoint(left: DataFrame, right: DataFrame,
                              by: Seq[String], op: String): Unit = {
    val shared = left.columns.toSet.intersect(right.columns.toSet) -- by
    require(shared.isEmpty,
      s"$op requires disjoint non-key column names; shared: ${shared.mkString(", ")}")
  }

  /** Explode each interval to its overlapped bins, with the span
    * guard (shared by both joins — ONE copy of the bin math).
    * `strictBounds` drops lo == hi rows — the EMPTY interval under
    * half-open semantics, which overlaps nothing. */
  private def explodeBins(df: DataFrame, loCol: String, hiCol: String,
                          binWidth: Long, maxBinsPerInterval: Long,
                          op: String, strictBounds: Boolean): DataFrame = {
    val loBin = floorDiv(col(loCol), binWidth)
    val hiBin = floorDiv(col(hiCol), binWidth)
    val bounds =
      if (strictBounds) col(loCol) < col(hiCol) else col(loCol) <= col(hiCol)
    df.filter(col(loCol).isNotNull && col(hiCol).isNotNull && bounds)
      .withColumn(bin, explode(
        when(hiBin - loBin >= maxBinsPerInterval,
          raise_error(concat(
            lit(s"$op: an interval spans more than $maxBinsPerInterval " +
              s"bins at binWidth=$binWidth — the explode would flood the " +
              "shuffle. Raise binWidth toward the typical interval span " +
              "(or maxBinsPerInterval if the skew is intended): interval=["),
            col(loCol).cast("string"), lit(","), col(hiCol).cast("string"),
            lit("]"))).cast("array<bigint>"))
          .otherwise(sequence(loBin, hiBin))))
  }

  /** Interval-OVERLAP join (range × range — concurrency analysis,
    * schedule conflicts, co-occurring sessions): rows of `left` paired
    * with every `right` row of the same keys whose interval intersects
    * (`[lo, hi]` closed when `inclusiveEnds`, else `[lo, hi)`
    * half-open). BOTH sides explode to their overlapped bins; a
    * qualifying pair shares every bin its intersection covers, so the
    * match is kept ONLY in the intersection's FIRST bin —
    * `bin == max(floor(l.lo/w), floor(r.lo/w))`, which floor-monotony
    * makes exactly `floor(max(lo,lo)/w)`, a bin both sides always
    * explode — and no distinct/dedup shuffle is ever needed. Cost:
    * one shuffle of each side on (keys, bin), explode factor ~span/w
    * per row, the same span guard as [[pointInInterval]] on BOTH
    * sides. Null or inverted intervals match nothing; under
    * half-open semantics a ZERO-LENGTH interval (lo == hi) is empty
    * and matches nothing either. */
  def intervalOverlap(left: DataFrame, lLoCol: String, lHiCol: String,
                      right: DataFrame, rLoCol: String, rHiCol: String,
                      by: Seq[String], binWidth: Long,
                      inclusiveEnds: Boolean = true,
                      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireDisjoint(left, right, by, "intervalOverlap")
    val overlap =
      if (inclusiveEnds) col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol)
      else col(lLoCol) < col(rHiCol) && col(rLoCol) < col(lHiCol)
    val firstBin = col(bin) ===
      greatest(floorDiv(col(lLoCol), binWidth), floorDiv(col(rLoCol), binWidth))
    val strict = !inclusiveEnds // [x, x) is empty: it overlaps nothing
    explodeBins(left, lLoCol, lHiCol, binWidth, maxBinsPerInterval,
        "intervalOverlap", strictBounds = strict)
      .join(explodeBins(right, rLoCol, rHiCol, binWidth, maxBinsPerInterval,
        "intervalOverlap", strictBounds = strict), (by :+ bin).toSeq, "inner")
      .filter(overlap && firstBin)
      .drop(bin)
  }
}
