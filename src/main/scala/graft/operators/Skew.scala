package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for hot keys at cluster scale.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  * covers sort-merge joins at runtime; these helpers cover the cases
  * AQE does not: skewed AGGREGATIONS (one giant group serializing into
  * one reducer) and broadcast-infeasible skewed joins.
  */
object Skew {

  /** Two-stage salted aggregation: rows are spread over `saltBuckets`
    * sub-keys, partially aggregated, then re-aggregated per real key.
    * Use for algebraic aggregates (sum/count/min/max) when one key
    * holds a large share of all rows — turns one hot reducer into
    * `saltBuckets` parallel ones at the cost of a second (tiny)
    * shuffle.
    *
    * @param partials (outName → partial agg over input rows)
    * @param merges   (outName → merge agg over the partial columns)
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                partials: Seq[(String, Column)],
                merges: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(merges.head._2.as(merges.head._1),
        merges.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Convenience salted count per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keys, saltBuckets,
      partials = Seq("__n" -> count(lit(1))),
      merges = Seq("n" -> sum(col("__n"))))

  /** Salted join for a skewed LEFT side against a small-ish right side
    * that is still too big to broadcast whole: left rows get a random
    * salt in [0, saltBuckets), the right side is replicated once per
    * salt value, and the join key becomes (key, salt) — the hot key's
    * rows land on `saltBuckets` different reducers.
    * Right-side cost: × saltBuckets rows through the shuffle.
    *
    * Only join types that never EMIT unmatched right rows are sound:
    * the right side is replicated once per salt bucket, so a `right` or
    * `full_outer` join would emit each unmatched right row saltBuckets
    * times. Rejected up front. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int = 8, joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti joins only " +
        s"(got '$joinType'): replicating the right side per salt bucket " +
        s"would duplicate unmatched right rows")
    val l = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
