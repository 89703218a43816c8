package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted aggregation/join correctness: same results as the direct
  * formulation on a deliberately skewed key distribution. */
class SkewSpec extends GraftSpec {

  private def skewed = {
    import spark.implicits._
    // 90% of rows share one key
    (0 until 1000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i * 1.0))
      .toDF("k", "v")
  }

  test("saltedCount matches plain groupBy count") {
    val direct = skewed.groupBy("k").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedCount(skewed, Seq("k"), saltBuckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == direct)
  }

  test("saltedAgg sum matches plain aggregation") {
    val direct = skewed.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val salted = Skew.saltedAgg(skewed, Seq("k"), 8,
      partials = Seq("__s" -> sum(col("v"))),
      merges = Seq("s" -> sum(col("__s"))))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-6) }
  }

  test("saltedJoin matches plain join") {
    import spark.implicits._
    val right = (0 until 7).map(i => (s"k$i", s"dim$i")).toDF("k", "d")
      .union(Seq(("hot", "dimHot")).toDF("k", "d"))
    val direct = skewed.join(right, Seq("k")).count()
    val salted = Skew.saltedJoin(skewed, right, Seq("k"), saltBuckets = 8).count()
    assert(salted == direct)
  }

  test("saltedJoin rejects join types that emit unmatched right rows") {
    import spark.implicits._
    val right = Seq(("k1", "d1")).toDF("k", "d")
    intercept[IllegalArgumentException](
      Skew.saltedJoin(skewed, right, Seq("k"), joinType = "right"))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(skewed, right, Seq("k"), joinType = "full_outer"))
    // left_semi remains sound: replication cannot duplicate left rows
    val semi = Skew.saltedJoin(skewed, right, Seq("k"), joinType = "left_semi")
    assert(semi.count() == skewed.join(right, Seq("k"), "left_semi").count())
  }
}
