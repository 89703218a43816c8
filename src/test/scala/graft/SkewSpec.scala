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

  test("saltedJoin enforces the replication-economics contract") {
    import spark.implicits._
    val right = (0 until 100).map(i => (s"k${i % 7}", s"dim$i")).toDF("k", "d")
    // 100 rows × 8 buckets = 800 replicated rows > budget 500 → refuse,
    // with the remediation options in the message
    val ex = intercept[IllegalArgumentException](
      Skew.saltedJoin(skewed, right, Seq("k"), saltBuckets = 8,
        replicationBudget = 500L))
    assert(ex.getMessage.contains("replicated rows"))
    assert(ex.getMessage.contains("AQE"))
    // in-contract path unchanged: same budget, fewer buckets
    val ok = Skew.saltedJoin(skewed, right, Seq("k"), saltBuckets = 4,
      replicationBudget = 500L)
    assert(ok.count() == skewed.join(right, Seq("k")).count())
    // budget 0 skips the guard (caller has priced the replication)
    val forced = Skew.saltedJoin(skewed, right, Seq("k"), saltBuckets = 8,
      replicationBudget = 0L)
    assert(forced.count() == skewed.join(right, Seq("k")).count())
  }

  // ---- the classic salting traps, pinned ----------------------------

  test("saltedAgg keeps null a valid group (reference group_by semantics)") {
    import spark.implicits._
    val df = Seq(("a", 1.0), (null, 2.0), ("a", 3.0), (null, 4.0), ("b", 5.0))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toMap
    val salted = Skew.saltedAgg(df, Seq("k"), 4,
      partials = Seq("__s" -> sum(col("v"))),
      merges = Seq("s" -> sum(col("__s"))))
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toMap
    assert(salted == direct, s"$salted vs $direct")
  }

  test("saltedJoin agrees with the plain join on null keys (never equi-match)") {
    import spark.implicits._
    val left = Seq(("a", 1L), (null, 2L), ("a", 3L), (null, 4L)).toDF("k", "n")
    val right = Seq(("a", "dimA"), (null, "dimNull")).toDF("k", "d")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (Option(r.getString(0)), r.getLong(1),
        Option(r.getString(2)))).sortBy(t => (t._1, t._2)).toSeq
    // inner: null keys drop on both paths
    assert(canon(Skew.saltedJoin(left, right, Seq("k"), 4)) ==
      canon(left.join(right, Seq("k"))))
    // left: null-key left rows survive null-padded EXACTLY ONCE — the
    // bug replication would introduce is saltBuckets copies of them
    assert(canon(Skew.saltedJoin(left, right, Seq("k"), 4, "left")) ==
      canon(left.join(right, Seq("k"), "left")))
  }

  test("salted forms on empty and multi-key inputs") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("k", "v")
    assert(Skew.saltedCount(empty, Seq("k")).count() == 0L)
    // two grouping keys, salt rides both
    val df = Seq(("a", "x", 1.0), ("a", "y", 2.0), ("a", "x", 3.0))
      .toDF("k1", "k2", "v")
    val direct = df.groupBy("k1", "k2").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val salted = Skew.saltedCount(df, Seq("k1", "k2"), 4)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(salted == direct)
  }
}
