package graft

import graft.ml.{HeavyHitters, MisraGriesAgg, MgBuf}
import org.apache.spark.sql.functions._

/** ml.HeavyHitters: sketch → recount → certify exact top-k at bounded
  * memory. The sketch's classical guarantees are pinned directly on
  * the Aggregator (pure JVM, no Spark needed), the end-to-end operator
  * against an exact groupBy, and the certificate's refusal path on a
  * distribution too flat for the counter budget. */
class HeavyHittersSpec extends GraftSpec {

  import spark.implicits._

  // -- the Aggregator's algorithmic guarantees (pure, exhaustive) ----

  private def freqs(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  /** Zipf-ish stream: key i appears ~1000/i times, shuffled
    * deterministically. */
  private val zipf: Seq[String] = {
    val xs = (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"k$i"))
    new scala.util.Random(7).shuffle(xs)
  }

  test("MisraGries keeps every key above N/(m+1) and never overcounts") {
    for (m <- Seq(4, 16, 48)) {
      val agg = new MisraGriesAgg(m)
      val sketch = zipf.foldLeft(agg.zero)(agg.reduce).counts
      val exact = freqs(zipf)
      val n = zipf.size
      assert(sketch.size <= m, s"m=$m: buffer exceeded $m entries")
      // completeness: true frequency > N/(m+1) ⇒ tracked
      for ((k, f) <- exact if f * (m + 1) > n)
        assert(sketch.contains(k), s"m=$m: lost heavy key $k (freq $f, N=$n)")
      // counts are lower bounds with bounded undercount
      for ((k, c) <- sketch) {
        assert(c <= exact(k), s"m=$m: overcounted $k")
        assert(exact(k) - c <= n / (m + 1) + 1, s"m=$m: undercount bound broken for $k")
      }
    }
  }

  test("MisraGries merge preserves the bound under arbitrary splits") {
    val m = 16
    val agg = new MisraGriesAgg(m)
    val n = zipf.size
    val exact = freqs(zipf)
    for (splits <- Seq(Seq(100, 2000), Seq(500, 500, 500, 500), Seq(1, n - 1))) {
      val parts = {
        val (chunks, rest) = splits.foldLeft((Vector.empty[Seq[String]], zipf)) {
          case ((acc, remaining), sz) =>
            val (h, t) = remaining.splitAt(sz); (acc :+ h, t)
        }
        (chunks :+ rest).filter(_.nonEmpty)
      }
      val merged = parts
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      assert(merged.counts.size <= m)
      for ((k, f) <- exact if f * (m + 1) > n)
        assert(merged.counts.contains(k),
          s"splits=$splits: lost heavy key $k (freq $f)")
      for ((k, c) <- merged.counts) assert(c <= exact(k))
    }
  }

  test("merge truncation keeps at most m keys and stays a lower bound") {
    val agg = new MisraGriesAgg(2)
    // two full disjoint buffers force the subtract-vth path
    val b1 = MgBuf(Map("a" -> 10L, "b" -> 3L))
    val b2 = MgBuf(Map("c" -> 8L, "d" -> 2L))
    val m12 = agg.merge(b1, b2).counts
    assert(m12.size <= 2)
    // vth = 3rd largest of (10,8,3,2) = 3 → a:7, c:5 survive
    assert(m12 == Map("a" -> 7L, "c" -> 5L))
  }

  // -- end-to-end operator ------------------------------------------

  test("topKExact equals the exact groupBy top-k (Zipfian corpus)") {
    // counters=32 < 60 distinct keys: evictions and merge truncation
    // are genuinely on the path; the 5th frequency (200) still clears
    // N/(m+1) ≈ 140 so the certificate holds
    val df = zipf.toDF("key").repartition(7) // partition-order independence
    val got = HeavyHitters.topKExact(df, col("key"), k = 5, counters = 32)
      .orderBy(desc("n"), asc("key")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val want = freqs(zipf).toSeq
      .sortBy { case (k, n) => (-n, k) }.take(5)
    assert(got.toSeq == want)
  }

  test("certificate refuses when counters cannot prove the top-k") {
    // near-uniform stream: 200 keys × 5 — with 16 counters nothing
    // clears N/(m+1) = 1000/17, so a plausible-but-unprovable top-k
    // must raise, not return
    val flat = (1 to 200).flatMap(i => Seq.fill(5)(s"u$i"))
    val df = new scala.util.Random(3).shuffle(flat).toDF("key")
    val e = intercept[Exception] {
      HeavyHitters.topKExact(df, col("key"), k = 5, counters = 16).collect()
    }
    assert(e.getMessage.contains("certificate"), e.getMessage)
  }

  test("null keys are ignored and k > counters is refused eagerly") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("key")
    val got = HeavyHitters.topKExact(df, col("key"), k = 2, counters = 8)
      .orderBy(desc("n")).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq("a" -> 2L, "b" -> 1L))
    intercept[IllegalArgumentException] {
      HeavyHitters.topKExact(df, col("key"), k = 9, counters = 8)
    }
  }
}
