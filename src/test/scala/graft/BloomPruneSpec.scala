package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._

/** operators.BloomPrune: explicit runtime-filter pruning. Contracts:
  * zero false negatives (every true match survives the prune), the
  * pruned semi-join equals the plain semi-join exactly, and the probe
  * side stays join-free/shuffle-free through the prune. */
class BloomPruneSpec extends GraftSpec {

  import spark.implicits._

  test("prune never drops a true match and kills most non-matches") {
    val probe = (1L to 10000L).toDF("id")
    val build = (1L to 10000L by 100).toDF("k") // 100 keys
    val bloom = BloomPrune.bloomOf(build, col("k"), expectedItems = 100, fpp = 0.01)
    val kept = BloomPrune.prune(probe, col("id"), bloom)
      .select("id").as[Long].collect().toSet
    val trueKeys = (1L to 10000L by 100).toSet
    assert(trueKeys.subsetOf(kept), "bloom dropped a true match")
    // ~1% fpp on 9900 non-matching: generous ceiling at 5%
    assert(kept.size - trueKeys.size <= 495,
      s"false-positive rate too high: ${kept.size - trueKeys.size} extras")
  }

  test("semiJoinPruned equals the exact semi-join (false positives cleared)") {
    val probe = (1L to 5000L).map(i => (i, s"p$i")).toDF("id", "payload")
    val build = (1L to 5000L by 7).toDF("k")
    val got = BloomPrune.semiJoinPruned(probe, "id", build, "k",
        expectedItems = 800, fpp = 0.05)
      .select("id").as[Long].collect().sorted
    val want = probe.join(build, col("id") === col("k"), "left_semi")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq)
  }

  test("the prune is a scan-stage predicate: no join, no exchange") {
    val probe = (1L to 1000L).toDF("id")
    val build = (1L to 1000L by 10).toDF("k")
    val bloom = BloomPrune.bloomOf(build, col("k"), expectedItems = 100)
    val plan = BloomPrune.prune(probe, col("id"), bloom)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"prune planned a join:\n$plan")
    assert(!plan.contains("Exchange"), s"prune planned an exchange:\n$plan")
  }

  test("null probe keys are pruned (a null never equi-matches)") {
    val probe = Seq(Some(1L), None, Some(2L), None).toDF("id")
    val build = Seq(1L, 2L).toDF("k")
    val bloom = BloomPrune.bloomOf(build, col("k"), expectedItems = 2)
    assert(BloomPrune.prune(probe, col("id"), bloom).count() == 2)
  }

  test("bad sketch parameters are refused eagerly") {
    val build = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      BloomPrune.bloomOf(build, col("k"), expectedItems = 0)
    }
    intercept[IllegalArgumentException] {
      BloomPrune.bloomOf(build, col("k"), expectedItems = 10, fpp = 1.5)
    }
  }
}
