package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftkit.Bridge.{column, expression}
import org.apache.spark.sql.types.BinaryType

/** Explicit runtime-filter (semi-join pruning) via a Bloom sketch —
  * the pattern Catalyst's own InjectRuntimeFilter applies to shuffle
  * joins, surfaced as an operator so a pipeline can apply it where the
  * optimizer will not:
  *
  *   - pruning a 100-TB fact scan by a filtered dimension BEFORE an
  *     expensive transform chain (decode, tokenize, score) that sits
  *     between the scan and the eventual join,
  *   - membership pruning against a keep/drop list with NO downstream
  *     join at all (blocklist scrubbing, incremental-batch pruning),
  *   - joins below AQE's runtime-filter thresholds or behind
  *     non-equi conditions the optimizer won't touch.
  *
  * Mechanics: the build side aggregates `xxhash64(key)` into a
  * `BloomFilterAggregate` (Spark's own sketch — a TypedImperativeAggregate
  * with map-side partials, so the build side never shuffles raw keys),
  * the resulting few-MB filter is embedded as a BINARY literal, and the
  * probe side filters through `BloomFilterMightContain` — codegen'd,
  * pushed into the scan stage, no join, no shuffle on the probe side.
  *
  * Contract: NO false negatives ever (a Bloom filter only errs toward
  * keeping); ~`fpp` of non-matching rows survive and MUST be finished
  * by the exact operation the filter fronts ([[semiJoinPruned]] does
  * this in one call). The build side is executed eagerly (the sketch
  * must exist to be embedded — same materialize-then-broadcast shape
  * as IVF's centroid table).
  */
object BloomPrune {

  /** Build the Bloom sketch of `key` over `build` as raw bytes.
    * Driver-held but size-bounded: `expectedItems` and `fpp` fix the
    * bit count (~9.6 bits/item at 1% fpp — ~12 MB per 10M keys)
    * independent of the build side's row count. */
  def bloomOf(build: DataFrame, key: Column, expectedItems: Long,
              fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      expression(xxhash64(key)), Literal(expectedItems), Literal(numBits))
    build.agg(column(agg.toAggregateExpression()).as("bloom"))
      .head().getAs[Array[Byte]](0)
  }

  /** Keep only probe rows whose `key` MIGHT be in the sketch: a
    * codegen'd scan-stage predicate — no join, no shuffle. Null keys
    * are dropped (a null never equi-matches, so pruning it is exact). */
  def prune(probe: DataFrame, key: Column, bloom: Array[Byte]): DataFrame =
    probe.where(column(BloomFilterMightContain(
      Literal(bloom, BinaryType), expression(xxhash64(key)))))

  /** Bloom-pruned exact left-semi join: sketch the build side's keys,
    * pre-filter the probe side map-only, then finish with the exact
    * semi-join (which also clears the ~fpp false positives). Result is
    * IDENTICAL to `probe.join(build, probe(key)===build(key), "left_semi")`
    * — the sketch only changes WHERE the non-matching rows die: at the
    * scan, instead of after the exchange. */
  def semiJoinPruned(probe: DataFrame, probeKey: String,
                     build: DataFrame, buildKey: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = bloomOf(build, col(buildKey), expectedItems, fpp)
    prune(probe, col(probeKey), bloom)
      .join(build.select(col(buildKey)).distinct(),
        col(probeKey) === col(buildKey), "left_semi")
  }
}
