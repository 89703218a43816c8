package graft

import org.apache.spark.sql.functions._

/** Temporary r9 stress-sweep probe (deleted once SCALING.md records
  * the result): q_embed_dedup was the one superlinear entry at ×16
  * (41.7× wall for 16× vectors) because the bench pins nBits=4 — 16
  * hyperplane buckets/band, so bucket occupancy grows with the corpus
  * and the in-bucket verify is quadratic per bucket. The documented
  * sizing contract (2^nBits tracks corpus size) predicts nBits=8
  * restores ~linear scaling at 32k vectors; this probe measures both
  * on the amplified table for an apples-to-apples pair. */
class R9StressProbeSpec extends GraftSpec {
  test("embed dedup x16: corpus-scaled nBits restores linear cost") {
    assume(new java.io.File("/tmp/graft_stress16/embeddings.parquet").exists())
    val e = spark.read.parquet("/tmp/graft_stress16/embeddings.parquet")
    def run(nBits: Int): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.ml.Dedup.embeddingDedup(e, "vec_id", "embedding",
        threshold = 0.45, nBits = nBits, bands = 64)
        .select("vec_id")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(8) // warmup (JIT, parquet footers)
    val t8 = run(8)
    val t4 = run(4)
    info(f"x16 embeddings: nBits=4 -> $t4%.2f s, nBits=8 -> $t8%.2f s")
    assert(t8 < t4, "corpus-scaled nBits must beat the under-sized bucket space")
  }
}
