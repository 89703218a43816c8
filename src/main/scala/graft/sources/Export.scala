package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sharded dataset export — the training-dataloader handoff: a FIXED
  * shard count with a deterministic, content-stable row→shard map, so
  * every re-export lands each row in the same shard and downstream
  * loaders can address shards positionally. (Extension beyond the
  * reference surface.)
  *
  * The assignment reuses the pipeline's SQL-expressible Knuth hash
  * (`((id · 2654435761 + seed) mod 2^31−1) mod n`) rather than a
  * Spark-internal hash, so an external system can compute — and audit
  * — the exact same layout (the driver oracle does).
  */
object Export {

  private val P = 2654435761L
  private val M = 2147483647L

  /** Append a `shard` column in [0, nShards). Map-only. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int,
                  seed: Long = 42L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("shard"),
      "shardAssign appends 'shard' — the input already has that column")
    df.withColumn("shard",
      pmod(pmod(col(idCol) * P + lit(seed), lit(M)), lit(nShards.toLong)))
  }

  /** Export `df` into `nShards` hash-addressed subdirectories
    * (`shard=K/`) under `dir`, one file per shard, and return the
    * manifest (shard, n_rows) — the loader's index. The
    * `repartition(nShards, shard)`ed write gives exactly one task per
    * shard; shard sizes stay balanced because the assignment is
    * uniform in the id hash (size the shard count to the corpus —
    * 100 TB / nShards per task). */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, dir: String,
                  format: String = "parquet", seed: Long = 42L): DataFrame = {
    val sharded = shardAssign(df, idCol, nShards, seed)
    sharded.repartition(nShards, col("shard"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard").format(format).save(dir)
    sharded.groupBy(col("shard")).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("shard"))
  }
}
