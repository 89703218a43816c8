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
  * ([[graft.ml.Sampling.knuthHash]] — `((id · 2654435761 + seed) mod
  * 2^31−1) mod n`) rather than a Spark-internal hash, so an external
  * system can compute — and audit — the exact same layout (the driver
  * oracle does). Ids must be non-null (and below ~3.5e9, see
  * knuthHash).
  */
object Export {

  /** Append a `shard` column in [0, nShards). Map-only. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int,
                  seed: Long = 42L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("shard"),
      "shardAssign appends 'shard' — the input already has that column")
    df.withColumn("shard",
      pmod(graft.ml.Sampling.knuthHash(col(idCol), seed), lit(nShards.toLong)))
  }

  /** Export `df` into hash-addressed subdirectories (`shard=K/`) under
    * `dir`, one file per non-empty shard, and return the (materialized)
    * manifest with one row for EVERY shard id in [0, nShards) —
    * including zero-row shards, which materialize no directory, so
    * loaders must consult the manifest, never a directory listing.
    *
    * Partitioning is an IDENTITY map shard→task (an RDD-level custom
    * `Partitioner`): exactly one write task per shard, each carrying
    * only its own shard's rows. A `repartition(nShards, col)` would
    * instead hash the shard id — balls-in-bins collisions put several
    * shards in one task (and leave ~1/e of tasks empty), breaking the
    * 100 TB / nShards task-sizing contract. The RDD hop costs one
    * serialization boundary on a write that is IO-bound anyway.
    *
    * The input lineage runs ONCE: rows stream through the shuffle to
    * the writer tasks, and the manifest is aggregated from the written
    * files themselves, so the counts describe exactly what landed on
    * disk. A null id fails fast with a descriptive error. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, dir: String,
                  format: String = "parquet", seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val sharded = shardAssign(df, idCol, nShards, seed)
    val schema = sharded.schema
    val shardIdx = schema.fieldIndex("shard")
    val identityPartitioned = sharded.rdd
      .map { r =>
        if (r.isNullAt(shardIdx))
          throw new IllegalArgumentException(
            s"writeShards: null $idCol — shard assignment needs non-null ids")
        (r.getLong(shardIdx), r)
      }
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = nShards
        override def getPartition(key: Any): Int = key.asInstanceOf[Long].toInt
      })
      .map(_._2)
    spark.createDataFrame(identityPartitioned, schema)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard").format(format).save(dir)
    val written = spark.read.format(format).load(dir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"))
    spark.range(nShards).select(col("id").as("shard"))
      .join(written, Seq("shard"), "left")
      .select(col("shard"), coalesce(col("n_rows"), lit(0L)).as("n_rows"))
      .orderBy(col("shard"))
  }
}
