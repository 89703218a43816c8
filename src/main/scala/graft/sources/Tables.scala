package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located-join story at cluster scale.
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join keys with the SAME bucket count lets every subsequent sort-merge
  * join read pre-distributed, pre-sorted buckets: NO exchange, NO sort
  * at query time (asserted in `PlanQualitySpec`). At 100 TB this turns
  * the dominant repeated fact-to-fact join from a full shuffle into a
  * map-side zip of bucket files — the one optimization Catalyst cannot
  * apply unless the data layout provides it.
  *
  * (Spark bucketing is datasource-native — no Hive required; tables
  * register in the session catalog and live under
  * `spark.sql.warehouse.dir`.)
  */
object Tables {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
