package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines (extension
  * beyond the reference surface — SURVEY §7.2 step 8).
  *
  * Media ride as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract run per-partition over iterator batches
  * (the Scala counterpart of `mapInPandas`: one decoder init per
  * partition, streaming rows, no whole-partition materialization).
  *
  * The actual codec calls are STUBBED with a deterministic fake
  * (image/audio libs are not in this container); the Spark-side
  * contract — schema, batch shape, partition sizing — is real and
  * tested, so swapping in a real decoder is a one-function change.
  */
object Multimodal {

  /** media column convention: content binary + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** STUB decoder — deterministic fake "embedding" derived from the
    * bytes. Replace with a real codec (e.g. javax.imageio / ffmpeg
    * bindings) without touching the pipeline shape. */
  private[multimodal] def fakeDecodeFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return null
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(j) = (h & 0xFFFF).toFloat / 65535.0f
      j += 1
    }
    out
  }

  /** Decode + featurize media rows per partition. `mapPartitions` so a
    * (stubbed) decoder is initialized once per task, not per row —
    * the pattern that matters when the decoder is an expensive native
    * context. Binary-heavy frames should be repartitioned by size
    * beforehand (`maxPartitionBytes` governs scan splits natively). */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select(col("media_id"), col("kind"), col("content"))
      .mapPartitions { rows =>
        // decoder init would happen here, once per partition
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            if (bytes == null) null else bytes.length.toLong,
            if (bytes == null) null else fakeDecodeFeature(bytes, dim).toSeq)
        }
      }(enc)
  }

  /** Deterministic synthetic media frame for tests/demos: content bytes
    * derived from the id. */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("id") % 3).cast("int") + 1).as("kind"),
      to_binary(sha2(col("id").cast("string"), 256), lit("hex")).as("content"),
      struct(lit("application/octet-stream").as("mime"),
        lit(64).as("width"), lit(64).as("height"),
        (col("id") * 100).as("duration_ms")).as("meta"))
  }
}
