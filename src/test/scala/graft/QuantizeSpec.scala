package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.ml.{Quantize, Similarity}

/** int8 quantization: error bound, degenerate vectors, ANN recall on
  * dequantized vectors, map-only plan. */
class QuantizeSpec extends GraftSpec {

  private val dir = "/root/testdata/sf0.001"

  test("reconstruction error is bounded by half a quantization step") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = Quantize.quantizeEmbeddings(emb, "embedding")
      .withColumn("__vd", col("embedding").cast("array<double>"))
      .select(col("vmin"), col("vmax"),
        Quantize.maxAbsError(col("__vd"), col("qvec"), col("vmin"), col("vmax"))
          .as("err"))
      .collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val halfStep = (r.getDouble(1) - r.getDouble(0)) / 255.0 / 2.0
      assert(r.getDouble(2) <= halfStep + 1e-12,
        s"err ${r.getDouble(2)} > half-step $halfStep")
    }
  }

  test("constant vectors take the degenerate branch and reconstruct exactly") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.5f, 0.5f, 0.5f)), (2L, Seq(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.quantizeEmbeddings(df, "embedding")
      .withColumn("deq", Quantize.dequantize(col("qvec"), col("vmin"), col("vmax")))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](r.fieldIndex("qvec")), r.getSeq[Double](r.fieldIndex("deq")))))
      .toMap
    assert(q(1L)._1 == Seq(0, 0, 0))
    assert(q(1L)._2 == Seq(0.5, 0.5, 0.5)) // exact despite scale 0
    assert(q(2L)._1 == Seq(0, 128, 255))   // endpoints land on the rails
  }

  test("cosine top-k over dequantized int8 vectors recalls the exact top-k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding", k = 10)
      .select("query_id", "nn_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def deq(df: org.apache.spark.sql.DataFrame) =
      Quantize.quantizeEmbeddings(df, "embedding")
        .select(col("vec_id"),
          Quantize.dequantize(col("qvec"), col("vmin"), col("vmax"))
            .cast("array<float>").as("embedding"))
    val approx = Similarity.bruteForceTopK(deq(emb), "vec_id", "embedding",
        deq(queries), "vec_id", "embedding", k = 10)
      .select("query_id", "nn_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // .keys.toSeq, not .keys: mapping the key SET to recall values
    // would collapse equal recalls and skew the mean (caught via the
    // same pattern in PqSpec)
    val recalls = exact.keys.toSeq.map(q =>
      (exact(q) intersect approx(q)).size.toDouble / exact(q).size)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean")
  }

  test("quantization plan is map-only") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = Quantize.quantizeEmbeddings(emb, "embedding")
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), p)
  }
}
