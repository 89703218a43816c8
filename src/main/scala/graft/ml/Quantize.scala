package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage/IO scale path for
  * the similarity stack: 4× smaller vectors (64-dim float → 64 bytes)
  * shrink every ANN index, shuffle, and broadcast by the same factor,
  * at a reconstruction error bounded by half a quantization step.
  * (Extension beyond the reference surface.)
  *
  * Per-vector affine quantization:
  *   scale = (vmax − vmin) / 255,  q[i] = round((v[i] − vmin) / scale)
  * with q in 0..255 and dequantization v̂[i] = vmin + q[i] · scale.
  * Per-VECTOR (not per-corpus) ranges need no global pass — the op is
  * map-only and embarrassingly parallel.
  *
  * Everything is expression-only; the arithmetic keeps one fixed IEEE
  * op order so an external engine (the DuckDB oracle) reproduces the
  * codes exactly. Degenerate constant vectors (vmax == vmin) quantize
  * to all-zero codes and reconstruct exactly.
  *
  * HOF discipline (see TextFunctions.shinglesFromNormalized): vmin /
  * vmax / the double-cast array are materialized as columns BEFORE the
  * per-element lambdas reference them.
  */
object Quantize {

  /** Append `vmin`, `vmax` (doubles) and `qvec` (array<int>, values
    * 0..255) for the given vector column. */
  def quantizeEmbeddings(df: DataFrame, vecCol: String): DataFrame = {
    Seq("vmin", "vmax", "qvec", "__vd").foreach(c =>
      require(!df.columns.contains(c),
        s"quantizeEmbeddings appends '$c' — the input already has that column"))
    df.withColumn("__vd", col(vecCol).cast("array<double>"))
      .withColumn("vmin", array_min(col("__vd")))
      .withColumn("vmax", array_max(col("__vd")))
      .withColumn("qvec",
        when(col("vmax") === col("vmin"),
          transform(col("__vd"), _ => lit(0)))
          .otherwise(transform(col("__vd"), v =>
            round((v - col("vmin")) * lit(255.0) / (col("vmax") - col("vmin")), 0)
              .cast("int"))))
      .drop("__vd")
  }

  /** Reconstruct an `array<double>` column from `qvec`/`vmin`/`vmax`
    * (the inverse of [[quantizeEmbeddings]] up to half a step). */
  def dequantize(qvec: Column, vmin: Column, vmax: Column): Column =
    when(vmax === vmin, transform(qvec, _ => vmin))
      .otherwise(transform(qvec, q =>
        vmin + q.cast("double") * (vmax - vmin) / lit(255.0)))

  /** Worst-case reconstruction error of a quantized row — half a step,
    * exposed for auditing: max |v̂[i] − v[i]|. Operands must be the
    * SAME materialized columns used at quantization time. */
  def maxAbsError(vd: Column, qvec: Column, vmin: Column, vmax: Column): Column =
    array_max(zip_with(dequantize(qvec, vmin, vmax), vd, (r, v) => abs(r - v)))
}
