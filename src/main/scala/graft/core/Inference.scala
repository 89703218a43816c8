package graft.core

import org.apache.spark.sql.types._

/** Type-inference mirroring the reference's ladder
  * (reference: src/crysda/utils.cr:275-309): Int32 → Int64 → Float64 →
  * Bool → String, NA cells skipped, thousands-separator commas allowed
  * for floats (utils.cr:319), configurable true/false vocabularies
  * (crysda.cr:30-33). */
private[graft] object Inference {

  val defaultTrue = Set("T", "TRUE", "true", "True")
  val defaultFalse = Set("F", "FALSE", "false", "False")

  /** Infer a Spark type from sampled string cells (already NA-filtered). */
  def inferFromStrings(sample: Seq[String],
                       trueValues: Set[String] = defaultTrue,
                       falseValues: Set[String] = defaultFalse): DataType = {
    val vs = sample.filter(v => v != null && v.nonEmpty)
    if (vs.isEmpty) return StringType
    def all(p: String => Boolean) = vs.forall(p)
    if (all(v => v.toIntOption.isDefined)) IntegerType
    else if (all(v => v.toLongOption.isDefined)) LongType
    else if (all(v => v.replace(",", "").toDoubleOption.isDefined)) DoubleType
    else if (all(v => trueValues.contains(v) || falseValues.contains(v))) BooleanType
    else StringType
  }

  /** Infer from in-memory Scala values (reference: Utils.handle_union,
    * src/crysda/utils.cr:185-207). Int widens to Long only when Longs
    * present; Float32 widens to Float64 (utils.cr:213,233). */
  def inferType(values: Seq[Any]): DataType = {
    val vs = values.filter(_ != null)
    if (vs.isEmpty) StringType
    else if (vs.forall(_.isInstanceOf[Int])) IntegerType
    else if (vs.forall(v => v.isInstanceOf[Int] || v.isInstanceOf[Long])) LongType
    else if (vs.forall(v => v.isInstanceOf[Float] || v.isInstanceOf[Double]
      || v.isInstanceOf[Int] || v.isInstanceOf[Long])) DoubleType
    else if (vs.forall(_.isInstanceOf[Boolean])) BooleanType
    else if (vs.forall(_.isInstanceOf[String])) StringType
    else if (vs.forall(_.isInstanceOf[java.sql.Timestamp])) TimestampType
    else StringType
  }

  /** True when the non-null cells do NOT fit one Spark type — the
    * reference's heterogeneous `AnyCol` case (context.cr:54), which
    * CrysFrame.of materializes as a [[Variant]] column. (Homogeneous
    * but non-primitive cells — e.g. all-UUID — also take the variant
    * path: they keep their family tag and round-trip losslessly.) */
  def isMixed(values: Seq[Any]): Boolean = {
    val vs = values.filter(_ != null)
    vs.nonEmpty && inferType(values) == StringType &&
      !vs.forall(_.isInstanceOf[String])
  }
}
