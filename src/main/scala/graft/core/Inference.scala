package graft.core

import org.apache.spark.sql.types._

/** Type-inference mirroring the reference's ladder
  * (reference: src/crysda/utils.cr:275-309): Int32 → Int64 → Float64 →
  * Bool → String, NA cells skipped, configurable true/false
  * vocabularies (crysda.cr:30-33). Three rule details pinned by the
  * PropertiesSpec ladder property (r9 — each was a divergence before):
  *  - numeric PEEKS accept surrounding whitespace (Crystal's
  *    `to_i/to_i64/to_f` default `whitespace: true`, utils.cr:329-347),
  *    matching the full-column `try_cast` verify, which also trims;
  *  - the float PEEK does NOT strip thousands-commas — only the
  *    full-column conversion does (`get_f64col` gsubs the comma,
  *    utils.cr:315-327; `float64col?` at :342 parses the raw cell), so
  *    "1,234.5" inside the first 20 rows makes the column String,
  *    while the same value PAST the peek keeps a float column and
  *    parses comma-stripped;
  *  - the bool vocabulary is CASE-INSENSITIVE: the reference upcases
  *    both the cell and the vocab (as_bool?, utils.cr:356-364), so
  *    "tRuE" is true under the default vocab. No trimming — " TRUE"
  *    is not a bool, also per as_bool?. */
private[graft] object Inference {

  val defaultTrue = Set("T", "TRUE", "true", "True")
  val defaultFalse = Set("F", "FALSE", "false", "False")

  private[graft] def up(s: String): String =
    s.toUpperCase(java.util.Locale.ROOT)

  /** Infer a Spark type from sampled string cells (already NA-filtered).
    *
    * An all-NA peek returns INT — the top of the ladder, not String:
    * the reference's `int32col?` maps over an empty sample without
    * raising, so an all-nil first-20 is an Int32 CANDIDATE whose real
    * type is decided by the full-column conversion fallback
    * (utils.cr:280-287); the reader's verify pass here plays that
    * role (and an all-NA COLUMN therefore types as Int32, exactly as
    * `Int32Col.new` over all-nil values does in the reference). */
  def inferFromStrings(sample: Seq[String],
                       trueValues: Set[String] = defaultTrue,
                       falseValues: Set[String] = defaultFalse): DataType = {
    val vs = sample.filter(v => v != null && v.nonEmpty)
    if (vs.isEmpty) return IntegerType
    def all(p: String => Boolean) = vs.forall(p)
    val boolUp = (trueValues ++ falseValues).map(up)
    if (all(v => v.trim.toIntOption.isDefined)) IntegerType
    else if (all(v => v.trim.toLongOption.isDefined)) LongType
    else if (all(v => v.trim.toDoubleOption.isDefined)) DoubleType
    else if (all(v => boolUp.contains(up(v)))) BooleanType
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
