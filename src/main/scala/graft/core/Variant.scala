package graft.core

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Heterogeneous-cell columns — the reference's `AnyCol`, whose cells
  * mix `String|Int|Float|Bool|Time|UUID|…` in ONE column
  * (reference: src/crysda/context.cr:54 `alias Any = …`).
  *
  * Spark columns are homogeneously typed, so a truly mixed column is
  * represented as a VARIANT: `struct<tag: string, repr: string>` — the
  * runtime family tag plus a canonical string encoding. That keeps the
  * cells first-class Spark values (groupable, sortable, shuffle-safe,
  * parquet-writable) with none of the reference's run-stable-hashcode
  * machinery: equality and grouping are by (tag, repr) value.
  *
  * Typed views are plain expressions (`asLong`/`asDouble`/…, try_cast
  * semantics: wrong-family cells go null), and `convertType` on a
  * variant column materializes it back to a typed column when the tags
  * turn out homogeneous (reference's convert_type ladder).
  */
object Variant {

  /** The variant cell schema. Field names live in the engine's reserved
    * `__graft_` namespace so a USER struct column that happens to carry
    * (tag, repr) string fields is never misread as a variant by the
    * printer or convertType. */
  val schema: StructType = StructType(Seq(
    StructField("__graft_tag", StringType, nullable = true),
    StructField("__graft_repr", StringType, nullable = true)))

  def isVariantType(dt: DataType): Boolean = dt match {
    case st: StructType =>
      st.fields.length == 2 &&
        st.fieldNames.toSeq == Seq("__graft_tag", "__graft_repr") &&
        st.fields.forall(_.dataType == StringType)
    case _ => false
  }

  /** Driver-side encode of one literal cell (CrysFrame.of ingest). */
  def encode(v: Any): Row = v match {
    case null                   => null
    case i: Int                 => Row("i32", i.toString)
    case l: Long                => Row("i64", l.toString)
    case f: Float               => Row("f64", f.toDouble.toString)
    case d: Double              => Row("f64", d.toString)
    case b: Boolean             => Row("bool", b.toString)
    case s: String              => Row("str", s)
    case t: java.sql.Timestamp  => Row("time", t.toInstant.toString)
    case t: java.time.Instant   => Row("time", t.toString)
    case u: java.util.UUID      => Row("uuid", u.toString)
    case other                  => Row("obj", String.valueOf(other))
  }

  /** Driver-side decode back to the JVM value `encode` consumed. */
  def decode(r: Row): Any =
    if (r == null || r.isNullAt(0)) null
    else r.getString(0) match {
      case "i32"  => r.getString(1).toInt
      case "i64"  => r.getString(1).toLong
      case "f64"  => r.getString(1).toDouble
      case "bool" => r.getString(1).toBoolean
      case "time" => java.sql.Timestamp.from(java.time.Instant.parse(r.getString(1)))
      case "uuid" => java.util.UUID.fromString(r.getString(1))
      case _      => r.getString(1)
    }

  def tag(c: Column): Column = c.getField("__graft_tag")
  def repr(c: Column): Column = c.getField("__graft_repr")

  /** Typed views — wrong-family cells evaluate to null (try_cast). */
  def asLong(c: Column): Column = repr(c).try_cast("long")
  def asDouble(c: Column): Column = repr(c).try_cast("double")
  def asBoolean(c: Column): Column =
    when(tag(c) === "bool", repr(c).try_cast("boolean"))
  def asTimestamp(c: Column): Column =
    when(tag(c) === "time", repr(c).try_cast("timestamp"))
  def asString(c: Column): Column = repr(c)

}
