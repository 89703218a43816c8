package graft.core

import org.apache.spark.sql.types._

/** Column-selection failure, mirroring the reference's `SelectException`
  * contract (reference: src/crysda/select.cr:21-33). */
final class SelectException(msg: String) extends RuntimeException(msg)

/** A `summarize` rule that does not reduce to a scalar per group —
  * the reference-shaped error contract
  * (reference: src/crysda/columns.cr:27-31, spec/core_spec.cr:313-317). */
final class NonScalarValueException(msg: String) extends RuntimeException(msg)

/** General reference-shaped failure (oversampling, invalid arguments —
  * reference: src/crysda/context.cr:56-58 CrysdaException). */
final class CrysdaException(msg: String) extends RuntimeException(msg)

/** Predicate/DSL column selection, resolved driver-side against the
  * frame's column names — no Catalyst involvement needed (the plan only
  * ever sees the final `select(names)`).
  *
  * Mirrors the reference DSL (reference: src/crysda/select.cr:42-129):
  * `startsWith`, `endsWith`, `matches`, `listOf`, `all`, name-range,
  * `except` (negative selection), boolean combinators; mixing positive
  * and negative selection in one call is rejected
  * (reference: src/crysda/dataframe.cr:716-738).
  *
  * Resolution is tri-state per column (include / exclude / untouched),
  * combined with AND/OR, exactly like the reference's nullable-bool
  * vectors.
  */
sealed trait ColumnSelector { self =>
  import ColumnSelector._

  def and(other: ColumnSelector): ColumnSelector = And(self, other)
  def or(other: ColumnSelector): ColumnSelector = Or(self, other)
  def unary_- : ColumnSelector = Not(self)

  /** Tri-state mask over `cols`: Some(true)=selected, Some(false)=deselected,
    * None=untouched. */
  private[core] def mask(cols: Seq[String], schema: StructType): Seq[Option[Boolean]]

  /** Resolve to a concrete, ordered list of column names. */
  def resolve(cols: Seq[String], schema: StructType): Seq[String] = {
    val m = mask(cols, schema)
    val anyPos = m.exists(_.contains(true))
    val anyNeg = m.exists(_.contains(false))
    if (anyPos && anyNeg)
      throw new SelectException(
        "Mixing positive and negative selection is not supported")
    if (anyPos) cols.zip(m).collect { case (c, Some(true)) => c }
    else if (anyNeg) cols.zip(m).collect { case (c, s) if !s.contains(false) => c }
    else Seq.empty
  }
}

object ColumnSelector {
  private def pos(cols: Seq[String])(p: String => Boolean): Seq[Option[Boolean]] =
    cols.map(c => if (p(c)) Some(true) else None)

  final case class StartsWith(prefix: String) extends ColumnSelector {
    private[core] def mask(cols: Seq[String], schema: StructType) =
      pos(cols)(_.startsWith(prefix))
  }
  final case class EndsWith(suffix: String) extends ColumnSelector {
    private[core] def mask(cols: Seq[String], schema: StructType) =
      pos(cols)(_.endsWith(suffix))
  }
  final case class Matches(re: String) extends ColumnSelector {
    private val rx = re.r
    private[core] def mask(cols: Seq[String], schema: StructType) =
      pos(cols)(c => rx.findFirstIn(c).isDefined)
  }
  final case class ListOf(names: Seq[String]) extends ColumnSelector {
    private[core] def mask(cols: Seq[String], schema: StructType) = {
      val missing = names.filterNot(cols.contains)
      if (missing.nonEmpty)
        throw new SelectException(s"Unknown column(s): ${missing.mkString(", ")}")
      pos(cols)(names.contains)
    }
  }
  case object All extends ColumnSelector {
    private[core] def mask(cols: Seq[String], schema: StructType) =
      cols.map(_ => Some(true))
  }
  /** Inclusive positional range `from..to` by name
    * (reference: src/crysda/select.cr:74-86). */
  final case class NameRange(from: String, to: String) extends ColumnSelector {
    private[core] def mask(cols: Seq[String], schema: StructType) = {
      val i = cols.indexOf(from); val j = cols.indexOf(to)
      if (i < 0 || j < 0)
        throw new SelectException(s"Unknown range bound in [$from..$to]")
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      cols.zipWithIndex.map { case (_, k) =>
        if (k >= lo && k <= hi) Some(true) else None }
    }
  }
  final case class OfType(dt: DataType) extends ColumnSelector {
    private[core] def mask(cols: Seq[String], schema: StructType) =
      cols.map(c => if (schema(c).dataType == dt) Some(true): Option[Boolean] else None)
  }
  final case class Not(inner: ColumnSelector) extends ColumnSelector {
    private[core] def mask(cols: Seq[String], schema: StructType) =
      inner.mask(cols, schema).map {
        case Some(b) => Some(!b)
        case None    => None
      }
  }
  final case class And(a: ColumnSelector, b: ColumnSelector) extends ColumnSelector {
    private[core] def mask(cols: Seq[String], schema: StructType) =
      a.mask(cols, schema).zip(b.mask(cols, schema)).map {
        case (Some(x), Some(y)) => Some(x && y)
        case (x, None)          => x
        case (None, y)          => y
      }
  }
  final case class Or(a: ColumnSelector, b: ColumnSelector) extends ColumnSelector {
    private[core] def mask(cols: Seq[String], schema: StructType) =
      a.mask(cols, schema).zip(b.mask(cols, schema)).map {
        case (Some(x), Some(y)) => Some(x || y)
        case (x, None)          => x
        case (None, y)          => y
      }
  }
}

/** User-facing selector vocabulary, `import graft.core.sel._`. */
object sel {
  import ColumnSelector._
  def startsWith(p: String): ColumnSelector = StartsWith(p)
  def endsWith(s: String): ColumnSelector = EndsWith(s)
  def matches(re: String): ColumnSelector = Matches(re)
  def listOf(names: String*): ColumnSelector = ListOf(names)
  def all: ColumnSelector = All
  def range(from: String, to: String): ColumnSelector = NameRange(from, to)
  def except(names: String*): ColumnSelector = Not(ListOf(names))
  def except(s: ColumnSelector): ColumnSelector = Not(s)
  def ofType(dt: DataType): ColumnSelector = OfType(dt)
  def ints: ColumnSelector = OfType(IntegerType).or(OfType(LongType))
  def doubles: ColumnSelector = OfType(DoubleType)
  def strings: ColumnSelector = OfType(StringType)
  def bools: ColumnSelector = OfType(BooleanType)
}
