package org.apache.spark.sql.graftkit

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`);
  * custom Catalyst expressions still need them to surface as Columns,
  * so this shim lives inside the sql package namespace. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Source column names referenced anywhere in a Column. Spark 4
    * Columns carry a ColumnNode tree whose catalyst conversion happens
    * at ANALYSIS — collecting over `expression(c)` sees only an opaque
    * ColumnNodeExpression leaf — so this walks the NODE tree,
    * descending into embedded catalyst expressions (df("name") →
    * AttributeReference) and back into any nodes those wrap. */
  def refs(c: Column): Seq[String] = refsOpaque(c)._1

  /** [[refs]] plus an opacity flag: true when the tree contains a node
    * whose references cannot be enumerated without a session — a raw
    * SQL string (`expr("...")`, parsed only at analysis), a star, or
    * an unresolved function that may expand to one. A caller using
    * references for a SAFETY decision must treat an opaque tree as
    * referencing anything. */
  def refsOpaque(c: Column): (Seq[String], Boolean) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var opaque = false
    def fromExpr(e: Expression): Unit =
      e.foreach {
        case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          out += ua.nameParts.mkString(".")
        case ar: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          out += ar.name
        case _: org.apache.spark.sql.catalyst.analysis.UnresolvedStar =>
          opaque = true
        case _ => ()
      }
    def fromNode(n: org.apache.spark.sql.internal.ColumnNode): Unit =
      n.foreach {
        case ua: org.apache.spark.sql.internal.UnresolvedAttribute =>
          out += ua.nameParts.mkString(".")
        case en: org.apache.spark.sql.classic.ExpressionColumnNode =>
          fromExpr(en.expression)
        case _: org.apache.spark.sql.internal.SqlExpression =>
          opaque = true
        case _: org.apache.spark.sql.internal.UnresolvedStar =>
          opaque = true
        case _ => ()
      }
    fromNode(c.node)
    (out.distinct.toSeq, opaque)
  }

  /** Node-level rename for the cases a ColumnNode CAN be rebuilt: a
    * bare attribute, or one wrapped in a single SortOrder (what
    * sortBy/sortDescBy produce). Returns None for anything composite —
    * node trees expose no generic transform, so the caller must fall
    * back to its own strategy. */
  def renameAttr(c: Column, m: Map[String, String]): Option[Column] = {
    import org.apache.spark.sql.{internal => NI}
    def ren(ua: NI.UnresolvedAttribute): Option[Column] =
      m.get(ua.nameParts.mkString(".")).map(n =>
        Column(NI.UnresolvedAttribute(Seq(n), ua.planId, ua.isMetadataColumn)))
    c.node match {
      case ua: NI.UnresolvedAttribute => ren(ua).orElse(Some(c))
      case so: NI.SortOrder =>
        so.child match {
          case ua: NI.UnresolvedAttribute =>
            ren(ua).map(ch =>
              Column(NI.SortOrder(ch.node, so.sortDirection, so.nullOrdering)))
              .orElse(Some(c))
          case _ => None
        }
      case _ => None
    }
  }

  /** Reverse a possibly-direction-carrying sort key: `x.desc` becomes
    * `x.asc` with the null ordering flipped too, and a plain column
    * becomes `desc` (Spark's window/sort default being asc-nulls-first,
    * its reverse is desc-nulls-last — which `.desc` is). Works on the
    * NODE tree: matching the converted catalyst expression never fires
    * on Spark 4 (the conversion happens at analysis), and calling
    * `.desc` on an already-SortOrder column nests sort orders, which
    * dies at codegen with an INTERNAL_ERROR. */
  def reverseSort(c: Column): Column = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      import org.apache.spark.sql.internal.SortOrder._
      val child = Column(so.child)
      (so.sortDirection, so.nullOrdering) match {
        case (Ascending, NullsFirst)  => child.desc_nulls_last
        case (Ascending, NullsLast)   => child.desc_nulls_first
        case (Descending, NullsFirst) => child.asc_nulls_last
        case (Descending, NullsLast)  => child.asc_nulls_first
      }
    case _ => c.desc
  }

  /** Decompose a possibly-sort-ordered Column (`col("x").desc`) into
    * its VALUE column and a function that re-applies the same
    * direction/null-ordering to another column. A plain column gets
    * Spark's window default (ascending, nulls first). Used by the
    * scale-safe global-window machinery, which must both sort by the
    * user's key and group/join on its value. */
  def sortSpec(c: Column): (Column, Column => Column) = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      import org.apache.spark.sql.internal.SortOrder._
      val re: Column => Column = (so.sortDirection, so.nullOrdering) match {
        case (Ascending, NullsFirst)  => _.asc_nulls_first
        case (Ascending, NullsLast)   => _.asc_nulls_last
        case (Descending, NullsFirst) => _.desc_nulls_first
        case (Descending, NullsLast)  => _.desc_nulls_last
      }
      (Column(so.child), re)
    case _ => (c, _.asc_nulls_first)
  }
}
