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
