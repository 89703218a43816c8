package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — absent from both the reference and vanilla Spark SQL
  * (extension operator; DuckDB's ASOF JOIN is the semantic oracle).
  *
  * For every left row, attach the payload of the right row with the
  * largest `ts` ≤ left `ts` within the same partition keys (inclusive).
  *
  * Implemented as union + running `last(ignoreNulls)` window rather
  * than a range join: ONE shuffle on the partition keys, linear scan
  * within each key — the plan a 1000-executor cluster wants (a naive
  * theta-join explodes quadratically; Spark has no native asof).
  * Skew note: a hot partition key degrades to a big single task — at
  * that point pre-bucket by (key, coarse time bucket) with carry-in.
  *
  * SQL-faithful edge semantics (matching DuckDB's equi+inequality
  * conditions): right rows with a NULL timestamp or a NULL key never
  * match anything and are dropped up front; left rows with a NULL
  * timestamp or key match nothing (null payload). The matched right
  * row travels as ONE struct, so a null inside one payload column can
  * never fall back to an older right row's value for that column.
  */
object AsOfJoin {

  /** @param left        probe side
    * @param right       reference side (ts-sorted semantics)
    * @param partitionBy equi-keys present in both sides
    * @param tsCol       timestamp column name (both sides)
    * @param payload     right-side columns to carry, (srcName → outName)
    */
  def join(left: DataFrame, right: DataFrame, partitionBy: Seq[String],
           tsCol: String, payload: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tag = "__asof_tag"
    val rowStruct = "__asof_row"
    // the candidate right row as a single struct — matched or not as a
    // unit (a per-column last(ignoreNulls) would mix rows when one
    // payload column is null)
    val l = left.withColumn(tag, lit(1))
      .withColumn(rowStruct,
        lit(null).cast(s"struct<${payload.map { case (src, out) =>
          s"`$out`:${right.schema(src).dataType.sql}" }.mkString(",")}>"))
    // null keys / null ts on the right can never satisfy the equi +
    // inequality conditions — drop them before the union
    val rMatchable = partitionBy.foldLeft(
      right.filter(col(tsCol).isNotNull))((d, k) => d.filter(col(k).isNotNull))
    val rr = leftCols.filterNot(c => partitionBy.contains(c) || c == tsCol)
      .foldLeft(rMatchable.select((partitionBy.map(col) :+ col(tsCol) :+
        struct(payload.map { case (src, out) => col(src).as(out) }: _*)
          .as(rowStruct)): _*)
        .withColumn(tag, lit(0)))((d, c) => d.withColumn(c, lit(null)))
    val unioned = l.unionByName(rr, allowMissingColumns = true)
    // right rows sort before left rows at equal ts (inclusive asof);
    // null-ts LEFT rows sort first, so they see no right rows — match
    // nothing, like SQL's inequality on NULL
    val w = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(col(tsCol).asc_nulls_first, col(tag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned.withColumn(rowStruct,
      last(col(rowStruct), ignoreNulls = true).over(w))
    matched.filter(col(tag) === 1)
      .select((leftCols.map(col) ++ payload.map { case (_, out) =>
        col(rowStruct).getField(out).as(out) }): _*)
  }
}
