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
    val l = payload.foldLeft(left.withColumn(tag, lit(1))) {
      case (d, (_, out)) => d.withColumn("__r_" + out, lit(null))
    }
    val rSel = partitionBy.map(col) ++ Seq(col(tsCol)) ++
      payload.map { case (src, out) => col(src).as("__r_" + out) }
    var r = right.select(rSel: _*).withColumn(tag, lit(0))
    // align schemas for unionByName: left payload columns missing on right
    val rr = leftCols.filterNot(c => partitionBy.contains(c) || c == tsCol)
      .foldLeft(r)((d, c) => d.withColumn(c, lit(null)))
    val unioned = l.unionByName(rr, allowMissingColumns = true)
    // right rows sort before left rows at equal ts (inclusive asof)
    val w = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(col(tsCol).asc, col(tag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { case (d, (_, out)) =>
      d.withColumn(out, last(col("__r_" + out), ignoreNulls = true).over(w))
    }
    filled.filter(col(tag) === 1)
      .select((leftCols.map(col) ++ payload.map { case (_, out) => col(out) }): _*)
  }
}
