package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object core {
  /** Column reference by LITERAL name — backtick-quoted so dotted names
    * (`Sepal.Length`, join suffixes `.x`/`.y`) resolve as one
    * identifier instead of a struct-field path. */
  private[graft] def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")
}
