package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object core {
  /** Column reference by LITERAL name — backtick-quoted so dotted names
    * (`Sepal.Length`, join suffixes `.x`/`.y`) resolve as one
    * identifier instead of a struct-field path.
    *
    * Convention boundary: the CrysFrame verb surface (this package)
    * accepts ANY column name and routes every reference through qcol —
    * fuzz-pinned on dotted/spaced/backticked names. The scale-extension
    * operators (graft.ml / graft.text / graft.operators / graft.sources
    * exports) take Spark-CONVENTIONAL names (`col(name)` semantics,
    * like Spark's own String-typed APIs): a dotted name there is a
    * struct path, exactly as a Spark user expects. */
  private[graft] def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")
}
