package graft.core

import org.apache.spark.sql.Row

/** Console renderers matching the reference's layout
  * (reference: src/crysda/dataframe.cr:604-664 print,
  * dataframe.cr:443-458 schema; golden outputs spec/core_spec.cr:426-493).
  * Only `maxRows` rows are fetched (`take`), never the whole frame. */
private[core] object Formatters {

  /** Cell renderer matching the reference: `<NA>` for nulls, doubles in
    * fixed `maxDigits` decimals ("12.100", golden
    * spec/core_spec.cr:425-434), everything else plain. */
  private def fmt(v: Any, maxDigits: Int): String = v match {
    case null     => "<NA>"
    case d: Double => String.format(s"%.${maxDigits}f", Double.box(d))
    case f: Float  => String.format(s"%.${maxDigits}f", Double.box(f.toDouble))
    case other    => other.toString
  }

  /** Layout per the reference: `"{title}: {n} x {m}"` header, optional
    * `Groups:` line, right-aligned padded cells, `<NA>` for nulls, and
    * an `and N more rows` footer (reference: src/crysda/dataframe.cr:604-664,
    * goldens spec/core_spec.cr:426-493). Two actions: a `take(maxRows+1)`
    * and — only when the frame overflows maxRows — a count() for the
    * exact footer/header numbers. */
  /** Console render matching the reference layout (golden
    * spec/core_spec.cr:460-477): `"A DataFrame: n x m"` title, row
    * numbers, right-aligned 3-space-separated cells, column subset
    * limited by `maxWidth`, and a footer naming the hidden variables.
    * (One deliberate divergence: the reference's footer under-lists the
    * hidden names by one — we list all of them.) */
  def printFrame(f: CrysFrame, title: String, maxRows: Int,
                 maxDigits: Int = 3, maxWidth: Int = 100,
                 rowNumbers: Boolean = true): String = {
    val names = f.names
    val rows: Seq[Row] = f.out.take(maxRows + 1).toSeq
    val total: Long = if (rows.size > maxRows) f.out.count() else rows.size.toLong
    val shown = rows.take(maxRows)
    val allCells = shown.map(r => names.map(n => fmt(r.getAs[Any](n), maxDigits)))
    val allWidths = names.zipWithIndex.map { case (n, i) =>
      (n.length +: allCells.map(_(i).length)).max
    }
    val rnW = if (rowNumbers) shown.size.toString.length else 0
    // width-limited column subset (reference: src/crysda/dataframe.cr:604-664)
    var used = rnW
    val nShow = allWidths.takeWhile { w => used += w + 3; used <= maxWidth }.size
    val shownNames = names.take(math.max(nShow, 1))
    val widths = allWidths.take(shownNames.size)
    val hidden = names.drop(shownNames.size)
    def pad(s: String, w: Int) = s.reverse.padTo(w, ' ').reverse
    val sb = new StringBuilder
    sb.append(s"$title: $total x ${names.size}\n")
    if (f.isGrouped) sb.append(s"Groups: ${f.groupedBy.mkString(", ")}\n")
    if (total > 0 || names.nonEmpty) {
      sb.append((" " * rnW) + shownNames.zip(widths)
        .map { case (n, w) => pad(n, w) }.mkString("   ", "   ", "\n"))
      shown.zipWithIndex.foreach { case (_, i) =>
        val rn = if (rowNumbers) pad((i + 1).toString, rnW) else ""
        sb.append(rn + allCells(i).take(shownNames.size).zip(widths)
          .map { case (c, w) => pad(c, w) }.mkString("   ", "   ", "\n"))
      }
    }
    val moreRows = if (total > maxRows) Some(s"and ${total - maxRows} more rows") else None
    val moreVars = if (hidden.nonEmpty)
      Some(s"and ${hidden.size} more variables: ${hidden.mkString(", ")}") else None
    val footer = (moreRows ++ moreVars).mkString(", ")
    if (footer.nonEmpty) sb.append(footer + "\n")
    sb.toString
  }

  /** CrysDA type names for the schema printer (golden
    * spec/core_spec.cr:436-452). */
  private def crysTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case DoubleType | FloatType => "Float64"
      case IntegerType            => "Int32"
      case LongType               => "Int64"
      case StringType             => "String"
      case BooleanType            => "Bool"
      case other                  => other.simpleString
    }
  }

  /** Single-column peek, `name [Type][N]: v1, v2, …` truncated to
    * `maxWidth` (reference: golden spec/core_spec.cr:454-458). */
  def columnString(f: CrysFrame, name: String, maxDigits: Int = 3,
                   maxWidth: Int = 100): String = {
    val n = f.numRow
    val vals = f.out.select(graft.core.qcol(name)).take(255)
      .map(r => fmt(r.get(0), maxDigits))
    val prefix = s"$name [${crysTypeName(f.schema(name).dataType)}][$n]: "
    val sb = new StringBuilder(prefix)
    var i = 0
    var stop = false
    while (i < vals.length && !stop) {
      val piece = (if (i > 0) ", " else "") + vals(i)
      if (sb.length + piece.length > maxWidth) stop = true
      else { sb.append(piece); i += 1 }
    }
    if (stop || n > vals.length) sb.append(", ...")
    sb.toString
  }

  /** Per-column `name [Type] v1, v2, …` with alignment and value-region
    * truncation (reference: src/crysda/dataframe.cr:443-458; golden
    * spec/core_spec.cr:436-452: "DataFrame with N observations"). */
  def schemaString(f: CrysFrame, maxDigits: Int = 3, maxWidth: Int = 100): String = {
    val rows = f.out.take(255)
    val sb = new StringBuilder
    sb.append(s"DataFrame with ${f.numRow} observations\n")
    val nameW = (f.names.map(_.length) :+ 1).max
    val types = f.names.map(n => s"[${crysTypeName(f.schema(n).dataType)}]")
    val typeW = (types.map(_.length) :+ 1).max
    f.names.zip(types).foreach { case (n, t) =>
      val vals = rows.map(r => fmt(r.getAs[Any](n), maxDigits)).mkString(", ")
      val shown = if (vals.length > maxWidth) vals.take(maxWidth) + "..." else vals
      sb.append(s"${n.padTo(nameW, ' ')} ${t.padTo(typeW, ' ')} $shown\n")
    }
    sb.toString
  }
}
