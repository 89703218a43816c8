package graft.core

import org.apache.spark.sql.Row

/** Console renderers matching the reference's layout
  * (reference: src/crysda/dataframe.cr:604-664 print,
  * dataframe.cr:443-458 schema; golden outputs spec/core_spec.cr:426-493).
  * Only `maxRows` rows are fetched (`take`), never the whole frame. */
private[core] object Formatters {

  private def fmt(v: Any, maxDigits: Int): String = v match {
    case null => "<NA>"
    case d: Double =>
      if (d == d.floor && math.abs(d) < 1e15) f"${d}%.1f"
      else BigDecimal(d).setScale(maxDigits, BigDecimal.RoundingMode.HALF_UP).toString
    case other => other.toString
  }

  /** Layout per the reference: `"{title}: {n} x {m}"` header, optional
    * `Groups:` line, right-aligned padded cells, `<NA>` for nulls, and
    * an `and N more rows` footer (reference: src/crysda/dataframe.cr:604-664,
    * goldens spec/core_spec.cr:426-493). Two actions: a `take(maxRows+1)`
    * and — only when the frame overflows maxRows — a count() for the
    * exact footer/header numbers. */
  def printFrame(f: CrysFrame, title: String, maxRows: Int,
                 maxDigits: Int = 3, maxWidth: Int = 100): String = {
    val names = f.names
    val rows: Seq[Row] = f.out.take(maxRows + 1).toSeq
    val total: Long = if (rows.size > maxRows) f.out.count() else rows.size.toLong
    val shown = rows.take(maxRows)
    val allCells = shown.map(r => names.map(n => fmt(r.getAs[Any](n), maxDigits)))
    val allWidths = names.zipWithIndex.map { case (n, i) =>
      (n.length +: allCells.map(_(i).length)).max
    }
    // width-limited column subset + "and K more variables" footer
    // (reference: src/crysda/dataframe.cr:604-664)
    var used = 0
    val nShow = allWidths.takeWhile { w => used += w + 3; used <= maxWidth }.size
    val shownNames = names.take(math.max(nShow, 1))
    val widths = allWidths.take(shownNames.size)
    val cells = allCells.map(_.take(shownNames.size))
    val moreVars = names.size - shownNames.size
    val sb = new StringBuilder
    sb.append(s"$title: $total x ${names.size}\n")
    if (f.isGrouped) sb.append(s"Groups: ${f.groupedBy.mkString(", ")}\n")
    sb.append(shownNames.zip(widths).map { case (n, w) => n.reverse.padTo(w, ' ').reverse }
      .mkString("   ", "   ", "\n"))
    cells.foreach { r =>
      sb.append(r.zip(widths).map { case (c, w) => c.reverse.padTo(w, ' ').reverse }
        .mkString("   ", "   ", "\n"))
    }
    if (total > maxRows && moreVars > 0)
      sb.append(s"and ${total - maxRows} more rows, and $moreVars more variables\n")
    else if (total > maxRows) sb.append(s"and ${total - maxRows} more rows\n")
    else if (moreVars > 0) sb.append(s"and $moreVars more variables\n")
    sb.toString
  }

  def schemaString(f: CrysFrame, maxValues: Int): String = {
    val rows = f.out.take(maxValues)
    val sb = new StringBuilder
    sb.append(s"DataFrame with ${f.numCol} columns\n")
    val nameW = (f.names.map(_.length) :+ 4).max
    f.names.foreach { n =>
      val dt = f.schema(n).dataType.simpleString
      val vals = rows.map(r => fmt(r.getAs[Any](n), 3)).mkString(", ")
      sb.append(s"${n.padTo(nameW, ' ')} [${dt}] $vals\n")
    }
    sb.toString
  }
}
