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

  def printFrame(f: CrysFrame, title: String, maxRows: Int,
                 maxDigits: Int = 3): String = {
    val names = f.names
    val rows: Seq[Row] = f.out.take(maxRows + 1).toSeq
    val shown = rows.take(maxRows)
    val cells = shown.map(r => names.map(n => fmt(r.getAs[Any](n), maxDigits)))
    val widths = names.zipWithIndex.map { case (n, i) =>
      (n.length +: cells.map(_(i).length)).max
    }
    val sb = new StringBuilder
    sb.append(s"$title: ${if (rows.size > maxRows) "" else s"${shown.size} x ${names.size}"}\n")
    if (f.isGrouped) sb.append(s"Groups: ${f.groupedBy.mkString(", ")}\n")
    sb.append(names.zip(widths).map { case (n, w) => n.reverse.padTo(w, ' ').reverse }
      .mkString("   ", "   ", "\n"))
    cells.foreach { r =>
      sb.append(r.zip(widths).map { case (c, w) => c.reverse.padTo(w, ' ').reverse }
        .mkString("   ", "   ", "\n"))
    }
    if (rows.size > maxRows) sb.append(s"and more rows\n")
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
