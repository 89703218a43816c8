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
    // variant ("AnyCol") cells print their raw repr, like the reference
    // prints the underlying Any value
    case r: Row if r.schema != null && Variant.isVariantType(r.schema) =>
      fmt(Variant.decode(r), maxDigits)
    case other    => other.toString
  }

  /** Console render mirroring the reference's algorithm statement by
    * statement (reference: src/crysda/dataframe.cr:604-664; goldens
    * spec/core_spec.cr:460-493): `"{title}: {n} x {m}"` title, optional
    * `Groups: keys [n]` line, a leading row-number column (only when
    * rows exist), right-aligned cells padded to `max(cellW, headerW)+3`
    * (first column unspaced), empty columns defaulting to width 20, a
    * width-limited column subset via prefix sums `< maxWidth`, and the
    * `and N more rows, and K more variables: …` footer.
    *
    * The reference's footer indexes the hidden names by a count that
    * includes the row-number column, so it LISTS one fewer name than it
    * counts whenever row numbers are shown — reproduced here for
    * byte-parity (noted as a reference bug in SURVEY.md §2.1).
    *
    * Two actions: a `take(maxRows+1)`, plus a count() only when the
    * frame overflows maxRows (and a distinct-count for the Groups line). */
  def printFrame(f: CrysFrame, title: String, maxRows: Int,
                 maxDigits: Int = 3, maxWidth: Int = 100,
                 rowNumbers: Boolean = true): String = {
    val names = f.names
    val maxRowsOrInf = if (maxRows < 0) Int.MaxValue else maxRows
    val rows: Seq[Row] = f.out.take(
      if (maxRowsOrInf == Int.MaxValue) Int.MaxValue else maxRowsOrInf + 1).toSeq
    val total: Long = if (rows.size > maxRowsOrInf) f.out.count() else rows.size.toLong
    val shown = rows.take(maxRowsOrInf)
    val useRn = rowNumbers && shown.nonEmpty
    // print_data: optional " " row-number column ++ data columns
    val headers: Seq[String] = (if (useRn) Seq(" ") else Nil) ++ names
    val cells: Seq[Seq[String]] = shown.zipWithIndex.map { case (r, i) =>
      (if (useRn) Seq((i + 1).toString) else Nil) ++
        names.map(n => fmt(r.getAs[Any](n), maxDigits))
    }
    // reference: col width defaults to 20 when a column has no values
    val padding0 = headers.indices.map { i =>
      val cellW = if (cells.isEmpty) 20 else cells.map(_(i).length).max
      math.max(cellW, headers(i).length) + 3
    }
    val padding =
      if (padding0.nonEmpty) padding0.updated(0, padding0.head - 3) else padding0
    // number of printed columns: prefix sums strictly below maxWidth
    val numPrintCols =
      padding.scanLeft(0)(_ + _).zipWithIndex.takeWhile(_._1 < maxWidth).last._2
    def pad(s: String, w: Int) = s.reverse.padTo(w, ' ').reverse
    val sb = new StringBuilder
    sb.append(s"$title: $total x ${names.size}\n")
    if (f.isGrouped) {
      val nGroups = f.df.select(f.groupedBy.map(graft.core.qcol): _*).distinct().count()
      sb.append(s"Groups: ${f.groupedBy.mkString(", ")} [$nGroups]\n")
    }
    sb.append(headers.take(numPrintCols).zipWithIndex
      .map { case (h, i) => pad(h, padding(i)) }.mkString + "\n")
    cells.foreach { row =>
      sb.append(row.take(numPrintCols).zipWithIndex
        .map { case (c, i) => pad(c, padding(i)) }.mkString + "\n")
    }
    val and = scala.collection.mutable.ArrayBuffer.empty[String]
    if (total > maxRowsOrInf) and += s"and ${total - maxRowsOrInf} more rows"
    val moreVarsCount = headers.size - numPrintCols
    if (moreVarsCount > 0)
      // reference bug reproduced: names indexed by a column count that
      // includes the row-number column, listing one fewer than counted
      and += s"$moreVarsCount more variables: ${names.drop(numPrintCols).mkString(", ")}"
    sb.append(wrap(and.mkString(", and "), maxWidth))
    sb.toString.replaceAll("\\s+$", "") + "\n"
  }

  /** Greedy word-wrap for the footer (the reference wraps it to
    * maxWidth); a no-op for footers already within the width. */
  private def wrap(s: String, width: Int): String =
    if (s.length < width) s
    else s.split(" ").foldLeft(Seq("")) { (acc, w) =>
      if (acc.last.isEmpty) acc.init :+ w
      else if (acc.last.length + 1 + w.length < width) acc.init :+ (acc.last + " " + w)
      else acc :+ w
    }.mkString("\n")

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
