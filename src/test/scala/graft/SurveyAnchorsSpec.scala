package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §8's implementation anchors, enforced — the same
  * drift-protection PersistInventorySpec gives SCALING.md's persist
  * inventory (VERDICT r10 next-round #7: §8's 126 rows rotted a little
  * each round, e.g. r9 line anchors moving under r10 edits; r11 found
  * `core/Binds` citing a file that was folded into Joins.scala long
  * ago). Every backticked `File.symbol` reference in a §8 table row's
  * implementation column must resolve: the file exists under
  * src/main/scala (by basename) and each named symbol appears in it as
  * a word. Conventions handled: `a/b` alternatives, `addColumn(s)`
  * optional plurals, `rollingSum/Mean` shared-prefix shorthand, and
  * names without a file of their own (inner classes, spec names,
  * Spark classes) fall back to a whole-tree word search. A moved or
  * renamed operator fails this spec until SURVEY.md is updated —
  * citations stay a contract, not a snapshot. */
class SurveyAnchorsSpec extends AnyFunSuite {

  private def slurp(f: java.io.File): String = {
    val s = scala.io.Source.fromFile(f, "UTF-8")
    try s.mkString finally s.close()
  }

  private def scalaFiles(root: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    walk(new java.io.File(root))
  }

  test("every SURVEY §8 implementation anchor resolves to a live symbol") {
    val lines = slurp(new java.io.File("SURVEY.md")).linesIterator.toSeq
    var in8 = false
    val rows = lines.filter { l =>
      if (l.startsWith("### 8.1")) in8 = true
      else if (in8 && l.startsWith("## ")) in8 = false
      in8 && l.startsWith("|") && !l.startsWith("|---") &&
        !l.contains("implementation")
    }
    assert(rows.size > 100, s"§8 table parse broke: only ${rows.size} rows found")

    val mainFiles = scalaFiles("src/main/scala")
    val byName: Map[String, Seq[java.io.File]] =
      mainFiles.groupBy(f => f.getName.stripSuffix(".scala"))
    lazy val allSrc =
      (mainFiles ++ scalaFiles("src/test/scala")).map(slurp).mkString(" ")

    val tokRe = java.util.regex.Pattern.compile("`([^`]+)`")
    val refRe = ("^(?:[a-z]+/)?([A-Z][A-Za-z0-9]+)" +
      "((?:\\.[A-Za-z0-9_()/+]+)*)$").r
    val identRe = "^[A-Za-z_][A-Za-z0-9_]*$".r
    val prefixRe = "^([a-z][A-Za-z0-9]*?)([A-Z][a-z0-9]+)$".r
    def word(s: String, content: String): Boolean =
      java.util.regex.Pattern.compile("\\b" + java.util.regex.Pattern.quote(s) + "\\b")
        .matcher(content).find()

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var refsChecked = 0
    rows.foreach { row =>
      // cells containing escaped pipes (`k-means\|\|`) must not split —
      // a plain split('|') would truncate the implementation column
      // there and silently skip every anchor after the escape
      val cols = row.split("(?<!\\\\)\\|")
      if (cols.length >= 3) {
        val m = tokRe.matcher(cols(2))
        while (m.find()) {
          m.group(1).trim match {
            case refRe(fname, syms) =>
              refsChecked += 1
              val content = byName.get(fname) match {
                case Some(fs) => fs.map(slurp).mkString(" ")
                case None =>
                  if (!word(fname, allSrc))
                    failures += s"`${m.group(1)}`: no file $fname.scala and the name appears nowhere in the tree"
                  allSrc // inner class / spec / Spark class: symbols checked tree-wide
              }
              Option(syms).getOrElse("").split('.').drop(1).foreach { sympart =>
                val alts = sympart.split('/')
                // `(s)` is an optional plural; any OTHER parenthesized
                // tail is a prose qualifier (`join(byPairs)`) — truncate
                def clean(raw: String): String =
                  raw.replace("(s)", "").takeWhile(_ != '(')
                    .replaceAll("[()+]", "")
                val first = clean(alts.headOption.getOrElse(""))
                val prefix = first match {
                  case prefixRe(p, _) => p
                  case _ => ""
                }
                alts.foreach { raw =>
                  val s = clean(raw)
                  if (s.nonEmpty && identRe.findFirstIn(s).isDefined) {
                    val ok = word(s, content) ||
                      (prefix.nonEmpty && s.head.isUpper && word(prefix + s, content))
                    if (!ok)
                      failures += s"`${m.group(1)}`: symbol '$s' not found in $fname"
                  }
                }
              }
            case _ => // prose in backticks, query names, etc. — not an anchor
          }
        }
      }
    }
    assert(refsChecked > 100, s"anchor extraction broke: only $refsChecked refs")
    assert(failures.isEmpty,
      s"\n${failures.size} SURVEY §8 anchors rotted — update SURVEY.md " +
        s"(or the code comment naming the symbol):\n  " +
        failures.mkString("\n  "))
  }
}
