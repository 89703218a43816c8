package graft

import graft.core.CrysFrame
import org.apache.spark.sql.functions._

/** Randomized chains over the public verb surface — the crash net for
  * API combinations no scenario test thinks to write (the r8 revOf
  * defect was exactly this shape: `sortByOrder(desc).takeLast` died at
  * codegen while every individual verb's own spec was green).
  *
  * Each seeded case applies 4–9 random applicable verbs to a small
  * frame, observes the result, and checks the structural contracts
  * every chain must keep:
  *   - `.out` materializes without throwing;
  *   - no internal helper column (`__`-prefixed or the ingest ordinal)
  *     leaks into the visible schema;
  *   - visible column names stay unique;
  *   - row-preserving verbs (sorts, renames, moves, column adds)
  *     keep the row count; reducers never increase it. */
class VerbChainFuzzSpec extends GraftSpec {

  import spark.implicits._

  private case class St(f: CrysFrame, numCols: Vector[String],
                        idCol: String, strCol: String, rows: Long)

  private def base(rnd: scala.util.Random): St = {
    val n = 40 + rnd.nextInt(140)
    val parts = 1 + rnd.nextInt(6)
    val df = (0 until n).map { i =>
      val v: java.lang.Long =
        if (rnd.nextInt(6) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(11) - 5)
      (i.toLong, v, s"g${i % (1 + rnd.nextInt(5))}")
    }.toDF("id", "v", "g").repartition(parts)
    St(CrysFrame(df), Vector("id", "v"), "id", "g", n.toLong)
  }

  /** One applicable random step; returns the next state. */
  private def step(st: St, rnd: scala.util.Random, fresh: () => String): St = {
    val numCol = st.numCols(rnd.nextInt(st.numCols.size))
    rnd.nextInt(13) match {
      case 0 => st.copy(f = st.f.sortBy(numCol))
      case 1 => st.copy(f = st.f.sortDescBy(numCol))
      case 2 => st.copy(f = st.f.sortByOrder(c => c(numCol).desc))
      case 3 => st.copy(f = st.f.sortByExpr(c => c(numCol) * -1))
      case 4 =>
        val nm = fresh()
        st.copy(f = st.f.addColumn(nm)(c => c(numCol) + 1),
          numCols = st.numCols :+ nm)
      case 5 =>
        // order-sensitive global verbs: the frame may have no explicit
        // ordering yet — give it one first (the user contract)
        val nm = fresh()
        val sorted = st.f.sortBy(st.idCol)
        val mk: graft.core.Ctx => org.apache.spark.sql.Column =
          rnd.nextInt(5) match {
            case 0 => _.cumsum(col(numCol))
            case 1 => _.lead(col(numCol), 1 + rnd.nextInt(3), -1L)
            case 2 => _.lag(col(numCol))
            case 3 => _.rowNumber
            case _ => _.rollingSum(col(numCol), 1 + rnd.nextInt(5))
          }
        st.copy(f = sorted.addColumn(nm)(mk), numCols = st.numCols :+ nm)
      case 6 =>
        val nm = fresh()
        st.copy(f = st.f.addColumn(nm)(c => c.rank(c(numCol).desc)),
          numCols = st.numCols :+ nm)
      case 7 =>
        val nm = fresh()
        st.copy(f = st.f.rename(numCol -> nm),
          numCols = st.numCols.map(c => if (c == numCol) nm else c),
          idCol = if (st.idCol == numCol) nm else st.idCol)
      case 8 => st.copy(f = st.f.moveLeft(st.strCol))
      case 9 =>
        val n = 1 + rnd.nextInt(20)
        val took = if (rnd.nextBoolean()) st.f.take(n) else st.f.takeLast(n)
        st.copy(f = took, rows = math.min(st.rows, n.toLong))
      case 10 =>
        val f2 = st.f.filter(c => c(numCol).isNotNull || c(st.strCol).isNotNull)
        st.copy(f = f2) // predicate is a tautology on this data: rows keep
      case 11 => st.copy(f = st.f.bindRows(st.f), rows = st.rows * 2)
      case 12 => st.copy(f = st.f.shuffle())
    }
  }

  private def runCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    var st = base(rnd)
    var n = 0
    val fresh = () => { n += 1; s"c$n" }
    val steps = 4 + rnd.nextInt(6)
    try {
      (0 until steps).foreach { _ => st = step(st, rnd, fresh) }
      val out = st.f.out
      val rows = out.count()
      val cols = out.columns.toSeq
      assert(cols.distinct == cols, s"duplicate visible columns: $cols")
      assert(!cols.exists(c => c.startsWith("__")),
        s"internal helper column leaked: $cols")
      assert(rows == st.rows, s"row count $rows, expected ${st.rows}")
      // a terminal grouped aggregation must also observe cleanly
      val agg = st.f.groupBy(st.strCol)
        .summarize("n" -> (_ => graft.core.Agg.n)).out.collect()
      assert(agg.map(_.getLong(1)).sum == st.rows)
    } catch {
      case e: org.scalatest.exceptions.TestFailedException => throw e
      case e: Throwable =>
        fail(s"seed=$seed steps=$steps: chain threw ${e.getClass.getSimpleName}: " +
          e.getMessage, e)
    }
  }

  test("random verb chains observe cleanly and keep structural contracts") {
    (1 to 30).foreach(s => runCase(1000 + s))
  }

  test("seed 1215: computed sort key survives rename + RDD-boundary verb") {
    // found by a 500-seed soak: rename → sortByExpr → rename → rank
    // left a stale composite sort key whose missing-attribute
    // resolution was severed by the global-window materialization's
    // zipWithIndex boundary; pinned here, minimal shape in
    // CoreVerbsSpec ("computed sort key survives rename...")
    runCase(1215)
  }
}
