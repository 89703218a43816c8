package graft

import graft.core.{sel, CrysFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SC}

/** ScalaCheck property suite (SURVEY §5): algebraic invariants the
  * verbs must hold on arbitrary small frames — the complement of the
  * example-based reference-port specs. Each property runs real Spark
  * jobs, so the per-property case count is kept small. */
class PropertiesSpec extends GraftSpec {

  private def check(name: String, cases: Int = 6)(p: Prop): Unit = {
    val res = SC.check(
      SC.Parameters.default.withMinSuccessfulTests(cases).withWorkers(1), p)
    assert(res.passed, s"$name: $res")
  }

  private val genRows: Gen[List[(Int, Int, String)]] = for {
    n <- Gen.choose(1, 10)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0, 99)
      v <- Gen.choose(-5, 5)
      s <- Gen.oneOf("a", "b", "c")
    } yield (id, v, s))
  } yield rows

  private def frame(rows: List[(Int, Int, String)]): CrysFrame =
    CrysFrame.of(spark, Seq("id", "v", "s"),
      rows.map(r => Seq(r._1, r._2, r._3)))

  test("property: spread∘gather is the identity on wide frames") {
    check("spread.gather") {
      Prop.forAll(genRows) { rows0 =>
        // unique ids — pivot keys must be unique per row
        val rows = rows0.zipWithIndex.map { case ((_, v, s), i) => (i, v, s) }
        val wide = frame(rows)
        val back = wide
          .gather("key", "value", sel.listOf("v"))
          .spread("key", "value")
        val a = wide.out.select(col("id"), col("v").cast("double"), col("s"))
          .collect().map(_.toSeq).toSet
        val b = back.out.select(col("id"), col("v"), col("s"))
          .collect().map(_.toSeq).toSet
        a == b
      }
    }
  }

  test("property: sortBy is stable — ties keep ingest order") {
    check("sort.stable") {
      Prop.forAll(genRows) { rows =>
        val sorted = frame(rows).withRowOrder.sortBy("s").out
          .collect().map(r => (r.getString(2), r.getInt(0), r.getInt(1))).toList
        // within each tie-group the (id, v) pairs appear in ingest order
        val expected = rows.zipWithIndex
          .sortBy { case ((_, _, s), i) => (s, i) }
          .map { case ((id, v, s), _) => (s, id, v) }
        sorted == expected
      }
    }
  }

  test("property: semi and anti joins partition the left side") {
    check("semi.anti.partition") {
      Prop.forAll(genRows, genRows) { (l, r) =>
        val lf = frame(l)
        val rf = frame(r).select("s")
        val semi = lf.semiJoin(rf, by = Seq("s")).numRow
        val anti = lf.antiJoin(rf, by = Seq("s")).numRow
        semi + anti == lf.numRow
      }
    }
  }

  test("property: left join with a key-unique right preserves left cardinality") {
    check("left.join.card") {
      Prop.forAll(genRows, genRows) { (l, r) =>
        val lf = frame(l)
        val rf = frame(r).distinct("s").select("s").addColumn("tag")(c => c.const(1))
        lf.leftJoin(rf, by = Seq("s")).numRow == lf.numRow
      }
    }
  }

  test("property: bindRows cardinality is additive, names are the union") {
    check("bindRows.additive") {
      Prop.forAll(genRows, genRows) { (a, b) =>
        val fa = frame(a)
        val fb = frame(b).rename("v" -> "w")
        val bound = fa.bindRows(fb)
        bound.numRow == fa.numRow + fb.numRow &&
          bound.names.toSet == Set("id", "v", "s", "w")
      }
    }
  }

  test("property: distinct is idempotent and a subset; take bounds cardinality") {
    check("distinct.take") {
      Prop.forAll(genRows) { rows =>
        val f = frame(rows)
        val d1 = f.distinct("s")
        val within = d1.numRow == d1.distinct("s").numRow && d1.numRow <= f.numRow
        val n = 3
        within && f.withRowOrder.take(n).numRow == math.min(n.toLong, f.numRow)
      }
    }
  }
}
