package graft

import graft.core.{CrysFrame, sel}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style invariants over seeded random frames (SURVEY §5:
  * "add ScalaCheck properties — spread∘gather = id, join row-count
  * invariants, sort stability"). */
class InvariantsSpec extends GraftSpec {

  private def randomLong(rng: Random, people: Int, years: Int): CrysFrame = {
    // unique (person, year) pairs with random gaps → spread-safe
    val rows = for {
      p <- 0 until people; y <- 0 until years
      if rng.nextDouble() > 0.3
    } yield Seq(s"p$p", 2000 + y,
      if (rng.nextDouble() < 0.2) null else math.round(rng.nextDouble() * 1000) / 10.0)
    CrysFrame.of(spark, Seq("person", "year", "weight"), rows)
  }

  test("spread then gather round-trips the non-null cells (20 seeds)") {
    for (seed <- 1 to 20) {
      val rng = new Random(seed)
      val long = randomLong(rng, rng.nextInt(4) + 2, rng.nextInt(3) + 2)
      if (long.numRow > 0) {
        val years = long.out.select(col("year").cast("string"))
          .distinct().collect().map(_.getString(0)).sorted
        val back = long.spread("year", "weight")
          .gather("year", "weight", sel.listOf(years.toIndexedSeq: _*), convert = true)
          .filter(c => c.isNotNa(c("weight")))
        val origNonNull = long.filter(c => c.isNotNa(c("weight")))
        val a = back.out.select("person", "year", "weight").collect()
          .map(_.toSeq).sortBy(_.toString)
        val b = origNonNull.out.select("person", "year", "weight").collect()
          .map(_.toSeq).sortBy(_.toString)
        assert(a.toSeq == b.toSeq, s"seed=$seed")
      }
    }
  }

  test("join row-count invariants (10 seeds)") {
    for (seed <- 1 to 10) {
      val rng = new Random(seed * 7)
      val keys = (0 until rng.nextInt(8) + 2).map(i => s"k$i")
      val l = CrysFrame.of(spark, Seq("k", "lv"),
        (0 until 20).map(i => Seq(keys(rng.nextInt(keys.size)), i)))
      val rKeys = keys.filter(_ => rng.nextBoolean())
      val r = CrysFrame.of(spark, Seq("k", "rv"),
        rKeys.zipWithIndex.map { case (k, i) => Seq(k, i * 1.0) }) // unique right keys
      val nLeft = l.numRow
      val inner = l.innerJoin(r, by = Seq("k")).numRow
      val left = l.leftJoin(r, by = Seq("k")).numRow
      val semi = l.semiJoin(r, by = Seq("k")).numRow
      val anti = l.antiJoin(r, by = Seq("k")).numRow
      assert(left == nLeft, s"seed=$seed: left join must keep all left rows (unique right keys)")
      assert(semi + anti == nLeft, s"seed=$seed: semi + anti partition the left side")
      assert(inner == semi, s"seed=$seed: inner == semi when right keys unique")
    }
  }

  test("sortBy is total and stable under permutation (10 seeds)") {
    for (seed <- 1 to 10) {
      val rng = new Random(seed * 13)
      val rows = (0 until 30).map(i =>
        Seq(rng.nextInt(5), if (rng.nextDouble() < 0.2) null else rng.nextInt(100), i))
      val f = CrysFrame.of(spark, Seq("a", "b", "i"), rows)
      val sorted = f.sortBy("a", "b", "i").out.collect().map(_.toSeq).toSeq
      val resorted = f.shuffle(seed).sortBy("a", "b", "i").out.collect().map(_.toSeq).toSeq
      assert(sorted == resorted, s"seed=$seed: total order must be permutation-invariant")
      // NAs last within each a-partition
      val bs = sorted.map(r => (r(0).asInstanceOf[Int], r(1)))
      bs.groupBy(_._1).values.foreach { grp =>
        val vals = grp.map(_._2)
        val firstNull = vals.indexWhere(_ == null)
        if (firstNull >= 0)
          assert(vals.drop(firstNull).forall(_ == null), s"seed=$seed: NAs must sort last")
      }
    }
  }

  test("bindRows preserves total row count and unions names (10 seeds)") {
    for (seed <- 1 to 10) {
      val rng = new Random(seed * 31)
      val a = CrysFrame.of(spark, Seq("x", "y"),
        (0 until rng.nextInt(10) + 1).map(i => Seq(i, s"s$i")))
      val b = CrysFrame.of(spark, Seq("y", "z"),
        (0 until rng.nextInt(10) + 1).map(i => Seq(s"t$i", i * 2.5)))
      val u = a.bindRows(b)
      assert(u.numRow == a.numRow + b.numRow)
      assert(u.names.toSet == Set("x", "y", "z"))
    }
  }

  test("grouped verbs equal per-group application (8 seeds)") {
    // the reference's core grouped contract (src/crysda/groupdf.cr):
    // a verb on a grouped frame is the verb applied to each group's
    // sub-frame independently — pinned here over random frames with
    // NA group keys and NA values, for both the reduction verbs and
    // the window verbs (whose grouped/global implementations differ)
    for (seed <- 1 to 8) {
      val rng = new Random(seed * 17)
      val rows = (0 until 40).map { i =>
        Seq(if (rng.nextDouble() < 0.15) null else s"g${rng.nextInt(4)}",
          if (rng.nextDouble() < 0.2) null else rng.nextInt(50), i)
      }
      val f = CrysFrame.of(spark, Seq("g", "v", "i"), rows).withRowOrder
      val keys = f.out.select("g").distinct().collect()
        .map(r => Option(r.getString(0))).toSeq
      def perGroup(verb: CrysFrame => CrysFrame): Seq[Seq[Any]] =
        keys.flatMap { k =>
          val sub = f.filter(c =>
            k.map(s => c("g") === s).getOrElse(c("g").isNull))
          verb(sub).out.collect().map(_.toSeq).toSeq
        }
      def grouped(verb: CrysFrame => CrysFrame): Seq[Seq[Any]] =
        verb(f.groupBy("g")).out.collect().map(_.toSeq).toSeq
      val verbs: Seq[(String, CrysFrame => CrysFrame)] = Seq(
        "take2" -> (_.take(2)),
        "takeLast3" -> (_.takeLast(3)),
        "slice2to4" -> (_.slice(2 to 4)),
        "cumsum" -> (_.sortBy("i").addColumn("cs")(c => c.cumsum(c("v")))),
        "lead" -> (_.sortBy("i").addColumn("ld")(c => c.lead(col("v")))),
        "rowNumber" -> (_.sortBy("i").addColumn("rn")(_.rowNumber)),
        "rank" -> (_.sortBy("i").addColumn("rk")(c => c.rank(c("v").desc))))
      verbs.foreach { case (nm, vb) =>
        val a = grouped(vb).sortBy(_.toString())
        val b = perGroup(vb).sortBy(_.toString())
        assert(a == b, s"seed=$seed verb=$nm")
      }
      // distinct is NOT per-group in the reference: it dedups globally
      // (grouped group_by ungroups first — groupdf.cr:85-87) and
      // returns an ungrouped frame
      val gd = f.groupBy("g").distinct("v")
      assert(!gd.isGrouped, "distinct must ungroup like the reference")
      assert(gd.out.collect().map(_.toSeq).toSeq.sortBy(_.toString()) ==
        f.distinct("v").out.collect().map(_.toSeq).toSeq.sortBy(_.toString()),
        s"seed=$seed: grouped distinct must equal global distinct")
    }
  }

  test("groups() partitions the frame exactly") {
    val f = CrysFrame.of(spark, Seq("g", "v"),
      Seq(Seq("a", 1), Seq("b", 2), Seq("a", 3), Seq(null, 4))).groupBy("g")
    val gs = f.groups
    assert(gs.size == 3)
    assert(gs.map(_._2.numRow).sum == 4)
  }
}
