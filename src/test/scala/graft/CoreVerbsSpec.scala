package graft

import graft.core.{Agg, CrysFrame, SelectException, sel}
import org.apache.spark.sql.functions._

/** Core verb semantics, mirroring the reference's behavioral specs
  * (reference: spec/core_spec.cr). */
class CoreVerbsSpec extends GraftSpec {

  private def persons: CrysFrame = CrysFrame.of(spark,
    Seq("first_name", "last_name", "age"),
    Seq(Seq("max", "smith", 53), Seq("tom", "doe", 30), Seq("eva", "miller", 23)))

  // --- selection DSL (reference: spec/core_spec.cr select tests) ---

  test("select keeps argument order") {
    assert(persons.select("age", "first_name").names == Seq("age", "first_name"))
  }

  test("select errors on unknown and duplicate columns") {
    intercept[SelectException](persons.select("nope"))
    intercept[SelectException](persons.select("age", "age"))
  }

  test("selector DSL: startsWith / endsWith / range / listOf") {
    assert(persons.select(sel.endsWith("name")).names == Seq("first_name", "last_name"))
    assert(persons.select(sel.range("first_name", "last_name")).names ==
      Seq("first_name", "last_name"))
    assert(persons.select(sel.listOf("age")).names == Seq("age"))
  }

  test("negative selection and mixing rejection") {
    assert(persons.select(sel.except("age")).names == Seq("first_name", "last_name"))
    intercept[SelectException](
      persons.select(sel.listOf("age").or(sel.except("first_name"))).names)
  }

  test("reject by type selector") {
    assert(persons.reject(sel.ints).names == Seq("first_name", "last_name"))
  }

  // --- rename / move (reference: dataframe.cr:370-398,323-332) ---

  test("rename preserves positions, ignores dummy renames") {
    val r = persons.rename("first_name" -> "fn", "age" -> "age")
    assert(r.names == Seq("fn", "last_name", "age"))
  }

  test("moveLeft / moveRight") {
    assert(persons.moveLeft("age").names == Seq("age", "first_name", "last_name"))
    assert(persons.moveRight("first_name").names ==
      Seq("last_name", "age", "first_name"))
  }

  // --- mutate (reference: spec/core_spec.cr add_column) ---

  test("addColumn scalar broadcast and replace-in-place") {
    val f = persons.addColumn("age")(_ => lit(99)).addColumn("k")(c => c.const("x"))
    assert(f.names == Seq("first_name", "last_name", "age", "k"))
    assert(f.out.select("age").collect().forall(_.getInt(0) == 99))
  }

  test("where vectorized conditional") {
    val f = persons.addColumn("senior")(c =>
      c.where(c("age") > 30, c.const("yes"), c.const("no")))
    assert(f.out.orderBy("age").select("senior").collect().map(_.getString(0)).toSeq ==
      Seq("no", "no", "yes"))
  }

  // --- filter (reference: spec/core_spec.cr filter; null → dropped) ---

  test("filter with null comparisons drops null rows") {
    val f = CrysFrame.of(spark, Seq("user_id", "name"),
      Seq(Seq(6, "maja"), Seq(3, "anna"), Seq(null, "max"), Seq(5, null)))
    assert(f.filter(_ => col("user_id") > 4).numRow == 2)
  }

  test("matching is NA-aware (null text matches nothing)") {
    val f = CrysFrame.of(spark, Seq("txt"), Seq(Seq("abc"), Seq(null), Seq("xbc")))
    assert(f.filter(c => c.matching(c("txt"), "^a")).numRow == 1)
  }

  // --- sorting (reference: spec/core_spec.cr:264-301 — NAs always last) ---

  test("sortBy ascending with NAs last") {
    val f = CrysFrame.of(spark, Seq("user_id", "name"),
      Seq(Seq(6, "maja"), Seq(3, "anna"), Seq(null, "max"), Seq(5, null)))
    val ids = f.sortBy("user_id").out.select("user_id").collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
    assert(ids == Seq(3, 5, 6, null))
  }

  test("sortDescBy still has NAs last") {
    val f = CrysFrame.of(spark, Seq("user_id"),
      Seq(Seq(6), Seq(3), Seq(null.asInstanceOf[Any]), Seq(5)))
    val ids = f.sortDescBy("user_id").out.collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
    assert(ids == Seq(6, 5, 3, null))
  }

  // --- slicing / sampling ---

  test("slice / take / takeLast per sort order") {
    val f = persons.sortBy("age")
    assert(f.slice(1, 3).out.select("age").collect().map(_.getInt(0)).toSeq.sorted ==
      Seq(23, 53))
    assert(f.take(2).out.select("age").collect().map(_.getInt(0)).toSeq.sorted ==
      Seq(23, 30))
    assert(f.takeLast(1).out.select("age").collect().map(_.getInt(0)).toSeq ==
      Seq(53))
  }

  test("sampleN bounds and exactness") {
    assert(persons.sampleN(2).numRow == 2)
  }

  test("sampleN with replacement can oversample") {
    val s = persons.sampleN(5, replace = true)
    assert(s.numRow == 5)
    assert(s.names == persons.names)
  }

  test("distinct keeps first full row per key") {
    val f = CrysFrame.of(spark, Seq("k", "v"),
      Seq(Seq("a", 1), Seq("a", 2), Seq("b", 3)))
    assert(f.distinct("k").numRow == 2)
    assert(f.distinct("k").names == Seq("k", "v"))
  }

  // --- grouping & summarize (reference: spec/core_spec.cr summarize) ---

  test("grouped summarize with key tuple") {
    val f = persons.addColumn("g")(c => c.where(c("age") > 25, lit("o"), lit("y")))
      .groupBy("g")
      .summarize("mean_age" -> (_ => avg(col("age"))), "n" -> (_ => Agg.n))
    val rows = f.sortBy("g").out.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("o", "y"))
    assert(rows.map(_.getLong(2)).toSeq == Seq(2L, 1L))
  }

  test("NA is a valid group (reference: spec/core_spec.cr:497-502)") {
    val f = CrysFrame.of(spark, Seq("k", "v"),
      Seq(Seq("a", 1), Seq(null, 2), Seq(null, 3)))
    assert(f.groupBy("k").summarize("n" -> (_ => Agg.n)).numRow == 2)
  }

  test("strict remove_na=false raises on NA (reference: utils.cr:138-148)") {
    val f = CrysFrame.of(spark, Seq("v"), Seq(Seq(1.0), Seq(null.asInstanceOf[Any])))
    val bad = f.summarize("m" -> (_ => Agg.mean(col("v"))))
    val e = intercept[Exception](bad.out.collect())
    assert(e.getMessage.contains("MissingValueException")
      || e.getCause != null && e.getCause.getMessage.contains("MissingValueException"))
    // removeNa=true skips
    val ok = f.summarize("m" -> (_ => Agg.mean(col("v"), removeNa = true)))
    assert(ok.out.collect()(0).getDouble(0) == 1.0)
  }

  test("percentile: exact interpolation at arbitrary p, strict-NA, approx in-band") {
    val f = CrysFrame.of(spark, Seq("v"),
      (1 to 10).map(i => Seq(i.toDouble * 10)))
    // rank p*(n-1): p=0.25 on 10..100 → index 2.25 → 30 + 0.25*10 = 32.5
    val got = f.summarize(
      "p25" -> (_ => Agg.percentile(col("v"), 0.25)),
      "p50" -> (_ => Agg.percentile(col("v"), 0.5)),
      "p100" -> (_ => Agg.percentile(col("v"), 1.0))).out.collect()(0)
    assert(got.getDouble(0) == 32.5 && got.getDouble(1) == 55.0 &&
      got.getDouble(2) == 100.0)
    // p50 ≡ median (the generalization contract)
    assert(f.summarize("m" -> (_ => Agg.medianExact(col("v"))))
      .out.collect()(0).getDouble(0) == 55.0)
    // strict-NA raise mirrors the other aggregates
    val withNa = CrysFrame.of(spark, Seq("v"), Seq(Seq(1.0), Seq(null.asInstanceOf[Any])))
    val e = intercept[Exception](
      withNa.summarize("p" -> (_ => Agg.percentile(col("v"), 0.5))).out.collect())
    assert(e.getMessage.contains("MissingValueException")
      || e.getCause != null && e.getCause.getMessage.contains("MissingValueException"))
    assert(withNa.summarize(
      "p" -> (_ => Agg.percentile(col("v"), 0.5, removeNa = true)))
      .out.collect()(0).getDouble(0) == 1.0)
    // approx stays within the sketch's rank guarantee on this tiny set
    val ap = f.summarize(
      "p" -> (_ => Agg.percentileApprox(col("v"), 0.25))).out.collect()(0).getDouble(0)
    assert(ap >= 20.0 && ap <= 40.0, s"approx p25=$ap")
    intercept[IllegalArgumentException](Agg.percentile(col("v"), 1.5))
  }

  test("count cross-tabulation and bare count") {
    val f = persons.count()
    assert(f.out.collect()(0).getLong(0) == 3L)
    val byName = persons.count("last_name")
    assert(byName.numRow == 3)
    assert(byName.names == Seq("last_name", "n"))
  }

  test("groupByExpr adds group_by_k columns") {
    val f = persons.groupByExpr(c => c("age") > 25).count()
    assert(f.names == Seq("group_by_1", "n"))
    assert(f.numRow == 2)
  }

  test("summarizeAt applies functions over selection with col.suffix names") {
    val f = persons.summarizeAt(sel.listOf("age"),
      "mean" -> (c => avg(c)), "n" -> (_ => Agg.n))
    assert(f.names == Seq("age.mean", "age.n"))
  }

  test("groupedKeys returns distinct key tuples") {
    val f = persons.addColumn("g")(c => c.where(c("age") > 25, lit("o"), lit("y")))
      .groupBy("g").groupedKeys
    assert(f.numRow == 2)
  }

  // --- addRow / rowNumber ---

  test("addRow appends literal row with arity check") {
    val f = persons.addRow("zoe", "doe", 99)
    assert(f.numRow == 4)
    intercept[IllegalArgumentException](persons.addRow("just-one"))
  }

  test("addRowNumber is 1-based and leading") {
    val f = persons.sortBy("age").addRowNumber("rn")
    assert(f.names.head == "rn")
    assert(f.out.orderBy("rn").select("age").collect().map(_.getInt(0)).toSeq ==
      Seq(23, 30, 53))
  }

  // --- ordering survives projection / rename (structured Ord metadata;
  //     Column.toString parsing misread dotted + computed keys) ---

  private def dotted: CrysFrame = CrysFrame.of(spark,
    Seq("Sepal.Length", "species"),
    Seq(Seq(5.1, "setosa"), Seq(7.0, "versicolor"), Seq(4.4, "virginica")))

  test("sortBy(dotted name) ordering survives select") {
    val f = dotted.sortBy("Sepal.Length").select("species")
    assert(f.out.collect().map(_.getString(0)).toSeq ==
      Seq("virginica", "setosa", "versicolor"))
  }

  test("rename of a dotted ordering column remaps the sort") {
    val f = dotted.sortDescBy("Sepal.Length").rename("Sepal.Length" -> "len")
    assert(f.out.collect().map(_.getString(1)).toSeq ==
      Seq("versicolor", "setosa", "virginica"))
    // the renamed key also drives takeLast (reverse direction)
    assert(f.takeLast(1).out.collect().map(_.getString(1)).toSeq == Seq("virginica"))
  }

  test("sortByExpr ordering survives select of its source columns") {
    val f = persons.sortByExpr(c => c("age") * -1).select("age", "first_name")
    assert(f.out.collect().map(_.getInt(0)).toSeq == Seq(53, 30, 23))
    // the key is materialized at sort time, so even dropping its source
    // column keeps the ordering (the reference sorted physically — a
    // projection never loses row order) with no stale reference to fail
    val g = f.select("first_name")
    assert(g.out.columns.toSeq == Seq("first_name"))
    assert(g.out.collect().map(_.getString(0)).toSeq ==
      Seq("max", "tom", "eva"))
  }

  test("rename remaps a computed sort key's references") {
    val f = persons.sortByExpr(c => c("age") * -1).rename("age" -> "years")
    assert(f.out.collect().map(_.getAs[Int]("years")).toSeq == Seq(53, 30, 23))
  }

  test("computed sort key survives rename then an RDD-boundary verb") {
    // regression (fuzzer seed 1215): a composite key carried as a live
    // expression only resolved post-rename through Spark's
    // missing-attribute chase, which the first RDD boundary downstream
    // (here rank's global-window zipWithIndex materialization) severed
    // — AnalysisException at `out`, far from the sort. Computed keys
    // are now materialized as hidden columns at sort time, so the
    // ordering rides through any lineage and keeps SNAPSHOT semantics.
    val f = persons.sortByExpr(c => c("age") * -1)
      .rename("age" -> "years")
      .addColumn("r")(c => c.rank(c("years").desc))
    assert(f.out.collect().map(_.getAs[Int]("years")).toSeq == Seq(53, 30, 23))
    // snapshot semantics: a later column shadowing the ORIGINAL key
    // name must not be captured by the sort key
    val g = persons.sortByExpr(c => c("age") * -1)
      .rename("age" -> "years")
      .addColumn("age")(_ => lit(0))
    assert(g.out.collect().map(_.getAs[Int]("years")).toSeq == Seq(53, 30, 23))
  }

  test("sortByOrder with a direction-carrying key reverses cleanly (takeLast)") {
    // regression: reversing a desc key used to nest SortOrders (the
    // match on the converted expression never fired on Spark 4) and
    // die at codegen with an INTERNAL_ERROR
    val f = persons.sortByOrder(c => c("age").desc)
    assert(f.out.collect().map(_.getAs[Int]("age")).toSeq == Seq(53, 30, 23))
    assert(f.takeLast(1).out.collect().map(_.getAs[Int]("age")).toSeq == Seq(23))
    val g = persons.sortByOrder(c => c("age").asc_nulls_last)
    assert(g.takeLast(1).out.collect().map(_.getAs[Int]("age")).toSeq == Seq(53))
  }

  test("take on an ordering-less frame is a stable value (seed 2100)") {
    // regression: bare `limit(n)` reads its single-partition shuffle in
    // block-fetch order, so each evaluation of the SAME lazy plan could
    // return a different subset — a self semi-join over take lost rows.
    // take now captures the ingest ordinal first, like takeLast/slice.
    import spark.implicits._
    val f = CrysFrame(
      (0 until 124).map(i => (i.toLong, s"g${i % 5}")).toDF("id", "g")
        .repartition(3))
    val t = f.take(11)
    val ids1 = t.out.collect().map(_.getLong(0)).toSet
    val ids2 = t.out.collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "take must return the same rows on re-evaluation")
    assert(t.semiJoin(t, by = Seq("g")).numRow == 11)
    assert(t.bindRows(t).numRow == 22)
  }

  test("takeLast and slice preserve ingest order in the output") {
    // the reduction machinery sorts physically (reversed keys / window);
    // an ingest-ordered frame must still observe rows in original order
    val f = CrysFrame.of(spark, Seq("v"),
      Seq(Seq(10), Seq(20), Seq(30), Seq(40), Seq(50))).withRowOrder
    assert(f.takeLast(2).out.collect().map(_.getInt(0)).toSeq == Seq(40, 50))
    assert(f.slice(2, 4).out.collect().map(_.getInt(0)).toSeq == Seq(20, 40))
    val g = CrysFrame.of(spark, Seq("g", "v"),
      Seq(Seq("a", 1), Seq("b", 2), Seq("a", 3), Seq("b", 4), Seq("a", 5)))
      .withRowOrder.groupBy("g")
    assert(g.takeLast(1).out.collect().map(_.getInt(1)).toSeq == Seq(4, 5))
  }

  test("sampling: exact per-group fraction, oversample error contract") {
    // reference: dataframe.cr:414-429, spec/core_spec.cr:320-326
    val f = CrysFrame.of(spark, Seq("g", "v"),
      (1 to 13).map(i => Seq(if (i <= 8) "a" else "b", i)))
    val grouped = f.groupBy("g")
    // exact per-group counts: bround(0.5*8)=4, bround(0.5*5)=2 — the
    // reference's Crystal round is ties-to-even, so 2.5 rounds to 2
    val counts = grouped.sampleFrac(0.5).ungroup.count("g")
      .out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 4L, "b" -> 2L))
    intercept[graft.core.CrysdaException](f.sampleN(-1))
    intercept[graft.core.CrysdaException](f.sampleN(14)) // ungrouped: eager
    // grouped: the guard rides in the query, raising at action time
    val ex = intercept[Exception](grouped.sampleN(6).out.collect())
    assert(ex.getMessage.contains("over-sample"))
    intercept[Exception](f.sampleFrac(3.0).out.collect())
    // reference spec core_spec.cr:199: frac > 1 WITH replacement doubles
    assert(f.sampleFrac(2.0, replace = true).numRow == 26)
    assert(f.sampleN(14, replace = true).numRow == 14)
    assert(f.sampleN(0).numRow == 0)
    assert(f.sampleN(0, replace = true).numRow == 0)
    // empty grouped frame: no rows, no error (transform over zero groups)
    assert(grouped.filter(_ => lit(false)).sampleN(3).out.count() == 0)
  }

  test("chained sorts are stable: later ties keep the earlier sort order") {
    // reference stable sort: re-sorting physically ordered rows keeps
    // prior order on ties (simpledf.cr:149-165)
    val f = CrysFrame.of(spark, Seq("a", "b"),
      Seq(Seq(2, 1), Seq(1, 1), Seq(3, 0), Seq(0, 1)))
      .withRowOrder
    val rows = f.sortBy("a").sortBy("b").out.collect().map(_.getInt(0)).toSeq
    // b=0 first (a=3), then b=1 ties in a-order: 0, 1, 2
    assert(rows == Seq(3, 0, 1, 2))
  }

  test("summarize raises NonScalarValueException on a non-scalar rule") {
    // reference: spec/core_spec.cr:313-317 — a rule returning a whole
    // column (not an aggregate) must raise the reference-shaped error
    intercept[graft.core.NonScalarValueException](
      persons.groupBy("last_name").summarize("bad" -> (c => c("age") + 1)))
    intercept[graft.core.NonScalarValueException](
      persons.summarize("bad" -> (c => c("first_name"))))
  }
}
