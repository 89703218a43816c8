package graft

import graft.core.{CrysFrame, sel}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reshape + binding semantics (reference: spec/reshape_spec.cr,
  * spec/core_spec.cr:575-657). */
class ReshapeBindSpec extends GraftSpec {

  private def long: CrysFrame = CrysFrame.of(spark,
    Seq("person", "year", "weight"),
    Seq(Seq("max", 2014, 33.1), Seq("max", 2015, 32.3),
      Seq("anna", 2014, null), Seq("anna", 2015, 39.2)))

  test("spread then gather round-trips (reference: reshape_spec.cr:26-114)") {
    val wide = long.spread("year", "weight")
    assert(wide.names.toSet == Set("person", "2014", "2015"))
    assert(wide.numRow == 2)
    val back = wide.gather("year", "weight", sel.listOf("2014", "2015"), convert = true)
    assert(back.numRow == 4)
    assert(back.schema("year").dataType == LongType)
  }

  test("spread verify rejects non-unique keys (reference: reshape.cr:24)") {
    val dup = long.bindRows(long)
    intercept[IllegalArgumentException](dup.spread("year", "weight", verify = true))
  }

  test("spread refuses a high-cardinality key with a clear error (pivotMaxValues)") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.pivotMaxValues", "10000")
    spark.conf.set("spark.sql.pivotMaxValues", "50")
    try {
      val tall = CrysFrame((1 to 200).map(i => (i % 4, s"k$i", i)).toDF("g", "key", "value"))
      val err = intercept[IllegalArgumentException](tall.spread("key", "value"))
      assert(err.getMessage.contains("more than 50 distinct values"), err.getMessage)
      // under the cap it still pivots
      val ok = CrysFrame((1 to 40).map(i => (i % 4, s"k${i % 10}", i)).toDF("g", "key", "value"))
        .spread("key", "value")
      assert(ok.names.length == 11) // g + 10 pivot columns
    } finally spark.conf.set("spark.sql.pivotMaxValues", prev)
  }

  test("gather coerces mixed numeric columns to double") {
    val f = CrysFrame.of(spark, Seq("id", "i", "d"),
      Seq(Seq(1, 10, 1.5), Seq(2, 20, 2.5)))
      .gather("key", "value", sel.listOf("i", "d"))
    assert(f.schema("value").dataType == DoubleType)
    assert(f.numRow == 4)
  }

  test("separate splits with NA literal → null + convert (reference: reshape_spec.cr:141-163)") {
    val f = CrysFrame.of(spark, Seq("combo"), Seq(Seq("1_a"), Seq("2_NA"), Seq("3_b")))
      .separate("combo", Seq("num", "tag"), sep = "_", convert = true)
    assert(f.names == Seq("num", "tag"))
    assert(f.schema("num").dataType == LongType)
    val tags = f.sortBy("num").out.select("tag").collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(tags == Seq("a", null, "b"))
  }

  test("unite concatenates with NA literal for nulls (reference: reshape.cr:109-122)") {
    val f = CrysFrame.of(spark, Seq("a", "b"), Seq(Seq("x", "y"), Seq("z", null)))
      .unite("ab", sel.listOf("a", "b"), sep = "_")
    assert(f.names == Seq("ab"))
    assert(f.out.orderBy("ab").collect().map(_.getString(0)).toSeq ==
      Seq("x_y", "z_NA"))
  }

  test("nest/unnest round-trips (reference: reshape_spec.cr:166-221)") {
    val f = long.nest(sel.listOf("year", "weight"), packedName = "data")
    assert(f.names == Seq("person", "data"))
    assert(f.numRow == 2)
    val back = f.unnest("data")
    assert(back.numRow == 4)
    assert(back.names.toSet == Set("person", "year", "weight"))
  }

  test("unnest of scalar list column (reference: reshape_spec.cr:213-221)") {
    import spark.implicits._
    val f = CrysFrame(Seq((1, Seq("a", "b")), (2, Seq("c"))).toDF("id", "tags"))
      .unnest("tags")
    assert(f.numRow == 3)
  }

  test("expand produces sorted cartesian of distincts (reference: reshape_spec.cr:223-244)") {
    val f = long.expand("person", "year")
    assert(f.numRow == 4)
    assert(f.names == Seq("person", "year"))
  }

  test("complete left-joins the original back (reference: reshape.cr:215-217)") {
    val sparse = CrysFrame.of(spark, Seq("k1", "k2", "v"),
      Seq(Seq("a", 1, 10), Seq("b", 2, 20)))
    val f = sparse.complete("k1", "k2")
    assert(f.numRow == 4)
    assert(f.out.filter(col("v").isNull).count() == 2)
  }

  // --- binding (reference: spec/core_spec.cr:575-657) ---

  test("bindRows unions by name with null fill") {
    val a = CrysFrame.of(spark, Seq("x", "y"), Seq(Seq(1, "p")))
    val b = CrysFrame.of(spark, Seq("y", "z"), Seq(Seq("q", 2.5)))
    val f = a.bindRows(b)
    assert(f.names.toSet == Set("x", "y", "z"))
    assert(f.numRow == 2)
  }

  test("spread fills typed holes and keeps null-key values as the NA column") {
    val long = CrysFrame.of(spark, Seq("id", "key", "value"),
      Seq(Seq(1, "x", 10), Seq(2, "y", 20), Seq(3, null, 30)))
    val wide = long.spread("key", "value", fill = 0)
    assert(wide.names.toSet == Set("id", "x", "y", "NA"))
    val byId = wide.out.collect().map(r => r.getInt(0) ->
      (r.get(1), r.get(2), r.get(3))).toMap
    // numeric fill actually lands (na.fill(String, _) would skip ints)
    assert(byId(1)._2 == 0 || byId(1)._1 == 0) // row 1 has x=10, others 0
    assert(!byId.values.exists { case (a, b, c) => a == null || b == null || c == null })
    // the null-key row's value survives in the NA column
    assert(byId(3).productIterator.contains(30))
  }

  test("separate works when `into` contains the source column name") {
    val f = CrysFrame.of(spark, Seq("x"), Seq(Seq("a-b")))
      .separate("x", Seq("x", "y"), sep = "-")
    val r = f.out.collect()(0)
    assert(r.getString(0) == "a" && r.getString(1) == "b")
  }

  test("separate null-pads ragged splits (r9 fuzzer find: ANSI getItem crash)") {
    // parity-plus vs the reference (which raises on unequal splits,
    // reshape.cr:140-141): a short row pads its tail with nulls, an
    // over-long row drops the extras — and, the regression itself,
    // OBSERVING the padded columns must not raise INVALID_ARRAY_INDEX
    // under ANSI (getItem past the end did; `get()` does not)
    val f = CrysFrame.of(spark, Seq("id", "x"),
      Seq(Seq(1, "a-b"), Seq(2, "solo"), Seq(3, "p-q-extra")))
      .separate("x", Seq("l", "r"), sep = "-")
    val rows = f.sortBy("id").out.collect()
    assert(rows(0).getString(1) == "a" && rows(0).getString(2) == "b")
    assert(rows(1).getString(1) == "solo" && rows(1).isNullAt(2))
    assert(rows(2).getString(1) == "p" && rows(2).getString(2) == "q")
  }

  test("convertType and unite preserve the grouping annotation") {
    val f = CrysFrame.of(spark, Seq("g", "v"),
      Seq(Seq("a", "1"), Seq("a", "2"), Seq("b", "3")))
      .groupBy("g").convertType("v")
    assert(f.groupedBy == Seq("g"))
    assert(f.schema("v").dataType == org.apache.spark.sql.types.LongType)
    // grouped summarize after convertType aggregates per group
    assert(f.summarize("s" -> (_ => org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.col("v")))).numRow == 2)
    val u = CrysFrame.of(spark, Seq("g", "v"), Seq(Seq("a", 1)))
      .groupBy("g").unite("gv", sel.listOf("v"), sep = "_")
    assert(u.groupedBy == Seq("g"))
  }

  test("bindRows re-infers conflicting column types like the reference") {
    // reference: dataframe.cr:694-714 — Int+Double → Float64,
    // incompatible → AnyCol (String here); unionByName alone would throw
    val ints = CrysFrame.of(spark, Seq("v"), Seq(Seq(1)))
    val dbls = CrysFrame.of(spark, Seq("v"), Seq(Seq(2.5)))
    val strs = CrysFrame.of(spark, Seq("v"), Seq(Seq("x")))
    val longs = CrysFrame.of(spark, Seq("v"), Seq(Seq(9999999999L)))
    val numeric = ints.bindRows(dbls)
    assert(numeric.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
    assert(numeric.out.orderBy("v").collect().map(_.getDouble(0)).toSeq == Seq(1.0, 2.5))
    val integral = ints.bindRows(longs)
    assert(integral.schema("v").dataType == org.apache.spark.sql.types.LongType)
    val mixed = ints.bindRows(strs)
    assert(mixed.schema("v").dataType == org.apache.spark.sql.types.StringType)
    assert(mixed.out.orderBy("v").collect().map(_.getString(0)).toSeq == Seq("1", "x"))
  }

  test("bindCols zips positionally, dedups names with _1 suffix") {
    val a = CrysFrame.of(spark, Seq("v"), Seq(Seq(1), Seq(2)))
    val b = CrysFrame.of(spark, Seq("v"), Seq(Seq(10), Seq(20)))
    val f = a.bindCols(b)
    assert(f.names == Seq("v", "v_1"))
    assert(f.numRow == 2)
  }
}
