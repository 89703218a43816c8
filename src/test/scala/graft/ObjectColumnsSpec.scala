package graft

import graft.core.CrysFrame
import org.apache.spark.sql.functions._

// top-level case classes: nested ones break Janino codegen for Encoders
case class GeoPoint(lat: Double, lon: Double)
case class Sighting(id: Long, species: String, where: GeoPoint)
case class Tagged(id: String, tags: Seq[String])

/** Arbitrary-object columns and the remaining reference tail:
  * CustomColumnValue-style struct cells (reference: context.cr:48-52),
  * ArrayList cells + unnest (reference: context.cr:76-119,
  * spec/reshape_spec.cr:212-221), filter_by_row_with_index
  * (dataframe.cr:262-274), concatenate (extension.cr:58-61),
  * JDBC ingest (crysda.cr:50-52, spec/reader_spec.cr:160-199). */
class ObjectColumnsSpec extends GraftSpec {

  import org.apache.spark.sql.Encoders
  private implicit val sightingEnc: org.apache.spark.sql.Encoder[Sighting] =
    Encoders.product[Sighting]
  private implicit val taggedEnc: org.apache.spark.sql.Encoder[Tagged] =
    Encoders.product[Tagged]

  test("case-class object columns group and sort by value") {
    val f = CrysFrame.ofDataset(spark, Seq(
      Sighting(1, "fox", GeoPoint(52.5, 13.4)),
      Sighting(2, "owl", GeoPoint(52.5, 13.4)),
      Sighting(3, "fox", GeoPoint(48.1, 11.6))))
    // the struct column is a first-class value: groupable like the
    // reference's hashcode-backed CustomColumnValue grouping
    val counts = f.groupBy("where").count()
      .out.collect().map(r => r.getStruct(0).getDouble(0) -> r.getLong(1)).toMap
    assert(counts == Map(52.5 -> 2L, 48.1 -> 1L))
    assert(f.schema("where").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
  }

  test("ArrayList-style list cells unnest to rows (reference reshape_spec)") {
    val f = CrysFrame.ofDataset(spark, Seq(
      Tagged("foo", Seq("some", "tags")),
      Tagged("bar", Seq("some", "other", "tags"))))
    assert(f.unnest("tags").numRow == 5)
  }

  test("mixed AnyCol cells round-trip through a variant column (reference context.cr:54)") {
    import graft.core.Variant
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T10:30:00Z"))
    val uuid = java.util.UUID.fromString("123e4567-e89b-12d3-a456-426614174000")
    // Seq[Any] keeps literal 4 an Int (weak conformance would widen
    // Seq(4, 2.5) to Seq[Double] and change the id column's family)
    val f = CrysFrame.of(spark, Seq("id", "payload"),
      Seq(Seq[Any](1, 42), Seq[Any](2, "hello"), Seq[Any](3, ts),
        Seq[Any](4, 2.5), Seq[Any](5, uuid), Seq[Any](6, null)))
    // one column, five runtime families → variant struct<tag, repr>
    assert(Variant.isVariantType(f.schema("payload").dataType))
    val cells = f.sortBy("id").out.collect()
      .map(r => Variant.decode(r.getAs[org.apache.spark.sql.Row]("payload")))
    assert(cells.toSeq == Seq(42, "hello", ts, 2.5, uuid, null))
    // typed views: wrong-family cells go null, right-family cells cast
    val longs = f.sortBy("id").out
      .select(Variant.asLong(col("payload"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getLong(0))
    assert(longs.toSeq == Seq(42L, null, null, null, null, null))
    // variant cells survive grouping/filtering as first-class values
    assert(f.filter(_ => Variant.tag(col("payload")) === "str").numRow == 1)
    // print renders the underlying value, not the struct
    assert(f.printFrame().contains("hello"))
    // convertType: homogeneous tags materialize back to a typed column
    val nums = CrysFrame.of(spark, Seq("v"), Seq(Seq(1), Seq(2L), Seq("3")))
    assert(Variant.isVariantType(nums.schema("v").dataType) ||
      nums.schema("v").dataType == org.apache.spark.sql.types.StringType)
    val times = CrysFrame.of(spark, Seq("k", "t"),
      Seq(Seq("a", ts), Seq("b", "2024-05-01T00:00:00Z")))
    assert(Variant.isVariantType(times.schema("t").dataType))
    val back = times.convertType("t")
    assert(back.schema("t").dataType == org.apache.spark.sql.types.TimestampType ||
      back.schema("t").dataType == org.apache.spark.sql.types.StringType)
    val intsMixed = CrysFrame.of(spark, Seq("v"), Seq(Seq(7), Seq(8.5), Seq(true)))
    assert(Variant.isVariantType(intsMixed.schema("v").dataType))
    val conv = intsMixed.convertType("v")
    // i32/f64/bool reprs: the ladder lands on String (no common numeric)
    assert(conv.schema("v").dataType == org.apache.spark.sql.types.StringType)
    val homo = CrysFrame.of(spark, Seq("v"), Seq(Seq(7), Seq(uuid))).convertType("v")
    assert(homo.schema("v").dataType == org.apache.spark.sql.types.StringType)
  }

  test("filterByRowWithIndex passes the 0-based index in frame order") {
    val f = CrysFrame.of(spark, Seq("person", "year"),
      Seq(Seq("max", 2014), Seq("max", 2016), Seq("anna", 2015), Seq("anna", 2016)))
      .withRowOrder
    // reference doc example: year > 2015 || odd index
    val kept = f.filterByRowWithIndex((r, i) =>
      r.getAs[Int]("year") > 2015 || i % 2 != 0)
    assert(kept.numRow == 2) // indices 1 (2016) and 3 (2016, odd)
    // index respects an explicit sort order
    val firstTwo = f.sortBy("year").filterByRowWithIndex((_, i) => i < 2)
      .out.collect().map(_.getInt(1)).toSeq.sorted
    assert(firstTwo == Seq(2014, 2015))
  }

  test("concatenate zips two columns with space, nulls as NA") {
    val f = CrysFrame.of(spark, Seq("a", "b"),
      Seq(Seq("x", 1), Seq(null, 2)))
      .addColumn("c")(c => c.concatenate(c("a"), c("b")))
    assert(f.out.orderBy("b").collect().map(_.getString(2)).toSeq ==
      Seq("x 1", "NA 2"))
  }

  test("readJdbc reads a table from an embedded Derby database") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE users") catch { case _: java.sql.SQLException => }
      st.execute("CREATE TABLE users (id INT, login VARCHAR(32), balance DOUBLE)")
      st.execute("INSERT INTO users VALUES (1, 'ann', 10.5), (2, 'bob', -3.25), (3, NULL, 0.0)")
      val f = graft.sources.Readers.readJdbc(spark, url, "users")
      assert(f.numRow == 3)
      assert(f.names.map(_.toLowerCase) == Seq("id", "login", "balance"))
      val rows = f.out.orderBy("id").collect()
      assert(rows(0).getString(1) == "ann" && rows(1).getDouble(2) == -3.25)
      assert(rows(2).isNullAt(1))
    } finally conn.close()
  }
}
