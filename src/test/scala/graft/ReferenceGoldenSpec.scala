package graft

import graft.core.{Agg, CrysFrame}
import graft.sources.Readers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden-value parity against the reference's own spec fixtures, read
  * in place from the read-only reference checkout (no fixture copies).
  * These pin exact numbers the reference asserts about itself. */
class ReferenceGoldenSpec extends GraftSpec {

  private val data = "/root/reference/spec/data"

  private lazy val sleep: CrysFrame = Readers.readCsv(spark, s"$data/msleep.csv")
  private lazy val iris: CrysFrame =
    Readers.readCsv(spark, s"$data/iris.txt", separator = "\t")

  test("msleep.csv infers the reference's column types (83 x 11, NA-heavy)") {
    assert(sleep.numRow == 83)
    assert(sleep.numCol == 11)
    val byName = sleep.schema.fields.map(f => f.name -> f.dataType).toMap
    Seq("name", "genus", "vore", "order", "conservation")
      .foreach(c => assert(byName(c) == StringType, c))
    Seq("sleep_total", "sleep_rem", "sleep_cycle", "awake", "brainwt", "bodywt")
      .foreach(c => assert(byName(c) == DoubleType, c))
  }

  test("iris.txt reads as 150 x 5, four doubles + species") {
    assert(iris.numRow == 150)
    assert(iris.schema("Species").dataType == StringType)
    assert(iris.schema("Sepal.Length").dataType == DoubleType)
  }

  /** reference: spec/reader_spec.cr URL test — served by an in-test
    * HTTP server exactly like the reference's own spec. */
  test("readCsv from an http:// URL matches the direct file read") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$data/msleep.csv"))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/msleep.csv", exchange => {
      exchange.sendResponseHeaders(200, bytes.length.toLong)
      try exchange.getResponseBody.write(bytes) finally exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/msleep.csv"
      val viaUrl = Readers.readCsv(spark, url)
      assert(viaUrl.numRow == 83 && viaUrl.numCol == 11)
      assert(viaUrl.schema == sleep.schema)
      assert(viaUrl.out.orderBy("name").collect().toSeq ==
        sleep.out.orderBy("name").collect().toSeq)
    } finally server.stop(0)
  }

  /** reference: spec/reader_spec.cr:99-116 — read_json from a URL via
    * an in-test HTTP server (3,201 movies, last column "IMDB Votes"). */
  test("readJson from an http:// URL matches the reference's movies expectations") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$data/movies.json"))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/movies.json", exchange => {
      exchange.sendResponseHeaders(200, bytes.length.toLong)
      try exchange.getResponseBody.write(bytes) finally exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/movies.json"
      val f = Readers.readJson(spark, url)
      assert(f.numRow == 3201)
      assert(f.names.contains("IMDB Votes"))
    } finally server.stop(0)
  }

  test("readJson URL honors multiLine=false (NDJSON, one record per line)") {
    val nd = "{\"a\": 1}\n{\"a\": 2}\n{\"a\": 3}\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.jsonl", exchange => {
      exchange.sendResponseHeaders(200, nd.length.toLong)
      try exchange.getResponseBody.write(nd) finally exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.jsonl"
      val f = Readers.readJson(spark, url, multiLine = false)
      assert(f.numRow == 3)
      assert(f.out.orderBy("a").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    } finally server.stop(0)
  }

  /** reference: builder.cr:44-83 IO/string input + gzip autodetect
    * (spec/reader_spec.cr gzip case). */
  test("readCsvString and gzip readCsvStream run the same typed pipeline") {
    val s = Readers.readCsvString(spark,
      """# preamble to skip
        |a,b,flag
        |1,x,T
        |2,NA,F
        |3,y,NA
        |""".stripMargin, skip = 1)
    assert(s.schema("a").dataType == IntegerType)
    assert(s.schema("flag").dataType == BooleanType)
    assert(s.numRow == 3)
    assert(s.out.orderBy("a").collect()(1).isNullAt(1)) // NA -> null
    val gz = Readers.readCsvStream(spark,
      java.nio.file.Files.newInputStream(
        java.nio.file.Paths.get(s"$data/msleep.csv.gz")))
    assert(gz.numRow == 83 && gz.numCol == 11)
    assert(gz.schema == sleep.schema)
  }

  /** reference: spec/core_spec.cr:660-680 — compound pipeline golden. */
  test("compound pipeline reproduces mean rem proportion 0.22137215757391437") {
    val got = sleep
      .filter(c => c("awake") > 3)
      .addColumn("rem_proportion")(c => c("sleep_rem") / c("sleep_total"))
      .moveLeft("rem_proportion", "sleep_rem", "sleep_total")
      .groupBy("vore")
      .summarize("mean_rem_prop" -> (_ =>
        Agg.mean(col("rem_proportion"), removeNa = true)))
      .filter(c => c("vore") === "insecti")
      .collectRows()
    assert(got.size == 1)
    assert(got.head.getDouble(1) == 0.22137215757391437)
  }

  /** reference: spec/joins_spec.cr:63-66 — unequal-by self-join golden. */
  test("self-join on (vore, order) yields exactly 597 rows") {
    val renamed = sleep.rename("order" -> "new_order")
    val joined = sleep.innerJoin(renamed,
      byPairs = Seq("vore" -> "vore", "order" -> "new_order"))
    assert(joined.numRow == 597)
  }

  /** reference: spec/joins_spec.cr:59-61 — natural self-join keeps names. */
  test("natural self-join by all columns preserves the column model") {
    assert(sleep.innerJoin(sleep).names == sleep.names)
  }

  /** reference: spec/reader_spec.cr:59-63 — gzip read path. */
  test("gzip CSV reads identically to the plain file") {
    val gz = Readers.readCsv(spark, s"$data/msleep.csv.gz")
    assert(gz.numRow == 83)
    assert(gz.names == sleep.names)
  }

  /** reference: spec/reader_spec.cr:50-57 — a custom NA sentinel must
    * not block numeric inference (leading NAs, Int32 column). */
  test("custom_na_value.csv infers Int with nulls under naValue=CUSTOM_NA") {
    val f = Readers.readCsv(spark, s"$data/custom_na_value.csv", naValue = "CUSTOM_NA")
    assert(f.schema("a").dataType == IntegerType)
    val vals = f.out.collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(vals.count(_ == null) == 5)
    assert(vals.filter(_ != null).map(_.asInstanceOf[Int]).sorted.toSeq == Seq(6, 7, 8, 9, 10))
  }

  /** reference: spec/reader_spec.cr:37-48 — the type-inference contract
    * fixture (String, String, Double, Int, Bool, Long). */
  test("test_header_types.csv reproduces the inference ladder") {
    val f = Readers.readCsv(spark, s"$data/test_header_types.csv")
    assert(f.schema.fields.map(_.dataType).toSeq ==
      Seq(StringType, StringType, DoubleType, IntegerType, BooleanType, LongType))
  }

  /** reference: spec/reader_spec.cr:99-116 — movies.json (3,201 records,
    * ragged keys). */
  test("movies.json parses 3201 records with union-of-keys columns") {
    val f = Readers.readJson(spark, s"$data/movies.json", multiLine = true)
    assert(f.numRow == 3201)
    assert(f.names.contains("Title"))
    assert(f.names.contains("IMDB Rating"))
  }

  /** reference: README tutorial — ramen-ratings, Stars stays string
    * because of literal "Unrated"; flips numeric with na_value. */
  test("ramen-ratings Stars column: string by default, numeric with naValue=Unrated") {
    val plain = Readers.readCsv(spark, s"$data/ramen-ratings.csv", multiLine = true)
    assert(plain.numRow == 2580)
    assert(plain.schema("Stars").dataType == StringType)
    val na = Readers.readCsv(spark, s"$data/ramen-ratings.csv", naValue = "Unrated",
      multiLine = true)
    assert(na.schema("Stars").dataType == DoubleType)
  }

  /** reference: spec/core_spec.cr:460-477 — exact print golden,
    * including the reference's footer bug (counts 5 hidden variables,
    * lists 4 — the row-number column shifts the name indexing; noted in
    * SURVEY.md §2.1). */
  test("printFrame reproduces the reference's msleep golden") {
    val expected =
      """A DataFrame: 83 x 11
        |                           name         genus    vore          order   conservation   sleep_total
        | 1                      Cheetah      Acinonyx   carni      Carnivora             lc        12.100
        | 2                   Owl monkey         Aotus    omni       Primates           <NA>        17.000
        | 3              Mountain beaver    Aplodontia   herbi       Rodentia             nt        14.400
        | 4   Greater short-tailed shrew       Blarina    omni   Soricomorpha             lc        14.900
        | 5                          Cow           Bos   herbi   Artiodactyla   domesticated         4.000
        | 6             Three-toed sloth      Bradypus   herbi         Pilosa           <NA>        14.400
        | 7            Northern fur seal   Callorhinus   carni      Carnivora             vu         8.700
        | 8                 Vesper mouse       Calomys    <NA>       Rodentia           <NA>         7.000
        | 9                          Dog         Canis   carni      Carnivora   domesticated        10.100
        |10                     Roe deer     Capreolus   herbi   Artiodactyla             lc         3.000
        |and 73 more rows, and 5 more variables: sleep_cycle, awake, brainwt, bodywt
        |""".stripMargin
    assert(sleep.printFrame("A DataFrame", 10) == expected)
  }

  /** reference: spec/core_spec.cr:479-493 — empty-frame print goldens:
    * a 0 x 0 frame renders the title only; a 0-row frame renders headers
    * at the 20-char default column width, no row-number column, and a
    * footer that both counts and lists the hidden variable (no
    * row-number column → no off-by-one). */
  test("printFrame reproduces the reference's empty-frame goldens") {
    assert(CrysFrame.empty(spark).printFrame("A DataFrame", 10) == "A DataFrame: 0 x 0\n")
    val expected =
      """A DataFrame: 0 x 5
        |        Sepal.Length            Sepal.Width           Petal.Length            Petal.Width
        |1 more variables: Species
        |""".stripMargin
    assert(iris.filter(c => c("Species") === "foo").printFrame("A DataFrame", 10) == expected)
  }

  /** reference: spec/core_spec.cr:436-452 — exact schema golden
    * (alignment + value-region truncation at maxWidth). */
  test("schemaString reproduces the reference's iris golden") {
    val expected =
      """DataFrame with 150 observations
        |Sepal.Length [Float64] 5.1, 4.9, 4.7, 4.6, ...
        |Sepal.Width  [Float64] 3.5, 3.0, 3.2, 3.1, ...
        |Petal.Length [Float64] 1.4, 1.4, 1.3, 1.5, ...
        |Petal.Width  [Float64] 0.2, 0.2, 0.2, 0.2, ...
        |Species      [String]  setosa, setosa, seto...
        |""".stripMargin
    assert(iris.schemaString(maxDigits = 1, maxWidth = 20) == expected)
  }

  /** reference: spec/core_spec.cr:454-458 — column peek goldens. */
  test("columnString reproduces the reference's column-peek goldens") {
    assert(iris.columnString("Sepal.Length", maxDigits = 1) ==
      "Sepal.Length [Float64][150]: 5.1, 4.9, 4.7, 4.6, 5.0, 5.4, 4.6, " +
      "5.0, 4.4, 4.9, 5.4, 4.8, 4.8, 4.3, ...")
    assert(iris.columnString("Species") ==
      "Species [String][150]: setosa, setosa, setosa, setosa, setosa, " +
      "setosa, setosa, setosa, setosa, ...")
  }
}
