package graft

import org.apache.spark.sql.functions._
import graft.functions.Kernels

/** The kernels' SQL surface (GraftExtensions): every registered
  * function must be callable from plain SQL and return EXACTLY what
  * the DataFrame DSL wrapper returns — same expression class, so this
  * pins the registration plumbing, not a reimplementation. */
class SqlFunctionsSpec extends GraftSpec {

  import spark.implicits._

  test("SQL kernels equal their DSL twins on the same rows") {
    Seq(("hello world hello again", Seq(1.0f, 2.0f), Seq(2.0f, 4.0f)))
      .toDF("text", "va", "vb").createOrReplaceTempView("sqlk")
    val viaSql = spark.sql(
      """SELECT minhash_sig(text, 16, 4) AS sig,
        |  simhash64(text) AS sh,
        |  cosine_sim(va, vb) AS cos,
        |  cosine_lsh_bands(va, 2, 4, 42L) AS bands,
        |  word_ngram_hashes(split(text, ' '), 2) AS whs,
        |  repetition_stats(text) AS rep,
        |  deflate_ratio(text) AS dr
        |FROM sqlk""".stripMargin).collect()(0)
    val viaDsl = spark.table("sqlk").select(
      Kernels.minhashSig(col("text"), 16, 4).as("sig"),
      Kernels.simhash64(col("text")).as("sh"),
      Kernels.cosineSim(col("va"), col("vb")).as("cos"),
      Kernels.cosineLshBands(col("va"), 2, 4, 42L).as("bands"),
      Kernels.wordNgramHashes(split(col("text"), " "), 2).as("whs"),
      Kernels.repetitionStats(col("text")).as("rep"),
      Kernels.deflateRatio(col("text")).as("dr")).collect()(0)
    assert(viaSql.getSeq[Long](0) == viaDsl.getSeq[Long](0))
    assert(viaSql.getLong(1) == viaDsl.getLong(1))
    assert(viaSql.getDouble(2) == viaDsl.getDouble(2))
    assert(viaSql.getSeq[Long](3) == viaDsl.getSeq[Long](3))
    assert(viaSql.getSeq[Long](4) == viaDsl.getSeq[Long](4))
    assert(viaSql.getStruct(5) == viaDsl.getStruct(5))
    assert(viaSql.getDouble(6) == viaDsl.getDouble(6))
  }

  test("char_ngram_hashes and cut_spans are SQL-callable and equal their DSL twins") {
    Seq(("abcdefgh-abcdefgh", Seq(2, 4)))
      .toDF("text", "starts").createOrReplaceTempView("sqlcs")
    val viaSql = spark.sql(
      """SELECT char_ngram_hashes(text, 8) AS h,
        |  cut_spans(text, starts, 4) AS c
        |FROM sqlcs""".stripMargin).collect()(0)
    val viaDsl = spark.table("sqlcs").select(
      Kernels.charNgramHashes(col("text"), 8).as("h"),
      Kernels.cutSpans(col("text"), col("starts"), 4).as("c")).collect()(0)
    assert(viaSql.getSeq[Long](0) == viaDsl.getSeq[Long](0))
    assert(viaSql.getStruct(1) == viaDsl.getStruct(1))
  }

  test("strip_html is SQL-callable and equals the DSL verb byte-for-byte") {
    Seq("<p>a &amp;&amp; b</p><script>x &lt; y</script><!-- c -->tail")
      .toDF("h").createOrReplaceTempView("sqlh")
    val viaSql = spark.sql("SELECT strip_html(h) FROM sqlh").head.getString(0)
    val viaDsl = spark.table("sqlh")
      .select(graft.text.TextFunctions.stripHtml(col("h"))).head.getString(0)
    assert(viaSql == "a && b tail")
    assert(viaSql == viaDsl)
    val e = intercept[IllegalArgumentException] {
      spark.sql("SELECT strip_html()") }
    assert(e.getMessage.contains("expects 1 arguments"))
  }

  test("SQL kernels validate config arguments and input types eagerly") {
    Seq(Tuple1("t")).toDF("text").createOrReplaceTempView("sqlk2")
    // non-literal config arg refused with the function named
    val e1 = intercept[Exception](
      spark.sql("SELECT minhash_sig(text, length(text), 4) FROM sqlk2"))
    assert(e1.getMessage.contains("minhash_sig"), e1.getMessage)
    // wrong arity refused
    val e2 = intercept[Exception](
      spark.sql("SELECT simhash64(text, 3) FROM sqlk2"))
    assert(e2.getMessage.contains("simhash64"), e2.getMessage)
    // wrong input type fails at analysis (the kernels' own checks)
    val e3 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT simhash64(array(1, 2)) FROM sqlk2").queryExecution.analyzed)
    assert(e3.getMessage.contains("simhash64"), e3.getMessage)
  }

  test("cosine_bucket_dups is SQL-callable (the embedding dedup verify kernel)") {
    val r = spark.sql(
      """SELECT cosine_bucket_dups(
        |  array(named_struct('id', 1L, 'vec', array(1.0D, 0.0D)),
        |        named_struct('id', 2L, 'vec', array(1.0D, 0.0D)),
        |        named_struct('id', 5L, 'vec', array(0.0D, 1.0D))),
        |  0.9D, 6) AS dups""".stripMargin).collect()(0).getSeq[Long](0)
    assert(r == Seq(2L)) // 2 duplicates 1 (lower id wins); 5 is orthogonal
  }
}
