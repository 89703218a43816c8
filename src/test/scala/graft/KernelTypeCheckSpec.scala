package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.functions.Kernels

/** Analysis-time input validation for every custom kernel expression:
  * misuse must fail when the plan is ANALYZED, not mid-task three hours
  * into a 100-TB scan. Each case feeds a wrong-typed column and pins
  * that the failure is an AnalysisException raised eagerly (at select
  * time), never a lazy eval-time ClassCastException. */
class KernelTypeCheckSpec extends GraftSpec {

  import spark.implicits._

  private lazy val ints = Seq(1, 2, 3).toDF("n")                 // not a string
  private lazy val strs = Seq("a", "b").toDF("s")                // not an array
  private lazy val strArr = Seq(Seq("x", "y")).toDF("a")         // non-numeric array

  private def analysisFailure(body: => Any): AnalysisException =
    intercept[AnalysisException](body)

  test("minhash_sig rejects a non-string child at analysis time") {
    val e = analysisFailure(ints.select(Kernels.minhashSig(col("n"), 8, 3)).queryExecution.analyzed)
    assert(e.getMessage.contains("minhash_sig"))
  }

  test("simhash64 rejects a non-string child at analysis time") {
    val e = analysisFailure(ints.select(Kernels.simhash64(col("n"))).queryExecution.analyzed)
    assert(e.getMessage.contains("simhash64"))
  }

  test("cosine_lsh_bands rejects a non-array child at analysis time") {
    val e = analysisFailure(strs.select(Kernels.cosineLshBands(col("s"), 4, 8, 42L))
      .queryExecution.analyzed)
    assert(e.getMessage.contains("cosine_lsh_bands"))
  }

  test("cosine_lsh_bands rejects a non-numeric array element type") {
    val e = analysisFailure(strArr.select(Kernels.cosineLshBands(col("a"), 4, 8, 42L))
      .queryExecution.analyzed)
    assert(e.getMessage.contains("cosine_lsh_bands"))
  }

  test("cosine_sim rejects a non-numeric array on either side") {
    val df = Seq((Seq(1.0, 2.0), Seq("x"))).toDF("l", "r")
    val e1 = analysisFailure(df.select(Kernels.cosineSim(col("r"), col("l")))
      .queryExecution.analyzed)
    assert(e1.getMessage.contains("cosine_sim"))
    val e2 = analysisFailure(df.select(Kernels.cosineSim(col("l"), col("r")))
      .queryExecution.analyzed)
    assert(e2.getMessage.contains("cosine_sim"))
  }

  test("cosine_bucket_dups rejects a malformed bucket shape") {
    val df = Seq(Seq((1, Seq(0.5)))).toDF("bucket") // id is int, not long
    val e = analysisFailure(df.select(Kernels.cosineBucketDups(col("bucket"), 0.8, 6))
      .queryExecution.analyzed)
    assert(e.getMessage.contains("cosine_bucket_dups"))
  }

  test("minhash_anchor_drop rejects mistyped id / sig / anchors") {
    val df = Seq((1L, Seq(1L, 2L), Seq((1L, Seq(1L, 2L))))).toDF("id", "sig", "anchors")
    // int id
    val e1 = analysisFailure(df.select(Kernels.minhashAnchorDrop(
      col("id").cast("int"), col("sig"), col("anchors"), 2, 0.5)).queryExecution.analyzed)
    assert(e1.getMessage.contains("minhash_anchor_drop"))
    // string sig
    val e2 = analysisFailure(df.select(Kernels.minhashAnchorDrop(
      col("id"), col("sig").cast("string"), col("anchors"), 2, 0.5)).queryExecution.analyzed)
    assert(e2.getMessage.contains("minhash_anchor_drop"))
    // anchors missing the struct shape
    val e3 = analysisFailure(df.select(Kernels.minhashAnchorDrop(
      col("id"), col("sig"), col("sig"), 2, 0.5)).queryExecution.analyzed)
    assert(e3.getMessage.contains("minhash_anchor_drop"))
    // and the WELL-typed call still analyzes clean
    df.select(Kernels.minhashAnchorDrop(col("id"), col("sig"), col("anchors"), 2, 0.5))
      .queryExecution.analyzed
  }

  test("repetition_stats rejects a non-string child at analysis time") {
    val e = analysisFailure(ints.select(Kernels.repetitionStats(col("n")))
      .queryExecution.analyzed)
    assert(e.getMessage.contains("repetition_stats"))
  }

  test("deflate_ratio rejects a non-string child at analysis time") {
    val e = analysisFailure(ints.select(Kernels.deflateRatio(col("n")))
      .queryExecution.analyzed)
    assert(e.getMessage.contains("deflate_ratio"))
  }

  test("nb_score_sum rejects a non-array child at analysis time") {
    val e = analysisFailure(ints.select(
        Kernels.nbScoreSum(col("n"), Map("a" -> 1L), 0L))
      .queryExecution.analyzed)
    assert(e.getMessage.contains("nb_score_sum"))
  }

  test("word_ngram_hashes: rolling hash is offset-independent and window-exact") {
    import graft.functions.Kernels
    def hashesOf(tokens: Seq[String], n: Int): Seq[Long] =
      Seq(Tuple1(tokens)).toDF("toks")
        .select(Kernels.wordNgramHashes(col("toks"), n).as("h"))
        .collect()(0).getSeq[Long](0)
    // the same 3-token window at DIFFERENT offsets must hash equal —
    // this is exactly what a buggy rolling update would break
    val a = hashesOf(Seq("p", "q", "x", "y", "z"), 3)
    val b = hashesOf(Seq("u", "v", "w", "x", "y", "z"), 3)
    assert(a.length == 3 && b.length == 4)
    assert(a(2) == b(3), "shared window ('x','y','z') hashed differently by offset")
    // every other window differs (no accidental equalities here)
    assert((a.take(2) ++ b.take(3)).distinct.size == 5)
    // order sensitivity: reversed window is a different gram
    val c = hashesOf(Seq("z", "y", "x"), 3)
    assert(c.length == 1 && c(0) != a(2))
    // shorter than n -> empty, never null
    assert(hashesOf(Seq("one", "two"), 3).isEmpty)
    // type check: non-string array refused at analysis time
    val e = analysisFailure(Seq(Tuple1(Seq(1, 2, 3))).toDF("toks")
      .select(Kernels.wordNgramHashes(col("toks"), 3)).queryExecution.analyzed)
    assert(e.getMessage.contains("word_ngram_hashes"))
  }

  test("well-typed kernel calls still evaluate (no false rejections)") {
    val r = Seq(("hello world hello", Seq(1.0f, 0.0f)))
      .toDF("t", "v")
      .select(
        Kernels.minhashSig(col("t"), 8, 3).as("sig"),
        Kernels.simhash64(col("t")).as("sh"),
        Kernels.cosineLshBands(col("v"), 2, 4, 7L).as("bands"),
        Kernels.cosineSim(col("v"), col("v")).as("cos"),
        Kernels.repetitionStats(col("t")).as("rep"))
      .collect()(0)
    assert(r.getSeq[Long](0).length == 8)
    assert(r.getSeq[Long](2).length == 2)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    assert(r.getStruct(4).getInt(0) == 3) // total_words
  }
}
