package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.text.Decontaminate

/** Benchmark decontamination: planted leaks found, clean docs pass,
  * short docs survive with zero counts, plan shape joins on hashes. */
class DecontaminateSpec extends GraftSpec {

  private val leak = (1 to 15).map(i => s"w$i").mkString(" ")

  private def fixture = {
    import spark.implicits._
    val docs = Seq(
      (1L, s"intro text then $leak and a tail"), // contains the leaked passage
      (2L, "a completely different document about other things entirely " +
        "with plenty of words but nothing shared beyond stray unigrams " +
        "so it stays clean under any long gram check"),
      (3L, "too short to have grams"),
      (4L, "")).toDF("doc_id", "text")
    val bench = Seq((s"question: $leak answer: yes")).toDF("qtext")
    (docs, bench)
  }

  test("13-gram overlap flags exactly the leaked document") {
    val (docs, bench) = fixture
    val out = Decontaminate.ngramOverlap(docs, "doc_id", "text", bench, "qtext")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L)) // whole corpus covered
    // doc 1: the 15-word leak inside a longer doc shares every 13-gram
    // window fully inside it → 3 of them
    assert(out(1L)._3 && out(1L)._2 == 3, out(1L).toString)
    assert(!out(2L)._3 && out(2L)._2 == 0)
    assert(out(3L) == ((0L, 0L, false))) // < 13 words: zero grams, kept
    assert(out(4L) == ((0L, 0L, false)))
  }

  test("n parameter: bigger windows need longer shared runs") {
    val (docs, bench) = fixture
    val out16 = Decontaminate.ngramOverlap(docs, "doc_id", "text", bench, "qtext", n = 16)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // the shared run is 15 words — no 16-gram can fit inside it
    assert(!out16(1L))
    val out5 = Decontaminate.ngramOverlap(docs, "doc_id", "text", bench, "qtext", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out5(1L) == 11) // 15-word run → 11 5-gram windows
  }

  test("duplicate grams in a doc count once (distinct contract)") {
    import spark.implicits._
    val docs = Seq((1L, s"$leak $leak $leak")).toDF("doc_id", "text")
    val bench = Seq((leak)).toDF("qtext")
    val out = Decontaminate.ngramOverlap(docs, "doc_id", "text", bench, "qtext", n = 15)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // repeated passage: windows spanning the seam are distinct, but the
    // leak window itself appears 3 times and counts once; bench holds
    // only the single 15-gram → n_contaminated is exactly 1
    assert(out(1L)._2 == 1, out(1L).toString)
  }

  test("duplicatedPassageStats profiles corpus-internal repetition") {
    import spark.implicits._
    val shared = (1 to 13).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha opening words then $shared closing remarks here"),
      (2L, s"totally different beginning yet $shared and another ending"),
      (3L, "no repeated passages anywhere in this document at all " +
        "just singular prose that appears exactly once in the corpus"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = Decontaminate.duplicatedPassageStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // docs 1 and 2 share exactly the one 13-gram window
    assert(out(1L)._2 == 1 && out(2L)._2 == 1, out.toString)
    assert(out(1L)._3 == 1.0 / out(1L)._1)
    assert(out(3L)._2 == 0 && out(3L)._3 == 0.0)
    assert(out(4L) == ((0L, 0L, 0.0))) // gram-less doc covered with zeros
  }

  test("removeDuplicatedPassages cuts cross-doc windows, keeps in-doc repeats") {
    import spark.implicits._
    // n = 3 keeps the expectations hand-checkable
    val docs = Seq(
      (1L, "aa bb SHARED1 SHARED2 SHARED3 cc dd"),   // shared run mid-doc
      (2L, "SHARED1 SHARED2 SHARED3 xx yy zz ww"),   // shared run at head
      (3L, "pp qq rr pp qq rr"),                     // repeated IN-DOC only
      (4L, "one two"),                               // shorter than n
      (5L, "")).toDF("doc_id", "text")               // tokenless
    val out = Decontaminate.removeDuplicatedPassages(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // docs 1/2: exactly the one shared 3-token window removed (its 3
    // tokens), neighbors intact — case is normalized by the tokenizer
    assert(out(1L) == ((7L, 3L, "aa bb cc dd")), out(1L).toString)
    assert(out(2L) == ((7L, 3L, "xx yy zz ww")), out(2L).toString)
    // in-doc repetition is NOT cross-doc duplication: untouched
    assert(out(3L) == ((6L, 0L, "pp qq rr pp qq rr")), out(3L).toString)
    // short and empty docs survive whole
    assert(out(4L) == ((2L, 0L, "one two")), out(4L).toString)
    assert(out(5L) == ((0L, 0L, "")), out(5L).toString)
    // overlapping shared windows: coverage is the UNION of windows.
    // both docs share a 4-token run = two overlapping 3-windows -> all
    // 4 tokens cut, not 6
    val docs2 = Seq(
      (1L, "aa R1 R2 R3 R4 bb"),
      (2L, "R1 R2 R3 R4 cc dd")).toDF("doc_id", "text")
    val out2 = Decontaminate.removeDuplicatedPassages(docs2, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out2(1L) == ((4L, "aa bb")), out2(1L).toString)
    assert(out2(2L) == ((4L, "cc dd")), out2(2L).toString)
    // a FULLY duplicated doc empties out (remove-all semantics: this
    // pass is boilerplate removal, not keep-one dedup)
    val docs3 = Seq(
      (1L, "B1 B2 B3"), (2L, "B1 B2 B3")).toDF("doc_id", "text")
    val out3 = Decontaminate.removeDuplicatedPassages(docs3, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out3 == Map(1L -> "", 2L -> ""), out3.toString)
  }

  test("streaming: contaminated ids emit live and match the batch flags") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (docs, bench) = fixture
    val docRows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = Decontaminate.contaminatedIdsStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", bench, "qtext")
      .writeStream.format("memory").queryName("streamdecon")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(docRows.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("streamdecon").collect().map(_.getLong(0)).toSet
      val batch = Decontaminate.ngramOverlap(docs, "doc_id", "text", bench, "qtext")
        .filter(col("contaminated")).collect().map(_.getLong(0)).toSet
      assert(streamed == batch && streamed == Set(1L), streamed.toString)
    } finally q.stop()
  }

  test("plan: n-gram strings never reach the join — 8-byte hash keys only") {
    val (docs, bench) = fixture
    val p = Decontaminate.ngramOverlap(docs, "doc_id", "text", bench, "qtext")
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"), p)
    // the equi-join keys are the hash column, not a string column
    val keyLines = p.linesIterator.filter(_.contains("keys")).mkString("\n")
    assert(keyLines.contains("__h"), p)
    assert(!keyLines.contains("__ng"), keyLines)
  }
}
