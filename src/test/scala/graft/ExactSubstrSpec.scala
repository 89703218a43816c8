package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.functions.Kernels
import graft.text.ExactSubstr

/** text.ExactSubstr — char-level exact-substring dedup (the Lee et
  * al. 2022 ExactSubstr cut as hash grouping). The kernel contracts
  * (rolling-hash window equality, island merge incl. the
  * adjacent-window rule, end-of-string clamping) are pinned locally;
  * the full operator is pinned on planted corpora; the plan shape is
  * asserted (no cartesian, bounded exchanges). The driver-side
  * DuckDB oracle (q_exact_substr) re-derives clean_text from gram
  * STRINGS, so the hash path is cross-checked end to end there. */
class ExactSubstrSpec extends GraftSpec {

  import spark.implicits._

  // ---- kernel: charNgramHashes

  test("equal windows hash equal, shifted/distinct windows differ, short strings empty") {
    val df = Seq(
      ("abcdefgh-abcdefgh", 1L),
      ("abc", 2L)).toDF("t", "id")
    val out = df.select(col("id"), Kernels.charNgramHashes(col("t"), 8).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val h = out(1L)
    assert(h.length == 17 - 8 + 1)
    assert(h(0) == h(9), "same 8-char window must hash equal")
    assert(h(0) != h(1), "shifted window must differ")
    assert(out(2L).isEmpty, "len < n yields no windows")
  }

  test("char_ngram_hashes rejects a non-string child at analysis time") {
    val e = intercept[AnalysisException](
      Seq(1).toDF("n").select(Kernels.charNgramHashes(col("n"), 4)).queryExecution.analyzed)
    assert(e.getMessage.contains("char_ngram_hashes"))
  }

  // ---- kernel: cutSpans

  private def cut(text: String, starts: Seq[Int], n: Int): (String, Int, Int) = {
    val r = Seq((text, starts)).toDF("t", "s")
      .select(Kernels.cutSpans(col("t"), col("s"), n).as("c"))
      .select("c.*").collect()(0)
    (r.getString(0), r.getInt(1), r.getInt(2))
  }

  test("cutSpans merges overlapping AND adjacent windows into maximal spans") {
    // windows of 4 at 2 and 4 overlap -> one span [2,8); at 10 adjacent
    // to nothing -> own span [10,14)
    assert(cut("0123456789ABCDEF", Seq(2, 4, 10), 4) == ("0189EF", 2, 10))
    // adjacent: starts 2 and 6 touch ([2,6) + [6,10)) -> ONE span [2,10)
    assert(cut("0123456789ABCDEF", Seq(2, 6), 4) == ("01ABCDEF", 1, 8))
    // gap of one char keeps two spans and the char between them
    assert(cut("0123456789ABCDEF", Seq(2, 7), 4) == ("016BCDEF", 2, 8))
  }

  test("cutSpans clamps at end of string, handles full-coverage and empty starts") {
    assert(cut("0123456789", Seq(8), 4) == ("01234567", 1, 2))
    assert(cut("0123456789", Seq(0, 4, 8), 4) == ("", 1, 10))
    assert(cut("0123456789", Seq(), 4) == ("0123456789", 0, 0))
    // unsorted input is re-sorted defensively
    assert(cut("0123456789ABCDEF", Seq(10, 2, 4), 4) == ("0189EF", 2, 10))
  }

  test("cutSpans ignores hostile offsets: out-of-range, null elements, long overflow") {
    // past-the-end and negative offsets identify no window — they must
    // neither crash nor cut; null elements likewise (review findings)
    assert(cut("0123456789", Seq(15), 4) == ("0123456789", 0, 0))
    assert(cut("0123456789", Seq(-3), 4) == ("0123456789", 0, 0))
    assert(cut("0123456789", Seq(-3, 2, 15), 4) == ("016789", 1, 4))
    val viaSql = Seq(("0123456789", Seq(java.lang.Long.valueOf(2L), null,
        java.lang.Long.valueOf(1L + Int.MaxValue))))
      .toDF("t", "s")
      .select(Kernels.cutSpans(col("t"), col("s"), 4).as("c"))
      .select("c.*").collect()(0)
    assert((viaSql.getString(0), viaSql.getInt(1), viaSql.getInt(2)) ==
      ("016789", 1, 4))
  }

  test("cutSpans: null starts passes text through; null text nulls the row") {
    val df = Seq(("keepme", false), (null: String, true)).toDF("t", "isNull")
      .withColumn("s", when(lit(false), array(lit(1))).otherwise(lit(null)))
    val rows = df.select(col("isNull"), Kernels.cutSpans(col("t"), col("s"), 4).as("c"))
      .collect()
    val byNull = rows.map(r => r.getBoolean(0) -> r).toMap
    assert(byNull(false).getStruct(1).getString(0) == "keepme")
    assert(byNull(false).getStruct(1).getInt(1) == 0)
    assert(byNull(true).isNullAt(1))
  }

  test("cut_spans rejects wrong input types at analysis time") {
    val e = intercept[AnalysisException](
      Seq((1, Seq(1))).toDF("t", "s")
        .select(Kernels.cutSpans(col("t"), col("s"), 4)).queryExecution.analyzed)
    assert(e.getMessage.contains("cut_spans"))
  }

  // ---- operator

  private val passage = "the quick brown fox jumps over the lazy dog again and again"

  private def rng(seed: Long): () => Long = {
    var h = seed * 0x9E3779B97F4A7C15L
    () => { h ^= h << 13; h ^= h >>> 7; h ^= h << 17; h }
  }

  test("a passage planted in two docs is cut from BOTH; unique text survives untouched") {
    val docs = Seq(
      (1L, s"unique preamble one. $passage trailing A"),
      (2L, s"different lead-in text, $passage trailing B"),
      (3L, "no duplication in this document at all, nothing shared")).toDF("doc_id", "text")
    val out = ExactSubstr.dedup(docs, "doc_id", "text", minLen = 40)
      .select("doc_id", "clean_text", "dup_spans", "removed_chars")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(3L) == ("no duplication in this document at all, nothing shared", 0, 0))
    for (id <- Seq(1L, 2L)) {
      val (clean, spans, removed) = out(id)
      assert(spans == 1, s"doc $id")
      assert(!clean.contains("quick brown fox"), s"doc $id: $clean")
      assert(removed >= passage.length, s"doc $id removed only $removed")
    }
    // the non-duplicated fringes survive
    assert(out(1L)._1.startsWith("unique preamble one."))
    assert(out(2L)._1.startsWith("different lead-in text,"))
  }

  test("a WITHIN-doc repeat is duplicated content too (both occurrences cut)") {
    val docs = Seq(
      (1L, s"$passage and between them $passage"),
      (2L, "completely unrelated second document to keep the corpus honest")).toDF("doc_id", "text")
    val out = ExactSubstr.dedup(docs, "doc_id", "text", minLen = 40)
      .where(col("doc_id") === 1L).select("clean_text", "dup_spans").collect()(0)
    assert(!out.getString(0).contains("quick brown fox"))
    assert(out.getInt(1) == 2)
  }

  test("duplicatedSpans profiles the maximal span text") {
    val docs = Seq(
      (1L, s"A $passage Z"),
      (2L, s"B $passage Y")).toDF("doc_id", "text")
    val spans = ExactSubstr.duplicatedSpans(docs, "doc_id", "text", minLen = 40)
      .collect()
    assert(spans.length == 2)
    for (r <- spans) {
      // the MAXIMAL shared span includes the spaces around the passage
      // ("A <p> Z" and "B <p> Y" share " <p> ", not just "<p>")
      val txt = r.getAs[String]("span_text")
      assert(txt == s" $passage ", txt)
      assert(r.getAs[Int]("span_start") == 1)
    }
  }

  test("cutAgainst cuts only reference-shared spans; reference-free docs pass through") {
    val corpus = Seq(
      (1L, s"my own intro then $passage and my own outro"),
      (2L, "entirely original writing with no benchmark overlap at all")).toDF("doc_id", "text")
    val reference = Seq(s"QUESTION: $passage ANSWER: 42").toDF("text")
    val out = ExactSubstr.cutAgainst(corpus, "doc_id", "text", reference, "text", minLen = 40)
      .select("doc_id", "clean_text", "dup_spans")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(2L) == ("entirely original writing with no benchmark overlap at all", 0))
    val (clean1, spans1) = out(1L)
    assert(spans1 == 1)
    assert(!clean1.contains("quick brown fox"))
    assert(clean1.startsWith("my own intro then") && clean1.endsWith("and my own outro"))
  }

  test("property: every removed span occurred >= 2 times; every kept char's window was unique") {
    val r = rng(41)
    // random word soup with heavy planted repetition across docs
    val phrases = (0 until 6).map(i =>
      (0 until 12).map(_ => "w" + (r() & 0xff)).mkString(" "))
    val docs = (1L to 30L).map { id =>
      val parts = (0 until 5).map { _ =>
        if ((r() & 3) == 0) phrases((r() & 0x7fffffff).toInt % phrases.length)
        else (0 until 10).map(_ => "u" + (r() & 0xffff)).mkString(" ")
      }
      (id, parts.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val L = 30
    val out = ExactSubstr.dedup(df, "doc_id", "text", minLen = L)
      .select("doc_id", "clean_text", "removed_chars").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getInt(2))).toList
    val orig = docs.toMap
    // corpus-wide window census over the ORIGINAL text
    val census = scala.collection.mutable.Map.empty[String, Int]
    for ((_, t) <- docs; i <- 0 to t.length - L)
      census.updateWith(t.substring(i, i + L))(c => Some(c.getOrElse(0) + 1))
    var removedTotal = 0
    for ((id, clean, removed) <- out) {
      removedTotal += removed
      assert(clean.length + removed == orig(id).length, s"doc $id length accounting")
      // reconstruct removed intervals by aligning clean against original
      // (clean is original minus intervals; verify via census instead:
      // every position whose window was globally unique must SURVIVE)
      // the removed chars are EXACTLY the union of duplicated windows
      // (island merging changes span counts, never the union)
      val t = orig(id)
      val coveredByDup = (0 to t.length - L)
        .filter(i => census(t.substring(i, i + L)) >= 2)
        .flatMap(i => i until i + L).toSet
      assert(removed == coveredByDup.size,
        s"doc $id removed $removed != duplicated cover ${coveredByDup.size}")
    }
    assert(removedTotal > 0, "the planted repetition must actually trigger cuts")
  }

  test("compiled cut path is bit-identical to the join path, on every column") {
    val r = rng(23)
    // 40 docs, a third of them quoting one of two reference passages
    // at random offsets inside otherwise-unique filler
    def filler(n: Int) = Array.fill(60)("w" + (r() & 0x3ff)).mkString(" ").take(n)
    val passages = Seq(passage, "zero one two three four five six seven eight nine ten eleven")
    val corpus = (1L to 40L).map { id =>
      val body =
        if (id % 3 == 0) s"${filler(30 + (id % 50).toInt)} ${passages((id % 2).toInt)} ${filler(40)}"
        else filler(120)
      (id, body)
    }.toDF("doc_id", "text")
    val reference = passages.map(p => s"frame $p frame").toDF("text")
    val joined = ExactSubstr.cutAgainst(corpus, "doc_id", "text", reference, "text", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3), r.getInt(4))).toSet
    val compiled = ExactSubstr.cutAgainstCompiled(corpus, "text",
      ExactSubstr.compileReference(reference, "text", minLen = 40), minLen = 40)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3), r.getInt(4))).toSet
    assert(compiled == joined)
    assert(compiled.exists(_._3 > 0), "the planted quotes must actually be cut")
  }

  test("compiled cut is one map-only projection (no Exchange, no Generate)") {
    val docs = Seq((1L, "some document text here")).toDF("doc_id", "text")
    val p = ExactSubstr.cutAgainstCompiled(docs, "text", Array(1L, 2L, 3L), minLen = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Generate"), p)
  }

  test("compileReference refuses an over-budget reference instead of broadcasting it") {
    val big = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      ExactSubstr.compileReference(big, "text", minLen = 4, maxGrams = 10))
    assert(e.getMessage.contains("maxGrams"))
  }

  test("plan: no cartesian product, one full-width shuffle on the gram hash") {
    val docs = Seq((1L, "x" * 100), (2L, "y" * 100)).toDF("doc_id", "text")
    val p = ExactSubstr.dedup(docs, "doc_id", "text", minLen = 40)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // gram-hash window + per-doc span grouping + docs join: <= 4 exchanges
    assert("Exchange".r.findAllIn(p).size <= 4, p)
  }
}
