package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer training + inference (text.Bpe, functions
  * .BpeEncodeExpr): the distributed trainer must match an independent
  * driver-side reference implementation move for move, and encoding
  * must round-trip. */
class BpeSpec extends GraftSpec {

  import spark.implicits._

  /** Independent reference: the textbook Sennrich loop over a word-
    * frequency map, with the SAME tie-break (count desc, pair asc). */
  private def refTrain(freqs: Map[String, Int], k: Int,
                       minCount: Long = 2L): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Int] = freqs.map { case (w, n) =>
      (w.map(_.toString).toVector :+ Bpe.EndOfWord) -> n }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < k && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; i <- 0 until syms.size - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val best = if (pc.isEmpty) None
        else Some(pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) })
      best match {
        case Some(((a, b), c)) if c >= minCount =>
          merges += ((a, b))
          vocab = vocab.map { case (syms, n) =>
            val nb = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.size) {
              if (j < syms.size - 1 && syms(j) == a && syms(j + 1) == b) {
                nb += a + b; j += 2
              } else { nb += syms(j); j += 1 }
            }
            nb.toVector -> n
          }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  private val classicFreqs =
    Map("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)

  private def classicDf = {
    val words = classicFreqs.toSeq.sortBy(_._1)
      .flatMap { case (w, n) => Seq.fill(n)(w) }
    // spread across several rows so the aggregation actually reduces
    words.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("trainBpe matches the independent reference on the classic corpus") {
    val got = Bpe.trainBpe(classicDf, "text", numMerges = 10)
    val want = refTrain(classicFreqs, 10)
    assert(got == want, s"\ngot  $got\nwant $want")
    // sanity on the classic first merges: 'es' (9) then 'est' (9)
    assert(got.take(2) == Seq(("e", "s"), ("es", "t")), got.toString)
  }

  test("trainBpe is deterministic under repartitioning") {
    val a = Bpe.trainBpe(classicDf, "text", 6)
    val b = Bpe.trainBpe(classicDf.repartition(7), "text", 6)
    assert(a == b)
  }

  test("encodeBpe applies merges in rank order; unknown words stay chars") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord),
      ("l", "o"), ("lo", "w"))
    val enc = Seq("Lowest low unk").toDF("text")
      .select(Bpe.encodeBpe(col("text"), merges).as("e"))
      .head.getSeq[String](0)
    assert(enc == Seq("low", "est</w>", "low", "</w>",
      "u", "n", "k", "</w>"), enc.toString)
  }

  test("encodeBpe duplicate pair in the merge table keeps its FIRST rank") {
    // training can re-emit a pair whose adjacency a later merge
    // recreates; last-wins ranking would apply (b,c) before (a,b) here
    val merges = Seq(("a", "b"), ("b", "c"), ("a", "b"))
    val enc = Seq("abc").toDF("text")
      .select(Bpe.encodeBpe(col("text"), merges)).head.getSeq[String](0)
    assert(enc == Seq("ab", "c", Bpe.EndOfWord), enc.toString)
  }

  test("mergeAdjacent resolves overlaps leftmost: aaa under (a,a) -> [aa, a]") {
    val out = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
      .select(Bpe.mergeAdjacent(col("syms"), "a", "a")).head.getSeq[String](0)
    assert(out == Seq("aa", "a"), out.toString)
  }

  test("adjacentPairCounts: weighted, and 1-symbol words contribute nothing") {
    val vocab = Seq(("ab", 3L, Seq("a", "b", "</w>")),
      ("fused", 7L, Seq("fused</w>"))).toDF("word", "n", "syms")
    val pc = Bpe.adjacentPairCounts(vocab).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pc == Map(("a", "b") -> 3L, ("b", "</w>") -> 3L))
  }

  test("encoded subwords reassemble to the normalized text (losslessness)") {
    val docs = Seq("The  quick brown fox", "jumps OVER the lazy dog",
      "", "   ", "punctuation, too!").toDF("text")
    val merges = Bpe.trainBpe(docs, "text", 12, minCount = 1L)
    val rt = docs.select(
      graft.text.TextFunctions.normalizeText(col("text")).as("norm"),
      trim(regexp_replace(
        array_join(Bpe.encodeBpe(col("text"), merges), ""),
        Bpe.EndOfWord, " ")).as("rt")).collect()
    rt.foreach(r => assert(r.getString(0) == r.getString(1),
      s"'${r.getString(0)}' != '${r.getString(1)}'"))
  }
}
