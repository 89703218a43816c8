package graft

import org.apache.spark.sql.functions._
import graft.text.LangModel

/** Unigram LM scoring: naive-exact values, in-domain vs out-of-domain
  * separation, OOV handling, empty docs, self-training. */
class LangModelSpec extends GraftSpec {

  test("surprisals match a naive computation exactly (micro-quantized)") {
    import spark.implicits._
    val train = Seq("spark shuffle join", "spark scan filter").toDF("text")
    val docs = Seq((1L, "spark join"), (2L, "zebra")).toDF("doc_id", "text")
    val out = LangModel.unigramXent(docs, "doc_id", "text", train, "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // model: total=6 tokens, V=5 → p(spark)=(2+1)/11, p(join)=(1+1)/11,
    // OOV zebra=(0+1)/11
    def c(p: Double) = math.round(-1e6 * math.log(p))
    assert(out(1L) == ((2L, c(3.0 / 11) + c(2.0 / 11))), out.toString)
    assert(out(2L) == ((1L, c(1.0 / 11))), out.toString)
  }

  test("in-domain text scores lower cross-entropy than out-of-domain") {
    import spark.implicits._
    val train = (1 to 50).map(i =>
      s"spark shuffle partition executor stage task broadcast join scan filter row$i")
      .toDF("text")
    val docs = Seq(
      (1L, "spark shuffle join filter scan broadcast"),
      (2L, "marmalade recipes require oranges sugar pectin")).toDF("doc_id", "text")
    val xents = LangModel.unigramXent(docs, "doc_id", "text", train, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(xents(1L) < xents(2L) - 1.0, xents.toString) // clear margin in nats
  }

  test("gram-less and null-text docs survive with zero counts; self-training works") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb aa"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val out = LangModel.unigramXent(docs, "doc_id", "text", docs, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(2L) == ((0L, 0L, 0.0)), out.toString)
    assert(out(3L) == ((0L, 0L, 0.0)), out.toString) // not size(null) = -1
    assert(out(1L)._1 == 3L && out(1L)._3 > 0.0)
  }

  test("bigram surprisals match a naive computation; word order matters") {
    import spark.implicits._
    val train = Seq("a b c", "a b d").toDF("text")
    val docs = Seq(
      (1L, "a b"),       // seen bigram (count 2)
      (2L, "b a"),       // REVERSED: unseen bigram, seen context b
      (3L, "z q"),       // unseen context entirely
      (4L, "a")).toDF("doc_id", "text") // no transitions
    val out = LangModel.bigramXent(docs, "doc_id", "text", train, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // V = 4 (a,b,c,d); ctx(a)=2, ctx(b)=2; c(a b)=2, c(b a)=0, ctx(z)=0
    def c(cnt: Int, ctx: Int) = math.round(-1e6 * math.log((cnt + 1.0) / (ctx + 4.0)))
    assert(out(1L) == ((1L, c(2, 2))), out.toString)
    assert(out(2L) == ((1L, c(0, 2))), out.toString)
    assert(out(3L) == ((1L, c(0, 0))), out.toString)
    assert(out(4L) == ((0L, 0L)), out.toString)
    // the reversed pair is more surprising than the attested one —
    // exactly what the unigram model CANNOT see
    assert(out(2L)._2 > out(1L)._2)
    val uni = LangModel.unigramXent(docs, "doc_id", "text", train, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uni(1L) == uni(2L)) // unigram is order-blind
  }

  test("chunkByTokens: windows, overlap, reconstruction, edge docs") {
    import spark.implicits._
    import graft.text.TextFunctions
    val words = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words), (2L, "a b"), (3L, ""), (4L, null: String))
      .toDF("doc_id", "text")
    val out = TextFunctions.chunkByTokens(docs, "doc_id", "text",
        maxTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    // doc 1: stride 3 → chunks at 0,3,6 cover [1..4],[4..7],[7..10]
    assert(out((1L, 0L)) == ((4L, "w1 w2 w3 w4")), out.toString)
    assert(out((1L, 1L)) == ((4L, "w4 w5 w6 w7")), out.toString)
    assert(out((1L, 2L)) == ((4L, "w7 w8 w9 w10")), out.toString)
    assert(!out.contains((1L, 3L)))
    // consecutive chunks share exactly `overlap` tokens; the union of
    // chunk tokens reconstructs the document
    val recon = (0L to 2L).flatMap(k => out((1L, k))._2.split(" ").drop(if (k == 0) 0 else 1))
    assert(recon == (1 to 10).map(i => s"w$i"), recon.toString)
    // short / empty / null docs: one chunk each, corpus fully covered
    assert(out((2L, 0L)) == ((2L, "a b")))
    assert(out((3L, 0L)) == ((0L, "")))
    assert(out((4L, 0L)) == ((0L, "")))
    assert(out.keySet.map(_._1) == Set(1L, 2L, 3L, 4L))
    // contract guards
    intercept[IllegalArgumentException] {
      TextFunctions.chunkByTokens(docs, "doc_id", "text", 4, overlap = 4)
    }
  }

  test("an empty training corpus raises a descriptive error, not null scores") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[Exception] {
      LangModel.unigramXent(docs, "doc_id", "text", empty, "text").collect()
    }
    assert(e.getMessage.contains("no tokens"), e.getMessage)
    val e2 = intercept[Exception] {
      LangModel.bigramXent(docs, "doc_id", "text", empty, "text").collect()
    }
    assert(e2.getMessage.contains("no tokens"), e2.getMessage)
  }
}
