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

  test("an empty training corpus raises a descriptive error, not null scores") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[Exception] {
      LangModel.unigramXent(docs, "doc_id", "text", empty, "text").collect()
    }
    assert(e.getMessage.contains("no tokens"), e.getMessage)
  }
}
