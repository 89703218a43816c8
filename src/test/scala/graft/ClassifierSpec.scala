package graft

import org.apache.spark.sql.functions._
import graft.text.Classifier

/** Naive Bayes quality classifier: hand-computed LLRs, unseen-token
  * signal, prior arithmetic, degenerate corpora, separation on a
  * realistic two-domain corpus. */
class ClassifierSpec extends GraftSpec {

  // train: pos "cat cat dog" (3 tokens), neg "dog bird" (2 tokens)
  // vocab: cat(2,0) dog(1,1) bird(0,1); tpos=3 tneg=2 V=3; prior=0
  private def tinyTrain = {
    import spark.implicits._
    Seq(("cat cat dog", "pos"), ("dog bird", "neg")).toDF("text", "cls")
  }

  test("per-token LLRs match the hand computation (micro-quantized)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat"), (2L, "dog"), (3L, "bird"), (4L, "fish"))
      .toDF("doc_id", "text")
    val out = Classifier.nbScore(docs, "doc_id", "text",
        tinyTrain, "text", col("cls") === "pos")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 916291L, out.toString)   // ln(3/6)-ln(1/5)
    assert(out(2L) == -182322L, out.toString)  // ln(2/6)-ln(2/5)
    assert(out(3L) == -875469L, out.toString)  // ln(1/6)-ln(2/5)
    assert(out(4L) == -182322L, out.toString)  // unseen: ln(1/6)-ln(1/5)
  }

  test("unseen tokens carry the token-mass asymmetry, not zero") {
    import spark.implicits._
    val docs = Seq((1L, "zzz zzz zzz")).toDF("doc_id", "text")
    val out = Classifier.nbScore(docs, "doc_id", "text",
        tinyTrain, "text", col("cls") === "pos").collect().head
    assert(out.getLong(2) == 3L * -182322L, out.toString)
  }

  test("prior and pred: doc counts shift the decision boundary") {
    import spark.implicits._
    // 3 pos docs vs 1 neg doc, same text → token LLRs are zero for a
    // doc of class-balanced tokens; prior = ln 3 decides alone
    val train = Seq(("x", true), ("x", true), ("x", true), ("x", false))
      .toDF("text", "lab")
    val docs = Seq((1L, "x"), (2L, "")).toDF("doc_id", "text")
    val rows = Classifier.nbScore(docs, "doc_id", "text",
        train, "text", col("lab"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val prior = math.round(1e6 * math.log(3.0))
    // x: c_pos=3, c_neg=1, tpos=3, tneg=1, V=1 →
    // LLR = ln(4/4) - ln(2/2) = 0
    assert(rows(1L) == ((1L, 0L, prior, 1L)), rows.toString)
    // empty doc: n_tokens 0, llr 0, score = prior alone
    assert(rows(2L) == ((0L, 0L, prior, 1L)), rows.toString)
  }

  test("null text and null labels take the documented defaults") {
    import spark.implicits._
    val train = Seq(("cat", java.lang.Boolean.TRUE),
      ("dog", java.lang.Boolean.FALSE),
      ("bird", null: java.lang.Boolean)).toDF("text", "lab")
    val docs = Seq((1L, null: String)).toDF("doc_id", "text")
    // null label trains as negative: bird lands in c_neg, so the model
    // evaluates (no single-class raise) and an all-null doc scores
    // prior-only
    val out = Classifier.nbScore(docs, "doc_id", "text",
        train, "text", col("lab")).collect().head
    assert(out.getLong(1) == 0L && out.getLong(2) == 0L, out.toString)
    assert(out.getLong(3) == math.round(1e6 * math.log(1.0 / 2.0)), out.toString)
  }

  test("a single-class corpus raises a descriptive error") {
    import spark.implicits._
    val train = Seq(("cat", true), ("dog", true)).toDF("text", "lab")
    val docs = Seq((1L, "cat")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Classifier.nbScore(docs, "doc_id", "text",
        train, "text", col("lab")).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("class"),
      e.toString)
  }

  test("separates two vocabularies with a wide margin; model frame is inspectable") {
    import spark.implicits._
    val train = ((1 to 40).map(i => (s"spark shuffle partition join stage t$i", true)) ++
      (1 to 40).map(i => (s"recipe oven sugar butter flour r$i", false)))
      .toDF("text", "lab")
    val docs = Seq(
      (1L, "spark join shuffle stage"),
      (2L, "sugar butter recipe oven")).toDF("doc_id", "text")
    val scored = Classifier.nbScore(docs, "doc_id", "text",
        train, "text", col("lab"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(scored(1L)._2 == 1L && scored(2L)._2 == 0L, scored.toString)
    assert(scored(1L)._1 > 2_000_000L && scored(2L)._1 < -2_000_000L,
      scored.toString) // > 2 nats of margin each way
    val model = Classifier.nbModel(train, "text", col("lab"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(model("spark") == ((40L, 0L)) && model("butter") == ((0L, 40L)),
      model.toString)
  }

  test("broadcast path scores bit-identically to the join path") {
    import spark.implicits._
    val train = ((1 to 30).map(i => (s"spark shuffle partition join t$i", true)) ++
      (1 to 20).map(i => (s"recipe oven sugar butter r$i", false)))
      .toDF("text", "lab")
    val docs = Seq(
      (1L, "spark join unseen0 words here"),
      (2L, "sugar butter"), (3L, ""), (4L, null: String),
      (5L, "completely novel vocabulary only")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val joined = rows(Classifier.nbScore(docs, "doc_id", "text",
      train, "text", col("lab")))
    val m = Classifier.compileNb(train, "text", col("lab"))
    val bcast = rows(Classifier.nbScoreBroadcast(docs, "doc_id", "text", m))
    assert(joined == bcast, s"join=$joined bcast=$bcast")
    // and the scores are partition-count invariant (long sums)
    val repart = rows(Classifier.nbScoreBroadcast(
      docs.repartition(7), "doc_id", "text", m))
    assert(repart == bcast)
  }

  test("compileNb refuses a corpus-sized vocabulary") {
    import spark.implicits._
    val train = Seq(("a b c d e f", true), ("g h i j", false)).toDF("text", "lab")
    val e = intercept[IllegalArgumentException] {
      Classifier.compileNb(train, "text", col("lab"), maxVocab = 3L)
    }
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
  }

  test("broadcast scoring composes on a stream unchanged (stateless projection)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val train = ((1 to 20).map(i => (s"spark shuffle join t$i", true)) ++
      (1 to 20).map(i => (s"oven sugar butter r$i", false))).toDF("text", "lab")
    val m = Classifier.compileNb(train, "text", col("lab"))
    val batchDocs = Seq((1L, "spark shuffle"), (2L, "sugar oven"), (3L, ""))
      .toDF("doc_id", "text")
    val expect = Classifier.nbScoreBroadcast(batchDocs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val scored = Classifier.nbScoreBroadcast(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", m)
    val q = scored.writeStream.format("memory").queryName("nb_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, "spark shuffle"), (2L, "sugar oven"), (3L, ""))
      q.processAllAvailable()
      val got = spark.table("nb_stream")
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == expect, s"stream=$got batch=$expect")
    } finally q.stop()
  }

  test("streamQualityFilter keeps the batch keep-set with original columns") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val train = ((1 to 20).map(i => (s"spark shuffle join t$i", true)) ++
      (1 to 20).map(i => (s"oven sugar butter r$i", false))).toDF("text", "lab")
    val m = Classifier.compileNb(train, "text", col("lab"))
    val rows = Seq((1L, "spark shuffle join", "a"), (2L, "sugar oven", "b"),
      (3L, "spark", "c"))
    val batchKeep = Classifier.withNbScore(
        rows.toDF("doc_id", "text", "tag"), "text", m)
      .filter(col("pred") === 1L).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val filtered = graft.streaming.StreamVerbs.streamQualityFilter(
      in.toDF().toDF("doc_id", "text", "tag"), "text", m)
    val q = filtered.writeStream.format("memory").queryName("nb_filter")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("nb_filter").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(got.map(_._1) == batchKeep, s"stream=$got batch=$batchKeep")
      // original columns (tag) survive the verb
      assert(got.forall { case (id, tag) => rows.exists(r => r._1 == id && r._3 == tag) })
    } finally q.stop()
  }

  test("withNbScore refuses a column clash") {
    import spark.implicits._
    val train = Seq(("a", true), ("b", false)).toDF("text", "lab")
    val m = Classifier.compileNb(train, "text", col("lab"))
    val docs = Seq(("x", 1L)).toDF("text", "pred")
    val e = intercept[IllegalArgumentException] {
      Classifier.withNbScore(docs, "text", m)
    }
    assert(e.getMessage.contains("pred"), e.getMessage)
  }
}
