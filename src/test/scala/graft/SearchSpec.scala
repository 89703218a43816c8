package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.text.Search

/** BM25 full-text search: distributed result vs an independent naive
  * driver-side computation, determinism under repartitioning, and the
  * plan shape that keeps it scalable. */
class SearchSpec extends GraftSpec {

  import org.apache.spark.sql.DataFrame

  private def fixture: (DataFrame, DataFrame) = {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "a hash join broadcasts the small table"),
      (3L, "hash hash hash join join partitions"),
      (4L, "sorting data before a merge join"),
      (5L, "the optimizer prunes parquet columns")).toDF("doc_id", "text")
    val qs = Seq((0L, "hash join"), (1L, "data")).toDF("query_id", "qtext")
    (docs, qs)
  }

  /** Naive single-threaded BM25 with the same quantization contract. */
  private def naive(docs: Seq[(Long, String)], query: Seq[String],
                    k1: Double = 1.2, b: Double = 0.75): Map[Long, Long] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = docs.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n.toDouble
    val terms = query.distinct
    docs.flatMap { case (id, _) =>
      val dl = toks(id).size
      val cis = terms.flatMap { t =>
        val tf = toks(id).count(_ == t)
        if (tf == 0) None
        else {
          val df = toks.values.count(_.contains(t))
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          val c = 1e6 * idf * (tf * (k1 + 1.0)) /
            (tf + k1 * ((1.0 - b) + (b * dl) / avgdl))
          Some(math.round(c))
        }
      }
      if (cis.isEmpty) None else Some(id -> cis.sum)
    }.toMap
  }

  test("bm25TopK matches an independent naive computation exactly") {
    val (docs, qs) = fixture
    val res = Search.bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    val docSeq = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    for ((qid, qtext) <- Seq((0L, "hash join"), (1L, "data"))) {
      val expect = naive(docSeq, qtext.split(" ").toSeq)
      val got = res.filter(_._1 == qid).map(r => r._2 -> r._3).toMap
      assert(got == expect, s"q$qid: $got vs $expect")
      // ranks follow (score desc, doc_id asc)
      val ranked = res.filter(_._1 == qid).sortBy(_._4)
      assert(ranked.map(_._3).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true })
    }
  }

  test("bm25TopK is deterministic under repartitioning and respects k") {
    val (docs, qs) = fixture
    def run(d: DataFrame) =
      Search.bm25TopK(d, "doc_id", "text", qs, "query_id", "qtext", k = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4))).toSet
    val a = run(docs)
    val b = run(docs.repartition(7))
    assert(a == b)
    assert(a.groupBy(_._1).values.forall(_.size <= 2))
  }

  test("query terms absent from the corpus contribute zero") {
    val (docs, qs0) = fixture
    import spark.implicits._
    val qs = Seq((0L, "hash join zzzunknown")).toDF("query_id", "qtext")
    val qsBase = Seq((0L, "hash join")).toDF("query_id", "qtext")
    def scores(q: DataFrame) =
      Search.bm25TopK(docs, "doc_id", "text", q, "query_id", "qtext", k = 10)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(scores(qs) == scores(qsBase))
  }

  test("tfidfTopTerms matches a naive computation, breaks ties by term, avoids windows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FormattedMode
    val docs = Seq(
      (1L, "spark spark spark shuffle"),
      (2L, "shuffle sort merge"),
      (3L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val out = Search.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // naive: tf * (ln((N+1)/(df+1)) + 1), micro-rounded
    def score(tf: Int, df: Int) = math.round(1e6 * tf * (math.log(4.0 / (df + 1.0)) + 1.0))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toList).toMap
    assert(byDoc(1L) == List(("spark", score(3, 1)), ("shuffle", score(1, 2))))
    assert(byDoc(2L).head._1 == "sort" || byDoc(2L).head._1 == "merge") // both df=1 tf=1: tie
    // doc 3: alpha and beta tie exactly (tf=2, df=1) → term order decides
    assert(byDoc(3L) == List(("alpha", score(2, 1)), ("beta", score(2, 1))))
    val p = Search.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("rrfFuse: hand-computed fusion, consensus beats single-ranker, ties by id") {
    import spark.implicits._
    // ranker A: doc 10 first, doc 20 second; ranker B: doc 20 first,
    // doc 30 second. doc 20 appears in both → should fuse on top.
    val a = Seq((0L, 10L, 1L), (0L, 20L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 20L, 1L), (0L, 30L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Search.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toList
      .sortBy(_._3)
    def c(rank: Long) = math.round(1e6 / (60.0 + rank))
    assert(got == List(
      (20L, c(2) + c(1), 1),  // consensus doc: both contributions
      (10L, c(1), 2),         // rank-1 in A only
      (30L, c(2), 3)), got.toString)
    // exact ties (same single rank in one ranker each) break by doc_id
    val t1 = Seq((0L, 7L, 1L)).toDF("query_id", "doc_id", "rank")
    val t2 = Seq((0L, 3L, 1L)).toDF("query_id", "doc_id", "rank")
    val tied = Search.rrfFuse(Seq(t1, t2), k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toList.sortBy(_._2)
    assert(tied == List((3L, 1), (7L, 2)), tied.toString)
  }

  test("hybridTopK surfaces docs either ranker likes and respects k") {
    import spark.implicits._
    val (docs, qs) = fixture
    // give every doc a vector; make doc 5's vector align with the probe
    def vec(seed: Int): Seq[Float] =
      Seq.tabulate(4)(i => (((seed * 31 + i * 7) % 10) + 1).toFloat)
    val corpus = docs.withColumn("embedding",
      typedLit(Seq.empty[Float])).drop("embedding")
      .collect().map(r => (r.getLong(0), r.getString(1), vec(r.getLong(0).toInt)))
      .toSeq.toDF("doc_id", "text", "embedding")
    val queries = qs.collect().map(r => (r.getLong(0), r.getString(1), vec(5)))
      .toSeq.toDF("query_id", "qtext", "qvec")
    // kPerRanker = 1: each ranker contributes exactly its best doc
    val out = Search.hybridTopK(corpus, "doc_id", "text", "embedding",
        queries, "query_id", "qtext", "qvec", k = 3, kPerRanker = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.groupBy(_._1).values.forall(_.length <= 3))
    // the probe equals doc 5's vector → doc 5 is semantic rank 1 for
    // every query and must surface, even where the lexical side never
    // retrieves it (doc 5 shares no term with q0 "hash join")
    assert(out.filter(_._1 == 0L).map(_._2).contains(5L), out.mkString(","))
    // the lexical best for q0 (doc 3: tf-heavy "hash ... join") also
    // surfaces — the fused list covers both modalities
    assert(out.filter(_._1 == 0L).map(_._2).contains(3L), out.mkString(","))
  }

  test("no tokenizer expression leaks into a pushed-down filter (Generate pitfall)") {
    import org.apache.spark.sql.execution.FormattedMode
    val (docs, qs) = fixture
    // a plain explode would infer a size-filter whose pushdown clones
    // the regexp tokenizer below the projection — pin that no Filter
    // node carries the tokenizer for the token-exploding operators
    val plans = Seq(
      Search.bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext", 5),
      Search.tfidfTopTerms(docs, "doc_id", "text", 5),
      graft.text.TextFunctions.chunkByTokens(docs, "doc_id", "text", 4, 1))
      .map(_.queryExecution.optimizedPlan.toString)
    plans.foreach { p =>
      val filterLines = p.linesIterator.filter(_.trim.startsWith("Filter")).toList
      assert(filterLines.forall(!_.contains("regexp_replace")),
        filterLines.mkString("\n"))
    }
  }

  test("bm25 plan: broadcast dictionary prune, no window, no cartesian blow-up") {
    val (docs, qs) = fixture
    val p = Search.bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext", k = 3)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }
}
