package graft

import org.apache.spark.sql.functions._
import graft.ml.Dedup

/** ml.Dedup.keepBestPerCluster — quality-aware cluster representative
  * selection: highest score wins, ties to the smallest id, singletons
  * keep themselves, all-null clusters fall back to min id, null ids
  * and column collisions refuse. */
class KeepBestSpec extends GraftSpec {

  import spark.implicits._

  // pair graph: {1,2,3} one cluster, {10,11} another; 20 is a
  // singleton (absent from the labels frame entirely)
  private def labels = Dedup.connectedComponents(
    Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b"))

  test("highest score wins; ties break to the smallest id; singletons keep themselves") {
    val df = Seq(
      (1L, 5.0), (2L, 9.0), (3L, 9.0),  // tie at 9.0 → id 2
      (10L, 1.0), (11L, 7.0),           // 11 wins outright
      (20L, 0.5)                        // singleton
    ).toDF("doc_id", "score")
    val kept = Dedup.keepBestPerCluster(df, "doc_id", "score", labels)
      .collect().map(r => (r.getAs[Long]("label"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"))).sortBy(_._1)
    assert(kept.toSeq == Seq((1L, 2L, 9.0), (10L, 11L, 7.0), (20L, 20L, 0.5)),
      kept.mkString(","))
  }

  test("a cluster whose scores are ALL null keeps its smallest id; mixed nulls lose to any score") {
    val df = Seq(
      (1L, None), (2L, None), (3L, None),            // all null → min id 1
      (10L, None), (11L, Some(0.0)),                 // 0.0 beats null
      (20L, None)
    ).toDF("doc_id", "score")
    val kept = Dedup.keepBestPerCluster(df, "doc_id", "score", labels)
      .collect().map(r => (r.getAs[Long]("label"), r.getAs[Long]("doc_id")))
      .sortBy(_._1)
    assert(kept.toSeq == Seq((1L, 1L), (10L, 11L), (20L, 20L)), kept.mkString(","))
  }

  test("every df column survives on the representative row") {
    val df = Seq((1L, 2.0, "keepme-a"), (2L, 8.0, "keepme-b"), (20L, 1.0, "solo"))
      .toDF("doc_id", "score", "text")
    val kept = Dedup.keepBestPerCluster(df, "doc_id", "score", labels)
    assert(kept.columns.toSeq == Seq("label", "doc_id", "score", "text"))
    val byId = kept.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(byId == Map(2L -> "keepme-b", 20L -> "solo"), byId.toString)
  }

  test("null ids and clashing column names refuse") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val withNull = Seq((Some(1L), 1.0), (None, 2.0)).toDF("doc_id", "score")
    val e = intercept[Exception](
      Dedup.keepBestPerCluster(withNull, "doc_id", "score", labels).collect())
    assert(msgs(e).exists(_.contains("null doc_id")), msgs(e).take(3).mkString(" | "))
    val clash = Seq((1L, 1.0, "x")).toDF("doc_id", "score", "label")
    val e2 = intercept[IllegalArgumentException](
      Dedup.keepBestPerCluster(clash, "doc_id", "score", labels))
    assert(e2.getMessage.contains("label"))
  }

  test("minhashDedupCC keepBestBy keeps the best-scoring cluster member, default keeps min id") {
    // three exact copies of one text + one distinct doc; copy id 7
    // carries the top quality score
    val df = Seq(
      (5L, "the quick brown fox jumps over the lazy dog again and again", 0.2),
      (6L, "the quick brown fox jumps over the lazy dog again and again", 0.4),
      (7L, "the quick brown fox jumps over the lazy dog again and again", 0.9),
      (30L, "a completely different document about distributed dataframes", 0.1)
    ).toDF("doc_id", "text", "quality")
    val byScore = Dedup.minhashDedupCC(df, "doc_id", "text",
        keepBestBy = Some("quality"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byScore == Set(7L, 30L), byScore.toString)
    val byMin = Dedup.minhashDedupCC(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byMin == Set(5L, 30L), byMin.toString)
    // both variants return exactly df's columns
    assert(Dedup.minhashDedupCC(df, "doc_id", "text",
      keepBestBy = Some("quality")).columns.toSeq == df.columns.toSeq)
  }

  test("splitByCluster: cluster members share a split; singletons match plain hashSplit") {
    import graft.ml.Sampling
    val ids = ((1L to 3L) ++ Seq(10L, 11L) ++ (20L to 80L)).toSeq
    val df = ids.map(Tuple1(_)).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.splitByCluster(df, "doc_id", labels, splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == ids.toSet)
    // whole clusters move together — the leakage-safety contract
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(got(10L) == got(11L))
    // cluster members draw on the LABEL's hash (ids 2,3 land where 1 does)
    val plain = Sampling.hashSplit(df, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(2L) == plain(1L) && got(11L) == plain(10L))
    // singletons are exactly hashSplit
    (20L to 80L).foreach(i => assert(got(i) == plain(i), s"singleton $i moved"))
    // with enough singletons, all three splits are populated
    assert(got.values.toSet == Set("train", "val", "test"), got.values.toSet.toString)
    // drop-in hashSplit replacement: df's column ORDER is preserved
    // (the using-column join would otherwise hoist the id first)
    val wide = ids.map(i => (s"t$i", i)).toDF("text", "doc_id")
    assert(Sampling.splitByCluster(wide, "doc_id", labels, splits)
      .columns.toSeq == Seq("text", "doc_id", "split"))
  }

  test("matches a driver-side reference on a random instance (deterministic)") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 60).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val scores = (0L until 50L).map(i => (i, (rnd.nextInt(5)).toDouble))
    val labels = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
    val labMap = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = scores
      .groupBy { case (id, _) => labMap.getOrElse(id, id) }
      .map { case (lab, members) =>
        val bestScore = members.map(_._2).max
        (lab, members.filter(_._2 == bestScore).map(_._1).min)
      }.toSet
    val got = Dedup.keepBestPerCluster(scores.toDF("id", "s"), "id", "s", labels)
      .collect().map(r => (r.getAs[Long]("label"), r.getAs[Long]("id"))).toSet
    assert(got == expect, s"diff: ${(got diff expect) ++ (expect diff got)}")
  }
}
