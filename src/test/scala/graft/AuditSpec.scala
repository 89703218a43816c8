package graft

import org.apache.spark.sql.functions._
import graft.operators.Audit

/** operators.Audit — one-pass pipeline accounting via Observations. */
class AuditSpec extends GraftSpec {

  import spark.implicits._

  test("gate metrics ride one action; chain continuity holds; null predicates drop") {
    val docs = Seq(
      (1L, "en", 10, "keep"),
      (2L, "en", 300, "keep"),
      (3L, "de", 500, "keep"),
      (4L, "en", 400, null.asInstanceOf[String]), // null gate-3 predicate
      (5L, "en", 250, "keep")).toDF("id", "lang", "n", "tag")
    // baseline: the same gated chain WITHOUT observations — however
    // many jobs the action costs there (AQE splits a count), the
    // audited chain must cost the SAME; the metrics ride for free.
    // Counted with a DEDICATED listener, not statusTracker job-group
    // deltas: the tracker retains a bounded job list (spark.ui
    // .retainedJobs), so after thousands of suite jobs the delta
    // arithmetic saturates/garbles (a full `sbt test` measured
    // baseline = -98 where the isolated suite read 1). The listener
    // bus is async — poll until the count stabilizes after the action.
    def countJobs(action: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        action
        var prev = -1; var cur = n.get; var spins = 0
        while (cur != prev && spins < 50) {
          Thread.sleep(100); prev = cur; cur = n.get; spins += 1
        }
        cur
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val plain = docs.filter(col("n") >= 200)
      .filter(col("lang") === "en").filter(col("tag") === "keep")
    val baseline = countJobs { plain.count(); () }

    val audit = new Audit.Pipeline()
    val g1 = audit.gate(docs, "size", col("n") >= 200)
    val g2 = audit.gate(g1, "english", col("lang") === "en")
    val g3 = audit.gate(g2, "tagged", col("tag") === "keep") // null → dropped
    var survivors = 0L
    val audited = countJobs { survivors = g3.count(); () }
    assert(survivors == 2) // ids 2, 5
    val rep = audit.report()
    assert(rep == Seq(("size", 5L, 4L), ("english", 4L, 3L), ("tagged", 3L, 2L)))
    // continuity: each gate's input is the previous gate's output
    rep.sliding(2).foreach { case Seq((_, _, out), (_, in, _)) =>
      assert(in == out)
    }
    assert(audited <= baseline,
      s"audit must not add jobs: audited=$audited baseline=$baseline")
  }

  test("snapshotDiff: statuses, null-text semantics, delta-only default, summary") {
    import graft.operators.SnapshotDiff
    val oldC = Seq(
      (1L, "same"), (2L, "will change"), (3L, "will be removed"),
      (4L, null.asInstanceOf[String]), (5L, "goes null")).toDF("id", "text")
    val newC = Seq(
      (1L, "same"), (2L, "changed!"), (6L, "brand new"),
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String])).toDF("id", "text")
    val d = SnapshotDiff.diff(oldC, newC, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 1 unchanged (absent); 4 null→null unchanged (absent)
    assert(d == Map(2L -> "changed", 3L -> "removed", 5L -> "changed", 6L -> "added"))
    val full = SnapshotDiff.diff(oldC, newC, "id", "text", includeUnchanged = true)
    assert(full.count() == 6)
    val s = SnapshotDiff.summary(oldC, newC, "id", "text").collect()(0)
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) == ((1L, 1L, 2L, 2L)))
    // the only corpus-wide movement is (id, hash): no text in the shuffle
    val p = SnapshotDiff.diff(oldC, newC, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("duplicate gate names are refused; reportFrame materializes the metrics table") {
    val docs = Seq((1L, 10), (2L, 300)).toDF("id", "n")
    val audit = new Audit.Pipeline()
    val g = audit.gate(docs, "size", col("n") >= 200)
    val e = intercept[IllegalArgumentException](
      audit.gate(g, "size", col("n") >= 300))
    assert(e.getMessage.contains("duplicate"))
    // a nondeterministic gate would make the observation and the
    // filter disagree — refused at build time
    val e2 = intercept[IllegalArgumentException](
      audit.gate(g, "sampled", rand(42) < 0.5))
    assert(e2.getMessage.contains("nondeterministic"))
    val frame = audit.reportFrame(spark,
      g.write.format("noop").mode("overwrite").save())
    val rows = frame.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("size", 2L, 1L)))
  }

  test("indexHealth surfaces the append signals as metric rows with remediation") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    def metric(df: org.apache.spark.sql.DataFrame, component: String, m: String) =
      df.filter(col("component") === component && col("metric") === m)
        .select("value", "breached", "recommended_action").head()
    // --- near-dup index: bucket pile-up → compaction recommended
    val nd = tmp("healthnd")
    val docs = Seq((0L, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    graft.ml.Dedup.buildNearDupIndex(docs, "doc_id", "text", nd,
      numHashes = 32, bands = 8, shingleSize = 4)
    (1 to 8).foreach { g =>
      graft.ml.Dedup.appendToNearDupIndex(
        Seq((1000L * g, "the quick brown fox jumps over the lazy dog again"))
          .toDF("doc_id", "text"), "doc_id", "text", nd)
    }
    val h1 = Audit.indexHealth(spark, nd)
    val pile = metric(h1, "neardup", "max_anchor_rows_per_bucket")
    assert(pile.getDouble(0) == 9.0 && pile.getBoolean(1), h1.collect().mkString("\n"))
    assert(pile.getString(2).contains("compactNearDupIndex"))
    // after compacting, the same report reads healthy
    graft.ml.Dedup.compactNearDupIndex(spark, nd)
    val h1b = Audit.indexHealth(spark, nd)
    val pileB = metric(h1b, "neardup", "max_anchor_rows_per_bucket")
    assert(pileB.getDouble(0) == 1.0 && !pileB.getBoolean(1))
    assert(pileB.isNullAt(2), "healthy metric still carries an action")
    // --- IVF index: drifted append → rebuild recommended
    val ivf = tmp("healthivf")
    val rng = new scala.util.Random(5)
    val centers = Array.fill(10)(Array.fill(8)(rng.nextGaussian()))
    val a = (0 until 200).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + 0.02 * rng.nextGaussian()).toFloat).toSeq)
    }.toDF("id", "vec")
    graft.ml.Similarity.buildIvfIndex(a, "id", "vec", ivf, nLists = 8)
    val shifted = (0 until 50).map(i =>
      (9000L + i, Seq.fill(8)(rng.nextGaussian().toFloat))).toDF("id", "vec")
    graft.ml.Similarity.appendToIvfIndex(shifted, "id", "vec", ivf)
    val h2 = Audit.indexHealth(spark, ivf)
    assert(metric(h2, "ivf", "generations").getDouble(0) == 2.0)
    val drift = metric(h2, "ivf", "latest_drift")
    assert(drift.getDouble(0) > 1.5 && drift.getBoolean(1),
      h2.collect().mkString("\n"))
    assert(drift.getString(2).contains("rebuildIvfIndex"))
    assert(metric(h2, "ivf", "lists").getDouble(0) == 8.0)
    // the PQ layout reports under its own component with the PQ op
    val pq = tmp("healthpq")
    graft.ml.Pq.buildIvfPqIndex(a, "id", "vec", pq, m = 4, pqK = 32,
      nLists = 8, iters = 0)
    graft.ml.Pq.appendToIvfPqIndex(shifted, "id", "vec", pq)
    val h3 = Audit.indexHealth(spark, pq)
    val drift3 = metric(h3, "ivf_pq", "latest_drift")
    assert(drift3.getBoolean(1) && drift3.getString(2).contains("rebuildIvfPqIndex"),
      h3.collect().mkString("\n"))
    // not an index → a clear refusal, not an empty frame
    val e = intercept[IllegalArgumentException](
      Audit.indexHealth(spark, tmp("healthnone")))
    assert(e.getMessage.contains("no graft index layout"), e.getMessage)
  }
}
