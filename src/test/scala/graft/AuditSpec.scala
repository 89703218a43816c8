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
    // audited chain must cost the SAME; the metrics ride for free
    def jobs(): Int = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val plain = docs.filter(col("n") >= 200)
      .filter(col("lang") === "en").filter(col("tag") === "keep")
    val b0 = jobs(); plain.count(); val baseline = jobs() - b0

    val audit = new Audit.Pipeline()
    val g1 = audit.gate(docs, "size", col("n") >= 200)
    val g2 = audit.gate(g1, "english", col("lang") === "en")
    val g3 = audit.gate(g2, "tagged", col("tag") === "keep") // null → dropped
    val before = jobs()
    val survivors = g3.count()
    val audited = jobs() - before
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
}
