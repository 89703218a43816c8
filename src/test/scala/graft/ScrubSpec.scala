package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.text.Scrub

/** PII scrubbing: detection, redaction, overlap semantics, idempotence,
  * and the map-only plan. */
class ScrubSpec extends GraftSpec {

  private def run(texts: String*) = {
    import spark.implicits._
    Scrub.redactPii(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"), "text")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5))).toSeq
  }

  test("emails, IPs and intl phones are counted and redacted") {
    val Seq(a) = run("mail bob.smith+x@corp.example.org from 192.168.0.1 or call +4915123456789 now")
    assert(a == ((1L, 1L, 1L,
      "mail <EMAIL> from <IP> or call <PHONE> now")), a.toString)
  }

  test("clean text passes through untouched with zero counts") {
    val Seq(a) = run("no personal data here, just 12.5 degrees and a plus + sign")
    assert(a == ((0L, 0L, 0L,
      "no personal data here, just 12.5 degrees and a plus + sign")), a.toString)
  }

  test("an IPv4-shaped host is not an email (alphabetic TLD required) but its IP is caught") {
    val Seq(a) = run("root@10.1.2.3 did it")
    assert(a._1 == 0L && a._2 == 1L, a.toString)
    assert(a._4 == "root@<IP> did it", a.toString)
    // a real email whose domain merely CONTAINS digits is still an email
    val Seq(b) = run("ping admin@host42.example.net ok")
    assert(b._1 == 1L && b._2 == 0L, b.toString)
    assert(b._4 == "ping <EMAIL> ok", b.toString)
  }

  test("redaction is idempotent and national phone formats are left alone") {
    import spark.implicits._
    val once = run("reach +12025550123 or (555) 123-4567")
    assert(once.head._3 == 1L) // only the E.164 number
    assert(once.head._4 == "reach <PHONE> or (555) 123-4567")
    val again = Scrub.redactPii(
      Seq((0L, once.head._4)).toDF("doc_id", "text"), "text")
      .select("text_redacted").collect()(0).getString(0)
    assert(again == once.head._4)
  }

  test("hasPii filters exactly the rows redactPii would change") {
    import spark.implicits._
    val df = Seq(
      (1L, "write me at a@b.io"), (2L, "plain prose"),
      (3L, "host 8.8.8.8"), (4L, "call +1234567890")).toDF("doc_id", "text")
    val flagged = df.filter(Scrub.hasPii(col("text"))).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L, 3L, 4L))
  }

  test("map-only scrub composes on streams with batch-identical output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (1L, "mail a@b.io and 10.0.0.1"), (2L, "clean"), (3L, "call +1234567890"))
    val in = MemoryStream[(Long, String)]
    val q = Scrub.redactPii(in.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("streamscrub")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("streamscrub")
        .select("doc_id", "n_emails", "n_ips", "n_phones", "text_redacted")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSet
      val batch = Scrub.redactPii(rows.toDF("doc_id", "text"), "text")
        .select("doc_id", "n_emails", "n_ips", "n_phones", "text_redacted")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSet
      assert(streamed == batch && streamed.size == 3)
    } finally q.stop()
  }

  test("plan is map-only: no exchange, no UDF") {
    import spark.implicits._
    val p = Scrub.redactPii(Seq((1L, "x")).toDF("doc_id", "text"), "text")
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("Invoke"), p)
  }
}
