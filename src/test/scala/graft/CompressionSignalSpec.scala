package graft

import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Deflate compressibility signal: golden parity with java.util.zip,
  * separation of repetitive vs prose text, null/empty neutrality,
  * thread-reuse soundness at row counts. */
class CompressionSignalSpec extends GraftSpec {

  private def refRatio(s: String): Double = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](bytes.length * 2 + 64)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total.toDouble / bytes.length
  }

  test("ratio matches an in-process java.util.zip computation exactly") {
    import spark.implicits._
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "buy now buy now buy now buy now buy now buy now",
      "Heterogeneous prose, with punctuation; numbers 12345, and变量!")
    val got = samples.toDF("text")
      .select(col("text"), TextFunctions.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    samples.foreach { s =>
      assert(got(s) == refRatio(s), s"'$s': got ${got(s)} want ${refRatio(s)}")
    }
  }

  test("repetitive text compresses far below prose (the filter signal)") {
    import spark.implicits._
    val rep = "click here to win! " * 40
    val prose = "In the morning the harbour was quiet; gulls traced slow " +
      "arcs over the water while fishermen coiled rope and argued about " +
      "the weather, the tide, and whose turn it was to buy coffee."
    val rows = Seq(rep, prose).toDF("text")
      .select(col("text"), TextFunctions.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows(rep) < 0.15, rows(rep).toString)
    assert(rows(prose) > 0.5, rows(prose).toString)
  }

  test("null and empty text score the neutral 1.0") {
    import spark.implicits._
    val rows = Seq(Some(""), None, Some("x"))
      .toDF("text")
      .select(TextFunctions.compressionRatio(col("text")).as("r"))
      .collect().map(_.getDouble(0))
    assert(rows(0) == 1.0 && rows(1) == 1.0, rows.mkString(","))
    assert(rows(2) > 1.0) // one byte cannot compress below itself + framing
  }

  test("thread-local deflater stays correct across many rows and partitions") {
    import spark.implicits._
    // 2000 distinct strings over 8 partitions: every row must match the
    // reference — a dirty reset or shared-buffer race would corrupt some
    val docs = (0 until 2000).map(i => (i.toLong, s"row $i " + ("pad " * (i % 37))))
    val got = docs.toDF("id", "text").repartition(8)
      .select(col("id"), TextFunctions.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    docs.foreach { case (id, s) =>
      assert(got(id) == refRatio(s), s"row $id diverged")
    }
  }
}
