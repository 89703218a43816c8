package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming throughput harness — the perf artifact for the streaming
  * twins (their correctness is spec-pinned in StreamingSpec; this
  * main gives them a repeatable rows/s + state-size record, committed
  * to SCALING.md).
  *
  * Protocol: MemoryStream input, fixed row count fed in fixed-size
  * micro-batches (addData → processAllAvailable per batch, so each
  * add is one micro-batch — the scheduling overhead a real trigger
  * pays is IN the measurement), noop-style memory-free sink via
  * foreachBatch(count). Wall clock spans first batch to drain;
  * rows/s = rows / wall. State size read from the query's last
  * progress (stateOperators totals). One warmup run (10% of the
  * rows) precedes each measured run — JIT + state-store directory
  * setup are not the steady state a pipeline pays.
  *
  * Prints one JSON line per verb on stdout:
  *   {"stream":"signature_dedup","rows":N,"batches":B,
  *    "wall_sec":t,"rows_per_sec":r,"state_rows":s,"state_bytes":b}
  */
object StreamBench {

  private def runQuery(spark: SparkSession, name: String,
                       build: DataFrame => DataFrame,
                       feed: (Int, Int) => Seq[org.apache.spark.sql.Row],
                       schema: org.apache.spark.sql.types.StructType,
                       rows: Int, batches: Int): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}

    def once(nRows: Int, nBatches: Int, tag: String): (Double, Long, Long) = {
      implicit val sqlCtx = spark.sqlContext
      implicit val enc: ExpressionEncoder[org.apache.spark.sql.Row] =
        ExpressionEncoder(RowEncoder.encoderFor(schema))
      val ms = MemoryStream[org.apache.spark.sql.Row]
      val out = build(ms.toDF())
      val sink = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = out.writeStream
        .outputMode(if (name == "hopping_counts") "update" else "append")
        .option("checkpointLocation",
          s"/tmp/graft_streambench_${name}_${tag}_${System.nanoTime()}")
        .foreachBatch { (b: DataFrame, _: Long) => sink.addAndGet(b.count()); () }
        .start()
      val per = nRows / nBatches
      val t0 = System.nanoTime()
      (0 until nBatches).foreach { bi =>
        ms.addData(feed(bi, per))
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val prog = q.lastProgress
      val (srows, sbytes) =
        if (prog != null && prog.stateOperators.nonEmpty)
          (prog.stateOperators.map(_.numRowsTotal).sum,
            prog.stateOperators.map(_.memoryUsedBytes).sum)
        else (0L, 0L)
      q.stop()
      (wall, srows, sbytes)
    }

    once(math.max(rows / 10, batches), math.max(batches / 4, 1), "warm")
    val (wall, srows, sbytes) = once(rows, batches, "run")
    println(f"""{"stream":"$name","rows":$rows,"batches":$batches,"wall_sec":$wall%.3f,"rows_per_sec":${rows / wall}%.0f,"state_rows":$srows,"state_bytes":$sbytes}""")
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    GraftSession.setLogLevel(spark, "WARN")
    // state-partition sizing: every stateful micro-batch pays one
    // state-store commit (delta file + sync) PER shuffle partition —
    // at 32 partitions the per-batch floor drowns the per-row cost on
    // a single node. 8 is the deployment-honest single-node setting
    // (state parallelism ~ cores doing real work per batch); a
    // cluster sizes this to executors, not to 200.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row

    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

    // 1) signature dedup: 1M rows, 25% duplicate signatures, event
    //    time advancing ~1s per 100 rows (state = distinct sigs in
    //    the 2h watermark horizon)
    val sigSchema = StructType(Seq(
      StructField("id", LongType), StructField("sig", LongType),
      StructField("ts", TimestampType)))
    runQuery(spark, "signature_dedup",
      df => graft.streaming.StreamVerbs.streamingSignatureDedup(df, "sig", "ts"),
      (bi, per) => (0 until per).map { i =>
        val gid = bi.toLong * per + i
        Row(gid, gid % (per * 3L / 4 + 1) + bi.toLong * per, // 25% intra-batch dups
          new java.sql.Timestamp(base.getTime + gid * 10))
      }, sigSchema, rows = 1000000, batches = 10)

    // 2) hopping counts: 1M events over ~28 simulated hours, 1h
    //    window / 15m slide / 2h lateness, 5 event types (each row
    //    lands in 4 windows; state = open windows x types)
    val evSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    runQuery(spark, "hopping_counts",
      df => graft.streaming.StreamVerbs.hoppingCounts(df),
      (bi, per) => (0 until per).map { i =>
        val gid = bi.toLong * per + i
        Row(new java.sql.Timestamp(base.getTime + gid * 100), // 100ms apart
          s"type${gid % 5}", (gid % 97).toDouble)
      }, evSchema, rows = 1000000, batches = 10)

    // 3) quality filter: NB model batch-trained on the sf documents
    //    (lang==en as the positive class — same shape as the
    //    StreamingSpec), then 200k streamed docs scored statelessly
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val model = graft.text.Classifier.compileNb(
      docs, "text", col("lang") === "en")
    val texts = docs.select("text").limit(2000).collect().map(_.getString(0))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    runQuery(spark, "quality_filter",
      df => graft.streaming.StreamVerbs.streamQualityFilter(df, "text", model),
      (bi, per) => (0 until per).map { i =>
        val gid = bi.toLong * per + i
        Row(gid, texts((gid % texts.length).toInt))
      }, docSchema, rows = 200000, batches = 10)

    spark.stop()
  }
}
