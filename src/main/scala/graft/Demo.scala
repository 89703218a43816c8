package graft

import graft.core.{CrysFrame, SelectException, sel}
import org.apache.spark.sql.SparkSession

/** Console walkthrough of the library surface — the flagship pipeline,
  * the formatter, and the error contracts. `sbt "runMain graft.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    GraftSession.setLogLevel(spark, "ERROR")

    println("=== flagship entry() on sf0.001 ===")
    val e = SparkEntry.entry(spark)
    e.show(truncate = false)
    println(s"rows: ${e.count()}")

    println("=== CrysFrame printFrame / schema formatters ===")
    val f = CrysFrame(spark.read.parquet("/root/testdata/sf0.001/nation.parquet"))
      .sortBy("n_nationkey")
    print(f.printFrame("nation", maxRows = 5))
    print(f.schemaString())
    println(f.columnString("n_name"))

    println("=== selector DSL + error contract probes ===")
    println("names: " + f.select(sel.startsWith("n_")).names.mkString(", "))
    try f.select("does_not_exist")
    catch { case ex: SelectException => println(s"SelectException: ${ex.getMessage}") }
    try f.select("n_name", "n_name")
    catch { case ex: SelectException => println(s"SelectException: ${ex.getMessage}") }

    println("=== sampling (exact-n, with replacement) ===")
    println(s"sampleN(3): ${f.sampleN(3).numRow} rows; " +
      s"sampleN(40, replace=true): ${f.sampleN(40, replace = true).numRow} rows " +
      s"from ${f.numRow}")

    println("=== CSV skip-preamble read ===")
    val tmp = java.nio.file.Files.createTempDirectory("graft_demo").toString + "/pre.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp),
      "junk line 1\njunk line 2\na,b\n1,x\n2,y\n")
    val skipped = graft.sources.Readers.readCsv(spark, tmp, skip = 2)
    print(skipped.sortBy("a").printFrame("skipped", 5))

    println("=== dedup: minhash greedy vs connected components (fixture docs) ===")
    locally {
      import spark.implicits._
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (3L, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (4L, "completely different content about catalyst optimizer internals here"))
        .toDF("doc_id", "text")
      val greedy = graft.ml.Dedup.minhashDedup(docs, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.6, shingleSize = 4)
      val cc = graft.ml.Dedup.minhashDedupCC(docs, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.6, shingleSize = 4)
      println(s"greedy keeps: ${greedy.select("doc_id").collect().map(_.getLong(0)).sorted.mkString(",")}; " +
        s"clusters keep: ${cc.select("doc_id").collect().map(_.getLong(0)).sorted.mkString(",")}")
      // quality-aware keep: the cluster's BEST-scoring member survives
      val scored = docs.withColumn("quality",
        org.apache.spark.sql.functions.col("doc_id").cast("double"))
      val best = graft.ml.Dedup.minhashDedupCC(scored, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.6, shingleSize = 4,
        keepBestBy = Some("quality"))
      println(s"best-quality keep: ${best.select("doc_id").collect().map(_.getLong(0)).sorted.mkString(",")}")
      // leakage-safe split: the whole near-dup cluster shares one split
      val pairs = graft.ml.Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.6, shingleSize = 4)
        .select("id_a", "id_b")
      val labels = graft.ml.Dedup.connectedComponents(pairs)
      graft.ml.Sampling.splitByCluster(docs.select("doc_id"), "doc_id", labels,
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id").show(4, truncate = false)
    }

    println("=== multimodal: real container-header sniffing ===")
    graft.multimodal.Multimodal.sniffMetadata(
      graft.multimodal.Multimodal.syntheticMedia(spark, 6))
      .orderBy("media_id").show(6, truncate = false)

    println("=== corpus datasheet: the publishable one-row profile ===")
    graft.text.Datasheet.describe(
      SparkEntry.t(spark, "/root/testdata/sf0.001", "documents"), "text")
      .show(truncate = false)

    println("=== streaming: tumbling counts over the events table (one batch) ===")
    val evDir = java.nio.file.Files.createTempDirectory("graft_demo_ev").toString
    // SparkEntry.t normalizes the driver's ts encodings (long nanos OR
    // timestamp[us]/NTZ — both have shipped; see the t scaladoc)
    SparkEntry.t(spark, "/root/testdata/sf0.001", "events")
      .limit(500).write.mode("overwrite").parquet(evDir)
    val stream = graft.streaming.StreamVerbs.tumblingCounts(
      graft.streaming.StreamVerbs.readEventStream(spark, evDir), "6 hours", "1 hour")
    val q = stream.writeStream.format("memory").queryName("demo_tumbling")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    spark.table("demo_tumbling").orderBy("window").show(5, truncate = false)

    spark.stop()
  }
}
