package graft

import graft.core.{CrysFrame, SelectException, sel}
import org.apache.spark.sql.SparkSession

/** Console walkthrough of the library surface — the flagship pipeline,
  * the formatter, and the error contracts. `sbt "runMain graft.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("=== flagship entry() on sf0.001 ===")
    val e = SparkEntry.entry(spark)
    e.show(truncate = false)
    println(s"rows: ${e.count()}")

    println("=== CrysFrame printFrame / schema formatters ===")
    val f = CrysFrame(spark.read.parquet("/root/testdata/sf0.001/nation.parquet"))
      .sortBy("n_nationkey")
    print(f.printFrame("nation", maxRows = 5))
    print(f.schemaString())

    println("=== selector DSL + error contract probes ===")
    println("names: " + f.select(sel.startsWith("n_")).names.mkString(", "))
    try f.select("does_not_exist")
    catch { case ex: SelectException => println(s"SelectException: ${ex.getMessage}") }
    try f.select("n_name", "n_name")
    catch { case ex: SelectException => println(s"SelectException: ${ex.getMessage}") }

    spark.stop()
  }
}
