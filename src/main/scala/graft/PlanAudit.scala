package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted plans for representative queries — the dev loop for
  * "is this the plan you'd want at 100 TB": pushed filters, pruned
  * schemas, broadcast vs shuffle joins, codegen spans.
  * `sbt "runMain graft.PlanAudit [queryName...]"` */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.setLogLevel(spark, "ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q_filter", "q_join_inner", "q_spread", "q_lead_lag")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
