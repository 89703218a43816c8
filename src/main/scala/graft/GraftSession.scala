package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory encoding the engine's scale defaults.
  * Local mode for tests/bench; the same conf set is what a cluster
  * submit should carry (minus master). */
object GraftSession {
  /** The only partition-less windows this engine ever plans are the
    * metadata-scale cross-partition offset frames in
    * core/GlobalWindows.runningScan — ≤ #input-partitions rows by
    * construction, and PlanQualitySpec asserts no data-scale frame
    * hits one. WindowExecBase still logs its "Moving all data to a
    * single partition" WARN for each (128× per bench run), which reads
    * like the defect class the plan specs exist to prevent. Raise that
    * package's logger to ERROR: real window misuse is caught by the
    * specs, not the log line. */
  private def quietIntentionalWindowWarn(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)

  /** Use INSTEAD of `sparkContext.setLogLevel`: that call runs log4j's
    * `setAllLevels`, which clobbers every per-logger override — the
    * window-WARN suppression must be re-applied after it. */
  def setLogLevel(s: SparkSession, level: String): Unit = {
    s.sparkContext.setLogLevel(level)
    quietIntentionalWindowWarn()
  }

  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32): SparkSession.Builder = {
    quietIntentionalWindowWarn()
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE: runtime partition coalescing, skew-join splitting, and
      // dynamic join-strategy switches — the knobs that keep plans
      // healthy when stats are off by 100× at real scale
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.parquet-style TIMESTAMP(NANOS) columns
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // SQL surface for the custom kernels (minhash_sig, simhash64,
      // cosine_sim, ...) — see GraftExtensions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
  }

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    setLogLevel(s, "WARN")
    s
  }
}
