package graft

import org.apache.spark.sql.SparkSession

/** One place for local SparkSession construction so every entry point
  * (Verify, Bench, ScalaTest) runs with identical semantics-relevant config.
  *
  *  - UTC session timezone: all reference date logic is timezone-explicit
  *    (SURVEY.md §7.4.5; the DAG's MST is connectivity, not semantics).
  *  - shuffle.partitions = cpu count, not the 200 default — local[N] has no
  *    use for 200 reducers; on a real cluster this would be sized to
  *    executors × cores (or left to AQE coalescing).
  *  - nanosAsLong: events.ts is parquet TIMESTAMP(NANOS), which the
  *    vectorized reader rejects; reading nanos as long (then truncating to
  *    micros in [[Tables.events]]) keeps the scan vectorized. Set here at
  *    session build — NOT inside a table loader — so no query mutates
  *    session state mid-plan (round-1 finding).
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      // Managed-table warehouse (bucketed tables in Scale) goes to a temp
      // dir, never the working directory.
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
