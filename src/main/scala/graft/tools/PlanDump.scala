package graft.tools

import graft.{PersistScope, Sessions, SparkEntry}

/** Dump `.explain("formatted")` output per query into files — the
  * optimization rounds' plan evidence (plans/r{N}/<query>_<tag>.txt).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> q1,q2,... [--final]
  *
  * `--final` runs the query once first so the dumped plan is the
  * ADAPTIVE FINAL plan (isFinalPlan=true) — the only view that shows
  * which exchanges AQE actually kept. Env: SPARK_GRAFT_SF_DIR (default
  * sf0.1), SPARK_GRAFT_CPUS (default 32). Not part of the library
  * surface.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (flags, rest) = args.partition(_.startsWith("--"))
    require(rest.length >= 3, "usage: PlanDump <outDir> <tag> q1,q2,... [--final]")
    val outDir = rest(0)
    val tag = rest(1)
    val names = rest(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val runFinal = flags.contains("--final")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { q =>
      try {
        val df = SparkEntry.queries(q)(spark, dir)
        if (runFinal) df.count()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${q}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[plandump] wrote $outDir/${q}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $q FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      } finally {
        PersistScope.releaseAll()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
