package graft.tools
import graft.{PersistScope, Sessions, SparkEntry}

/** Dev tool: print a query's physical plan. Default prints the
  * pre-execution plan (AQE placeholder); `--final` runs the query first
  * and prints the ADAPTIVE FINAL plan — the only view that shows which
  * exchanges AQE actually kept (a static explain conservatively plans
  * exchanges that a preserved LogicalRDD partitioning lets the runtime
  * skip). Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS.
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val (flags, queries) = args.partition(_.startsWith("--"))
    val runFinal = flags.contains("--final")
    for (q <- queries) {
      println(s"===== $q")
      val df = SparkEntry.queries(q)(spark, dir)
      if (runFinal) df.count()
      val plan = df.queryExecution.executedPlan.toString
      println(plan.linesIterator.map(_.take(150)).mkString("\n"))
      PersistScope.releaseAll()
    }
    spark.stop()
  }
}
