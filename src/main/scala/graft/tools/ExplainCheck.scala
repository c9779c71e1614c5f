package graft.tools
import graft.{Sessions, SparkEntry}
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"===== $q")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      println(plan.linesIterator.map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
