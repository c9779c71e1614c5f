package graft.tools

import graft.Sessions
import graft.operators.Relational

/** Scratch comparison: composed as-of (union + running-window prefix
  * scan) vs the native AsOfJoinExec merge scan, same corpus,
  * alternating reps.
  */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // Warm both paths (codegen + readers).
    Relational.qAsofJoin(spark, dir).count()
    Relational.qAsofNative(spark, dir).count()
    val reps = 5
    val composed = (1 to reps).map(_ => time(Relational.qAsofJoin(spark, dir).count()))
    val native = (1 to reps).map(_ => time(Relational.qAsofNative(spark, dir).count()))
    println(f"ASOF composed med=${composed.sorted.apply(reps / 2)}%.3f all=${composed.map(t => f"$t%.3f").mkString(",")}")
    println(f"ASOF native   med=${native.sorted.apply(reps / 2)}%.3f all=${native.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
