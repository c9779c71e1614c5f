package graft.tools

import graft.{Sessions, SparkEntry}

/** Scratch audit: print join/scan pathology indicators for every query's
  * initial physical plan (CartesianProduct anywhere, SortMergeJoin and
  * BroadcastNestedLoopJoin counts) so accidental plan regressions surface
  * without reading 80 plans by hand. Not part of the library surface.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val dir = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val cart = "CartesianProduct".r.findAllIn(p).length
        val smj = "SortMergeJoin".r.findAllIn(p).length
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
        // Aggregates that could not hash-aggregate: SortAggregate means a
        // non-fixed-width aggregate buffer (e.g. min/max over strings —
        // the r13 minhash-signature finding); ObjectHashAggregate is the
        // fallback for typed-imperative aggs (collect_set etc.) and is
        // expected where those appear, but a count spike is worth a look.
        // Known-and-kept sortAgg rows: a13_mode / j4 (string/decimal in
        // the argmin struct, tiny inputs) and the d12/curation family
        // (quality election — the hash-shaped alternative measured
        // slower; see d12From's scaladoc before "fixing" it again).
        val sortAgg = "SortAggregate".r.findAllIn(p).length
        val objAgg = "ObjectHashAggregate".r.findAllIn(p).length
        println(f"AUDIT $name%-24s cart=$cart smj=$smj bnlj=$bnlj sortAgg=$sortAgg objAgg=$objAgg")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
