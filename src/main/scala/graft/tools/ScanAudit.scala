package graft.tools

import graft.{PersistScope, Sessions, SparkEntry}

/** Scratch audit (r16): per-query counts of REAL parquet scans (by
  * file), Generate and Window nodes in the physical plan tree —
  * duplicated expensive subtrees (the unpinned-branch class t19/t29
  * had) show up as a table scanned more times than the query's shape
  * needs. Counts are collected from the plan TREE, not its toString:
  * InMemoryTableScan is a leaf there, so cached subtrees (whose build
  * plan the text form reprints per reference) count once at build, and
  * every remaining FileSourceScan is work the query actually re-runs.
  * Not part of the library surface.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only = args.headOption.map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan
          // Distinct cache objects (by identity), collected FIRST so each
          // cached build's subtree is walked exactly once however many
          // InMemoryTableScans reference it (r17, ADVICE r16: the old
          // walk re-walked relation.cachedPlan per reference, so a cache
          // scanned N times reported its build scans N×).
          val seenCaches = java.util.Collections.newSetFromMap(
            new java.util.IdentityHashMap[
              org.apache.spark.sql.execution.columnar.InMemoryRelation, java.lang.Boolean]())
          def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
            p.collect {
              case s: org.apache.spark.sql.execution.FileSourceScanExec =>
                Seq("scan:" + s.relation.location.rootPaths.headOption
                  .map(_.getName).getOrElse("?"))
              case g: org.apache.spark.sql.execution.GenerateExec =>
                Seq(s"gen:${g.boundGenerator.getClass.getSimpleName}")
              case _: org.apache.spark.sql.execution.window.WindowExec => Seq("win")
              case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
                // one build per distinct cache object, counted once
                if (seenCaches.add(im.relation))
                  walk(im.relation.cachedPlan).map("cached/" + _)
                else Seq.empty
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                walk(a.executedPlan)
            }.flatten
          val counts = walk(plan).groupBy(identity)
            .map { case (k, vs) => s"$k=${vs.size}" }.toSeq.sorted
          println(s"SCANAUDIT $name ${counts.mkString(",")}")
        } catch { case e: Throwable =>
          println(s"SCANAUDIT $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
        } finally { PersistScope.releaseAll(); spark.catalog.clearCache() }
      }
    spark.stop()
  }
}
