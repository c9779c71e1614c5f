package graft.tools

import graft.{PersistScope, Sessions, SparkEntry}

/** Scratch per-query timer: `runMain graft.tools.TimeQuery q1,q2,...`
  * times each named [[SparkEntry.queries]] entry on
  * SPARK_GRAFT_SF_DIR (default sf0.1), median of SPARK_GRAFT_REPS
  * (default 3) after one untimed warm-up, releasing pinned working sets
  * between reps. Set SPARK_GRAFT_EXPLAIN=1 to also dump each query's
  * formatted physical plan once. Not part of the library surface.
  */
object TimeQuery {
  /** Whole-process CPU seconds (all threads) — see Bench.processCpuSec;
    * duplicated because Bench's is private and this tool must stay
    * drop-in runnable on the bare classpath.
    */
  private def processCpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        val t = os.getProcessCpuTime
        if (t < 0) -1.0 else t / 1e9
      case _ => -1.0
    }

  def main(args: Array[String]): Unit = {
    // `--list` prints the catalog names (one per line) and exits — lets
    // tools/sweep_quiet.sh chunk the catalog across fresh JVMs without
    // hardcoding the query list anywhere outside SparkEntry.
    if (args.headOption.contains("--list")) {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_REPS must be >= 1, got $reps")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val tally: Option[RepDiag.StageTally] =
      if (sys.env.contains("SPARK_GRAFT_DIAG")) {
        val t = new RepDiag.StageTally
        spark.sparkContext.addSparkListener(t)
        Some(t)
      } else None
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        fn(spark, dir).explain("formatted")
      // Release pinned working sets OUTSIDE the timed window — Bench
      // releases in an untimed finally too, so medians stay comparable
      // to BENCH_DETAIL neighbors for persist-heavy queries.
      val times = (0 to reps).map { i =>
        val s0 = RepDiag.snapshot()
        val c0 = processCpuSec()
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val elapsed = (System.nanoTime() - t0) / 1e9
        val cpu = if (c0 < 0) -1.0 else processCpuSec() - c0
        // Per-rep attribution for spike hunting (SPARK_GRAFT_DIAG=1):
        // a slow rep with cpu ~ wall*threads is real work (plan/spill);
        // low cpu + high host steal is hypervisor contention; low cpu +
        // high iowait is disk stalls; high gc is heap pressure. stderr so
        // the TIME stdout protocol the sweep scripts parse is untouched.
        if (i > 0 && sys.env.contains("SPARK_GRAFT_DIAG"))
          System.err.println(RepDiag.line(name, i, elapsed, s0))
        // Listener events land async; give the bus a beat before draining
        // so a rep's stages aren't attributed to its successor.
        tally.foreach { t =>
          Thread.sleep(200)
          t.drain(6).foreach(l => System.err.println(s"STAGE $name rep=$i $l"))
        }
        PersistScope.releaseAll()
        (elapsed, n, cpu)
      }.tail // first rep is the untimed warm-up
      val med = times.map(_._1).sorted.apply(times.size / 2)
      // cpu= rides on the same TIME line (VERDICT r13 #6): per-rep
      // process-CPU deltas let a later reader separate host stall
      // (wall >> cpu/threads) from real work without re-measuring.
      println(f"TIME $name%-24s median=$med%7.3f s  reps=${times.map(t => f"${t._1}%.3f").mkString(",")}  rows=${times.head._2}  cpu=${times.map(t => f"${t._3}%.3f").mkString(",")}")
      // Bench's aged-session lesson (Bench.scala): without an explicit
      // collection between queries, dead blocks from earlier queries
      // surface as multi-second mixed GCs inside a later query's timed
      // window — a sweep measured q_triangles 19 s aged vs 5.6 s fresh
      // before this was added.
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
