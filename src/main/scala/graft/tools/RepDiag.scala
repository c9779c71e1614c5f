package graft.tools

/** Per-rep spike attribution for [[TimeQuery]] (SPARK_GRAFT_DIAG=1).
  *
  * The r9/r10 sweeps showed untouched queries occasionally running 5-10x
  * their usual wall-clock inside one JVM (d2 sf1 reps 4.5 s .. 70.7 s;
  * q_triangles BASE reps 3.4 s .. 23.9 s) while GC logs stayed benign.
  * This snapshots the three competing explanations around each rep so a
  * slow rep carries its own diagnosis:
  *
  *   - process CPU seconds (com.sun.management OperatingSystemMXBean):
  *     a spike with cpu scaling alongside wall is the JVM genuinely
  *     burning cores (different plan, spill, JIT storm);
  *   - JVM GC pause seconds (GarbageCollectorMXBeans delta): heap aging;
  *   - host /proc/stat deltas (USER_HZ jiffies -> seconds, summed over
  *     all CPUs): steal = hypervisor gave our vCPUs to a co-tenant,
  *     iowait = threads parked on disk. Both are invisible to the JVM —
  *     wall grows while cpu/gc do not.
  *
  * Dev tool only; not part of the library surface.
  */
object RepDiag {
  final case class Snap(cpuNs: Long, gcMs: Long, steal: Long, iowait: Long,
                        busy: Long, utime: Long, stime: Long, minflt: Long,
                        majflt: Long)

  /** (utime, stime, minflt, majflt) of THIS process from /proc/self/stat —
    * splits burned CPU into user vs kernel and counts page faults, so a
    * slow rep shows whether the cycles went to our code or to the kernel
    * (page re-commit after G1 uncommit, mmap churn). Jiffies, USER_HZ=100. */
  private def selfStat: (Long, Long, Long, Long) =
    try {
      val s = scala.util.Using.resource(scala.io.Source.fromFile("/proc/self/stat"))(_.mkString)
      // fields after the parenthesised comm: index from the closing paren.
      val cols = s.substring(s.lastIndexOf(')') + 2).split(" ")
      // cols: state(0) ppid(1) ... minflt(7) cminflt(8) majflt(9) cmajflt(10)
      //       utime(11) stime(12)
      (cols(11).toLong, cols(12).toLong, cols(7).toLong, cols(9).toLong)
    } catch { case _: Exception => (0L, 0L, 0L, 0L) }

  /** Per-stage task metrics since the listener was installed. The slow-rep
    * signature disambiguates three causes the process-level numbers can't:
    * same stages + same task counts + fatter runTime = slower identical
    * tasks (JIT/alloc); extra task count on one stage = AQE skew-split or
    * retry; extra STAGES = the physical plan itself flipped between reps. */
  // Top-level (not nested in StageTally): a nested case class's generated
  // equals/canEqual carry an outer-instance test scalac cannot check at
  // run time and warns about.
  final case class S(name: String, tasks: Int, runMs: Long,
                     memSpill: Long, diskSpill: Long, peakExecMem: Long)

  final class StageTally extends org.apache.spark.scheduler.SparkListener {
    private val stages = new java.util.concurrent.ConcurrentHashMap[Int, S]()
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val info = sc.stageInfo
      val m = Option(info.taskMetrics)
      stages.merge(info.stageId,
        S(info.name.takeWhile(_ != '\n'), info.numTasks,
          m.map(_.executorRunTime).getOrElse(0L),
          m.map(_.memoryBytesSpilled).getOrElse(0L),
          m.map(_.diskBytesSpilled).getOrElse(0L),
          m.map(_.peakExecutionMemory).getOrElse(0L)),
        (a, b) => S(a.name, a.tasks + b.tasks, a.runMs + b.runMs,
          a.memSpill + b.memSpill, a.diskSpill + b.diskSpill,
          math.max(a.peakExecMem, b.peakExecMem)))
    }
    /** Top-k stages completed since the last drain, by executor run time. */
    def drain(k: Int): Seq[String] = {
      import scala.jdk.CollectionConverters._
      val snap = stages.asScala.toSeq.sortBy(-_._2.runMs).take(k)
      stages.clear()
      snap.map { case (id, s) =>
        f"id=$id tasks=${s.tasks} run=${s.runMs / 1e3}%.1fs " +
          f"spillMem=${s.memSpill >> 20}M spillDisk=${s.diskSpill >> 20}M " +
          f"peakExec=${s.peakExecMem >> 20}M ${s.name.take(48)}"
      }
    }
  }

  private def osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** (steal, iowait, busy=user+nice+system) jiffies from the aggregate
    * cpu line; zeros if /proc/stat is unreadable (non-Linux dev box). */
  private def hostJiffies: (Long, Long, Long) =
    try {
      val cols = scala.util.Using.resource(scala.io.Source.fromFile("/proc/stat")) {
        _.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      }
      // cpu: user nice system idle iowait irq softirq steal ...
      val iowait = if (cols.length > 4) cols(4) else 0L
      val steal = if (cols.length > 7) cols(7) else 0L
      (steal, iowait, cols.take(3).sum)
    } catch { case _: Exception => (0L, 0L, 0L) }

  def snapshot(): Snap = {
    val (st, io, busy) = hostJiffies
    val (ut, sy, mn, mj) = selfStat
    Snap(osBean.getProcessCpuTime, gcMillis, st, io, busy, ut, sy, mn, mj)
  }

  /** One stderr line attributing a finished rep against its start snapshot.
    * Jiffy counts are USER_HZ=100 across all CPUs, so /100 gives
    * CPU-seconds summed over the machine's 32 logical processors. */
  def line(name: String, rep: Int, wallSec: Double, s0: Snap): String = {
    val s1 = snapshot()
    val cpu = (s1.cpuNs - s0.cpuNs) / 1e9
    val gc = (s1.gcMs - s0.gcMs) / 1e3
    val steal = (s1.steal - s0.steal) / 100.0
    val iowait = (s1.iowait - s0.iowait) / 100.0
    val hostBusy = (s1.busy - s0.busy) / 100.0
    val ut = (s1.utime - s0.utime) / 100.0
    val sy = (s1.stime - s0.stime) / 100.0
    f"DIAG $name%-24s rep=$rep wall=$wallSec%7.3f cpu=$cpu%8.3f gc=$gc%6.3f " +
      f"steal=$steal%7.2f iowait=$iowait%6.2f hostbusy=$hostBusy%8.2f " +
      f"usr=$ut%7.2f sys=$sy%7.2f minflt=${s1.minflt - s0.minflt} " +
      f"majflt=${s1.majflt - s0.majflt}"
  }
}
