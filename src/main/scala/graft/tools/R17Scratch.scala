package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{PersistScope, Sessions}

/** r17 optimization scratchpad — interleaved same-session A/B harness
  * (the R16Scratch discipline: round-robin variants, rep 0 discarded,
  * medians compared within one session so host drift hits all sides
  * equally). Variants this round:
  *
  *  - `<st>pN`: streaming catalog queries under an explicit
  *    spark.graft.stream.partitions (2 vs 4 — the r16 default) to
  *    validate the data-derived default before it lands;
  *  - `<st>rocks`: the stream-stream join family under the RocksDB
  *    state-store provider vs the default HDFS-backed heap store
  *    (VERDICT r16 #6);
  *  - d9 family A/B re-run (hashed join keys) via R16Scratch's variants.
  *
  * Not part of the library surface; kept as measurement evidence.
  */
object R17Scratch {

  /** Run a named streaming catalog query under an explicit
    * spark.graft.stream.partitions value.
    */
  private def stAt(q: String, parts: Int)(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.graft.stream.partitions", parts.toString)
    try graft.SparkEntry.queries(q)(spark, dir)
    finally spark.conf.unset("spark.graft.stream.partitions")
  }

  /** Run a named streaming catalog query under the RocksDB state-store
    * provider (st11-st13 already require it; this probes the join/agg
    * families that default to the HDFS-backed heap store).
    */
  private def stRocks(q: String)(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try graft.SparkEntry.queries(q)(spark, dir)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private val stQueries = Seq(
    "st1_tumbling_window", "st2_sliding_window", "st3_session_window",
    "st4_stream_join", "st7_stream_left_join", "st10_stream_full_outer",
    "st5_stream_dedup", "st6_stream_static", "st8_stream_upsert",
    "st14_stream_neardup")

  /** t31 with the pin moved POST-AGGREGATE (the t19 shape, VERDICT r16
    * #4): cache one row per distinct (doc, hash) with its position count
    * instead of the full per-position rolled table. Coverage counts
    * positions = sum(k), so output is identical by algebra; the distinct
    * the cross-doc gate needed is now free (aggregate rows are already
    * distinct (doc, hash)).
    */
  def t31B(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.operators.LlmOps
    val agg = PersistScope.persisted(
      graft.Tables.documentsSpread(spark, dir)
        .filter(length(col("text")) >= LlmOps.SpanWindow)
        .select(col("doc_id"), expr(s"rolling_hashes(text, ${LlmOps.SpanWindow})"))
        .groupBy("doc_id", "hash").agg(count(lit(1)).as("k")))
    val perDoc = agg.groupBy("doc_id").agg(sum("k").as("n_windows"))
    val crossDoc = agg.groupBy("hash")
      .agg(count(lit(1)).as("nd")).filter(col("nd") >= 2).select("hash")
    val dupWin = agg.join(crossDoc, "hash")
      .groupBy("doc_id").agg(sum("k").as("n_dup_windows"))
    perDoc.join(dupWin, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        expr(LlmOps.milli("coalesce(n_dup_windows, 0)", "n_windows"))
          .as("dup_coverage_milli"))
  }

  def t31A(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LlmOps.t31SpanCoverage(spark, dir)

  def covA(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LlmOps.curationCoverageManifest(spark, dir)

  import org.apache.spark.sql.functions.col
  def covB(spark: SparkSession, dir: String): DataFrame = {
    val coverageBad = t31B(spark, dir)
      .filter(col("dup_coverage_milli") > graft.operators.LlmOps.CoverageCeilingMilli)
      .select("doc_id")
    graft.operators.LlmOps.curationNeardupIdx(spark, dir)
      .join(coverageBad, Seq("doc_id"), "left_anti")
  }

  val variants: Map[String, (SparkSession, String) => DataFrame] =
    Map("t31A" -> t31A _, "t31B" -> t31B _, "covA" -> covA _, "covB" -> covB _) ++
    (for {
      q <- stQueries
      parts <- Seq(2, 4)
    } yield s"${q.split('_').head}p$parts" -> (stAt(q, parts) _)).toMap ++
    (for (q <- Seq("st1_tumbling_window", "st3_session_window",
      "st4_stream_join", "st7_stream_left_join", "st10_stream_full_outer"))
      yield s"${q.split('_').head}rocks" -> (stRocks(q) _)).toMap ++
    (for (q <- Seq("st1_tumbling_window", "st3_session_window",
      "st4_stream_join", "st7_stream_left_join", "st10_stream_full_outer"))
      yield s"${q.split('_').head}heap" ->
        ((s: SparkSession, d: String) => graft.SparkEntry.queries(q)(s, d))).toMap

  def main(args: Array[String]): Unit = {
    val all = variants ++ R16Scratch.variants
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(variants.keys.toSeq.sorted)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val results = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    for (r <- 0 to reps; v <- names) {
      val fn = all(v)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val el = (System.nanoTime() - t0) / 1e9
      PersistScope.releaseAll()
      spark.catalog.clearCache()
      System.gc()
      if (r > 0) results(v) :+= el // rep 0 = warm-up
      println(f"SCRATCH $v rep=$r ${el}%.3f s rows=$n")
    }
    names.foreach { v =>
      val rs = results(v).sorted
      if (rs.nonEmpty)
        println(f"SCRATCHMED $v median=${rs(rs.size / 2)}%.3f reps=${rs.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
