package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** Scratch A/B: window-lead shingle construction (current) vs the
  * shuffle-free array-carry form (posexplode + element_at lookups into
  * the carried token array). Same output values; different plan shape.
  *
  * `--verify` mode (r12): per-candidate exact-Jaccard verify cost —
  * interpreted string `size(array_intersect)` vs the native codegen'd
  * `sorted_intersect_count` over 60-bit-hashed sorted sets (the d5/d5b/
  * st14 swap). Pairs are the all-pairs of the first 200 docs so the
  * measured quantity is purely the per-pair verify constant.
  */
object ShingleBench {

  private def verifyAb(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.operators.LlmOps
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
    val sh = docs
      .select(col("doc_id"), expr("split(text, ' ')").as("toks"))
      .select(col("doc_id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .filter(col("pos") <= size(col("toks")) - 3)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"),
          element_at(col("toks"), col("pos") + 2),
          element_at(col("toks"), col("pos") + 3)).as("shingle"))
    val strSets = sh.groupBy("doc_id")
      .agg(collect_set("shingle").as("s")).persist()
    val hashSets = sh.groupBy("doc_id")
      .agg(sort_array(collect_set(expr(LlmOps.shingleHash60("shingle")))).as("s"))
      .persist()
    strSets.count(); hashSets.count()
    def pairs(sets: org.apache.spark.sql.DataFrame) =
      sets.toDF("a", "sa").join(sets.toDF("b", "sb"), col("a") < col("b"))
    def timeIt(name: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"SHB $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s pairs=$n")
    }
    for (_ <- 1 to 3) {
      timeIt("string array_intersect")(pairs(strSets)
        .select(expr("size(array_intersect(sa, sb))").as("i")).filter(col("i") >= 0).count())
      timeIt("native sorted_intersect")(pairs(hashSets)
        .select(expr("sorted_intersect_count(sa, sb)").as("i")).filter(col("i") >= 0).count())
    }
    // Value identity: the hashed counts must equal the string counts.
    val a = pairs(strSets).select(col("a"), col("b"),
      expr("cast(size(array_intersect(sa, sb)) as bigint)").as("i"))
    val b = pairs(hashSets).select(col("a"), col("b"),
      expr("sorted_intersect_count(sa, sb)").as("i"))
    println(s"SHB verify value diff rows = ${a.exceptAll(b).count() + b.exceptAll(a).count()}")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    if (args.headOption.contains("--verify")) {
      verifyAb(spark, dir)
      spark.stop()
      return
    }
    val docs = Tables.documents(spark, dir)
    docs.count() // warm

    def timeIt(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"SHB $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
    }

    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    def windowForm = docs
      .select(col("doc_id"), posexplode(expr("split(text, ' ')")).as(Seq("pos", "tok")))
      .withColumn("n1", lead("tok", 1).over(w))
      .withColumn("n2", lead("tok", 2).over(w))
      .filter(col("n2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("n1"), col("n2")).as("shingle"))

    def arrayForm = docs
      .select(col("doc_id"), expr("split(text, ' ')").as("toks"))
      .select(col("doc_id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .filter(col("pos") <= size(col("toks")) - 3)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"),
          element_at(col("toks"), col("pos") + 2),
          element_at(col("toks"), col("pos") + 3)).as("shingle"))

    // Interleave to null out session aging.
    for (_ <- 1 to 3) {
      timeIt("window lead")(windowForm.count())
      timeIt("array element_at")(arrayForm.count())
    }
    // Value identity.
    val diff = windowForm.exceptAll(arrayForm).count() + arrayForm.exceptAll(windowForm).count()
    println(s"SHB value diff rows = $diff")
    // Downstream shape: a groupBy after each (the signature aggregation shape).
    timeIt("window -> groupBy")(windowForm.groupBy("doc_id").agg(count("*")).count())
    timeIt("array  -> groupBy")(arrayForm.groupBy("doc_id").agg(count("*")).count())
    spark.stop()
  }
}
