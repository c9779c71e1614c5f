package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** Scratch A/B: window-lead shingle construction (current) vs the
  * shuffle-free array-carry form (posexplode + element_at lookups into
  * the carried token array). Same output values; different plan shape.
  */
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
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
