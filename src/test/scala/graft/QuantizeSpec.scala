package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Int8 quantization invariants: values stay in the int8 range and the
  * dequantized error respects the symmetric-quantization bound
  * |x − q·s/127| ≤ s/254 (half a quantization step).
  */
class QuantizeSpec extends SparkTestBase {

  test("q8 values in [-127, 127] and dequantization error within half a step") {
    val q = Similarity.simQuantizeQ8(spark, Sf)
    val orig = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("xf").cast("double").as("x"))
    val joined = q.join(orig, Seq("vec_id", "dim"))
      .select(col("scale"),
        abs(col("x") - col("q") * col("scale") / lit(127.0)).as("err"))
    assert(joined.count() > 0)
    assert(joined.filter(col("err") > col("scale") / lit(254.0) + lit(1e-12)).count() === 0)
    assert(q.agg(max(abs(col("q")))).head.getLong(0) <= 127L)
  }
}
