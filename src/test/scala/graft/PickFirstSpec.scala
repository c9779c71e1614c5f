package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** P4 pick-first determinism: the reference took whatever row the API
  * returned first (planning_center.py:65); the engine pins an explicit
  * order, so the result must be identical no matter how the input is
  * partitioned or pre-ordered.
  */
class PickFirstSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    ("p1", "e2", "b@x"), ("p1", "e1", "a@x"),   // two rows — e1 must win
    ("p2", "e9", "z@x"),
    ("p3", "e5", "m@x"), ("p3", "e4", "k@x"), ("p3", "e6", "n@x"))

  private def pickFirst(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("person_id").orderBy(col("email_id"))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("person_id", "address")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("pick-first result is independent of input partitioning and order") {
    val base = rows.toDF("person_id", "email_id", "address")
    val expected = Map("p1" -> "a@x", "p2" -> "z@x", "p3" -> "k@x")
    assert(pickFirst(base) === expected)
    assert(pickFirst(base.repartition(7)) === expected)
    assert(pickFirst(base.orderBy(col("address").desc)) === expected)
    assert(pickFirst(rows.reverse.toDF("person_id", "email_id", "address")) === expected)
  }
}
