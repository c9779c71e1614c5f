package graft

import org.apache.spark.sql.functions._

/** Schema evolution on the landing zone: a long-lived dataset gains
  * columns over time, and readers must see the union schema with NULLs
  * where an old batch predates a column — no rewrite of history. This
  * is the parquet `mergeSchema` contract the engine's incremental sinks
  * (K6 partition overwrite, streaming upsert) rely on when producers
  * upgrade.
  */
class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  test("mergeSchema unions batch schemas; pre-evolution rows read as NULL") {
    val dir = tempDir("schema_evo")
    Seq((1L, "a1"), (2L, "a2")).toDF("id", "a")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, "a3", 30L), (4L, "a4", 40L)).toDF("id", "a", "b")
      .write.parquet(s"$dir/batch=2")

    val merged = spark.read.option("mergeSchema", true).parquet(dir)
    assert(merged.columns.toSet === Set("id", "a", "b", "batch"))
    val rows = merged.select("id", "b").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows === Map(1L -> None, 2L -> None, 3L -> Some(30L), 4L -> Some(40L)))

    // The default (no mergeSchema) picks ONE footer's schema — the trap:
    // whether 'b' is visible depends on which file wins, so evolved
    // tables must opt in explicitly. Both outcomes read without error;
    // only the union-schema read is deterministic.
    val partial = spark.read.parquet(dir)
    assert(partial.count() === 4)

    // Filters on the evolved column prune pre-evolution rows naturally
    // (NULL-rejecting predicate) and still push down.
    assert(merged.filter(col("b") > 0).count() === 2)
  }
}
