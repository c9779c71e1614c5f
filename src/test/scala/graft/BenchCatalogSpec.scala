package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-name invariants between Bench's protocol sets and the query
  * catalog — no SparkSession needed. A typo'd name in FreshJvmQueries
  * would otherwise silently fall back to in-chunk grading (the exact
  * pollution the set exists to prevent), and a stale baselineTwins or
  * warm-up name would silently stop annotating/warming.
  */
class BenchCatalogSpec extends AnyFunSuite {

  test("FreshJvmQueries all name real catalog queries") {
    val unknown = Bench.FreshJvmQueries -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"not in the catalog: $unknown")
  }

  test("baselineTwins keys and recommended forms all name real catalog queries") {
    val keys = SparkEntry.baselineTwins.keySet -- SparkEntry.queries.keySet
    val vals = SparkEntry.baselineTwins.values.toSet -- SparkEntry.queries.keySet
    assert(keys.isEmpty, s"twin keys not in the catalog: $keys")
    assert(vals.isEmpty, s"recommended forms not in the catalog: $vals")
    // A twin must never recommend itself, and every recommended form
    // should be cheaper machinery, i.e. NOT itself an annotated twin
    // pointing elsewhere (no chains).
    SparkEntry.baselineTwins.foreach { case (k, v) =>
      assert(k != v, s"$k recommends itself")
      assert(!SparkEntry.baselineTwins.contains(v) || SparkEntry.baselineTwins(v) == v,
        s"$k -> $v -> ${SparkEntry.baselineTwins.get(v)} forms a chain")
    }
  }

  test("every warm-up Bench can emit names a real catalog query") {
    val emitted = Bench.warmupsFor(SparkEntry.queries.keys.toSeq).toSet
    val unknown = emitted -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"warm-ups not in the catalog: $unknown")
  }

  test("the calibration query exists and is not itself pollution-prone") {
    assert(SparkEntry.queries.contains(Bench.CalibrationQuery))
    assert(!Bench.FreshJvmQueries.contains(Bench.CalibrationQuery),
      "the calibration reference must grade under the plain protocol")
  }

  test("the r15 unverified-flag class grades fresh-JVM from the start") {
    // VERDICT r15 #1: the five worst audit flags the degraded r15 window
    // could not re-verify — removing any of them from the set silently
    // reopens the in-chunk pollution ambiguity.
    val required = Set("q_curation_pipeline", "t11_decontaminate",
      "q_kmeans", "q_semdedup", "sim_pq_topk")
    val missing = required -- Bench.FreshJvmQueries
    assert(missing.isEmpty, s"pollution-class entries missing: $missing")
  }

  test("audit_skipped surfaces in the parsed total line when reruns were skipped") {
    // VERDICT r15 #4: a run with unverified audit flags must not parse
    // identically to a fully audited one.
    assert(Bench.auditSkippedTag(0) === "")
    assert(Bench.auditSkippedTag(47) === ""","audit_skipped":47""")
    // The tag splices into a JSON object — must start with a comma and
    // form a valid key:value pair.
    val line = s"""{"metric":"total","value":1.0${Bench.auditSkippedTag(3)}}"""
    assert(line.contains(""""audit_skipped":3"""))
  }
}
