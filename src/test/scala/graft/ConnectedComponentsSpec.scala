package graft

import graft.operators.LlmOps

/** The d7 resolve core on synthetic graphs — in particular the round-cap
  * behavior the round-2 verdict flagged: non-convergence must be
  * OBSERVABLE (returned flag), never a silent wrong answer.
  */
class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def chain(n: Int) =
    (0L until n).sliding(2).map(p => (p(1), p(0))).toSeq.toDF("doc_a", "doc_b")

  test("deep chain: round cap reports non-convergence instead of silently returning") {
    // Diameter 256; 2 rounds of propagate+jump resolve paths of length
    // ~3^2 only, so this cannot converge.
    val (_, converged) = LlmOps.connectedComponents(chain(257), maxRounds = 2)
    assert(!converged)
  }

  test("deep chain converges to the component min within the default cap") {
    val (labels, converged) =
      LlmOps.connectedComponents(chain(257), LlmOps.MaxResolveRounds)
    assert(converged)
    val distinctLabels = labels.select("canonical_id").distinct().as[Long].collect()
    assert(distinctLabels.toSeq === Seq(0L))
    assert(labels.count() === 257)
  }

  test("intermediate round checkpoints are released; only the final labels stay persisted") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val (labels, converged) = LlmOps.connectedComponents(chain(129), LlmOps.MaxResolveRounds)
    labels.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(converged)
    // Multiple propagate+jump rounds ran; pre-fix each left its
    // localCheckpoint blocks registered forever (advisor finding). Only
    // the final labels checkpoint — which the caller still reads — may
    // remain.
    assert(after <= before + 1, s"leaked persistent RDDs: before=$before, after=$after")
  }

  test("two components + pointer jumping: each node gets its component min") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val (labels, converged) = LlmOps.connectedComponents(edges, LlmOps.MaxResolveRounds)
    assert(converged)
    val m = labels.as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
