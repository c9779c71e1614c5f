package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites: one local SparkSession (getOrCreate —
  * sbt runs suites in one forked JVM, so every suite reuses it; nobody
  * stops it). Same semantics-relevant config as Verify/Bench via
  * [[Sessions]].
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("4")

  /** Release PersistScope registrations after EVERY test — suites run
    * queries that pin working sets (dedup family, k-means, PageRank),
    * and the shared session otherwise accumulates their blocks for the
    * whole run; worse, lingering CacheManager entries can make a later
    * plan-shape assertion resolve through InMemoryRelation instead of
    * the scan it was written against (reviewer finding).
    */
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome =
    try super.withFixture(test) finally PersistScope.releaseAll()

  /** sf0.001 corpus — smallest driver fixture, for tests that want real
    * tables rather than in-memory rows.
    */
  val Sf = "/root/testdata/sf0.001"

  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
