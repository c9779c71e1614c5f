package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale-out join utilities — the two techniques the 100 TB posture
  * notes throughout this engine keep referring to, as concrete API:
  *
  *  - **Bucketing** (SURVEY.md §4): pre-partition both sides of a hot
  *    fact×fact join on the join key at write time; subsequent equi-joins
  *    read co-located buckets and need NO shuffle exchange at all
  *    (asserted on the physical plan in ScaleSpec). This is the answer to
  *    "the J2 shuffle becomes the bottleneck at 100 TB".
  *
  *  - **Key salting**: when a join key is heavily skewed beyond what AQE's
  *    skew-join splitting handles, explode the small side k ways and
  *    scatter the big side across the k salts — the hot key's rows spread
  *    over k tasks. Deterministic salt (hash of a unique column mod k),
  *    no RNG.
  */
object Scale {

  /** Write `df` as a bucketed+sorted table on `key` — the one-time
    * layout cost that removes the per-query join shuffle.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Skew-resistant equi-join of a large (skewed) side against a smaller
    * side: `big` is salted by hash(`bigUniqueCol`) mod `salts`, `small`
    * is replicated once per salt, and the join key becomes
    * (key, salt). Result rows are identical to `big.join(small, key)` —
    * only the partitioning changes. `small` grows ×salts, so pick salts
    * to balance the hot key against the replication cost.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salts: Int, bigUniqueCol: String): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(col(bigUniqueCol)), lit(salts)))
    val repSmall = small.withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    saltedBig.join(repSmall, Seq(key, "__salt")).drop("__salt")
  }
}
