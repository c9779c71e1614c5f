package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The remaining TPC-H queries (Q2, Q7–Q9, Q11, Q13, Q15–Q17, Q19–Q22),
  * adapted to the driver fixture's columns — together with the nine in
  * [[Relational]] (Q1, Q3–Q6, Q10, Q12, Q14, Q18) the catalog covers the
  * full 22-query suite. All run through the plain `spark.sql` TEXT
  * surface over [[Tables.registerAll]]'s views: the "switch to this
  * library" path where Catalyst does join ordering / broadcast selection
  * / subquery decorrelation from SQL alone, no DataFrame hints.
  *
  * Fixture adaptations (the schema has no partsupp, phone, shipmode,
  * commit/receipt dates, or containers):
  *  - "suppliers of a part" (Q2/Q16/Q20) = DISTINCT (l_partkey,
  *    l_suppkey) pairs from lineitem — the same N:M relation partsupp
  *    materializes;
  *  - supply cost (Q2) → s_acctbal; part cost (Q9) → p_retailprice ×
  *    quantity; "late" (Q21) = shipped > 60 days after the order date
  *    (Q4's convention); "no recent orders" (Q22) = nothing since
  *    2000-01-01 (every fixture customer has SOME order).
  *
  * Float discipline matches the rest of the repo: money sums are
  * per-row-rounded integer CENTS, ratios ride [[LlmOps.milli]], and the
  * one intentional double comparison (Q17's 0.2×avg) is over integral
  * quantities whose sums are exact in IEEE double at any order, so both
  * engines compute bit-identical thresholds.
  */
object Tpch {

  /** TPC-H Q2 (minimum-"cost" supplier), adapted: for each EUROPE-sized
    * slice of parts, the supplier(s) with the LOWEST account balance
    * among those that have actually supplied it. The correlated scalar
    * MIN decorrelates (RewriteCorrelatedScalarSubquery) into an
    * aggregate-then-join on p_partkey — both sides shuffle once on
    * partkey; region/nation broadcast onto the supplier dim. The
    * distinct pair table is the partsupp stand-in, built once per
    * branch; integer-cents equality keeps the min-match exact. LIMIT
    * rides a (cents DESC, s_name, p_partkey) total order →
    * TakeOrderedAndProject, never a global sort.
    */
  def q2(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT cast(round(s_acctbal * 100) as bigint) AS acctbal_cents,
        |  s_name, n_name, p_partkey, p_name
        |FROM part
        |JOIN ps ON p_partkey = ps.l_partkey
        |JOIN supplier ON s_suppkey = ps.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size = 25 AND p_type = 'LARGE' AND r_name = 'EUROPE'
        |  AND round(s_acctbal * 100) = (
        |    SELECT min(round(s2.s_acctbal * 100))
        |    FROM ps ps2
        |    JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY acctbal_cents DESC, s_name, p_partkey
        |LIMIT 20""".stripMargin)
  }

  /** TPC-H Q7 (volume shipping between two nations): the classic
    * DOUBLE-ROLE dimension — nation joins twice, once through supplier
    * and once through customer, with a symmetric pair filter. Both
    * nation sides broadcast; the fact chain shuffles on its natural
    * keys (suppkey, orderkey, custkey) and the two-year shipdate window
    * pushes into the lineitem scan. The final (nation, nation, year)
    * aggregate is ≤ a handful of rows — map-combinable to nothing.
    */
  def q7(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT supp_nation, cust_nation, l_year,
        |  cast(sum(cents) as bigint) AS revenue_cents
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    cast(year(l_shipdate) as bigint) AS l_year,
        |    cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint) AS cents
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate >= timestamp'1996-01-01'
        |    AND l_shipdate < timestamp'1998-01-01') shipping
        |GROUP BY supp_nation, cust_nation, l_year""".stripMargin)
  }

  /** TPC-H Q8 (national market share): what integer-MILLI fraction of a
    * region+type market's revenue came from one supplying nation, per
    * order year. The deepest join in the suite (7 tables, nation twice);
    * every dimension side broadcasts, the fact chain co-shuffles, and
    * the share is a conditional-sum ratio on the shared round-half-up
    * primitive — the same "pivot a predicate into the aggregate" idiom
    * as Q12/Q14, exact at any scale.
    */
  def q8(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      s"""SELECT o_year,
        |  ${LlmOps.milli(
             "sum(CASE WHEN supp_nation = 'NATION_9' THEN cents ELSE 0 END)",
             "sum(cents)")} AS mkt_share_milli,
        |  cast(sum(cents) as bigint) AS total_cents
        |FROM (
        |  SELECT cast(year(o_orderdate) as bigint) AS o_year,
        |    cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint) AS cents,
        |    n2.n_name AS supp_nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        |    AND o_orderdate >= timestamp'1996-01-01'
        |    AND o_orderdate < timestamp'1998-01-01') all_nations
        |GROUP BY o_year""".stripMargin)
  }

  /** TPC-H Q9 (product-type profit), adapted: profit = discounted
    * revenue − retailprice×quantity (the fixture's stand-in for
    * ps_supplycost×l_quantity), integer cents per row so the grouped
    * sums are exact. The `%red%` part filter prunes the broadcast side
    * BEFORE the fact join (infix LIKE stays codegen'd); grouping is by
    * supplier nation × order year — a ≤ 25×7-row aggregate that partial
    * aggregation collapses map-side.
    */
  def q9(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT nation, o_year, cast(sum(profit_cents) as bigint) AS profit_cents
        |FROM (
        |  SELECT n_name AS nation, cast(year(o_orderdate) as bigint) AS o_year,
        |    cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)
        |      - cast(round(p_retailprice * l_quantity * 100) as bigint) AS profit_cents
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%') profit
        |GROUP BY nation, o_year""".stripMargin)
  }

  /** TPC-H Q11 (important stock), adapted: parts whose revenue through
    * one nation's suppliers exceeds 1/1000 of that nation's total. The
    * per-part aggregate is computed ONCE in a CTE; the global total is
    * a scalar subquery over the SAME aggregate (Catalyst reuses the
    * exchange via ReuseExchange when the subtrees match), broadcast as
    * one row. The threshold compare is pure integer (v×1000 > Σv) — no
    * percentage doubles — so it cannot drift at 100 TB row counts.
    */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """WITH val AS (
        |  SELECT l_partkey AS partkey,
        |    sum(cast(round(l_extendedprice * 100) as bigint)) AS v
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey = 3
        |  GROUP BY l_partkey)
        |SELECT partkey, cast(v as bigint) AS value_cents
        |FROM val
        |WHERE v * 1000 > (SELECT sum(v) FROM val)""".stripMargin)
  }

  /** TPC-H Q13 (customer order-count distribution): the LEFT-JOIN-
    * with-ON-filter shape — the priority predicate lives in the join
    * condition, NOT a WHERE (a WHERE would turn the outer join inner
    * and drop zero-order customers, the rows Q13 exists to count).
    * Two aggregates: per-customer count shuffles on custkey (the join's
    * own key, one exchange total), then the ≤ max-orders-per-customer-
    * row histogram collapses map-side.
    */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count""".stripMargin)
  }

  /** TPC-H Q15 (top supplier): the max-of-an-aggregate-selects-the-row
    * shape. The quarter's per-supplier revenue CTE is referenced twice
    * (rows + scalar max); both references resolve to the same aggregate
    * subtree, the max broadcasts as one row, and the integer-cents
    * equality admits exactly the argmax supplier(s) — ties included,
    * which is why this is NOT a LIMIT 1.
    */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) AS total
        |  FROM lineitem
        |  WHERE l_shipdate >= timestamp'1997-01-01'
        |    AND l_shipdate < timestamp'1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, cast(total as bigint) AS total_cents
        |FROM supplier
        |JOIN revenue ON s_suppkey = supplier_no
        |WHERE total = (SELECT max(total) FROM revenue)""".stripMargin)
  }

  /** TPC-H Q16 (supplier diversity per part class), adapted: distinct
    * supplier counts per (brand, type, size) over the lineitem-derived
    * partsupp stand-in, minus "complaint" suppliers (negative balance —
    * the fixture's stand-in for the comment LIKE filter). The NOT IN
    * subquery is a ≤ dim-sized broadcast null-aware anti join
    * (s_suppkey is non-null, so the null-aware machinery degenerates to
    * a plain hash anti); count(DISTINCT) over the already-distinct pair
    * table expands to a two-level aggregate, both levels partial.
    */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        |      FROM lineitem) ps
        |JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin)
  }

  /** TPC-H Q17 (small-quantity-order revenue): the correlated-average
    * filter — keep lines whose quantity is under 20% of their part's
    * average. Decorrelates into a per-partkey avg aggregate joined back
    * on partkey (one shuffle each side). The 0.2×avg threshold is the
    * repo's ONE intentional double comparison: quantities are integral
    * (1–50), their sums are exact in IEEE double at any summation
    * order, and avg/×0.2 are single deterministic ops — both engines
    * compute bit-identical thresholds, documented here rather than
    * contorted into rationals.
    */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint) AS total_cents,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_size <= 10
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }

  /** TPC-H Q19 (discounted revenue, OR-of-ANDs): three (brand, size,
    * quantity) disjuncts over the part⋈lineitem join. The p_brand IN
    * superset and size bound are implied residuals Catalyst can push to
    * the broadcast side; the full disjunction evaluates inside
    * whole-stage codegen post-join. One fact scan, one broadcast, one
    * single-row aggregate.
    */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT
        |  cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) as bigint) AS revenue_cents,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
  }

  /** TPC-H Q20 (potential part promotion), adapted: suppliers in a
    * nation group that moved > 50 units of some `red…` part in 1997.
    * The IN subquery aggregates lineitem per (suppkey, partkey) — the
    * HAVING cut runs BEFORE the semi join, so the join's build side is
    * already tiny — and RewritePredicateSubquery turns the IN into a
    * left semi on suppkey against the ≤ dim-sized supplier scan.
    */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    JOIN part ON p_partkey = l_partkey
        |    WHERE p_name LIKE 'red%'
        |      AND l_shipdate >= timestamp'1997-01-01'
        |      AND l_shipdate < timestamp'1998-01-01'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING sum(cast(round(l_quantity) as bigint)) > 50)""".stripMargin)
  }

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted to Q4's
    * lateness convention: count, per supplier, the finished
    * multi-supplier orders where THEIR line shipped > 60 days after the
    * order date and NO OTHER supplier's line did. EXISTS and NOT EXISTS
    * both carry an orderkey equality, so they plan as hash left-semi /
    * left-anti joins with the inequality as a residual condition —
    * never a nested loop; the outer o_orderdate reference rides the
    * join condition. Three passes over lineitem, all equi-shuffled on
    * orderkey (at 100 TB, bucketing lineitem on orderkey makes all
    * three exchange-free). LIMIT rides a (numwait DESC, s_name) total
    * order.
    */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name IN ('NATION_4', 'NATION_5')
        |  AND l1.l_shipdate > o_orderdate + interval 60 days
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + interval 60 days)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin)
  }

  /** TPC-H Q22 (global sales opportunity), adapted: rich-but-lapsed
    * customers per nation — balance above the positive-balance average
    * of the nation group, with NO order since 2000-01-01 (the fixture's
    * stand-in for "never ordered": every synthetic customer has some
    * order). The average is held as exact integers — cents×count >
    * Σcents instead of a double avg — so the threshold cannot drift
    * between engines; the scalar (Σ, n) pair broadcasts as one row and
    * the NOT EXISTS is a hash anti join on custkey whose date predicate
    * prunes the orders scan first.
    */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """WITH pos AS (
        |  SELECT sum(cast(round(c_acctbal * 100) as bigint)) AS s, count(*) AS n
        |  FROM customer
        |  WHERE c_acctbal > 0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7))
        |SELECT c_nationkey AS nationkey, count(*) AS numcust,
        |  cast(sum(cast(round(c_acctbal * 100) as bigint)) as bigint) AS totacctbal_cents
        |FROM customer
        |WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
        |  AND cast(round(c_acctbal * 100) as bigint) * (SELECT n FROM pos) > (SELECT s FROM pos)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= timestamp'2000-01-01')
        |GROUP BY c_nationkey""".stripMargin)
  }
}
