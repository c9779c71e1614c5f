package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.Scalars._

/** Core relational operator catalog — every scan/filter/projection/join/
  * aggregation/window/set-op/slice semantic from SURVEY.md §2, re-expressed
  * as declarative Spark plans over the driver parquet corpus.
  *
  * Conventions (shared with the DuckDB oracle in [[graft.SparkEntry]]):
  *  - output row order is NOT part of any query's contract except where
  *    order is semantic (offset/limit slice, global top-k): the driver's
  *    comparator row-sorts before hashing, and a trailing global sort is a
  *    full extra exchange at scale for nothing. Queries whose SEMANTICS
  *    need an order (pick-first, window frames, slices) pin it inside the
  *    window/limit, with total tie-breaks for reproducibility;
  *  - double aggregates are round(_, 2) at the projection boundary
  *    (SURVEY.md §7.4 float discipline);
  *  - nulls stay internal; '' substitution happens only in final
  *    projections (planning_center.py:65,70 semantics).
  *
  * Scale notes are on each query: what the plan does at 100 TB /
  * 1000 executors, which joins broadcast, where the shuffles are.
  */
object Relational {

  /** Pinned "today" for age math — current_date() would make results
    * unreproducible (SURVEY.md §7.4.1).
    */
  val AsOfDate = "2026-06-01"

  // ---------------------------------------------------------------------
  // Scans / projections / filters (S1, S4, P1-P3)
  // ---------------------------------------------------------------------

  /** S1: plain dimension scan. At scale: metadata-only partition listing;
    * column pruning reaches the parquet footer (ReadSchema).
    */
  def s1ScanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir)
      .select(col("r_regionkey"), col("r_name"))

  /** S4: filter + projection — both must reach the scan (PushedFilters /
    * ReadSchema in explain). Models the reference's server-side
    * where[primary]=true pushdown (planning_center.py:64,69).
    */
  def s4FilteredScan(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** P1: substring-contains filter (the "Youth" filter,
    * planning_center.py:20). Catalyst pushes StringContains to parquet.
    */
  def p1ContainsFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"))

  /** P2+P3: projection with derived columns and an allowlist prune
    * (csv_operations.py:10,21). Derivations are pure expressions (F2/F7).
    */
  def p2Projection(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        col("c_name"),
        upper(col("c_mktsegment")).as("segment"),
        gradeLabel(col("c_nationkey")).as("grade_label"))

  /** P4: pick-first-per-key with an explicit deterministic order — the
    * reference took whatever row the API returned first
    * (planning_center.py:65); we impose (date, orderkey) order. One shuffle
    * on the window key; at scale this is a single hash-partitioned sort, no
    * driver involvement.
    */
  def p4PickFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
        col("o_orderdate").cast("date").as("first_orderdate"))
  }

  // ---------------------------------------------------------------------
  // Joins (J1-J6)
  // ---------------------------------------------------------------------

  /** J1: dimension chain join (lists ⋈ ... in the reference). nation and
    * region are broadcast — zero shuffle of the fact side.
    */
  def j1DimJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count("*").as("n_customers"), round(sum("c_acctbal"), 2).as("total_acctbal"))

  /** J2: fact × fact equi-join (the reference's N+1 point lookups,
    * planning_center.py:33-34, become one hash join). At 100 TB this is a
    * shuffle/sort-merge join on the key; AQE handles skew. Bucketing both
    * tables on the join key would remove the shuffle entirely.
    */
  def j2FactJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count("*").as("n_items"))

  /** J9: the same fact×fact aggregation as [[j2FactJoin]] driven through
    * [[Scale.saltedEquiJoin]] — the skew-resistant plan a 100 TB run
    * switches to when one join key dominates beyond what AQE's skew
    * splitting absorbs. Salt = hash(l_linenumber) mod 4 spreads each
    * order's line items over 4 salts; results are identical to the plain
    * join (same oracle as j2 modulo aliases), only the partitioning
    * differs.
    */
  def j9SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
    val small = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    Scale.saltedEquiJoin(big, small, "l_orderkey", salts = 4, bigUniqueCol = "l_linenumber")
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count("*").as("n_items"))
  }

  /** J3/F7: left outer join with pick-first + ''-default on the right side
    * (primary email join, planning_center.py:63-65). Aggregating the right
    * side BEFORE the join keeps it 1:1 — partial aggregation happens
    * map-side, and the join never explodes.
    */
  def j3LeftJoinDefault(spark: SparkSession, dir: String): DataFrame = {
    val firstOrder = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(min("o_orderdate").as("first_date"), count("*").as("n_orders"))
    Tables.customer(spark, dir)
      .join(firstOrder, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"),
        emptyIfNull(col("first_date").cast("date").cast("string")).as("first_order_date"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
  }

  /** J5/A3: dual-source count reconciliation — the reference's one testing
    * idea (webscraper.py:88-96): expected vs actual with unmatched → invalid
    * (0). Both sides are pre-aggregated (tiny), so the verdict join is a
    * broadcast.
    */
  def j5ValidateCounts(spark: SparkSession, dir: String): DataFrame = {
    val expected = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nation_key"))
      .agg(count("*").as("expected_count"))
    val actual = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey").as("nation_key"))
      .agg(countDistinct("c_custkey").as("actual_count"))
    Validation.validateCounts(expected, actual, "nation_key")
  }

  /** J6/P6: left-semi membership filter (the csv_fmt allowlist,
    * csv_operations.py:18). Broadcast semi-join: no shuffle, no duplicate
    * explosion.
    */
  def j6SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    // No broadcast() hint: the member set is customer-derived (~20% of
    // a fact-sized table at scale) — forcing it onto the driver would
    // fail long before 100 TB. AQE broadcasts it when it measures small
    // and degrades to a shuffled left_semi when it doesn't (reviewer
    // finding; the fixture plans identically either way).
    Tables.orders(spark, dir)
      .join(building, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  /** Anti-join: report non-members (the engine-side failure report for
    * J5/J6, SURVEY.md §2.4).
    */
  def jAntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  // ---------------------------------------------------------------------
  // Aggregations (A1-A3 + extensions)
  // ---------------------------------------------------------------------

  /** A1: group count (len(people_list[name]), planning_center.py:50).
    * Partial+final hash aggregate; map-side combine means the shuffle
    * carries one row per (partition × group), not per input row.
    */
  def a1GroupCount(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(count("*").as("n_orders"))

  /** Multi-aggregate over a fact table (TPC-H Q1 shape): sum/avg/count in
    * one pass, all map-side combinable.
    */
  def a2GroupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        count("*").as("count_order"))

  /** Exact distinct count — expands to a two-phase aggregate. At 100 TB
    * prefer [[aApproxDistinct]] (HLL++) when ±2% is acceptable: one pass, no
    * per-key state explosion.
    */
  def a3CountDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(
        countDistinct("o_custkey").as("n_customers"),
        count("*").as("n_orders"))

  /** HLL++ approximate distinct (no DuckDB oracle — estimator internals
    * differ across engines; correctness is bounded-error-vs-exact, asserted
    * in the ScalaTest spec instead).
    */
  def aApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct("l_orderkey", 0.02).as("approx_orders"))

  /** ROLLUP hierarchy totals (region → nation → grand total). Null grouping
    * slots are labelled 'ALL' so the output is oracle-stable.
    *
    * Expressed through spark.sql over a temp view: in Spark 4.1.2 the
    * DataFrame-API rollup over ANY join-derived columns trips the
    * ambiguous-self-join detector (rollup's Expand duplicates the tagged
    * grouping attributes) — reproduced with qualified dataset aliases,
    * fresh Alias exprIds, toDF(), cleared metadata, and pre-aggregation;
    * only the SQL path (no __dataset_id column tags) analyzes. Round-1
    * runtime failure.
    *
    * Scale shape: the inner GROUP BY collapses the fact table to one row
    * per (region, nation) BEFORE the rollup's 3-way Expand, so the expand
    * and second aggregation run on |groups| rows, not |customers|.
    */
  def a4Rollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"))
      .createOrReplaceTempView("a4_rollup_input")
    spark.sql(
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        |       coalesce(n_name, 'ALL') AS nation_name,
        |       sum(cnt) AS n_customers
        |FROM (SELECT r_name, n_name, count(*) AS cnt
        |      FROM a4_rollup_input GROUP BY r_name, n_name)
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin)
  }

  /** CUBE over two independent dimensions. */
  def a5Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count("*").as("n_orders"), round(sum("o_totalprice"), 2).as("total_price"),
        grouping("o_orderstatus").as("g_s"), grouping("o_orderpriority").as("g_p"))
      // grouping(), not coalesce-to-'ALL': a genuine NULL data value and
      // a cube subtotal slot would otherwise both read 'ALL' and emit
      // indistinguishable duplicate-keyed rows (reviewer finding; latent
      // on the null-free fixture, wrong as operator semantics).
      .select(
        when(col("g_s") === 1, lit("ALL"))
          .otherwise(coalesce(col("o_orderstatus"), lit("NULL"))).as("order_status"),
        when(col("g_p") === 1, lit("ALL"))
          .otherwise(coalesce(col("o_orderpriority"), lit("NULL"))).as("order_priority"),
        col("n_orders"), col("total_price"))

  // ---------------------------------------------------------------------
  // Windows / sorts / slices (§2.6, K5)
  // ---------------------------------------------------------------------

  /** Top-k per group via row_number (rank frames). One shuffle on the
    * partition key; Spark 3.1+ inserts WindowGroupLimit to stop sorting
    * whole groups at scale.
    */
  def w1TopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk").cast("long").as("rk"), col("o_orderkey"),
        col("o_totalprice"))
  }

  /** Running total — rows-between frame; accumulation order is pinned by the
    * window order so results are reproducible.
    */
  def w2RunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_total"))
  }

  /** lag/lead offsets within a key. */
  def w3LagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        coalesce(lag("o_totalprice", 1).over(w), lit(0.0)).as("prev_price"),
        coalesce(lead("o_totalprice", 1).over(w), lit(0.0)).as("next_price"))
  }

  /** Time-range window frame: per customer, orders placed in the 30 days
    * up to and including each order (RANGE frame over the date order —
    * a true value-range frame, not a row count). Money is summed in
    * integer cents so sliding-frame accumulation order can never cause a
    * float divergence between engines.
    */
  def w4RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("w4_orders")
    spark.sql(
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER w AS n_orders_30d,
        |  sum(cast(round(o_totalprice * 100) as bigint)) OVER w AS cents_30d
        |FROM w4_orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)""".stripMargin)
  }

  /** Rank-function family: dense_rank, percent_rank, cume_dist, ntile —
    * one windowed pass; the ratio outputs are (rank−1)/(n−1)-style exact
    * divisions of the same integers in both engines.
    */
  def w5RankFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select(
        col("o_orderpriority"), col("o_orderkey"),
        dense_rank().over(w).cast("long").as("drank"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).cast("long").as("quartile"))
  }

  /** first/last/nth extrema within a window. last_value and nth_value use
    * the explicit unbounded-unbounded frame: the default frame ends at
    * CURRENT ROW, which silently turns last_value into "current value" —
    * the classic window-function trap, pinned identically in the oracle.
    */
  def w6FirstLast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first("o_orderkey").over(w).as("first_key"),
        last("o_orderkey").over(w).as("last_key"),
        coalesce(nth_value(col("o_orderkey"), 2).over(w), lit(-1L)).as("second_key"))
  }

  /** Batch sessionization (gaps-and-islands): per user, events separated
    * by more than `gapMs` of silence start a new session; a running sum
    * over the new-session flags numbers the islands, then one aggregate
    * emits per-session stats. The streaming twin is
    * [[graft.streaming.Sessionize]]; this is the same semantics as a
    * single batch plan — two windowed passes over ONE partitioning
    * (user_id), so the sort is done once and reused, then a hash
    * aggregate on (user_id, session_seq) that lands in the same
    * partitioning — no extra shuffle (the reference has no session
    * concept; this is the events-table analog of its per-list grouping,
    * `dags/tasks/planning_center.py:29`).
    *
    * Timestamps are compared as integer epoch millis so gap arithmetic
    * is exact and identical in the oracle. At 100 TB this is one shuffle
    * on user_id — the partitioning a sessionizing pipeline would already
    * keep its events in.
    */
  def w7Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapMs = 30L * 60 * 1000
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val flagged = ev.withColumn("new_sess",
      when(col("ts_ms") - lag("ts_ms", 1).over(w) > gapMs
        || lag("ts_ms", 1).over(w).isNull, 1L).otherwise(0L))
    flagged
      .withColumn("session_seq",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_ms").as("start_ms"),
        max("ts_ms").as("end_ms"),
        (max("ts_ms") - min("ts_ms")).as("duration_ms"))
  }

  /** Scalar subquery (uncorrelated): rows above a global aggregate. In
    * Spark the one-row aggregate is joined back with a broadcast nested
    * loop — exactly how a scalar subquery executes, but declared with
    * the DataFrame API; the oracle states it as `(SELECT avg(...) ...)`.
    * The filter compares against the UNROUNDED double average: order
    * prices carry 2 decimals, so no price can sit within float-summation
    * noise of the mean.
    */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val globalAvg = orders.agg(avg("o_totalprice").as("avg_price"))
    orders.crossJoin(broadcast(globalAvg))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  /** Correlated scalar subquery: customers whose spend exceeds their
    * nation's average spend. The oracle states it with two correlated
    * subqueries (re-scan per row); the engine states the same WHAT as
    * ONE pass with window aggregates over the nation partition — the
    * re-expression that makes the operator scale (a correlated re-scan
    * is the N+1 anti-pattern of SURVEY.md §4 in SQL form). The
    * comparison is the integer cross-multiplication
    * spend·n > total — no division, no floats.
    */
  def qCorrelatedScalar(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
    val perCustomer = Tables.customer(spark, dir)
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_nationkey"),
        coalesce(col("cents"), lit(0L)).as("cents"))
    val w = Window.partitionBy("c_nationkey")
    perCustomer
      .withColumn("nation_total_cents", sum("cents").over(w))
      .withColumn("n_in_nation", count(lit(1)).over(w))
      .filter(col("cents") * col("n_in_nation") > col("nation_total_cents"))
      .select(col("c_custkey"), col("cents"), col("nation_total_cents"), col("n_in_nation"))
  }

  /** Array-function family over the token arrays: size, slice+join,
    * sort extremum, membership. All codegen'd built-ins, no lambda HOFs
    * (those run interpreted — the LlmOps lesson); string sort order is
    * binary/codepoint in both engines.
    */
  def f10Arrays(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        expr("cast(size(split(text, ' ')) as bigint)").as("n_tokens"),
        expr("array_join(slice(split(text, ' '), 1, 3), ' ')").as("first3"),
        expr("element_at(sort_array(split(text, ' ')), 1)").as("min_token"),
        expr("cast(array_contains(split(text, ' '), 'the') as int)").as("has_the"))

  /** GROUPING SETS — the general form rollup/cube specialize. SQL-text
    * path for the same Spark 4.1.2 ambiguity reason as [[a4Rollup]].
    */
  def a7GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("a7_orders")
    spark.sql(
      """SELECT CASE WHEN grouping(o_orderstatus) = 1 THEN 'ALL'
        |            ELSE coalesce(o_orderstatus, 'NULL') END AS order_status,
        |       CASE WHEN grouping(o_orderpriority) = 1 THEN 'ALL'
        |            ELSE coalesce(o_orderpriority, 'NULL') END AS order_priority,
        |       count(*) AS n_orders
        |FROM a7_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  /** Exact percentiles per group. Computed over the integer order key so
    * linear interpolation ((a+b)·frac) is exact in double for both
    * engines — the float-discipline rule (SURVEY.md §7.4) applied to
    * quantiles. For big data prefer approx_percentile (t-digest
    * sketch, one pass, mergeable) — bounded-error spec in
    * ApproxDistinctSpec's style.
    */
  def a10Percentile(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile(o_orderkey, 0.5)").as("median_key"),
        expr("percentile(o_orderkey, 0.9)").as("p90_key"),
        count("*").as("n"))

  /** Pivot: long→wide on an explicit value list (always name the pivot
    * values: an unlisted pivot scans twice to discover them and the
    * output schema becomes data-dependent — both wrong at scale).
    */
  def a8Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  /** Unpivot (melt): wide→long — the inverse reshaping, over the full
    * outer join's two count columns.
    */
  def a9Unpivot(spark: SparkSession, dir: String): DataFrame =
    j8FullOuter(spark, dir)
      .unpivot(
        Array(col("nation_key")),
        Array(col("n_customers"), col("n_suppliers")),
        "metric", "value")

  /** K5: the Sheets range-copy (google_sheets.py:77-88) — ordered offset 1,
    * take ≤498 rows, first 5 columns, values materialized.
    */
  def k5Slice(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey")
      .offset(1)
      .limit(498)

  /** Global top-k: Catalyst plans TakeOrderedAndProject — per-partition
    * heaps, only k rows cross the wire.
    */
  def topkGlobal(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  // ---------------------------------------------------------------------
  // Set operations (§2.7)
  // ---------------------------------------------------------------------

  private def buildingCustkeys(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))

  private def orderingCustkeys(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(col("o_custkey").as("custkey")).distinct()

  def setUnion(spark: SparkSession, dir: String): DataFrame =
    // No trailing orderBy: row order is not part of the contract (file
    // header) and a global sort after the distinct is a full extra
    // exchange at scale for nothing (reviewer finding).
    buildingCustkeys(spark, dir).union(orderingCustkeys(spark, dir))
      .distinct()

  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    buildingCustkeys(spark, dir).intersect(orderingCustkeys(spark, dir))

  def setExcept(spark: SparkSession, dir: String): DataFrame =
    orderingCustkeys(spark, dir).except(buildingCustkeys(spark, dir))

  // ---------------------------------------------------------------------
  // Scalar-function queries (F1, F2, F6)
  // ---------------------------------------------------------------------

  /** F1: the age derivation with the tuple-compare birthday adjustment
    * (planning_center.py:73-78), applied to order dates against a pinned
    * as-of date, then aggregated.
    */
  def f1AgeLabel(spark: SparkSession, dir: String): DataFrame = {
    val asOf = to_date(lit(AsOfDate))
    Tables.orders(spark, dir)
      .select(ageLabel(col("o_orderdate"), asOf).as("age_label"))
      .groupBy("age_label")
      .agg(count("*").as("n_orders"))
  }

  /** F2: "Grade <g>" with Python-truthiness zero handling
    * (planning_center.py:81-82) — c_nationkey includes 0, which must map to
    * '' exactly like the reference.
    */
  def f2GradeLabel(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(gradeLabel(col("c_nationkey")).as("grade_label"))
      .groupBy("grade_label")
      .agg(count("*").as("n_customers"))

  /** F6: JSON field access (csv_operations.py:13 / the JSON:API nested
    * reads) — get_json_object over the events.props JSON string.
    */
  def f6JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy("event_type")
      .agg(
        round(avg("k"), 2).as("avg_k"),
        round(sum("value"), 2).as("total_value"),
        count("*").as("n_events"))

  /** F6b: from_json into a typed struct (vs f6's get_json_object path —
    * from_json parses once per row into a struct; prefer it when several
    * fields are read). Null-safe: malformed JSON yields a null struct.
    */
  def f7FromJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).as("p"))
      .select(col("event_id"), coalesce(col("p.k"), lit(-1)).as("k"))

  /** F8b: date/time function family over order dates — trunc, diff,
    * add_months, extract; all integer/date outputs (oracle-exact).
    */
  def f8Datetime(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
        datediff(to_date(lit(AsOfDate)), col("o_orderdate").cast("date")).cast("long").as("days_ago"),
        add_months(col("o_orderdate").cast("date"), 3).as("due_month"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        quarter(col("o_orderdate")).cast("long").as("qtr"))

  /** F9: string function family — case, padding, translation, edit
    * distance (levenshtein is built-in in both engines).
    */
  def f9Strings(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        initcap(lower(col("c_mktsegment"))).as("segment_label"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded_key"),
        translate(col("c_name"), "#", "-").as("clean_name"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("long").as("seg_dist"))

  /** S5: parse-into-rows over semi-structured text (the HTML-card scrape,
    * webscraper.py:64-77 — name at :69, int(count) at :70): regexp
    * extraction + cast + aggregate, all on the scan side of any join.
    * Here the events.props JSON strings play the semi-structured page.
    */
  def s5ParseSource(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_type"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int").as("k"))
      .groupBy("event_type")
      .agg(
        count("*").as("n_rows"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        sum("k").as("sum_k"))

  /** S6+P6+P7: the csv_fmt config map (csv_operations.py:12-19) — a tiny
    * driver-side map becomes a broadcast lookup table; membership filter
    * (only configured keys survive, :18) + rename-via-lookup (:19) in one
    * broadcast inner join. Zero shuffle of the fact side.
    */
  def p7RenameLookup(spark: SparkSession, dir: String): DataFrame = {
    val fmt = spark.createDataFrame(Seq(
      ("en", "english_docs"),
      ("de", "german_docs"),
      ("fr", "french_docs"))).toDF("lang", "csv_name")
    Tables.documents(spark, dir)
      .join(broadcast(fmt), "lang")
      .select(col("doc_id"), col("lang"), col("csv_name"))
  }

  /** J4: the second pick-first+default instance (phones,
    * planning_center.py:68-70, same pattern as emails :63-65): cheapest
    * supplier per part from lineitem, parts with no lineitem defaulting.
    * Pick-first runs BEFORE the left join so the join stays 1:1.
    *
    * The pick is an argmin via `min(struct(price, suppkey))` — struct
    * ordering is lexicographic, so this selects exactly the window
    * row_number()-over-(price, suppkey) = 1 row, but as a PARTIALLY
    * AGGREGATED groupBy: each map task reduces its partition to one
    * candidate per part BEFORE the shuffle, so the exchange carries
    * |parts| rows, not |lineitem|. (Struct min plans as SortAggregate —
    * a map-side sort on the group key only; the win is shuffle volume.)
    * The window form (kept in [[p4PickFirst]], where the windowed
    * family is the point) shuffles every fact row and sorts each
    * partition by the full (key, price, suppkey) order — at 100 TB the
    * difference is shuffling the whole fact table.
    */
  def j4PickFirstSupplier(spark: SparkSession, dir: String): DataFrame = {
    val cheapest = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(min(struct(col("l_extendedprice"), col("l_suppkey"))).as("best"))
      .select(col("l_partkey"), col("best.l_suppkey").as("cheapest_suppkey"),
        col("best.l_extendedprice").as("cheapest_price"))
    Tables.part(spark, dir)
      .join(cheapest, col("p_partkey") === col("l_partkey"), "left")
      .select(
        col("p_partkey"),
        coalesce(col("cheapest_suppkey"), lit(-1L)).as("cheapest_suppkey"),
        coalesce(col("cheapest_price"), lit(0.0)).as("cheapest_price"))
  }

  /** Full outer join (SURVEY.md §2.4 declared-for-completeness variant):
    * customer vs supplier presence per nation — nations with only one
    * side survive with a zero count on the other. Both sides pre-aggregate
    * to one row per key before the join (map-side combine; the join never
    * explodes).
    */
  def j8FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val custN = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey")).agg(count("*").as("n_customers"))
    val suppN = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey")).agg(count("*").as("n_suppliers"))
    custN.join(suppN, col("c_nationkey") === col("s_nationkey"), "full")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nation_key"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
  }

  /** As-of join (SURVEY.md §2.4 engine extension — absent from the
    * reference): for each error event, the latest NON-error event of the
    * same user at or before it (the "what happened right before the
    * failure" query). Composed from existing operators (preference (a)
    * in the builder contract) as a PREFIX SCAN: union both event kinds
    * into one per-user stream, sort once by (ts, is_err, event_id), and
    * carry the last non-error row forward with `last(..., ignoreNulls)`
    * over a running frame — ONE exchange + one sort, linear in rows.
    *
    * The first composition here (inequality equi-join + argmax) was
    * KILLED by measurement: it materializes every (error, earlier
    * event) pair per user before aggregating, so its intermediate grows
    * with errors×prior-events per user — 0.57 s → 9.1 s (15.9× at 10×
    * rows) in the r10 sf1 sweep, vs 4.1× for this form and the native
    * merge. Tie order matches the oracle: non-errors sort BEFORE an
    * error at the same ts (at-or-before includes equal ts), and
    * event_id breaks ts ties so "last" = max (ts, event_id).
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        (col("event_type") === "error").as("is_err"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_err"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("prev",
        last(when(!col("is_err"),
            struct(col("ts"), col("event_id"), col("event_type"))),
          ignoreNulls = true).over(w))
      // Inner-join semantics: errors with no prior non-error are dropped,
      // exactly as the oracle's JOIN does.
      .filter(col("is_err") && col("prev").isNotNull)
      .select(
        col("event_id").as("error_id"), col("user_id"), col("ts").as("error_ts"),
        col("prev.ts").as("prev_ts"),
        col("prev.event_id").as("prev_event_id"),
        col("prev.event_type").as("prev_event_type"))
  }

  /** Conditional / boolean aggregate family: count_if, bool_and,
    * bool_or, and a deterministic max_by (argmax). The argmax ordinal
    * is integer cents scaled plus the key as tie-break — max_by on a
    * duplicated raw price would be free to return either row on either
    * engine. All single-pass, map-side combinable.
    */
  def f12ConditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(
        expr("count_if(o_totalprice > 100000)").as("n_big"),
        expr("bool_and(o_totalprice > 0)").as("all_positive"),
        expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
        // cents * 1e7 + key: keys stay below 1e7 at every corpus SF, so
        // the key only ever breaks exact-price ties.
        expr("max_by(o_orderkey, cast(round(o_totalprice * 100) as bigint) * 10000000 + o_orderkey)")
          .as("priciest_key"))

  /** Global row numbers over a total order, the scale-safe way — see
    * [[Scale.globalRowNumbers]]: range-partitioned sort + per-partition
    * offsets instead of the naive empty-PARTITION-BY window that funnels
    * the whole table through one task. Unique sort key (o_orderkey)
    * makes the numbering independent of sampler-chosen partition
    * boundaries, so the oracle is a plain row_number OVER (ORDER BY).
    */
  def qGlobalRownum(spark: SparkSession, dir: String): DataFrame =
    Scale.globalRowNumbers(
        Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
        Seq("o_orderkey"))
      .select(col("o_orderkey"), col("rn"))

  /** Approximate percentiles (GK sketch): the constant-memory
    * counterpart to [[a10Percentile]]'s exact quantiles — at 100 TB the
    * exact form needs a full sort per group, the sketch one pass and a
    * mergeable O(1/ε) summary (same contract family as
    * approx_count_distinct, a6). No DuckDB oracle BY CONTRACT (sketch
    * results are engine-specific); ApproxDistinctSpec bounds the error
    * against the exact percentiles instead.
    */
  def a12ApproxPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile_approx(o_totalprice, array(0.5D, 0.9D), 10000)").as("pcts"),
        count(lit(1)).as("n"))
      .select(col("o_orderstatus"),
        col("pcts").getItem(0).as("p50_approx"),
        col("pcts").getItem(1).as("p90_approx"),
        col("n"))

  /** A14: sketch-merge — the pre-aggregation pattern behind every
    * incremental distinct-count dashboard. Daily DataSketches HLL
    * sketches of active users are built ONCE (one pass over events),
    * then the weekly distinct count is the UNION of the day sketches —
    * no second scan of the raw data. At 100 TB this is the difference
    * between "re-scan a quarter of events per weekly rollup" and
    * "merge 7 kilobyte-sized sketches": stored daily sketches make any
    * window (week, month, arbitrary ad-hoc span) answerable at
    * metadata cost, and the merge is associative so it map-combines.
    * No DuckDB oracle BY CONTRACT (sketch bytes are engine-specific);
    * ApproxDistinctSpec bounds the weekly estimates against exact
    * distincts instead.
    */
  def a14HllMerge(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(date_trunc("DAY", col("ts")).as("day"), col("user_id"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"), count(lit(1)).as("n_events"))
    daily
      .groupBy(date_trunc("WEEK", col("day")).cast("date").as("week"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
        sum("n_events").as("n_events"))
  }

  /** Q_EVENT_NGRAMS: sequential-pattern mining lite — corpus-wide counts
    * of per-user event-type TRIGRAMS (what users actually do next), the
    * building block of next-action models and funnel discovery. Each
    * user's stream is ordered by (ts, event_id) — a total order, so the
    * trigram multiset is deterministic — and the trigram extraction is
    * two LAG frames over one window pass. Scale shape: one hash shuffle
    * on user_id with per-partition sort (never global), then a
    * wordcount-style aggregate whose ≤|event_types|³ key space
    * map-combines to almost nothing.
    */
  def qEventNgrams(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      // NULL-typed events are ABSENT from the sequence (dropped BEFORE
      // the window, so lags never straddle them) — without this,
      // concat_ws would silently shrink a trigram to a bigram while the
      // oracle's `||` nulls the whole pattern (reviewer finding; the
      // fixture has no NULL types, so only the contract sees it).
      .filter(col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .select(col("event_type").as("t3"),
        lag("event_type", 1).over(w).as("t2"),
        lag("event_type", 2).over(w).as("t1"))
      .filter(col("t1").isNotNull)
      .groupBy(concat_ws(" > ", col("t1"), col("t2"), col("t3")).as("pattern"))
      .agg(count(lit(1)).as("n"))
  }

  /** Q_WINSORIZE: per-group outlier clipping at the 5th/95th RANK — the
    * feature-engineering normalization pass (clip, then feed the model).
    * Bounds are ORDER STATISTICS (row_number against ⌊n·5/100⌋ with a
    * (value, key) tie-break), not interpolated percentiles: integer
    * ranks give bit-identical bounds on any engine, where interpolated
    * quantiles would ride float position arithmetic. Scale shape: one
    * window pass partitioned by the group (hash-shuffle, per-partition
    * sort, never global), a ≤|groups|-row bounds aggregate broadcast
    * back onto the fact rows, and the clip itself is a codegen'd
    * least/greatest projection.
    */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """WITH t AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    cast(round(o_totalprice * 100) as bigint) AS cents
        |  FROM orders),
        |ranked AS (
        |  SELECT o_orderstatus, cents,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY cents, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM t),
        |bounds AS (
        |  SELECT o_orderstatus,
        |    max(CASE WHEN rn = greatest(1, (n * 5) div 100) THEN cents END) AS lo,
        |    max(CASE WHEN rn = least(n, (n * 95) div 100 + 1) THEN cents END) AS hi
        |  FROM ranked GROUP BY o_orderstatus)
        |SELECT o_orderkey, t.o_orderstatus, cents,
        |  least(greatest(cents, lo), hi) AS clipped_cents
        |FROM t JOIN bounds ON t.o_orderstatus = bounds.o_orderstatus""".stripMargin)
  }

  /** Ordered collection aggregate: each customer's order keys as one
    * comma-joined string in (date, key) order. collect_list gives NO
    * ordering guarantee across partitions — the deterministic form is
    * collect structs → array_sort (lexicographic on the struct) →
    * project+join; the oracle states the same thing as
    * `string_agg(... ORDER BY)`. The transform lambda runs interpreted
    * (see the minhash notes) but touches one small array per GROUP, not
    * per row — off the hot path.
    */
  def f11Collect(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        concat_ws(",",
          expr("transform(array_sort(collect_list(struct(o_orderdate, o_orderkey))), " +
            "x -> cast(x.o_orderkey as string))")).as("order_keys"),
        count(lit(1)).as("n_orders"))

  /** Equi-width histogram over event values with data-derived bounds —
    * 20 buckets between [min, max], edges computed in integer millis so
    * the bucket function is exact integer arithmetic on both engines
    * (a float `(v-lo)/width` would put boundary values on different
    * sides after one ulp of divergence). One scan for bounds (broadcast
    * single row), one scan for the bucketed aggregate — the standard
    * two-pass distributed histogram; at 100 TB both passes are map-side
    * combinable.
    */
  def a11Histogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(expr("cast(round(value * 1000) as bigint)").as("v_milli"))
    val bounds = ev.agg(min("v_milli").as("lo"), max("v_milli").as("hi"))
    ev.crossJoin(broadcast(bounds))
      .select(col("v_milli"),
        least(lit(19L), expr("((v_milli - lo) * 20) div (hi - lo + 1)")).as("bucket"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_events"),
        min("v_milli").as("min_v_milli"),
        max("v_milli").as("max_v_milli"))
  }

  /** The as-of join again, through the NATIVE whole-operator path
    * ([[graft.plans.AsOfJoin]] → AsOfJoinExec): one co-partitioning
    * exchange per side, a sort, and an O(n+m) merge scan per partition —
    * versus [[qAsofJoin]]'s union + running-window prefix scan, which
    * pays one wider sort over the unioned stream and carries the
    * last-seen struct through every row. Both are linear (the r10 sf1
    * sweep measured ~4× at 10× rows for each); the merge keeps the
    * smaller constant and never widens the probe rows.
    * Same oracle as q_asof_join: the two formulations must agree row
    * for row (no (user_id, ts) ties exist in the corpus, so the
    * merge's last-wins and argmax's struct-max tie-breaks coincide).
    */
  def qAsofNative(spark: SparkSession, dir: String): DataFrame = {
    val errors = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("error_ts"))
    val others = Tables.events(spark, dir)
      .filter(col("event_type") =!= "error")
      .select(col("user_id").as("u2"), col("ts"), col("event_id"), col("event_type"))
    graft.plans.AsOf.join(errors, others, Seq("user_id"), Seq("u2"), "error_ts", "ts")
      .select(col("error_id"), col("user_id"), col("error_ts"),
        col("ts").as("prev_ts"), col("event_id").as("prev_event_id"),
        col("event_type").as("prev_event_type"))
  }

  /** SCD type-2 history build: compress each user's event stream into
    * versioned validity intervals — a new version starts whenever the
    * tracked attribute (event_type) CHANGES, valid_to is the instant
    * before the next change (-1 sentinel = still current). The classic
    * slowly-changing-dimension construction: change detection via lag,
    * interval close via lead, version numbers via row_number — three
    * window functions over ONE (user_id) partitioning, so the whole
    * history builds in a single shuffle; at 100 TB this is the
    * change-data-capture compaction pass run per ingest window.
    * Integer epoch millis throughout (exact arithmetic, oracle-aligned).
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(
        col("user_id"), col("event_type"),
        col("ts_ms").as("valid_from_ms"),
        coalesce(lead("ts_ms", 1).over(w) - 1, lit(-1L)).as("valid_to_ms"),
        row_number().over(w).cast("long").as("version"))
  }

  /** Range join: events against 48 overlapping time windows derived from
    * the corpus's own [min, max] span — executed via [[Scale.rangeJoin]]
    * as a bucketed equi-join (1-hour buckets), never a nested loop over
    * data×data. All window arithmetic is integer epoch millis (`div`,
    * never float division) so the oracle's `//` computes the identical
    * bounds. Values are summed as integer millis. The window table here
    * is small, but the plan shape is the one that survives both sides
    * being large — see the scaladoc on [[Scale.rangeJoin]].
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      unix_millis(col("ts")).as("ts_ms"),
      expr("cast(round(value * 1000) as bigint)").as("value_milli"))
    val bounds = ev.agg(min("ts_ms").as("lo"), max("ts_ms").as("hi"))
    val windows = spark.range(48).toDF("w_id")
      .crossJoin(broadcast(bounds))
      .select(col("w_id"),
        (col("lo") + col("w_id") * expr("(hi - lo + 1) div 64")).as("w_start"),
        (col("lo") + col("w_id") * expr("(hi - lo + 1) div 64")
          + expr("(hi - lo + 1) div 32 + 1")).as("w_end"))
    Scale.rangeJoin(ev, "ts_ms", windows, "w_start", "w_end", bucketWidth = 3600000L)
      .groupBy("w_id")
      .agg(count(lit(1)).as("n_events"), sum("value_milli").as("sum_value_milli"))
  }

  /** Interval-overlap join: two order cohorts, each order an active
    * 14-day half-open window from its order date, matched on WINDOW
    * OVERLAP — the campaign-overlap / concurrent-sessions query class
    * where BOTH join sides are ranges and a naive plan is a nested loop
    * over data×data. Executed via [[Scale.intervalJoin]]: fixed-width
    * bucket explode on both sides, bucket equi-join, overlap re-check,
    * first-shared-bucket uniqueness (no distinct). Day arithmetic is
    * all integer (`unix_date`), so the oracle's date subtraction
    * computes identical bounds.
    */
  def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    def side(m: Int, p: String) = Tables.orders(spark, dir)
      .filter(col("o_custkey") % 50 === m)
      .select(
        col("o_orderkey").as(s"${p}_orderkey"),
        expr("cast(unix_date(cast(o_orderdate as date)) as bigint)").as(s"${p}_lo"),
        expr("cast(unix_date(cast(o_orderdate as date)) as bigint) + 14").as(s"${p}_hi"))
    Scale.intervalJoin(
        side(1, "a"), "a_lo", "a_hi",
        side(2, "b"), "b_lo", "b_hi", bucketWidth = 14L)
      .select(col("a_orderkey"), col("b_orderkey"),
        (least(col("a_hi"), col("b_hi")) - greatest(col("a_lo"), col("b_lo")))
          .as("overlap_days"))
  }

  /** Date-spine gap fill: per-customer monthly order rollup with every
    * missing month materialized as an explicit zero row — the "no data
    * IS data" step every time-series feature build needs before windows
    * or forecasting (a lag over a series with silent holes is wrong).
    *
    * The spine is generated PER KEY from that key's own [min, max]
    * month bounds (`sequence` + explode) — no driver-side date loop, no
    * global calendar cross join: rows ∝ Σ per-key span. The fill join is
    * a left join on (key, month) — both sides hash-partition on the same
    * compound key. Integer cents; months as DATE.
    */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 200)
      .groupBy(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
    val spine = monthly
      .groupBy("o_custkey")
      .agg(min("month").as("lo"), max("month").as("hi"))
      .select(col("o_custkey"),
        explode(expr("sequence(lo, hi, interval 1 month)")).as("month"))
    spine.join(monthly, Seq("o_custkey", "month"), "left")
      .select(col("o_custkey"), col("month"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("cents"), lit(0L)).as("cents"))
  }

  /** Fuzzy match / entity resolution: near-identical names found with a
    * BLOCKED Levenshtein join — the data-cleaning step that links
    * "Customer#000000019" to its typo'd twin. Edit distance is O(len²)
    * per pair, so the join must never be all-pairs: candidates come from
    * an equi-join on a cheap blocking key (nation, custkey-hundred) and
    * only blocked pairs pay the distance call. Same candidate-then-
    * verify skeleton as the dedup family (d2/d4) with an edit-distance
    * verifier instead of Jaccard. `levenshtein` is a codegen'd built-in
    * returning an int — oracle-exact.
    *
    * At 100 TB the blocking key is the whole game (phonetic code,
    * sorted-neighborhood window, or LSH over char n-grams); the plan
    * shape — equi-join on the block, distance on candidates only —
    * stays identical.
    */
  def qFuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    def side(p: String) = Tables.customer(spark, dir).select(
      col("c_custkey").as(s"${p}key"),
      col("c_name").as(s"${p}name"),
      col("c_nationkey").as(s"${p}nation"),
      expr("c_custkey div 100").as(s"${p}block"))
    side("a_").join(side("b_"),
        col("a_nation") === col("b_nation") &&
          col("a_block") === col("b_block") &&
          col("a_key") < col("b_key"))
      .select(col("a_key").as("cust_a"), col("b_key").as("cust_b"),
        levenshtein(col("a_name"), col("b_name")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= 3)
  }

  /** Sorted-neighborhood window: each row is a candidate against its
    * next [[FuzzyWindow]] rows in sort order, per pass.
    */
  val FuzzyWindow = 10

  /** Fuzzy match with blocking derived from the MATCH FIELD itself —
    * the entity-resolution form [[qFuzzyMatch]] can't be: its
    * (nation, custkey-hundred) block is id-derived, so a typo'd
    * duplicate whose surrogate key landed far away is unreachable no
    * matter how small the edit distance (round-5 finding).
    *
    * Method: two-pass SORTED NEIGHBORHOOD over the name. Pass 1 sorts
    * by the name, pass 2 by its reversal; each row pairs with its next
    * FuzzyWindow rows in that order, the union of both passes is
    * verified with Levenshtein. Why two passes: a sort co-locates
    * names sharing a long PREFIX, so an edit near the end is caught by
    * pass 1, an edit near the start keeps the suffix — i.e. the
    * reversed name's prefix — and is caught by pass 2. (Prefix-key or
    * q-gram blocking both degenerate on this corpus: every name shares
    * `Customer#00...`, so the discriminating characters sit at the
    * END of the string.)
    *
    * Scale shape: each pass is one range-partitioned sort
    * ([[Scale.globalRowNumbers]] — no single-partition window) plus a
    * BOUNDED self-join (exactly FuzzyWindow successors per row, so
    * candidates = 2·W·n, linear in n — no block can go quadratic, the
    * failure mode a skewed equi-join block has). The ±W band runs as an
    * explode-to-successor-rn EQUI-join, never an inequality nested
    * loop (see the comment in `pass`).
    */
  def qFuzzyMatchName(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_name").as("name"))
    def pass(sortKey: org.apache.spark.sql.Column): DataFrame = {
      val rn = graft.PersistScope.persisted(
        Scale.globalRowNumbers(base.withColumn("sortkey", sortKey), Seq("sortkey")))
      // The ±W band stated as an inequality join would plan as a nested
      // loop over n² rn pairs (measured: 82 s at sf0.1). Exploding each
      // row to its W successor rns makes it a plain shuffled EQUI-join —
      // exactly W candidate rows per input row, linear in n.
      rn.select(col("rn").as("rn_a"), col("key").as("key_a"), col("name").as("name_a"))
        .withColumn("rn_b", explode(expr(s"sequence(rn_a + 1, rn_a + $FuzzyWindow)")))
        .join(
          rn.select(col("rn").as("rn_b"), col("key").as("key_b"), col("name").as("name_b")),
          "rn_b")
        .select("key_a", "key_b", "name_a", "name_b")
    }
    pass(col("name")).unionByName(pass(reverse(col("name"))))
      .select(
        least(col("key_a"), col("key_b")).as("cust_a"),
        greatest(col("key_a"), col("key_b")).as("cust_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= 3)
      .distinct()
  }

  /** F14: regex scalar family — extract, count, and match built-ins
    * (anchored extract, occurrence count, containment test) in one
    * map-only pass. These stay inside whole-stage codegen (Java regex
    * compiled once per task), unlike a UDF reimplementation.
    */
  def f14Regex(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^[a-z]+", 0).as("first_word"),
        expr("cast(regexp_count(p_name, '[aeiou]+') as bigint)").as("n_vowel_runs"),
        col("p_name").rlike("(ring|bolt)").as("is_fastener"))

  /** F15: VARIANT column family — Spark 4's native semi-structured type
    * (`parse_json` → open-schema binary-encoded values, `variant_get`
    * typed path extraction, `try_variant_get` null-on-miss). Between
    * f7's fixed struct (full schema known) and f13's map<string,string>
    * (stringly typed), VARIANT is the third point: schema-on-read with
    * per-path TYPED access and no upfront schema at all — the shape a
    * landing zone of heterogeneous JSON wants. Map-only, one parse per
    * row feeding every extraction; missing paths yield NULL (''-coalesced
    * at the boundary, the engine's null discipline), never an error.
    */
  def f15Variant(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // try_ forms throughout: one malformed props row (or a non-numeric
      // k) must yield NULL for that row, never abort the query — the
      // same defensive posture f13 takes on this column (reviewer
      // finding; parse_json/variant_get throw).
      .select(col("event_id"), expr("try_parse_json(props)").as("v"))
      .select(
        col("event_id"),
        expr("try_variant_get(v, '$.k', 'bigint')").as("k_num"),
        expr("try_variant_get(v, '$.k', 'string')").as("k_str"),
        expr("coalesce(try_variant_get(v, '$.absent', 'string'), '')").as("missing"))

  /** Robust outlier detection: customers whose account balance sits
    * more than 1.5 MADs from their segment's MEDIAN — median/MAD, not
    * mean/stddev, because one whale in a segment inflates a stddev
    * gate until nothing else flags (the classic robust-stats argument).
    * All comparisons run on DOUBLED integers: cents×2 and deviation×2
    * keep the .5 midpoints exact-percentile interpolation produces on
    * integer inputs, so the MAD cut is a pure integer compare on both
    * engines — no float tolerance. (1.5, not the normal-data 3.0: the
    * fixture balances are uniform, and a uniform tail never exceeds
    * 2 MADs — a 3-MAD gate on this corpus proves nothing.) Two grouped aggregates + broadcast
    * joins back; the fact table is scanned twice (median, then
    * deviations) — the unavoidable two-pass shape of exact MAD.
    */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_custkey"), col("c_mktsegment").as("segment"),
      expr("cast(round(c_acctbal * 100) as bigint)").as("cents"))
    val med = c.groupBy("segment")
      .agg(expr("cast(round(2 * percentile(cents, 0.5)) as bigint)").as("med2"))
    val dev = c.join(broadcast(med), "segment")
      .withColumn("dev2", abs(lit(2) * col("cents") - col("med2")))
    val mad = dev.groupBy("segment")
      .agg(expr("cast(round(2 * percentile(dev2, 0.5)) as bigint)").as("mad4"))
    dev.join(broadcast(mad), "segment")
      .filter(col("dev2") * 4 > col("mad4") * 3)
      .select(col("c_custkey"), col("segment"), col("cents"),
        col("med2"), col("dev2"), col("mad4"))
  }

  /** Funnel conversion: per signup cohort-day, how many users ever
    * purchased AFTER their first signup. The inequality ("a purchase at
    * or after the signup") folds into per-user aggregates — max purchase
    * ts vs min signup ts — so the join is a 1:1 equi-join on user_id,
    * never an event×event inequality join. Conversion is integer milli.
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(max("ts").as("last_p"))
    s.join(p, Seq("user_id"), "left")
      .select(
        expr("cast(date_trunc('day', s_ts) as date)").as("cohort_day"),
        (col("last_p").isNotNull && col("last_p") >= col("s_ts"))
          .cast("long").as("converted"))
      .groupBy("cohort_day")
      .agg(count(lit(1)).as("n_signups"), sum("converted").as("n_converted"),
        expr(graft.operators.LlmOps.milli("sum(converted)", "count(1)")).as("conv_milli"))
  }

  /** Q_FUNNEL_STEPS: three-step ORDERED funnel (signup → first view
    * strictly after it → first purchase strictly after that), counted
    * per signup cohort week — the sequential-pattern query class
    * (SQL:2016 MATCH_RECOGNIZE territory) expressed as iterated
    * conditional aggregation: each step is a map-combinable min() over
    * the step's event type, joined 1:1 on user_id to the previous
    * step's timestamp and filtered to "strictly after". Three
    * fact-side filters cut each scan to one event type BEFORE its
    * aggregate; the three per-user frames then join on the same
    * user_id key (one clustering reused), and the cohort rollup is a
    * metadata-sized aggregate. Never an event×event inequality join —
    * same discipline as [[qFunnel]], extended to an arbitrary-depth
    * step chain.
    */
  def qFunnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def firstOf(tpe: String) = ev.filter(col("event_type") === tpe)
    // s1/s2 pinned (r16): each feeds the next step AND the final join —
    // unpinned, their scan+aggregate subtrees ran twice apiece (6 events
    // scans in the r16 scan audit, 3 needed).
    val s1 = graft.PersistScope.persisted(
      firstOf("signup").groupBy("user_id").agg(min("ts").as("t1")))
    val s2 = graft.PersistScope.persisted(
      firstOf("view").join(s1, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2")))
    val s3 = firstOf("purchase").join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(expr("cast(date_trunc('week', t1) as date)").as("cohort_week"),
        col("t2"), col("t3"))
      .groupBy("cohort_week")
      .agg(count(lit(1)).as("n_signup"),
        count(col("t2")).as("n_viewed"),
        count(col("t3")).as("n_purchased"))
  }

  /** Retention cohort matrix: users grouped by first-seen week, one row
    * per (cohort week, week offset) with the count still active — the
    * triangle every growth dashboard draws. Two map-combinable
    * aggregates plus one user-keyed equi-join; distinct (user, week)
    * activity collapses BEFORE the join so events are shuffled once.
    */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cohort = ev.groupBy("user_id")
      .agg(expr("cast(date_trunc('week', min(ts)) as date)").as("cohort_week"))
    val active = ev
      .select(col("user_id"), expr("cast(date_trunc('week', ts) as date)").as("week"))
      .distinct()
    active.join(cohort, "user_id")
      .select(col("cohort_week"),
        expr("datediff(week, cohort_week) div 7").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
  }

  /** TPC-H Q3 (shipping-priority), adapted to the fixture's columns and
    * date span — exercised through the plain `spark.sql` TEXT surface
    * over [[Tables.registerAll]]'s views: the "switch to this library"
    * path where Catalyst does join ordering/broadcast selection from SQL
    * alone, no DataFrame hints. Revenue is integer CENTS (per-row
    * round, then sum) so the top-10 cut and the hash compare never ride
    * on double-sum ULPs; ORDER BY (revenue, key) is a total order, so
    * the LIMIT 10 set is deterministic on both engines.
    */
  def qTpchQ3(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT o_orderkey,
        |  sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) AS revenue_cents,
        |  cast(o_orderdate as date) AS order_date
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < timestamp'1998-03-15'
        |  AND l_shipdate > timestamp'1998-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue_cents DESC, o_orderkey
        |LIMIT 10""".stripMargin)
  }

  /** TPC-H Q5 (local-supplier volume), adapted: six-table join — the
    * plan-complexity stress where join ORDER matters most (region/nation
    * broadcast, customer⋈orders⋈lineitem⋈supplier shuffled on their
    * keys). Same spark.sql text surface and integer-cents discipline as
    * [[qTpchQ3]].
    */
  def qTpchQ5(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT n_name,
        |  sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= timestamp'1996-01-01'
        |  AND o_orderdate < timestamp'1997-01-01'
        |GROUP BY n_name""".stripMargin)
  }

  /** TPC-H Q1 (pricing summary), adapted: the canonical wide-aggregate
    * scan — one pass over the fact table, four sums + a count per
    * (returnflag, linestatus) group, no join anywhere. Same spark.sql
    * text surface and integer-cents discipline as [[qTpchQ3]]; averages
    * are integer MILLI ratios of already-exact integer sums, so the
    * whole result hash-matches with zero float tolerance. At 100 TB
    * this is THE map-combinable shape: partial aggregation reduces each
    * scan task to ≤6 group rows before the one metadata-sized shuffle.
    */
  def qTpchQ1(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      s"""SELECT l_returnflag, l_linestatus,
        |  sum(cast(round(l_quantity) as bigint)) AS sum_qty,
        |  sum(cast(round(l_extendedprice * 100) as bigint)) AS sum_base_cents,
        |  sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) AS sum_disc_cents,
        |  sum(cast(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) as bigint)) AS sum_charge_cents,
        |  ${LlmOps.milli("sum(cast(round(l_discount * 1000) as bigint))", "count(1)")} AS avg_disc_micro,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= timestamp'1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** TPC-H Q6 (forecast revenue), adapted: the selective filter-and-sum
    * scan — three pushable predicates, one global aggregate, result is
    * ONE row. The predicates reach the parquet reader (PushedFilters;
    * row-group min/max stats skip whole chunks at scale) and the
    * aggregate needs no real shuffle: every task emits one partial row.
    * Discount bounds compare the stored doubles against literals that
    * parse identically in both engines — no epsilon anywhere.
    */
  def qTpchQ6(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT
        |  sum(cast(round(l_extendedprice * l_discount * 100) as bigint)) AS revenue_cents,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= timestamp'1996-01-01'
        |  AND l_shipdate < timestamp'1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin)
  }

  /** TPC-H Q4 (order-priority checking), adapted: the fixture has no
    * l_commitdate/l_receiptdate, so "late" is a lineitem shipped more
    * than 60 days after the order date — same correlated-EXISTS shape.
    * Catalyst rewrites the EXISTS into a LEFT SEMI join on l_orderkey
    * (RewritePredicateSubquery), so the fact table is scanned once,
    * filtered at the scan (shipdate pushdown applies to neither side
    * here — the correlation is an inter-column compare — but the
    * orderdate window does push into the orders scan), and each order
    * row is emitted at most once regardless of how many late lines it
    * has. At 100 TB: one equi-shuffle on orderkey; the count-by-priority
    * is a ≤5-row map-combinable aggregate.
    */
  def qTpchQ4(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= timestamp'1996-01-01'
        |  AND o_orderdate < timestamp'1996-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + interval 60 days)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** TPC-H Q12 (shipping-mode priority classes), adapted: the fixture
    * has no l_shipmode, so lines are grouped by l_returnflag instead —
    * the shape is unchanged: fact⋈fact equi-join on orderkey, then
    * CONDITIONAL COUNTS (high/low priority) inside one aggregate pass,
    * the "pivot a predicate into columns" idiom. Both conditional sums
    * are map-combinable; the only shuffle is the orderkey join (orders
    * and lineitem co-shuffle; at 100 TB bucketing both on orderkey
    * makes it exchange-free).
    */
  def qTpchQ12(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT l_returnflag,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS high_count,
        |  sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS low_count
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= timestamp'1997-01-01'
        |  AND l_shipdate < timestamp'1998-01-01'
        |GROUP BY l_returnflag""".stripMargin)
  }

  /** TPC-H Q14 (promotion effect), adapted to the fixture's enum-valued
    * p_type: what integer-MILLI fraction of one month's discounted
    * revenue came from PROMO parts. The part side is dimension-sized →
    * Catalyst broadcasts it (PlanSpec locks that); the lineitem scan is
    * cut by the one-month shipdate pushdown BEFORE the join, so the
    * probe side is a month of the fact table, not all of it. The ratio
    * rides the shared round-half-up integer primitive over two
    * conditional cent-sums — zero float tolerance, like every ratio in
    * the repo.
    */
  def qTpchQ14(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      s"""SELECT
        |  ${LlmOps.milli(
               "sum(CASE WHEN p_type = 'PROMO' THEN cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint) ELSE 0 END)",
               "sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint))")} AS promo_milli,
        |  sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) AS revenue_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= timestamp'1997-09-01'
        |  AND l_shipdate < timestamp'1997-10-01'""".stripMargin)
  }

  /** TPC-H Q10 (returned-item reporting), adapted: which customers
    * returned the most revenue in a quarter — top 20 by integer-cents
    * revenue with a (revenue DESC, custkey) total order so the LIMIT is
    * deterministic on both engines. Plan: the returnflag + quarter
    * predicates cut lineitem AT THE SCAN, orders⋈lineitem co-shuffle on
    * orderkey, the per-customer aggregate shuffles once on custkey, and
    * the customer/nation dims broadcast onto the 20-row result side.
    * The LIMIT plans as TakeOrderedAndProject — partial top-20 per
    * partition, never a global sort (PlanSpec).
    */
  def qTpchQ10(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT c_custkey, c_name, n_name,
        |  sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= timestamp'1996-10-01'
        |  AND o_orderdate < timestamp'1997-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_cents DESC, c_custkey
        |LIMIT 20""".stripMargin)
  }

  /** TPC-H Q18 (large-volume customers), adapted: orders whose total
    * quantity exceeds a threshold — the HAVING-over-fact-aggregate
    * shape. The inner per-order aggregate runs FIRST (map-combinable on
    * orderkey, the same key the join needs, so Catalyst reuses the
    * exchange), the HAVING cuts it to a handful of rows, and only
    * those join back to orders/customer. Quantities sum as exact
    * integers; (sum DESC, orderkey) totally orders the LIMIT.
    */
  def qTpchQ18(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT c_custkey, c_name, o_orderkey, cast(o_orderdate as date) AS order_date,
        |  big.sum_qty
        |FROM (
        |  SELECT l_orderkey, sum(cast(round(l_quantity) as bigint)) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(cast(round(l_quantity) as bigint)) > 210) big
        |JOIN orders ON o_orderkey = big.l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY big.sum_qty DESC, o_orderkey
        |LIMIT 10""".stripMargin)
  }

  /** J10: bloom-filter semi-join reduction — the 100 TB shuffle-volume
    * cut stated explicitly. A sketch of the selective dimension's keys
    * (Spark's own BloomFilterAggregate, surfaced as `bloom_agg` by
    * [[graft.GraftExtensions]]) is built in a scalar subquery (one
    * metadata-sized broadcast, ~1 MB for a million keys), and the fact
    * scan drops non-candidate rows BEFORE the join's exchange with
    * `might_contain` — the same machinery Spark's AQE runtime filters
    * inject automatically, but as an explicit, composable operator.
    * False positives (sketch, not set) are removed by the exact join
    * that follows; the filter can only shrink shuffle volume, never
    * change the result — which is why the oracle is the PLAIN join.
    * At 100 TB: fact-side shuffle drops from all rows to
    * selectivity + ε, and the filter evaluates inside the scan stage.
    */
  def j10BloomPrejoin(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |  cast(round(o_totalprice * 100) as bigint) AS cents
        |FROM (
        |  SELECT * FROM orders
        |  WHERE might_contain(
        |    (SELECT bloom_agg(xxhash64(c_custkey)) FROM customer
        |     WHERE c_mktsegment = 'BUILDING'),
        |    xxhash64(o_custkey))) pre
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
  }

  /** W8: cumulative distinct count — per user, how many DISTINCT event
    * types they had used as of each event. A distinct-in-frame window
    * (`count(distinct x) over (... rows unbounded preceding)`) is not
    * supported by either engine AND would be O(frame²) anyway; the
    * scalable form is the first-occurrence-flag trick: rank each
    * (user, type) stream by time, flag rank-1 rows, and running-sum the
    * flags. Two windowed passes, both partitioned on user-derived keys —
    * the second window reuses the first's user_id clustering (Catalyst
    * plans one Exchange on (user_id, event_type) and one on user_id;
    * at 100 TB both are ordinary hash-partitioned sorts, never a global
    * sort, never per-frame set state.
    */
  def w8RunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val firstOfType = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val perUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        (row_number().over(firstOfType) === 1).cast("long").as("is_first"))
      .select(col("event_id"), col("user_id"),
        sum("is_first").over(perUser).as("n_types_so_far"))
  }

  /** W9: per-user exponentially weighted moving average of event values
    * (α = 0.2) — the ORDERED NON-LINEAR RECURRENCE class no window
    * frame can express: s_t depends on s_{t−1} through a rounding
    * step, so unlike w2's running sum there is no prefix-aggregate
    * form. The scalable shape is per-key fold: one shuffle on user_id,
    * collect the key's (ts, event_id, value-milli) events, array_sort
    * (struct order = (ts, event_id, x) — a total order), and a single
    * `aggregate` lambda fold to the FINAL state per key — the same
    * per-key-state contract as sessionization (state ∝ one key's
    * events, never the table). Output is one row per user (the signal
    * a feature store keeps), not per event.
    *
    * Integer discipline: s' = rhu((200·x + 800·s) / 1000) via the
    * shared round-half-up form — event values are non-negative (data
    * contract, asserted nowhere cheaper than the oracle equality
    * itself), so Spark `div` ≡ DuckDB `//`. The lambda fold is
    * interpreted (round-3 lesson) but runs once per KEY, not per
    * event-pair; the DuckDB twin replays the identical recurrence as a
    * recursive CTE.
    */
  def w9Ewma(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("cast(round(value * 1000) as bigint)").as("x"))
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"), col("x")))).as("evs"))
      .select(col("user_id"),
        size(col("evs")).cast("long").as("n_events"),
        expr("""aggregate(evs, cast(null as bigint),
                (s, e) -> CASE WHEN s IS NULL THEN e.x
                          ELSE (2 * (200 * e.x + 800 * s) + 1000) div 2000 END)""")
          .as("ewma_milli"))

  /** A13: per-group MODE (most frequent value) with a deterministic
    * tie-break — dominant language per document source. Two
    * map-combinable aggregates: (source, lang) counts, then an argmax
    * via `min(struct(-cnt, lang))` — struct ordering is lexicographic,
    * so the smallest (-cnt, lang) pair IS (highest count, first lang
    * alphabetically on ties): the window row_number()-over-(cnt DESC,
    * lang) = 1 row, computed as a PARTIAL aggregate instead. Each map
    * task reduces to one candidate per source before the shuffle — the
    * same shuffle-volume argument as [[j4PickFirstSupplier]], and the
    * reason built-in `mode()` (no tie order contract in either engine)
    * is not used.
    */
  def a13Mode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(min(struct((-col("cnt")).as("neg_cnt"), col("lang"))).as("m"))
      .select(col("source"), col("m.lang").as("mode_lang"),
        (-col("m.neg_cnt")).as("n_docs"))

  /** Per-group OLS regression slope over daily revenue — "is each
    * nation's order volume trending up?" — as EXACT RATIONAL arithmetic:
    * the slope numerator n·Σxy − Σx·Σy and denominator n·Σxx − (Σx)²
    * are returned as integer columns instead of dividing into a float.
    * x is the epoch-day of the order date, y the day's revenue in cents;
    * every moment is a map-combinable integer sum, so the whole
    * regression is ONE scan + one two-level aggregate — no sort, no
    * window, no driver math. At 100 TB the same plan holds; for cent
    * sums beyond ~2^63/n_days the sums move to DECIMAL(38,0), shape
    * unchanged. (Ratios-as-rationals is the repo's float discipline:
    * consumers divide at display time; the gate compares exact ints.)
    */
  def qGroupRegression(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nation"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("long").as("x"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .groupBy("nation", "x").agg(sum("cents").as("y"))
    daily.groupBy("nation")
      .agg(count(lit(1)).as("n_days"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("nation"), col("n_days"),
        (col("n_days") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
  }

  /** F16: higher-order lambda function family over array columns —
    * filter / exists / transform+aggregate / zip_with on the embedding
    * vectors, every output an exact integer (per-element
    * round-to-milli BEFORE summing, float→double widening first, so
    * both engines fold identical integer sequences). These are the
    * lambda forms of what [[graft.functions.CosineMilli]] does natively;
    * kept map-only and measured — the repo's round-3 lesson is that
    * interpreted lambdas cost ~µs/element, so the HOF surface exists
    * for expressiveness while hot paths use the codegen'd Expression.
    */
  def f16Hof(spark: SparkSession, dir: String): DataFrame = {
    val toMilli = (x: org.apache.spark.sql.Column) =>
      round(x.cast("double") * 1000).cast("long")
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        size(filter(col("embedding"), x => x > lit(0f))).cast("long").as("n_pos"),
        exists(col("embedding"), x => x > lit(0.5f)).cast("long").as("has_big"),
        aggregate(transform(col("embedding"), toMilli),
          lit(0L), (acc, x) => acc + x).as("sum_milli"),
        aggregate(zip_with(col("embedding"), col("embedding"),
            (a, b) => toMilli(a) * toMilli(b)),
          lit(0L), (acc, x) => acc + x).as("norm2_milli2"))
  }

  /** F13: map-typed column family — parse JSON props into a real
    * `map<string,string>` (schema-on-read for ragged key sets, vs f7's
    * fixed struct), augment it with `map_concat`, and flatten with the
    * map-generator explode into (key, value) rows. Map columns are how
    * an engine carries open-schema metadata (HTTP headers, feature
    * bags, experiment tags) without a schema migration per new key.
    * Map-only: parse, concat, and explode all run inside the scan
    * stage; rows out ∝ total map entries.
    *
    * Null discipline: an unparseable/NULL props yields a NULL map from
    * from_json, and map_concat(NULL, m) is NULL — which would silently
    * drop the whole event at the explode (the oracle twin still emits
    * its 'et' row). coalesce to an empty map so the 'et' entry always
    * survives. Fixture assumption, stated: props never carries an 'et'
    * key — under the default mapKeyDedupPolicy=EXCEPTION a duplicate
    * key would throw at runtime on both engines.
    */
  def f13Maps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)).as("m"),
        col("event_type"))
      .select(col("event_id"),
        map_concat(coalesce(col("m"), map()),
          map(lit("et"), col("event_type"))).as("mm"))
      .select(col("event_id"), explode(col("mm")).as(Seq("key", "value")))

  // ---------------------------------------------------------------------
  // Flagship (§7.2): every structural element of the reference pipeline in
  // one plan — filter → 3 joins → derive → agg → validate → project.
  // ---------------------------------------------------------------------

  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val asOf = to_date(lit(AsOfDate))
    // P1-style name filter on the dimension (the "Youth" filter).
    val dims = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").contains("A"))
    // J1/J2: dim ⋈ customer ⋈ orders; dims broadcast, one shuffle on custkey.
    val joined = Tables.customer(spark, dir)
      .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
    // F1/F2 derivations, A1 aggregation.
    val actual = joined
      .select(col("n_name"),
        ageYears(col("o_orderdate"), asOf).as("order_age"),
        col("o_totalprice"))
      .groupBy("n_name")
      .agg(
        count("*").as("n_orders"),
        round(avg("order_age"), 2).as("avg_order_age"),
        round(sum("o_totalprice"), 2).as("total_price"))
    // J5 validation against an independently-computed expected count.
    val expected = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count("*").as("n_customers"))
    actual.join(expected, Seq("n_name"), "left")
      .select(
        col("n_name"), col("n_orders"), col("avg_order_age"), col("total_price"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        when(col("n_orders") > 0 && col("n_customers") > 0, 1).otherwise(0).as("valid"))
  }
}
