package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.DataType

/** As-of join as a WHOLE-OPERATOR Catalyst extension — the brief's
  * preference rung (c): a custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered through `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]), for semantics Spark's built-in operators
  * only express quadratically.
  *
  * Semantics (inner as-of): for every left row, the single right row
  * with equal keys and the LARGEST right time <= left time; left rows
  * with no such match are dropped. The composed form
  * ([[graft.operators.Relational.qAsofJoin]]) states this as an
  * inequality join + argmax, which materializes every (left, earlier
  * right) pair before the aggregate — O(n·m) per key. This operator is
  * the direct algorithm: both sides hash-partitioned on the keys
  * (`ClusteredDistribution`, so EnsureRequirements co-partitions them
  * exactly as it does for SortMergeJoin), sorted by (keys, time)
  * (`requiredChildOrdering` — Spark inserts the sorts), then ONE
  * synchronized merge scan per partition that carries the current
  * candidate right row per key group — O(n + m) after the sort, state
  * of exactly one buffered row. This is the shape kdb/Pandas/Flink give
  * asof joins; on Spark it rides the same exchange+sort machinery as
  * SMJ, so AQE, codegen'd sorts, and spill all apply to the children.
  *
  * Null keys and null times never match (SQL join semantics): such rows
  * are skipped on both sides during the merge.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    isLeftOuter: Boolean) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  // Type agreement is load-bearing, not cosmetic: the merge scan
  // compares right-side projections with orderings built from LEFT-side
  // types, so an INT-vs-BIGINT key pair would read 4 of 8 bytes and
  // match garbage SILENTLY (reviewer finding). Fail at construction.
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(DataType.equalsStructurally(l.dataType, r.dataType, ignoreNullability = true),
      s"as-of join key type mismatch: ${l.dataType} vs ${r.dataType}")
  }
  require(DataType.equalsStructurally(leftTime.dataType, rightTime.dataType, ignoreNullability = true),
    s"as-of join time type mismatch: ${leftTime.dataType} vs ${rightTime.dataType}")
  override def output: Seq[Attribute] =
    if (isLeftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, outer) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, outer) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    isLeftOuter: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (isLeftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** Same contract as SortMergeJoinExec: cluster each side on its keys;
    * EnsureRequirements gives both the same hash partitioning.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (keys…, time) ascending on both sides — the merge scan's
    * invariant — plus a TOTAL-order tie-break over the right side's
    * remaining orderable columns: the merge keeps the LAST right row
    * with time <= left time, so duplicate (key, time) right rows would
    * otherwise match whichever duplicate the sort happened to emit last
    * (run-to-run nondeterminism under AQE/spill — reviewer finding).
    * With the tie-break the winner is the duplicate with the greatest
    * remaining-column tuple, deterministically.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val rightTieBreak = right.output
      .filterNot(a => rightKeys.exists(_.semanticEquals(a)) || rightTime.semanticEquals(a))
      .filter(a => RowOrdering.isOrderable(a.dataType))
      .map(SortOrder(_, Ascending))
    Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightTime).map(SortOrder(_, Ascending)) ++ rightTieBreak)
  }

  /** Output keeps the left side's key-sorted order within partitions. */
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  /** Every output row is a left row (possibly right-extended), emitted
    * in left order — the left child's partitioning survives verbatim.
    * Without this override the inherited UnknownPartitioning forces a
    * redundant full exchange on any parent that re-groups by the join
    * keys (reviewer finding; same override SortMergeJoinExec makes).
    */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val numOutputRows = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // Bind against NULLABLE right attrs in outer mode: bindReference
      // takes nullability from the input side, and a non-nullable
      // BoundReference would skip the null check and read garbage from
      // the all-null extension row.
      val projInput =
        if (isLeftOuter) lOut ++ rOut.map(_.withNullability(true)) else lOut ++ rOut
      val resultProj = UnsafeProjection.create(output, projInput)
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // Right cursor: the next unconsumed right row (owned copies —
        // the child iterator reuses its row buffer).
        private var rRow: UnsafeRow = _
        private var rKey: UnsafeRow = _
        private var rTime: UnsafeRow = _
        // Best-so-far right row for the key group the cursor is in.
        private var cand: UnsafeRow = _
        private var candKey: UnsafeRow = _
        private var nextResult: UnsafeRow = _

        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            val t = rTimeProj(r)
            if (!k.anyNull && !t.anyNull) {
              rRow = r.asInstanceOf[UnsafeRow].copy()
              rKey = k.copy()
              rTime = t.copy()
            }
          }
        }
        advanceRight()

        private def computeNext(): UnsafeRow = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTime = lTimeProj(l)
            if (!lKey.anyNull && !lTime.anyNull) {
              // Consume right rows that are candidates for this left row:
              // earlier keys (useless, drop) and same-key rows with
              // time <= left time (each replaces the previous candidate).
              var cont = rRow != null
              while (cont) {
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0) { advanceRight(); cont = rRow != null }
                else if (c == 0 && timeOrd.compare(rTime, lTime) <= 0) {
                  cand = rRow; candKey = rKey
                  advanceRight(); cont = rRow != null
                } else cont = false
              }
              if (cand != null && keyOrd.compare(candKey, lKey) == 0) {
                numOutputRows += 1
                return resultProj(joined(l, cand))
              } else if (isLeftOuter) {
                numOutputRows += 1
                return resultProj(joined(l, nullRight))
              }
            } else if (isLeftOuter) {
              // Left-outer keeps null-keyed/null-timed left rows too
              // (they can never match), null-extended — SQL outer-join
              // null semantics.
              numOutputRows += 1
              return resultProj(joined(l, nullRight))
            }
          }
          null
        }

        override def hasNext: Boolean = {
          if (nextResult == null) nextResult = computeNext()
          nextResult != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = nextResult
          nextResult = null
          r
        }
      }
    }
  }
}

/** Public API: `AsOf.join(trades, quotes, Seq("sym"), Seq("sym"), "t", "qt")`
  * — each trade matched to the latest quote at or before it. `joinType`
  * "inner" (default) drops unmatched left rows; "left"/"left_outer"
  * keeps them null-extended (pandas merge_asof / kdb aj semantics).
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           joinType: String = "inner"): DataFrame = {
    val isLeftOuter = joinType.toLowerCase match {
      case "inner" => false
      case "left" | "left_outer" | "leftouter" => true
      case other => throw new IllegalArgumentException(
        s"as-of joinType must be inner or left_outer, got '$other'")
    }
    def attr(df: DataFrame, name: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${df.queryExecution.analyzed.output.map(_.name)}"))
    val plan = AsOfJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      leftKeys.map(attr(left, _)), rightKeys.map(attr(right, _)),
      attr(left, leftTime), attr(right, rightTime), isLeftOuter)
    org.apache.spark.sql.graftshim.PlanBridge.ofRows(left.sparkSession, plan)
  }
}
