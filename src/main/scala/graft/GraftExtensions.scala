package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineMilli, DotDouble, Mix64, NfcNormalize, RollingHashes, RollingMinHash, SimpleLower, SortedIntersectCount}
import graft.plans.{AsOfJoinStrategy, RangeJoinRewrite}

/** SparkSessionExtensions entry point
  * (`spark.sql.extensions=graft.GraftExtensions`, set in [[Sessions]]):
  *
  *  - native expressions into the session's function registry, usable
  *    from SQL text and expr() exactly like built-ins;
  *  - the optimizer rule turning naive range-containment joins into
  *    bucketed equi-joins ([[graft.plans.RangeJoinRewrite]], opt-in
  *    by conf);
  *  - the planner strategy for the whole-operator as-of join
  *    ([[graft.plans.AsOfJoinStrategy]] → AsOfJoinExec).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Shared argument discipline for the two rolling-hash builders: the
    * builder runs at analysis time, so malformed calls surface as
    * analysis errors, not raw CCE/NPE/IndexOutOfBounds (reviewer
    * finding). The window must be a non-null integer literal.
    */
  private def literalWindow(fn: String, children: Seq[Expression]): (Expression, Int) = {
    if (children.size != 2)
      throw new IllegalArgumentException(
        s"$fn(text, window) takes 2 arguments, got ${children.size}")
    val w = children(1) match {
      case e if e.foldable => e.eval() match {
        // Any integral literal width: INT/BIGINT/SMALLINT/TINYINT all
        // appear here depending on how the caller wrote the constant.
        case n @ (_: java.lang.Integer | _: java.lang.Long |
                  _: java.lang.Short | _: java.lang.Byte) =>
          n.asInstanceOf[java.lang.Number].intValue()
        case other => throw new IllegalArgumentException(
          s"$fn window must be a non-null integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"$fn window must be a literal, not a column")
    }
    (children.head, w)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("cosine_milli"),
      new ExpressionInfo(classOf[CosineMilli].getName, "cosine_milli"),
      (children: Seq[Expression]) => CosineMilli(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_double"),
      new ExpressionInfo(classOf[DotDouble].getName, "dot_double"),
      (children: Seq[Expression]) => DotDouble(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => SortedIntersectCount(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        if (children.size != 1)
          throw new IllegalArgumentException(
            s"nfc_normalize(text) takes 1 argument, got ${children.size}")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("simple_lower"),
      new ExpressionInfo(classOf[SimpleLower].getName, "simple_lower"),
      (children: Seq[Expression]) => {
        if (children.size != 1)
          throw new IllegalArgumentException(
            s"simple_lower(text) takes 1 argument, got ${children.size}")
        SimpleLower(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("mix64"),
      new ExpressionInfo(classOf[Mix64].getName, "mix64"),
      (children: Seq[Expression]) => {
        if (children.size != 3)
          throw new IllegalArgumentException(
            s"mix64(x, a, b) takes 3 arguments, got ${children.size}")
        Mix64(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (children: Seq[Expression]) => {
        val (text, w) = literalWindow("rolling_min_hash", children)
        RollingMinHash(text, w)
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_hashes"),
      new ExpressionInfo(classOf[RollingHashes].getName, "rolling_hashes"),
      (children: Seq[Expression]) => {
        val (text, w) = literalWindow("rolling_hashes", children)
        RollingHashes(text, w)
      }))
    // Spark's own bloom-filter sketch pair (the machinery behind AQE
    // runtime filters), surfaced as SQL functions so a query can state
    // an EXPLICIT semi-join reduction: build the filter over the small
    // side's keys, pre-filter the fact scan with might_contain, then
    // run the exact join on the survivors (false positives are removed
    // by the join; the filter only cuts shuffle volume, never results).
    // These are internal catalyst classes, not registered by default;
    // the analyzer wraps the raw AggregateFunction like any built-in.
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (children: Seq[Expression]) => {
        if (children.size != 1)
          throw new IllegalArgumentException(
            s"bloom_agg(xxhash64_value) takes 1 argument, got ${children.size}")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"might_contain(bloom, xxhash64_value) takes 2 arguments, got ${children.size}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
  }
}
