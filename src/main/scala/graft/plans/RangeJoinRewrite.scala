package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a naive range-containment join into the
  * bucketed equi-join [[graft.operators.Scale.rangeJoin]] builds by hand.
  *
  * An inner join whose ONLY predicates are range bounds —
  * `lo <= point AND point < hi` with `point` from one side and `lo`/`hi`
  * from the other — has no equi-keys, so Spark plans a nested-loop join:
  * fine when one side broadcasts, O(n×m) when both sides are large. With
  * `spark.graft.rangeJoin.bucketWidth` set to a positive integer W, this
  * rule (registered by [[graft.GraftExtensions]]) rewrites the join to:
  *
  *  1. explode the bounds side to every W-wide bucket its interval
  *     overlaps (`sequence(floor(lo/W), floor((hi-1)/W))`),
  *  2. join on bucket equality — `floor(point/W) = bucket` — which the
  *     planner now picks a hash/sort-merge join for,
  *  3. keep the ORIGINAL containment predicate as the post-match filter
  *     (bucket overlap is a superset of containment),
  *  4. project the exploded bucket column back out.
  *
  * Rows therefore match the naive join exactly (asserted in
  * RangeJoinRewriteSpec), only the physical strategy changes. The rule
  * is opt-in (conf unset → untouched plans) because the right W is a
  * data property — pick it near the typical interval width. Bucket
  * arithmetic uses sign-correct floor division (plain `div` truncates
  * toward zero and would misbucket negative values); a lower bound that
  * is strict still uses `floor(lo/W)` (a superset bucket — containment
  * filters it), and an empty interval (`hi <= lo`) clamps to one
  * harmless bucket rather than letting `sequence` throw on a reversed
  * range. Only integral bound types are rewritten: float buckets would
  * be approximate, and timestamp/date semantics belong to the caller
  * (convert to epoch integers first, as the engine's queries do).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.bucketWidth"

  /** A normalized `small OP large` comparison (strict = `<` vs `<=`). */
  private case class Cmp(small: Expression, large: Expression, strict: Boolean)

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // A malformed conf value must not take down every query in the
    // session from inside the optimizer (reviewer finding): warn once
    // with the key name and treat the rule as disabled.
    val width = scala.util.Try(conf.getConfString(ConfKey, "0").toLong).getOrElse {
      logWarning(s"$ConfKey is not a long integer " +
        s"('${conf.getConfString(ConfKey, "0")}') — range-join rewrite disabled")
      0L
    }
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, width).getOrElse(j)
    }
  }

  private def rewrite(j: Join, cond: Expression, width: Long): Option[LogicalPlan] = {
    val preds = splitConjunctivePredicates(cond)

    def fromLeft(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(j.left.outputSet)
    def fromRight(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(j.right.outputSet)

    // Already an equi-join (incl. our own rewrite output): leave alone —
    // this also makes the rule idempotent under the fixed-point batch.
    val hasEquiKey = preds.exists {
      case EqualTo(a, b) =>
        (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
      case EqualNullSafe(a, b) =>
        (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
      case _ => false
    }
    if (hasEquiKey) return None

    val cmps = preds.flatMap {
      case LessThan(a, b)           => Some(Cmp(a, b, strict = true))
      case LessThanOrEqual(a, b)    => Some(Cmp(a, b, strict = false))
      case GreaterThan(a, b)        => Some(Cmp(b, a, strict = true))
      case GreaterThanOrEqual(a, b) => Some(Cmp(b, a, strict = false))
      case _ => None
    }.filter(c => integral(c.small.dataType) && integral(c.large.dataType))

    // lower: bound <= point (point is the LARGE side); upper: point <= bound.
    val candidates = for {
      loC <- cmps if fromLeft(loC.large) != fromRight(loC.large) // point side well-defined
      hiC <- cmps
      if loC.large.semanticEquals(hiC.small)
      pointFromLeft = fromLeft(loC.large)
      if (pointFromLeft && fromRight(loC.small) && fromRight(hiC.large)) ||
         (!pointFromLeft && fromLeft(loC.small) && fromLeft(hiC.large) && fromRight(loC.large))
    } yield (loC.large, loC.small, hiC.large, hiC.strict, pointFromLeft)

    candidates.headOption.map { case (point, lo, hi, hiStrict, pointFromLeft) =>
      val w = Literal(width)
      def toLong(e: Expression): Expression =
        if (e.dataType == LongType) e else Cast(e, LongType)
      def floorDiv(e: Expression): Expression = {
        val x = toLong(e)
        val q = new IntegralDivide(x, w)
        val r = new Remainder(x, w)
        new Subtract(q, If(LessThan(r, Literal(0L)), Literal(1L), Literal(0L)))
      }
      val startB = floorDiv(lo)
      val stopB = floorDiv(
        if (hiStrict) new Subtract(toLong(hi), Literal(1L)) else toLong(hi))
      val bucket = AttributeReference("__range_bucket", LongType)()
      // Sequence is TimeZoneAwareExpression: without a zone it reports
      // unresolved even over longs, and the optimizer rejects the plan.
      val seq = Sequence(startB, Greatest(Seq(stopB, startB)), Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))
      val rangesPlan = if (pointFromLeft) j.right else j.left
      val gen = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(bucket), child = rangesPlan)
      val newCond = And(EqualTo(floorDiv(point), bucket), cond)
      val newJoin =
        if (pointFromLeft) Join(j.left, gen, Inner, Some(newCond), j.hint)
        else Join(gen, j.right, Inner, Some(newCond), j.hint)
      Project(j.output, newJoin)
    }
  }
}
