package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: `mix64(x, a, b) = (a*x + b) >>> 4` in
  * wrapping 64-bit arithmetic — one member of the classic multiply-shift
  * universal hash family (Dietzfelbinger et al.), applied here as the
  * MinHash seed mixer.
  *
  * Why native instead of SQL arithmetic: the seeded MinHash bank needs
  * h_k(x) = (a_k·x + b_k) mod 2^64 for eight (a_k, b_k) pairs, and under
  * ANSI mode (the Spark 4 default) a bigint overflow in `a * x` THROWS
  * instead of wrapping. This expression does the multiply-add in plain
  * Java `long` semantics (wrap mod 2^64) inside whole-stage codegen —
  * one fused multiply/add/shift per value, replacing the previous
  * one-md5-per-(seed, shingle) bank that SURVEY 7.7 measured as the
  * band family's irreducible map-side term.
  *
  * The `>>> 4` keeps the TOP 60 bits of the product — the well-mixed
  * bits of a multiply-shift hash (low bits of a·x have limited
  * avalanche) — and lands the result in [0, 2^60), non-negative in a
  * signed long, so min() ordering agrees between engines regardless of
  * signedness. The DuckDB twins compute the identical value with exact
  * HUGEINT arithmetic: `((a::HUGEINT * x + b) % 2^64) // 16` (asserted
  * value-for-value in Mix64Spec and end-to-end by every banded-family
  * oracle).
  *
  * With constants a_k odd and both a_k, b_k < 2^63 (HUGEINT product
  * headroom on the oracle side), the PRE-SHIFT map x → (a_k·x + b_k)
  * mod 2^64 is a bijection on 64-bit values; the `>>> 4` then discards
  * the low 4 bits, so two distinct shingle hashes CAN collide after the
  * shift — at a ~2^-60 per-pair rate, which is harmless for MinHash's
  * min-wise use (a collision merely ties two candidates the verify
  * step separates anyway). (ADVICE r15: the pre-r16 wording claimed
  * post-shift distinctness, which the shift makes false as stated.)
  */
case class Mix64(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second, third).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three bigint arguments, got " +
        Seq(first, second, third).map(_.dataType.catalogString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override def prettyName: String = "mix64"

  override def nullSafeEval(x: Any, a: Any, b: Any): Any =
    (a.asInstanceOf[Long] * x.asInstanceOf[Long] + b.asInstanceOf[Long]) >>> 4

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, a, b) =>
      s"${ev.value} = ($a * $x + $b) >>> 4;")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Mix64 =
    copy(first = newFirst, second = newSecond, third = newThird)
}
