package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: `|a ∩ b|` for two ASCENDING-SORTED
  * `array<bigint>` inputs, by a single two-pointer merge — O(|a|+|b|),
  * zero allocation, inside whole-stage codegen.
  *
  * Why a custom Expression (SURVEY.md §2.10 preference (b)): the built-in
  * `size(array_intersect(a, b))` materializes the intersection ARRAY (and
  * a hash set) per row just to take its length; on the triangle-counting
  * hot path ([[graft.operators.Graph.qTrianglesAdj]]) that is millions of
  * rows × O(√m)-sized neighbor lists — the merge-count form does the same
  * work with no per-row allocation and fuses into the surrounding codegen
  * stage.
  *
  * Contract: both inputs must be sorted ascending with distinct non-null
  * elements (as produced by `sort_array(collect_set(..))` / a sorted
  * distinct aggregation); the merge silently undercounts on unsorted
  * input, so callers own that invariant. NULL input → NULL. A NULL
  * element returns NULL only if the merge VISITS it before one array is
  * exhausted (reviewer finding: `(array(1), array(2, NULL))` → 0,
  * `(array(1), array(NULL, 2))` → NULL) — the null check is a cheap
  * guard against garbage answers on contract-violating SQL-text input,
  * not a validation pass; arrays containing nulls are outside the
  * contract, and an upfront scan to normalize them would put an O(n)
  * penalty on every row of the triangle hot path to serve inputs the
  * operator never produces.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "sorted_intersect_count"

  private lazy val elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val checkNulls = elementsNullable
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(j))) return null
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |long $c = 0L;
         |int $i = 0; int $j = 0;
         |while ($i < $nx && $j < $ny) {
         |  $nullCheck
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $c; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
