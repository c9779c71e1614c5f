package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two double arrays.
  *
  * Replaces the `aggregate(zip_with(a, b, (x, y) -> x * y), 0d,
  * (acc, v) -> acc + v)` higher-order formulation in the LSH bucketing
  * path ([[graft.operators.Similarity]]): lambdas run interpreted and
  * allocate a zipped array per row, while this generates one fused loop
  * inside whole-stage codegen (same template as [[CosineMilli]]).
  *
  * Value parity: sequential element 0..n−1 fold in double — identical to
  * the HOF formulation and to the DuckDB oracle's `list_dot_product`
  * (asserted in SimilaritySpec). Edge semantics also match the HOF
  * (advisor finding — the first version truncated to the shorter array
  * and read null elements as garbage): mismatched lengths → NULL (the
  * `zip_with` pad-with-null path), and a null element in either array →
  * NULL. The element null checks are emitted only when the input type's
  * `containsNull` says they can occur, so the common
  * `array<double> NOT NULL` path keeps the branch-free fused loop.
  */
case class DotDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = DoubleType

  // NULL on length mismatch / null element, even when both inputs are
  // themselves non-null.
  override def nullable: Boolean = true

  override def prettyName: String = "dot_double"

  // lazy val: constant for the expression's lifetime; the interpreted
  // path reads it per row (reviewer finding).
  private lazy val elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}
