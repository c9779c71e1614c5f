package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: cosine similarity of two double arrays as
  * an integer milli value — `floor(1000 · dot/(|a|·|b|) + 0.5)`.
  *
  * Why a custom Expression (SURVEY.md §2.10 / builder contract preference
  * (b)): the higher-order-function formulation
  * (`aggregate(zip_with(a, b, ...), ...)`) runs INTERPRETED — lambda
  * expressions are excluded from whole-stage codegen — and allocates a
  * zipped array per row. This expression generates a single fused loop
  * (dot product and both norms in one pass, no allocation) via
  * doGenCode, and stays inside whole-stage codegen.
  *
  * Value parity: the fold order (sequential, element 0..n-1, all in
  * double) is identical to the HOF formulation and to the DuckDB oracle's
  * list_dot_product, so results are bit-identical and the oracle is
  * unchanged. Verified against the HOF version in SimilaritySpec.
  */
case class CosineMilli(left: Expression, right: Expression)
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

  override def dataType: DataType = LongType

  // NULL on length mismatch / null element, even when both inputs are
  // themselves non-null — the same discipline as DotDouble (reviewer
  // finding: this expression still truncated to the shorter array and
  // skipped element-null checks, the exact bug DotDouble fixed).
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_milli"

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
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    math.floor(1000.0 * (dot / (math.sqrt(na) * math.sqrt(nb))) + 0.5).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = (long) java.lang.Math.floor(
         |      1000.0 * ($dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))) + 0.5);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineMilli =
    copy(left = newLeft, right = newRight)
}
