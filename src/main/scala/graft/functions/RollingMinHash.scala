package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Rabin-Karp rolling min-hash — the
  * winnowing-style document fingerprint (min over all `window`-char
  * polynomial hashes of the text, updated in O(1) per position, O(n)
  * per document). The classic rolling-hash fingerprint the reference
  * family's t4 approximates with per-shingle md5; this form touches
  * each character once instead of hashing every window from scratch.
  *
  * Arithmetic: h_i = Σ_j code(c_{i+j})·B^{w−1−j} mod M with B = 257,
  * M = 2³¹−1 — pure integer math a SQL oracle reproduces exactly
  * (character codes are Unicode code points, matching ord()/substr()
  * semantics in the oracle for any input text, not just ASCII).
  * Strings shorter than the window hash as one degenerate whole-string
  * window. Codegen calls the same static loop both paths share, inside
  * the whole-stage span — no interpreted fallback.
  */
case class RollingMinHash(child: Expression, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && window > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, positive window), got " +
        s"${child.dataType.catalogString} window=$window")

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_min_hash"

  override def nullSafeEval(s: Any): Any =
    RollingMinHash.compute(s.asInstanceOf[UTF8String].toString, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingMinHash.compute($c.toString(), $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  // Encoding contract for every consumer of these constants
  // (RollingMinHash, RollingHashes.hashIterator and their SQL oracle
  // twins): the polynomial runs over Unicode CODE POINTS — exactly what
  // the DuckDB twins hash via ord()/substr() (DuckDB character positions
  // and ord() are codepoint-based). Positions, window widths and hash
  // values therefore agree between engine and oracle for ANY text, not
  // just ASCII: é contributes 0xE9 and 𝄞 (a surrogate pair in Java's
  // UTF-16 Strings) contributes the single value 0x1D11E on both sides.
  // codepoint overflow is impossible: max codepoint 0x10FFFF < 2^21 and
  // every intermediate stays below Mod·Base + 2^21 < 2^40.
  val Base = 257L
  val Mod = 2147483647L // 2^31 - 1

  /** Min over all `w`-codepoint window hashes; O(n) rolling update over
    * the codepoint array (one decode pass per document).
    */
  def compute(s: String, w: Int): Long = {
    val cp = s.codePoints().toArray
    val n = cp.length
    if (n == 0) return 0L
    val ww = math.min(w, n)
    var h = 0L
    var i = 0
    while (i < ww) { h = (h * Base + cp(i)) % Mod; i += 1 }
    var minH = h
    var pow = 1L
    var j = 1
    while (j < ww) { pow = pow * Base % Mod; j += 1 }
    i = ww
    while (i < n) {
      h = ((h - cp(i - ww) * pow % Mod + Mod) % Mod * Base + cp(i)) % Mod
      if (h < minH) minH = h
      i += 1
    }
    minH
  }
}
