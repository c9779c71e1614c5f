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
  * (character codes are UTF-16 units ≡ code points for ASCII corpora).
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
  // twins): the polynomial runs over UTF-16 code units (String.charAt /
  // String.length). The DuckDB twins hash codepoints via ord()/substr(),
  // so positions and hash values agree only while the corpus is ASCII —
  // which the documents fixture is, by construction (TESTDATA.md). For a
  // non-ASCII corpus, hash UTF-8 bytes on BOTH sides to make the twin
  // encoding-independent; t13/t18 oracles would need the same change.
  val Base = 257L
  val Mod = 2147483647L // 2^31 - 1

  /** Min over all `w`-char window hashes; O(n) rolling update. All
    * intermediates stay below 2^48 — no overflow in Long.
    */
  def compute(s: String, w: Int): Long = {
    val n = s.length
    if (n == 0) return 0L
    val ww = math.min(w, n)
    var h = 0L
    var i = 0
    while (i < ww) { h = (h * Base + s.charAt(i)) % Mod; i += 1 }
    var minH = h
    var pow = 1L
    var j = 1
    while (j < ww) { pow = pow * Base % Mod; j += 1 }
    i = ww
    while (i < n) {
      h = ((h - s.charAt(i - ww) * pow % Mod + Mod) % Mod * Base + s.charAt(i)) % Mod
      if (h < minH) minH = h
      i += 1
    }
    minH
  }
}
