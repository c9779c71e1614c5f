package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: locale-independent SIMPLE Unicode
  * lowercasing — the one-to-one per-code-point mapping from
  * UnicodeData.txt (`Character.toLowerCase(int)`), NOT the full
  * mapping Spark's `lower()` applies (`String.toLowerCase`, which pulls
  * in SpecialCasing.txt).
  *
  * Why it exists (ADVICE r15, medium): the d10b normalization fold
  * keeps non-ASCII text, and the two engines' `lower()` disagree on the
  * full-vs-simple divergence class — Spark/Java full-maps U+0130 'İ' to
  * "i" + combining dot above (2 code points) and applies the
  * context-sensitive final-sigma rule (Σ → ς word-finally), while
  * DuckDB's utf8proc-based `lower()` simple-maps both ('İ' → 'i',
  * Σ → σ always). On a real non-ASCII corpus the d10b oracle twin would
  * diverge; the ASCII fixture corpus could never catch it. This
  * expression applies exactly utf8proc's mapping class, so the Spark
  * fold and the DuckDB twin agree BY CONSTRUCTION on those code points
  * (asserted on U+0130/Σ fixtures in NfcNormalizeSpec). Bonus: unlike
  * `String.toLowerCase()` (default-locale-sensitive — a Turkish-locale
  * JVM maps I → ı), the simple mapping is locale-independent, so
  * results cannot drift with executor JVM locale.
  *
  * Execution shape: ASCII-only input takes a byte-scan fast path — no
  * allocation when nothing uppercases, a byte-wise copy otherwise; only
  * strings with non-ASCII bytes pay the String/code-point round-trip
  * (the simple mapping never changes code-point COUNT, but UTF-8 byte
  * length can change — e.g. U+0130 (2 bytes) → 'i' (1 byte) — so the
  * general path re-encodes). Codegen'd (one static call inside
  * whole-stage codegen), null-safe, deterministic.
  */
case class SimpleLower(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "simple_lower"

  override def nullSafeEval(input: Any): Any =
    SimpleLower.lower(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimpleLower.lower($c)")

  override protected def withNewChildInternal(newChild: Expression): SimpleLower =
    copy(child = newChild)
}

object SimpleLower {
  /** Shared by the interpreted and generated paths. */
  def lower(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    var hasUpper = false
    while (i < bytes.length && ascii) {
      val b = bytes(i)
      if (b < 0) ascii = false
      else if (b >= 'A' && b <= 'Z') hasUpper = true
      i += 1
    }
    if (ascii) {
      if (!hasUpper) s // pass-through (consumer copies when it stores)
      else {
        val out = new Array[Byte](bytes.length)
        var j = 0
        while (j < bytes.length) {
          val b = bytes(j)
          out(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          j += 1
        }
        UTF8String.fromBytes(out)
      }
    } else {
      val str = s.toString
      val sb = new java.lang.StringBuilder(str.length)
      var k = 0
      while (k < str.length) {
        val cp = str.codePointAt(k)
        sb.appendCodePoint(Character.toLowerCase(cp))
        k += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }
}
