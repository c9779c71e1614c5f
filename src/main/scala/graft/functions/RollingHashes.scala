package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR: every Rabin-Karp `window`-char hash of a
  * string as (pos, hash) rows — the per-position form of
  * [[RollingMinHash]] (same Base/Mod polynomial, same O(1) rolling
  * update), for operators that need the hash SEQUENCE rather than the
  * min fingerprint: content-defined chunking boundaries
  * ([[graft.operators.LlmOps.t18CdcChunks]]), winnowing windows,
  * positional n-gram sketches.
  *
  * This is the engine's custom-UDTF surface (SURVEY.md §2.10): a
  * `Generator` produces zero-or-more rows per input row and plans as a
  * `Generate` node exactly like the built-in `explode`/`posexplode` —
  * rows stream out of the iterator, so a long document never
  * materializes its full hash array per row downstream of the generate.
  * Generators are excluded from whole-stage codegen by design
  * (CodegenFallback), same as every built-in generator.
  *
  * Semantics: n ≥ window → n−window+1 rows (pos = 0-based window
  * start); 0 < n < window → ONE degenerate whole-string window at
  * pos 0 (mirrors [[RollingMinHash]]); empty/NULL text → no rows.
  */
case class RollingHashes(child: Expression, window: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && window > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, positive window), got " +
        s"${child.dataType.catalogString} window=$window")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("hash", LongType, nullable = false)))

  override def prettyName: String = "rolling_hashes"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.isEmpty) Iterator.empty
      else RollingHashes.hashIterator(s, window)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

object RollingHashes {
  import RollingMinHash.{Base, Mod}

  /** Streaming (pos, hash) rows; O(1) rolling state over the codepoint
    * array (positions are CODEPOINT offsets — the same positions the
    * oracle twin's substr() arithmetic produces for any text).
    */
  def hashIterator(s: String, w: Int): Iterator[InternalRow] = {
    val cp = s.codePoints().toArray
    val n = cp.length
    val ww = math.min(w, n)
    var h = 0L
    var i = 0
    while (i < ww) { h = (h * Base + cp(i)) % Mod; i += 1 }
    var pow = 1L
    var j = 1
    while (j < ww) { pow = pow * Base % Mod; j += 1 }
    val p = pow
    val first = h
    new Iterator[InternalRow] {
      private var pos = 0
      private var cur = first
      override def hasNext: Boolean = pos <= n - ww
      override def next(): InternalRow = {
        val row = InternalRow(pos.toLong, cur)
        if (pos < n - ww)
          cur = ((cur - cp(pos) * p % Mod + Mod) % Mod * Base + cp(pos + ww)) % Mod
        pos += 1
        row
      }
    }
  }
}
