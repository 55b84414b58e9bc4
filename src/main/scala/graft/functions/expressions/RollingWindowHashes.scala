package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling fingerprints (Karp & Rabin, IBM JRD 1987) of every
  * stride-1 character window of length `winLen`: element i of the output is
  * the polynomial hash of the window starting at 1-based char position i+1,
  * computed over Unicode CODE POINTS (matching `substr` semantics) in ONE
  * O(n) pass — where materializing the window strings themselves
  * ([[graft.operators.Dedup.exactSubstrSpans]]) costs O(n·winLen) bytes
  * built, shuffled, and compared.
  *
  * Arithmetic is mod M61 = 2⁶¹−1 (Mersenne; the classic fast-reduction
  * modulus): `mulmod` uses `Math.multiplyHigh` with 2⁶⁴ ≡ 2³ (mod M61), so
  * the hot loop is a handful of shifts and adds, no BigInteger. Two
  * instances with independent bases give a 122-bit combined key — at 10¹⁴
  * corpus windows (the 100 TB tier) the expected number of colliding PAIRS
  * is ~10¹⁴·10¹⁴ / 2¹²² ≈ 2·10⁻⁹: the fingerprint path is exact in any
  * practical sense, and the q163 oracle (q149's string-keyed SQL verbatim)
  * checks the equality on the fixture rather than assuming it.
  */
case class RollingWindowHashes(child: Expression, winLen: Int, base: Long)
    extends UnaryExpression {
  require(winLen >= 2, s"winLen must be >= 2, got $winLen")
  require(base > 0 && base < RollingWindowHashes.M61,
    s"base must be in (0, 2^61-1), got $base")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    RollingWindowHashes.compute(v.asInstanceOf[UTF8String], winLen, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.RollingWindowHashes.compute($s, $winLen, ${base}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_rolling_window_hashes"
}

object RollingWindowHashes {
  /** 2⁶¹ − 1, the Mersenne prime M61. */
  val M61: Long = (1L << 61) - 1

  /** (a·b) mod M61 for a, b < M61. Product = hi·2⁶⁴ + lo with
    * 2⁶⁴ ≡ 2³ and 2⁶¹ ≡ 1 (mod M61): t = 8·hi + (lo >>> 61) + (lo & M61)
    * < 2⁶² + 2⁶¹ — one final fold reduces it.
    */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var t = (hi << 3) + (lo >>> 61) + (lo & M61)
    t = (t & M61) + (t >>> 61)
    if (t >= M61) t - M61 else t
  }

  /** Rolling window hashes over the string's code points. Empty array when
    * the string holds fewer than `winLen` code points. Decode is sized by
    * the walk itself, NOT `numChars()` — the two disagree on malformed
    * UTF-8 and numChars-sized buffers overran (see [[PolyHash.codePoints]]).
    */
  def compute(s: UTF8String, winLen: Int, base: Long): ArrayData = {
    val cp = PolyHash.codePoints(s.getBytes)
    val n = cp.length
    val m = n - winLen + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](m)
    // pw = base^(winLen-1) mod M61
    var pw = 1L
    var k = 1
    while (k < winLen) { pw = mulmod(pw, base); k += 1 }
    var h = 0L
    var i = 0
    while (i < winLen) {
      h = mulmod(h, base) + cp(i)
      h = (h & M61) + (h >>> 61); if (h >= M61) h -= M61
      i += 1
    }
    out(0) = h
    var p = 1
    while (p < m) {
      // h = (h - cp(p-1)·pw)·base + cp(p+winLen-1)  (mod M61)
      var t = h - mulmod(cp(p - 1), pw)
      if (t < 0) t += M61
      h = mulmod(t, base) + cp(p + winLen - 1)
      h = (h & M61) + (h >>> 61); if (h >= M61) h -= M61
      out(p) = h
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
