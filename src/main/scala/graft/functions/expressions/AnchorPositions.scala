package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined anchor positions in ONE rolling O(n) pass — the codegen'd
  * kernel behind [[graft.operators.Dedup.anchoredWindows]]: 1-based char
  * positions p (with a full `minLen` window after them) where the 8-char
  * polynomial fingerprint `Σ cp(p+i)·31^i mod P ≡ 0 (mod anchorEvery)`.
  *
  * The value is BIT-IDENTICAL to the Column-HOF formulation it replaces
  * (`pmod(Σ ascii(substr(text, p+i, 1))·31^i, P) % anchorEvery`, mirrored
  * in the q154/q155/q157/q166 DuckDB oracles): the raw 31^i literals exceed
  * P but are congruent to the reduced powers, so the rolling update
  * `h' = (h − cp(p))·31⁻¹ + cp(p+8)·31⁷ (mod P)` (modular inverse — exact
  * in Z_P, property-tested against the direct sum) lands on the same
  * residues. What changes is cost: the HOF path evaluated 8 `substr` +
  * `ascii` allocations at EVERY position (O(8n) with per-call garbage);
  * this is one code-point walk and three multiplies per position.
  */
case class AnchorPositions(child: Expression, minLen: Int, anchorEvery: Int)
    extends UnaryExpression {
  require(minLen > AnchorPositions.K,
    s"anchored windows need minLen > ${AnchorPositions.K}, got $minLen")
  require(anchorEvery >= 1, s"anchorEvery must be >= 1, got $anchorEvery")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    AnchorPositions.compute(v.asInstanceOf[UTF8String], minLen, anchorEvery)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.AnchorPositions.compute($s, $minLen, $anchorEvery);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_anchor_positions"
}

object AnchorPositions {
  /** Fingerprint width (chars) — matches Dedup.AnchorK / the oracle SQL. */
  val K = 8
  private val P = 1000000007L
  /** 31⁻¹ mod P. */
  private val Inv31: Long =
    java.math.BigInteger.valueOf(31L).modInverse(java.math.BigInteger.valueOf(P)).longValueExact()
  /** 31⁷ mod P (the raw 31⁷ literal in the HOF/SQL form is congruent). */
  private val Pow7: Long = {
    var x = 1L
    for (_ <- 1 to K - 1) x = x * 31L % P
    x
  }

  def compute(s: UTF8String, minLen: Int, anchorEvery: Int): ArrayData = {
    // decode sized by the walk itself, NOT numChars() — the two disagree on
    // malformed UTF-8 and numChars-sized buffers overran (see
    // PolyHash.codePoints)
    val cp = PolyHash.codePoints(s.getBytes)
    val n = cp.length
    val m = n - minLen + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
    // initial fingerprint over cp(0..7), then roll
    var h = 0L
    var j = K - 1
    while (j >= 0) { h = (h * 31L + cp(j)) % P; j -= 1 }
    val out = new Array[Int](m)
    var w = 0
    var p = 0
    while (p < m) {
      if (h % anchorEvery == 0L) { out(w) = p + 1; w += 1 }
      if (p + 1 < m) {
        var t = (h - cp(p)) % P
        if (t < 0) t += P
        h = (t * Inv31 % P + cp(p + K).toLong * Pow7) % P
      }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) out else java.util.Arrays.copyOf(out, w))
  }
}
