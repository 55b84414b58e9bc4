package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Byte-level perceptual hashes over opaque media blobs — the 1-D analog of
  * image dHash/aHash (Krawetz, "Kind of Like That", 2013; public technique):
  * downsample the byte signal into a fixed bucket grid, then emit one bit per
  * gradient (dHash: bucket k vs bucket k+1) or per deviation from the global
  * mean (aHash). Two media blobs that differ by small local edits keep most
  * buckets' means intact, so their hashes sit within a small Hamming
  * distance — the property the banded near-dup pairing
  * ([[graft.multimodal.Multimodal.mediaDupPairs]]) exploits.
  *
  * A real image deployment would decode pixels first (no codec libs in this
  * container — see [[graft.multimodal.Multimodal.decodeStub]]); the hash is
  * over whatever byte signal the decode stage emits, and the bucketing /
  * banding / pairing machinery is unchanged.
  *
  * All arithmetic is integer and every intermediate stays below 2⁶³ for blobs
  * up to ~190 MB (sum·count ≤ 255·n² — asserted), so DuckDB reproduces the
  * hash exactly on ASCII fixtures: position → bucket is `(pos*B) // n`,
  * bucket sums/counts are a GROUP BY, and the mean comparison is the
  * cross-multiplied `s_k·c_{k+1} > s_{k+1}·c_k` (never a division). 60 bits,
  * not 64, so `1 << k` never touches the sign bit in either engine — same
  * rationale as [[SimHashPoly]].
  */
object PerceptualHash {
  /** dHash bit count; bucket grid is Bits+1 so every bit compares an
    * adjacent bucket pair.
    */
  val Bits = 60

  /** Blob size cap keeping 255·n² < 2⁶³ (no overflow in the cross-multiplied
    * mean comparison).
    */
  val MaxBytes: Int = 190000000

  private def bucketSums(bytes: Array[Byte], nBuckets: Int): (Array[Long], Array[Long]) = {
    val sum = new Array[Long](nBuckets)
    val cnt = new Array[Long](nBuckets)
    val n = bytes.length.toLong
    var i = 0
    while (i < bytes.length) {
      val b = ((i.toLong * nBuckets) / n).toInt
      sum(b) += (bytes(i) & 0xFF)
      cnt(b) += 1
      i += 1
    }
    (sum, cnt)
  }

  /** Gradient hash: bit k = 1 iff mean(bucket k) > mean(bucket k+1) over a
    * (Bits+1)-bucket grid. Empty input → 0.
    */
  def dhash(bytes: Array[Byte]): Long = {
    if (bytes.length == 0) return 0L
    require(bytes.length <= MaxBytes, s"blob exceeds $MaxBytes bytes")
    val (sum, cnt) = bucketSums(bytes, Bits + 1)
    var out = 0L
    var k = 0
    while (k < Bits) {
      if (sum(k) * cnt(k + 1) > sum(k + 1) * cnt(k)) out |= (1L << k)
      k += 1
    }
    out
  }

  /** Average hash: bit k = 1 iff mean(bucket k) > global mean over a
    * Bits-bucket grid. Empty input → 0.
    */
  def ahash(bytes: Array[Byte]): Long = {
    if (bytes.length == 0) return 0L
    require(bytes.length <= MaxBytes, s"blob exceeds $MaxBytes bytes")
    val (sum, cnt) = bucketSums(bytes, Bits)
    val n = bytes.length.toLong
    var total = 0L
    var k = 0
    while (k < Bits) { total += sum(k); k += 1 }
    var out = 0L
    k = 0
    while (k < Bits) {
      if (sum(k) * n > total * cnt(k)) out |= (1L << k)
      k += 1
    }
    out
  }
}

sealed abstract class PerceptualHashExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
}

/** 60-bit byte-level dHash (gradient hash) of a binary blob. */
case class DHashBytes(child: Expression) extends PerceptualHashExpr {
  override def nullSafeEval(v: Any): Any =
    PerceptualHash.dhash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.expressions.PerceptualHash.dhash($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_dhash"
}

/** 60-bit byte-level aHash (average hash) of a binary blob. */
case class AHashBytes(child: Expression) extends PerceptualHashExpr {
  override def nullSafeEval(v: Any): Any =
    PerceptualHash.ahash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.expressions.PerceptualHash.ahash($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_ahash"
}
