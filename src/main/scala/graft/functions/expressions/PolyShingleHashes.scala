package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct n-gram shingle hashes — the SQL-expressible sibling of
  * [[ShingleHashes]]: token hash is the [[PolyHash]] code-point polynomial
  * (not xxhash64) and the shingle hash folds the n token hashes with
  * `acc = (acc·R + th) mod P`. Identical values come out of DuckDB as
  *
  * {{{
  * list_distinct(list_transform(generate_series(1, len(ths)-n+1),
  *   i -> fold over ths[i..i+n-1] of (acc*1000003 + th) % 1000000007))
  * }}}
  *
  * which turns the whole MinHash-LSH dedup pipeline (q22b/q45) into an
  * oracle-checkable query. Hash range is [0, P) ≈ 30 bits: across a corpus
  * of ~10⁶ shingles birthday collisions are real (~500), but BOTH engines
  * compute the same collisions, so set parity is exact; the per-pair Jaccard
  * error from a collision between two ~100-shingle sets is ~10⁻⁵ — below the
  * floorRound(4) output granularity in expectation and irrelevant to the
  * ≥-threshold policy at the margins the fixtures exercise.
  *
  * Fused single pass like its sibling (the HOF tree was the measured dedup
  * hotspot); static helper keeps whole-stage codegen intact.
  */
case class PolyShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    PolyShingleHashes.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.PolyShingleHashes.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_poly_shingle_hashes"
}

object PolyShingleHashes {
  import PolyHash.{P, R}

  def compute(s: UTF8String, n: Int): ArrayData = {
    val th = PolyHash.tokenHashes(s.getBaseObject, s.getBaseOffset, s.numBytes)
    val m  = th.length - n + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var k = 0
      while (k < n) {
        acc = (acc * R + th(i + k)) % P
        k += 1
      }
      hs(i) = acc
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    i = 1
    while (i < m) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    val out = if (w == m) hs else java.util.Arrays.copyOf(hs, w)
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
