package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct n-gram shingle hashes of a document, fused into one pass
  * over the raw UTF-8 bytes.
  *
  * Semantics are bit-identical to the HOF formulation it replaces
  * (tokens = `split(text, " ")`, token hash = `xxhash64(token)`, shingle
  * hash = `xxhash64(th(i), …, th(i+n-1))`, then `sort_array(array_distinct(…))`):
  *  - tokenization walks the bytes splitting on 0x20, which matches
  *    `split(text, " ")` because a space byte cannot occur inside a UTF-8
  *    multi-byte sequence, and Java regex split with limit -1 keeps empty
  *    trailing tokens;
  *  - hashes reuse Spark's own [[XXH64]] (seed 42, fold-seeded for the
  *    multi-argument form), so values equal the builtin `xxhash64`.
  *
  * Why it exists: the equivalent Column tree
  * (`transform(sequence(1, cnt), i => xxhash64(element_at(__th, i), …))`)
  * costs ~5 s over 5 000 docs at sf0.1 — per-element `element_at` bound
  * checks, a materialized index `sequence`, boxed lambda evaluation, and a
  * generic `array_distinct` — while this kernel does the same work in one
  * allocation-lean JVM loop. The heavy loop lives in a static helper invoked
  * from both interpreted and codegen paths, so whole-stage codegen stays
  * intact (one call per row).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.ShingleHashes.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_shingle_hashes"
}

object ShingleHashes {
  private val Seed = 42L

  /** One pass: tokenize on 0x20, hash each token slice, roll n-gram hashes,
    * sort + dedup in place. Returns an UnsafeArrayData (primitive longs).
    */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off  = s.getBaseOffset
    val len  = s.numBytes
    // pass 1: token count = spaces + 1 (split with limit -1 keeps empties)
    var spaces = 0
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val numTokens = spaces + 1
    val m = numTokens - n + 1 // shingle count
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // pass 2: token hashes
    val th = new Array[Long](numTokens)
    var t = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || Platform.getByte(base, off + i) == 0x20) {
        th(t) = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        t += 1
        start = i + 1
      }
      i += 1
    }
    // pass 3: rolling shingle hashes (multi-arg xxhash64 = fold-seeded)
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = Seed
      var k = 0
      while (k < n) {
        h = XXH64.hashLong(th(i + k), h)
        k += 1
      }
      hs(i) = h
      i += 1
    }
    // sort + dedup in place
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
