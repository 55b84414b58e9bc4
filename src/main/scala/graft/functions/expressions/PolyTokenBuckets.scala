package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-token feature-hash bucket ids, fused into one pass over the raw UTF-8
  * bytes: tokenize on 0x20 (matches `split(text, " ")` with limit -1, empty
  * tokens kept), hash each token with the polynomial rolling hash
  * `h = (h·31 + byte) mod 1 000 000 007` (h₀ = 0), bucket = `h mod dim`.
  *
  * The polynomial hash — NOT xxhash64 — is deliberate: it is expressible
  * token-for-token in DuckDB SQL
  * (`list_reduce(... ascii(substr(w,i,1)) ..., (acc,x) -> (acc*31+x) % 1000000007)`),
  * which turns the whole hashing-embedder pipeline into an oracle-checkable
  * query (q35). Arithmetic stays below 2⁶³ (acc < 10⁹, ·31 + cp < 2⁶³), so
  * there is no overflow-semantics divergence between engines. The hash walks
  * Unicode CODE POINTS (via [[PolyHash.tokenHash]]), exactly the oracle's
  * character-indexed `ascii(substr(w,i,1))` — so parity holds on non-ASCII
  * text too, not just the ASCII fixtures.
  */
case class PolyTokenBuckets(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0, s"dim must be positive, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    PolyTokenBuckets.compute(v.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.PolyTokenBuckets.compute($s, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_poly_token_buckets"
}

object PolyTokenBuckets {
  def compute(s: UTF8String, dim: Int): ArrayData = {
    val th  = PolyHash.tokenHashes(s.getBaseObject, s.getBaseOffset, s.numBytes)
    val out = new Array[Int](th.length)
    var t = 0
    while (t < th.length) {
      out(t) = (th(t) % dim).toInt
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
