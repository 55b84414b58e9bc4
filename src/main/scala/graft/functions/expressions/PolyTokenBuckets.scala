package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.Platform
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
  * query (q35). Arithmetic stays below 2⁶³ (acc < 10⁹, ·31 + 255 < 2⁶³), so
  * there is no overflow-semantics divergence between engines. Byte values are
  * read unsigned; for ASCII corpora (the fixtures) byte == `ascii()` code
  * point, which is the oracle's formulation — non-ASCII text is still
  * deterministic, just byte-level rather than code-point-level.
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
  private val P = 1000000007L

  def compute(s: UTF8String, dim: Int): ArrayData = {
    val base = s.getBaseObject
    val off  = s.getBaseOffset
    val len  = s.numBytes
    var spaces = 0
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val out = new Array[Int](spaces + 1)
    var t = 0
    var h = 0L
    i = 0
    while (i < len) {
      val b = Platform.getByte(base, off + i)
      if (b == 0x20) {
        out(t) = (h % dim).toInt
        t += 1
        h = 0L
      } else {
        h = (h * 31L + (b & 0xFF)) % P
      }
      i += 1
    }
    out(t) = (h % dim).toInt
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
