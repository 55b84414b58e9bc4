package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * codegen'd scalar — the text-canonicalization step byte-exact dedup
  * needs before hashing: "café" arrives from real crawls both precomposed
  * (U+00E9) and decomposed (e + U+0301), visually identical, byte-distinct.
  * Hashing the NFC form merges every canonical-equivalent spelling while
  * leaving genuinely different text apart; DuckDB's `nfc_normalize`
  * implements the same UAX #15 transform, which is what makes the dedup
  * oracle-checkable across engines.
  *
  * ASCII fast path: canonical composition cannot alter pure-ASCII text, and
  * `java.text.Normalizer.isNormalized` is a cheap scan — the common case
  * (the bulk of a web corpus) returns the input UTF8String without
  * allocating. The JDK's Normalizer is ICU-derived and tracks the Unicode
  * version of the running JDK; both engines here normalize per UAX #15, so
  * mirrored md5(nfc(text)) compares equal.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.NfcNormalize.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {
  import java.text.Normalizer

  /** NFC-normalize; returns the input object unchanged when already
    * normalized. Pure-ASCII input (the bulk of a web corpus) is detected by
    * a byte scan and returns without even the String round-trip.
    */
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
