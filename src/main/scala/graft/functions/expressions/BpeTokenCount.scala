package graft.functions.expressions

import graft.functions.bpe.BpeTokenizer
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token count under the byte-level BPE tokenizer
  * ([[graft.functions.bpe.BpeTokenizer.default]]) — the faithful analog of
  * the reference's tiktoken length guard (`vectrekker/main.py:170,175`),
  * whose pipeline only ever consumes the COUNT. A native expression (not a
  * UDF) so the scan stage stays whole-stage-codegen'd; the BPE merge loop
  * runs in a static JVM helper with a per-executor pre-token memo.
  *
  * Oracle-checked: the DuckDB mirror is a recursive-CTE merge loop over the
  * same merge table (generated from [[BpeTokenizer.default]] at query
  * registration — see `TextQueries.bpeOracle`); the whitespace token model
  * ([[graft.functions.TextFunctions.tokens]]) is the simpler oracle path.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    BpeTokenCount.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.BpeTokenCount.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_token_count"
}

object BpeTokenCount {
  def compute(s: UTF8String): Int = BpeTokenizer.default.countTokens(s.toString)
}
