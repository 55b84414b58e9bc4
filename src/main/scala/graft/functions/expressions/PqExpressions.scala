package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels as native codegen expressions.
  *
  * The straightforward Column formulation (m·ksub unrolled struct/dot
  * subtrees per row) generates methods past janino's limits — whole-stage
  * codegen FAILS compilation (measured ~5 s per failed attempt, then
  * interpreted fallback), which is exactly the codegen-friendliness rule the
  * brief's hot paths live by. These expressions emit a single static-kernel
  * call with the codebook attached as a reference object, so the stage stays
  * one compact whole-stage-codegen span.
  *
  * Arithmetic contract (the q135/q136 DuckDB oracle mirrors it token for
  * token): all reductions are sequential left folds from 0.0; the entry
  * distance is `|cb|² − 2·v_j·cb` (ties to the lower code), the ADC table
  * entry is `|q_j|² + |cb|² − 2·q_j·cb`.
  */
object PqKernels {

  /** codes[j] = argmin over codebook entries of |cb|² − 2·v_j·cb. */
  def encode(vec: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val v = vec.toDoubleArray()
    val m = cb.length
    val dsub = v.length / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestD = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < cb(j).length) {
        val e = cb(j)(c)
        var c2 = 0.0
        var d = 0
        while (d < dsub) { c2 += e(d) * e(d); d += 1 }
        var dot = 0.0
        d = 0
        while (d < dsub) { dot += v(j * dsub + d) * e(d); d += 1 }
        val dist = c2 - 2.0 * dot
        if (dist < bestD) { bestD = dist; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Flat asymmetric-distance table: entry [j·ksub + c] = |q_j − cb_jc|². */
  def adcTable(vec: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val v = vec.toDoubleArray()
    val m = cb.length
    val dsub = v.length / m
    var total = 0
    var j = 0
    while (j < m) { total += cb(j).length; j += 1 }
    val out = new Array[Double](total)
    var idx = 0
    j = 0
    while (j < m) {
      var q2 = 0.0
      var d = 0
      while (d < dsub) { q2 += v(j * dsub + d) * v(j * dsub + d); d += 1 }
      var c = 0
      while (c < cb(j).length) {
        val e = cb(j)(c)
        var c2 = 0.0
        d = 0
        while (d < dsub) { c2 += e(d) * e(d); d += 1 }
        var dot = 0.0
        d = 0
        while (d < dsub) { dot += v(j * dsub + d) * e(d); d += 1 }
        out(idx) = q2 + c2 - 2.0 * dot
        idx += 1
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

sealed trait PqExpression extends UnaryExpression {
  def codebooks: Array[Array[Array[Double]]]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.simpleString}")
  }

  protected def kernel: String // PqKernels method name

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.PqKernels.$kernel($s, $cbRef);")
  }
}

/** Per-subspace code assignment — `array<int>` of length m. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends PqExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], codebooks)
  override protected def kernel: String = "encode"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_encode"
}

/** Per-query flat ADC table — `array<double>` of length m·ksub. */
case class PqAdcTable(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends PqExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    PqKernels.adcTable(v.asInstanceOf[ArrayData], codebooks)
  override protected def kernel: String = "adcTable"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_adc_table"
}
