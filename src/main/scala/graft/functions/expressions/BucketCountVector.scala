package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Fused feature-hashing kernel: bucket indices (array<int>, each in
  * [0, dim)) -> L2-normalized bucket-count vector (array<double> of length
  * dim) in a single allocation-light pass. The HOF formulation allocates a
  * dim-length array per input element; this allocates one per row.
  * Out-of-range buckets are ignored (defensive), zero inputs yield the zero
  * vector (matching l2Normalize's zero-vector passthrough).
  * `normalize = false` returns the raw counts (as doubles) — the
  * pre-normalization view the q35 oracle checks with exact integer math.
  */
case class BucketCountVector(child: Expression, dim: Int,
                             normalize: Boolean = true) extends UnaryExpression {
  require(dim > 0, s"dim must be positive, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val xs     = v.asInstanceOf[ArrayData]
    val n      = xs.numElements()
    val counts = new Array[Double](dim)
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val b = xs.getInt(i)
        if (b >= 0 && b < dim) counts(b) += 1.0
      }
      i += 1
    }
    if (normalize) {
      var nsq = 0.0
      var j   = 0
      while (j < dim) { nsq += counts(j) * counts(j); j += 1 }
      val norm = math.sqrt(nsq)
      if (norm > 0.0) { j = 0; while (j < dim) { counts(j) /= norm; j += 1 } }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n      = ctx.freshName("n")
      val i      = ctx.freshName("i")
      val j      = ctx.freshName("j")
      val b      = ctx.freshName("b")
      val counts = ctx.freshName("counts")
      val nsq    = ctx.freshName("nsq")
      val norm   = ctx.freshName("norm")
      s"""
         |int $n = $a.numElements();
         |double[] $counts = new double[$dim];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    int $b = $a.getInt($i);
         |    if ($b >= 0 && $b < $dim) $counts[$b] += 1.0;
         |  }
         |}
         |if ($normalize) {
         |  double $nsq = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) { $nsq += $counts[$j] * $counts[$j]; }
         |  double $norm = java.lang.Math.sqrt($nsq);
         |  if ($norm > 0.0) { for (int $j = 0; $j < $dim; $j++) { $counts[$j] /= $norm; } }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bucket_count_vector"
}
