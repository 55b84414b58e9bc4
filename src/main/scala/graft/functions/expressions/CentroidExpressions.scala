package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** IVF coarse-quantizer kernels as native codegen expressions.
  *
  * The Column formulation of the cell argmin —
  * `array_min(array(struct(lit(c2_i) − 2·dot(v, array(lit…)), lit(i)), …))`
  * — bakes nlist·dim centroid LITERALS into the expression tree. At fixture
  * parameters (nlist=32, dim=64 → 2 k literal nodes) that is invisible; at
  * production IVF (nlist 4096, dim 1536 → 6.3 M nodes) analysis + codegen
  * cost explodes and, on the streaming paths, the tree re-plans EVERY
  * micro-batch — the exact pathology class [[SrpBandBuckets]] fixed for the
  * SRP hyperplanes (q214: 1.9 s → 5.9 s on planning alone). These kernels
  * attach the centroid matrix as ONE reference object (the [[PqEncode]]
  * convention), so plan size is independent of nlist and the stage stays a
  * single compact whole-stage-codegen span.
  *
  * Arithmetic contract (bit-identical to the literal form, which is what
  * keeps every IVF-family DuckDB oracle hash-stable): the distance to
  * centroid i is `c2_i − 2.0·dot(v, c_i)` where `c2_i` is the left-to-right
  * sum of squares (the driver-side `c.map(x*x).sum` the literal form baked)
  * and `dot` is the left-to-right fold of [[DotProduct]]; argmin ties break
  * to the LOWER index (the struct-ordering tie rule), and the probe order is
  * ascending (distance, index) — exactly `sort_array` over struct(d, i).
  *
  * Null semantics — the ONE deliberate divergence from the literal form:
  * null input, a null element, or a vector/centroid length mismatch ⇒
  * NULL. The literal `array_min(array(struct(…)))` formulation silently
  * assigned such rows to CELL 0 (every per-centroid distance folded to a
  * null struct field, and null-first struct ordering made array_min pick
  * index 0) — a malformed embedding quietly joining a real cell's
  * candidate set. NULL drops the row from every cell join instead, which
  * is the honest behavior; no fixture or artifact contains such a row
  * (embedders never emit them), which is why every oracle hash is
  * unchanged. If a pre-existing artifact ever did, incremental-vs-rebuild
  * checks would surface the difference loudly rather than inherit cell 0.
  */
object CentroidKernels {

  /** Left-to-right |c|² per centroid — the same fold order as the Scala
    * `c.map(x => x * x).sum` the literal plans evaluated at build time.
    */
  def sumSq(cents: Array[Array[Double]]): Array[Double] = {
    val out = new Array[Double](cents.length)
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var s = 0.0
      var d = 0
      while (d < c.length) { s += c(d) * c(d); d += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  /** dists(i) = c2(i) − 2·dot(v, cents(i)); null (as a whole) on any null
    * element or length mismatch.
    */
  private def dists(vec: ArrayData, cents: Array[Array[Double]],
                    c2: Array[Double]): Array[Double] = {
    val dim = vec.numElements()
    var d = 0
    while (d < dim) {
      if (vec.isNullAt(d)) return null
      d += 1
    }
    val v = vec.toDoubleArray()
    val out = new Array[Double](cents.length)
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      if (c.length != dim) return null
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += v(j) * c(j); j += 1 }
      out(i) = c2(i) - 2.0 * dot
      i += 1
    }
    out
  }

  /** Double comparison with Spark's SQL ordering (SQLOrderingUtil
    * .compareDoubles): -0.0 == 0.0, NaN largest — the ordering `array_min`
    * and `sort_array` applied to the literal struct(d, i) form.
    */
  private def cmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** Boxed argmin cell index (ties → lower index), or null. */
  def argminBoxed(vec: ArrayData, cents: Array[Array[Double]],
                  c2: Array[Double]): Integer = {
    val ds = dists(vec, cents, c2)
    if (ds == null) return null
    var best = 0
    var i = 1
    while (i < ds.length) {
      if (cmp(ds(i), ds(best)) < 0) best = i
      i += 1
    }
    Integer.valueOf(best)
  }

  /** The `nprobe` nearest cell indices ascending by (distance, index) — the
    * kernel form of `slice(sort_array(cellScores(v)), 1, nprobe)` with only
    * the `i` field kept (every consumer drops `d`). Selection scans cells in
    * index order with strict `<`, which reproduces the struct sort's
    * tie-to-lower-index rule; cells whose distance is NaN sort last (the
    * compareDoubles convention).
    */
  def probes(vec: ArrayData, cents: Array[Array[Double]], c2: Array[Double],
             nprobe: Int): ArrayData = {
    val ds = dists(vec, cents, c2)
    if (ds == null) return null
    val n = ds.length
    val take = math.min(nprobe, n)
    val used = new Array[Boolean](n)
    val out = new Array[Int](take)
    var p = 0
    while (p < take) {
      var best = -1
      var i = 0
      while (i < n) {
        if (!used(i) && (best == -1 || cmp(ds(i), ds(best)) < 0)) best = i
        i += 1
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  /** cents(cell) as ArrayData, or null when out of range (the element_at
    * out-of-bounds convention under ansi=false).
    */
  def lookup(cell: Int, cents: Array[Array[Double]]): ArrayData =
    if (cell < 0 || cell >= cents.length) null
    else new GenericArrayData(cents(cell))
}

sealed trait CentroidExpression extends UnaryExpression {
  def cents: Array[Array[Double]]
  @transient protected lazy val c2: Array[Double] = CentroidKernels.sumSq(cents)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.simpleString}")
  }
}

/** The argmin coarse-cell index of a vector — `int`, ties to lower index. */
case class CentroidArgmin(child: Expression, cents: Array[Array[Double]])
  extends CentroidExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    CentroidKernels.argminBoxed(v.asInstanceOf[ArrayData], cents, c2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    val c2Ref = ctx.addReferenceObj("ivfC2", c2, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |Integer $r = graft.functions.expressions.CentroidKernels.argminBoxed($v, $centsRef, $c2Ref);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_centroid_argmin"
}

/** The `nprobe` nearest cell indices, ascending (distance, index) —
  * `array<int>`; positions are the probe ranks (`probe_rn` = pos + 1).
  */
case class CentroidProbes(child: Expression, cents: Array[Array[Double]],
                          nprobe: Int) extends CentroidExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    CentroidKernels.probes(v.asInstanceOf[ArrayData], cents, c2, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    val c2Ref = ctx.addReferenceObj("ivfC2", c2, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |ArrayData $r = graft.functions.expressions.CentroidKernels.probes($v, $centsRef, $c2Ref, $nprobe);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_centroid_probes"
}

/** The centroid ARRAY for a cell-index column — the kernel form of
  * `element_at(array(array(lit…)…), cell + 1)` (which baked the whole
  * centroid matrix as literals a second time on the residual paths).
  * Input `int` (0-based cell), output `array<double>`; out-of-range ⇒ null.
  */
case class CentroidLookup(child: Expression, cents: Array[Array[Double]])
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires int input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(cell: Any): Any =
    CentroidKernels.lookup(cell.asInstanceOf[Int], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |ArrayData $r = graft.functions.expressions.CentroidKernels.lookup($v, $centsRef);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_centroid_lookup"
}
