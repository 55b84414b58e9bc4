package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-function MinHash signature over a set of 64-bit element hashes, fused
  * into a single pass: for each element hash h and function j, the seeded
  * rehash is splitmix64(h + GOLDEN·(j+1)) and the k minima accumulate in a
  * local long[k] — no intermediate array materialization (the HOF
  * formulation allocates k arrays of n elements per row).
  *
  * splitmix64 is a public-domain finalizer (Steele et al., "Fast splittable
  * pseudorandom number generators"); overflow wraps (Java semantics), which
  * is exactly the mixing behavior wanted.
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    // a null element slot would read undefined memory through the primitive
    // accessor — reject at analysis instead of corrupting signatures at run
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> with non-nullable elements " +
        "(e.g. graft_shingle_hashes output; use filter(x, x -> x is not null) first)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @inline private def splitmix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(v: Any): Any = {
    val xs   = v.asInstanceOf[ArrayData]
    val n    = xs.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      var j = 0
      while (j < numHashes) {
        val r = splitmix64(h + 0x9e3779b97f4a7c15L * (j + 1))
        if (r < mins(j)) mins(j) = r
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n    = ctx.freshName("n")
      val i    = ctx.freshName("i")
      val j    = ctx.freshName("j")
      val h    = ctx.freshName("h")
      val z    = ctx.freshName("z")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $z = $h + 0x9e3779b97f4a7c15L * ($j + 1);
         |    $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |    $z = $z ^ ($z >>> 31);
         |    if ($z < $mins[$j]) $mins[$j] = $z;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_signature"
}
