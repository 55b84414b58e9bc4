package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def vec(xs: Double*) = xs.toArray

  private lazy val df = Seq(
    (1L, vec(1, 0, 0), vec(0, 1, 0)),
    (2L, vec(1, 2, 3), vec(1, 2, 3)),
    (3L, vec(1, 1, 0), vec(1, 0, 0)),
    (4L, vec(0, 0, 0), vec(1, 2, 3)),
  ).toDF("id", "a", "b")

  test("dot product") {
    val r = df.select($"id", dot($"a", $"b").as("d")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r(1) === 0.0)
    assert(r(2) === 14.0)
    assert(r(3) === 1.0)
  }

  test("cosine: orthogonal=0, identical=1, 45deg") {
    val r = df.select($"id", cosine($"a", $"b").as("c")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(math.abs(r(1)) < 1e-12)
    assert(math.abs(r(2) - 1.0) < 1e-12)
    assert(math.abs(r(3) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("cosine is in [-1,1] and cos(v,v)=1 for random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Array.fill(16)(rnd.nextGaussian()), Array.fill(16)(rnd.nextGaussian())))
    val d = rows.toDF("a", "b")
    val cs = d.select(cosine($"a", $"b").as("c"), cosine($"a", $"a").as("self")).collect()
    cs.foreach { r =>
      assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    }
  }

  test("fused kernels are bit-identical to the HOF forms") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(100)((Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian())))
    val d = rows.toDF("a", "b")
    val cmp = d.select(
      cosine($"a", $"b").as("c_hof"), cosineFused($"a", $"b").as("c_fused"),
      dot($"a", $"b").as("d_hof"), dotFused($"a", $"b").as("d_fused")).collect()
    cmp.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // exact, not approx
      assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("fused kernels: null on length mismatch, null on zero norm") {
    val d = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0), Array(0.0, 0.0)))
      .toDF("a", "b", "z")
    val r = d.select(cosineFused($"a", $"b"), cosineFused($"a", $"z"), dotFused($"a", $"b")).head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("matVec kernel is bit-identical to the HOF literal-matrix form") {
    val rnd = new scala.util.Random(29)
    val mat = Array.fill(16)(Array.fill(16)(rnd.nextGaussian()))
    // the historical HOF formulation the kernel replaced — the equivalence
    // contract that keeps every rotated-chain oracle hash-stable
    def matVecHof(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val rows = array(mat.map(r => array(r.map(lit): _*)): _*)
      transform(sequence(lit(1), lit(mat.length)), j => dotFused(v, element_at(rows, j)))
    }
    val d = Seq.fill(50)(Array.fill(16)(rnd.nextGaussian())).toDF("v")
    val cmp = d.select(matVec($"v", mat).as("k"), matVecHof($"v").as("h")).collect()
    cmp.foreach { r =>
      assert(r.getSeq[Double](0) === r.getSeq[Double](1)) // exact, not approx
    }
    // null semantics: length mismatch ⇒ null elements; null vector ⇒ null
    val e = Seq(Tuple1(Array(1.0, 2.0))).toDF("v")
      .select(matVec($"v", mat).as("k"),
        matVec(lit(null).cast("array<double>"), mat).as("n")).head
    assert(e.getSeq[Any](0).forall(_ == null) && e.isNullAt(1))
  }

  test("VectorSumAggregator: typed UDAF mean vector per group") {
    import graft.functions.VectorSumAggregator
    import org.apache.spark.sql.functions.udaf
    val meanUdaf = udaf(VectorSumAggregator.meanVector)
    val d = Seq((0, Seq(1.0, 3.0)), (0, Seq(3.0, 5.0)), (1, Seq(2.0, 2.0)))
      .toDF("g", "v")
    val got = d.groupBy("g").agg(meanUdaf($"v").as("mean"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got(0) === Seq(2.0, 4.0))
    assert(got(1) === Seq(2.0, 2.0))
  }

  test("euclidean distance") {
    val r = df.filter($"id" === 1).select(euclidean($"a", $"b")).head.getDouble(0)
    assert(math.abs(r - math.sqrt(2)) < 1e-12)
  }

  test("l2Normalize produces unit vectors; zero vector passes through") {
    val r = df.select($"id", l2Norm(l2Normalize($"a")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(r(2) - 1.0) < 1e-12)
    assert(r(4) === 0.0) // zero vector stays zero
  }
}
