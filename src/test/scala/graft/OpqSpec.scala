package graft

import graft.operators.{AnnIndex, Opq}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPQ trainer + clustered-fixture invariants (Ge et al. CVPR 2013): the
  * eigensolver, the variance-balancing allocation, the orthogonality of the
  * trained rotation, the Spark↔Scala fixture-formula equivalence, and the
  * measured strict recall ordering raw < residual < residual+OPQ that
  * q178's oracle-checked audit reports.
  */
class OpqSpec extends AnyFunSuite with SparkTestSession {

  test("jacobiEigenSym solves a symmetric eigenproblem: A·v = λ·v, VᵀV = I") {
    val rnd = new scala.util.Random(11)
    val n = 12
    val b = Array.fill(n, n)(rnd.nextDouble() - 0.5)
    val a = Array.tabulate(n, n)((i, j) => (b(i)(j) + b(j)(i)) / 2.0)
    val (lam, v) = Opq.jacobiEigenSym(a)
    for (e <- 0 until n) {
      for (r <- 0 until n) {
        val av = (0 until n).map(c => a(r)(c) * v(c)(e)).sum
        assert(math.abs(av - lam(e) * v(r)(e)) < 1e-9, s"A·v ≠ λ·v at ($r,$e)")
      }
    }
    for (i <- 0 until n; j <- 0 until n) {
      val d = (0 until n).map(r => v(r)(i) * v(r)(j)).sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"VᵀV not I at ($i,$j)")
    }
  }

  test("eigenAllocation balances variance: buckets full, top directions spread") {
    // 8 dominant eigenvalues among 64 — the fixture's shape. Balanced
    // allocation must put the 8 dominant directions into 8 DISTINCT buckets.
    val lam = Array.tabulate(64)(i => if (i < 8) 1e9 + i else 1.0 + i * 1e-3)
    val alloc = Opq.eigenAllocation(lam, m = 16, dsub = 4)
    assert(alloc.sorted.toSeq == (0 until 64), "allocation must be a permutation")
    val bucketOf = alloc.zipWithIndex.map { case (e, pos) => e -> pos / 4 }.toMap
    val topBuckets = (0 until 8).map(bucketOf)
    assert(topBuckets.distinct.length == 8,
      s"dominant directions share buckets: $topBuckets")
  }

  test("fixtureRotation is orthogonal and deterministic") {
    val r1 = Opq.fixtureRotation
    val r2 = Opq.trainRotation({
      val ids = 0 until 256
      val xs = ids.map(i => Opq.clusteredVector(i.toLong)).toArray
      val means = Array.ofDim[Double](32, 64)
      for (i <- ids; d <- 0 until 64) means(i % 32)(d) += xs(i)(d) / 8.0
      ids.map(i => Array.tabulate(64)(d => xs(i)(d) - means(i % 32)(d))).toArray
    }, m = 16, dsub = 4)
    val n = r1.length
    for (i <- 0 until n; j <- 0 until n) {
      val d = (0 until n).map(k => r1(i)(k) * r1(j)(k)).sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"R·Rᵀ not I at ($i,$j)")
    }
    // retraining from the same formula reproduces the exact same matrix
    for (i <- 0 until n; j <- 0 until n)
      assert(math.abs(r1(i)(j) - r2(i)(j)) < 1e-12)
  }

  test("Spark-generated clustered fixture matches the Scala formula bit-for-bit") {
    val cf = graft.queries.VectorQueries.clusteredDf(spark, sfDir)
      .filter(col("vec_id") < 40)
      .select(col("vec_id"), col("cvec"))
      .collect()
    assert(cf.nonEmpty)
    for (r <- cf) {
      val id = r.getLong(0)
      val got = r.getSeq[Double](1)
      val want = Opq.clusteredVector(id)
      assert(got.length == 64)
      for (d <- 0 until 64)
        assert(got(d) == want(d), s"component $d of vec $id: ${got(d)} != ${want(d)}")
    }
  }

  test("clustered corpus: recall@3 strictly improves raw < residual < residual+OPQ") {
    val cf = graft.queries.VectorQueries.clusteredDf(spark, sfDir)
    val out = SparkEntry.queries("q178_opq_recall")(spark, sfDir).collect()
    assert(out.length == 20)
    val hitRaw = out.map(_.getAs[Long]("n_hit_raw")).sum
    val hitRes = out.map(_.getAs[Long]("n_hit_res")).sum
    val hitOpq = out.map(_.getAs[Long]("n_hit_opq")).sum
    assert(hitRaw < hitRes, s"residual must beat raw PQ: raw=$hitRaw res=$hitRes")
    assert(hitRes < hitOpq, s"OPQ must beat plain residual: res=$hitRes opq=$hitOpq")
    assert(cf.count() >= 256) // the rotation's training-sample ids exist at every SF
  }

  test("kmeans centroids land on the planted cluster means (clustered fixture)") {
    val cf = graft.queries.VectorQueries.clusteredDf(spark, sfDir)
    val cents = AnnIndex.kmeansCentroids(cf, "cvec", "vec_id", k = 32, iters = 1)
    // every corpus vector's nearest trained centroid is its planted cluster's
    val rows = cf.limit(200).collect()
    for (r <- rows) {
      val id = r.getLong(0)
      val v = r.getSeq[Double](1)
      val d2 = cents.map(c => c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(d2.zipWithIndex.min._2 == (id % 32).toInt,
        s"vec $id assigned to ${d2.zipWithIndex.min._2}, planted ${(id % 32)}")
    }
  }
}
