package graft

import graft.operators.{Scan, Validate}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScanSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // ---- Scan: the two-pass distributed prefix scan vs the single-partition
  // window it replaces (equality is the whole contract) ----

  test("cumSums matches the single-partition window cumsum") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(i => (rnd.nextInt(100).toLong, rnd.nextInt(10).toLong, 1L))
      .toDF("k", "a", "b")
      .groupBy("k").agg(sum("a").as("a"), sum("b").as("b")) // distinct keys: tie-free scan
    val got = Scan.cumSums(df, Seq("k"), Seq("a", "b"), parts = 7)
      .select("k", "cum_a", "cum_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("cum_a", sum("a").over(w)).withColumn("cum_b", sum("b").over(w))
      .select("k", "cum_a", "cum_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got === want)
  }

  test("cumSums: single row and empty input") {
    val one = Seq((5L, 3L)).toDF("k", "n")
    assert(Scan.cumSums(one, Seq("k"), Seq("n"), parts = 4)
      .select("cum_n").head.getLong(0) === 3L)
    val empty = Seq.empty[(Long, Long)].toDF("k", "n")
    assert(Scan.cumSums(empty, Seq("k"), Seq("n"), parts = 4).count() === 0L)
  }

  test("runningLast carries the latest flagged payload across partitions") {
    // payload present only at keys 10, 40, 41; nulls elsewhere
    val df = (0L to 60L).map(k => (k, if (Set(10L, 40L, 41L)(k)) Some(k * 100) else None))
      .toDF("k", "p")
    val got = Scan.runningLast(df, Seq("k"), "p", parts = 5)
      .select("k", "prev_p").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sortBy(_._1)
    got.foreach { case (k, prev) =>
      val want = Seq(10L, 40L, 41L).filter(_ <= k).lastOption.map(_ * 100).getOrElse(-1L)
      assert(prev === want, s"at k=$k")
    }
  }

  // ---- KS gate: exact statistic on a hand-checkable sample ----

  test("ksGate computes the textbook two-sample D") {
    // prev = {1..10}, next = {6..15}: F_prev(5) = 0.5, F_next(5) = 0 -> D = 0.5
    val prev = (1 to 10).map(_.toDouble).toDF("v")
    val next = (6 to 15).map(_.toDouble).toDF("v")
    val r = Validate.ksGate(prev, next, "v", threshold = 0.3, scanParts = 3).head
    assert(r.getDouble(0) === 0.5)
    assert(r.getLong(1) === 10L && r.getLong(2) === 10L && r.getLong(3) === 1L)
  }

  test("ksGate: identical samples read D = 0 and do not flag") {
    val x = (1 to 50).map(i => (i % 7).toDouble).toDF("v")
    val r = Validate.ksGate(x, x, "v", threshold = 0.05).head
    assert(r.getDouble(0) === 0.0 && r.getLong(3) === 0L)
  }

  test("binned KS under-estimates exact KS and converges with the grid") {
    val rnd = new scala.util.Random(11)
    val prev = (1 to 400).map(_ => rnd.nextDouble() * 10).toDF("v")
    val next = (1 to 400).map(_ => rnd.nextDouble() * 10 + 1.5).toDF("v") // location shift
    val exact = Validate.ksGate(prev, next, "v", threshold = 0.1).head.getDouble(0)
    def binned(bins: Int) = {
      import graft.operators.Sketches
      Validate.ksGateFromBinnedCounts(
        Sketches.histogramCounts(prev, "v", 0.0, 12.0, bins),
        Sketches.histogramCounts(next, "v", 0.0, 12.0, bins),
        threshold = 0.1).head.getDouble(0)
    }
    val d8 = binned(8)
    val d64 = binned(64)
    assert(d8 <= exact + 1e-9)
    assert(d64 <= exact + 1e-9)
    assert(d64 >= d8 - 1e-9)          // refinement never loses resolution here
    assert(exact - d64 < 0.05)         // 64 bins ~ exact on a 1.5/10 shift
    assert(exact > 0.1)                // the shift itself is visible
  }
}
