package graft

import graft.operators.Skew
import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-mechanics tests: salting preserves join semantics; bucketed tables
  * join without a shuffle.
  */
class ScaleSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join result (skewed key)") {
    // skew: 90% of left rows share key 1
    val left = ((1 to 900).map(i => (1L, i.toLong)) ++ (1 to 100).map(i => (i.toLong + 1, i.toLong)))
      .toDF("k", "v")
    val right = (1L to 101L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain  = left.join(right, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "k", salt = 8).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 1000)
  }

  test("heavyHitters surfaces the hot key") {
    val left = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i))).toDF("k", "v")
    val top = Skew.heavyHitters(left, col("k"), 1).head
    assert(top.getLong(0) === 1L && top.getLong(1) === 900L)
  }

  test("partitioned sink: filters prune partitions at the scan") {
    import graft.sources.PartitionedSink
    val out = java.nio.file.Files.createTempDirectory("graft_part").resolve("events").toString
    PartitionedSink.writePartitioned(
      Tables.events(spark, sfDir).select("event_id", "user_id", "value", "event_type"),
      out, Seq("event_type"))
    val pruned = spark.read.parquet(out).filter(col("event_type") === "error")
    assert(PartitionedSink.isPartitionPruned(pruned),
      pruned.queryExecution.executedPlan.toString.take(2000))
    val want = Tables.events(spark, sfDir).filter(col("event_type") === "error").count()
    assert(pruned.count() === want)
  }

  test("bucketed co-located join plans without a shuffle") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    Bucketing.writeBucketed(o, "orders_b", "o_custkey", 4)
    Bucketing.writeBucketed(c.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 4)
    val joined = spark.table("orders_b").join(spark.table("customer_b"), Seq("o_custkey"))
    val agg = joined.groupBy("o_custkey").agg(sum("o_totalprice"))
    assert(Bucketing.isShuffleFree(joined), joined.queryExecution.executedPlan.toString)
    assert(Bucketing.isShuffleFree(agg), "groupBy on bucket key should reuse bucketing")
    // and the result is correct
    assert(joined.count() === o.count())
  }
}
