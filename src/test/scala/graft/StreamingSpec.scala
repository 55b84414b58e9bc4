package graft

import graft.streaming.{Sessionize, StreamingAgg}
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite with SparkTestSession {

  test("streaming sessionization equals batch sessionization") {
    val batch  = Sessionize.batch(spark, sfDir).collect().map(_.toSeq).toSet
    val stream = Sessionize.streaming(spark, sfDir).collect().map(_.toSeq).toSet
    assert(stream === batch)
    assert(batch.nonEmpty)
  }

  test("streaming monthly order stats equals batch aggregation") {
    import org.apache.spark.sql.functions._
    import graft.functions.MathFunctions.floorRound
    val stream = StreamingAgg.monthlyOrderStats(spark, sfDir).collect().map(_.toSeq).toSet
    val batch = Tables.orders(spark, sfDir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"), floorRound(sum("o_totalprice"), 2).as("total"))
      .collect().map(_.toSeq).toSet
    assert(stream === batch)
    assert(batch.nonEmpty)
  }

  test("watermarked windowed counts emit finalized windows") {
    val rows = Sessionize.windowedCounts(spark, sfDir).collect()
    assert(rows.nonEmpty) // no-data batch finalizes watermark-passed windows
    assert(rows.map(_.getLong(1)).forall(_ > 0))
  }
}
