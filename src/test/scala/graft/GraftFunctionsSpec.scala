package graft

import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("native kernels are callable from SQL text") {
    GraftFunctions.register(spark)
    Seq((Array(1.0, 0.0), Array(1.0, 0.0))).toDF("a", "b").createOrReplaceTempView("v")
    val r = spark.sql(
      """SELECT graft_cosine(a, b) AS c, graft_dot(a, b) AS d,
        |  graft_sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS i,
        |  size(graft_minhash(array(42L, 7L), 16)) AS m
        |FROM v""".stripMargin).head
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getInt(2) === 2)
    assert(r.getInt(3) === 16)
  }
}
