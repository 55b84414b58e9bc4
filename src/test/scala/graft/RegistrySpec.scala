package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run on sf0.001 and return rows; every oracle
  * key must reference a registered query. Cheap full-surface smoke.
  */
class RegistrySpec extends AnyFunSuite with SparkTestSession {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without query: $orphans")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val n = fn(spark, sfDir).count()
      // near-dup queries may legitimately return few rows, but zero across the
      // board would mean a dead operator; allow zero only for pair queries
      if (name.contains("pairs") || name.contains("near_dup")) assert(n >= 0)
      else assert(n > 0, s"$name returned 0 rows")
    }
  }
}
