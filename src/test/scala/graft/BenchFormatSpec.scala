package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-contract byte budget of Bench's metric line: the driver
  * parses the line out of the LAST ~2000 bytes of output, and overflow
  * silently loses the round's metrics (the BENCH_r01..r04 failure). Every
  * added query grows the line, so this asserts the budget at pessimistic
  * widths instead of discovering the clip one round too late.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val worstNoise =
    ""","noise":{"tw":9999.99,"te":9999.99,"r":99.99,"ls":99.99,"le":99.99,"lm":99.99}"""

  test("metric line fits the driver tail window even at worst-case timing widths") {
    val names = SparkEntry.queries.keys.toSeq
    // tiered formatting keeps every value ≤ 4 chars below 1000 s — probe the
    // widest band of each tier plus an absurd contaminated run
    for (v <- Seq(9.99, 99.9, 999.0)) {
      val line = Bench.metricLine(names.map(_ -> v).toMap, "sf0.1", worstNoise, "")
      info(s"${names.size} queries at $v -> ${line.length} bytes")
      assert(line.length <= 1900,
        s"metric line ${line.length} B with every query at $v s: compact keys/values " +
          "further or the driver tail clips it and the round's metrics are lost")
    }
  }

  test("prefix-compressed query keys stay unique") {
    val keys = Bench.shortKeys(SparkEntry.queries.keys)
    assert(keys.values.toSeq.distinct.size === keys.size)
  }
}
