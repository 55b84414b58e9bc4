package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-contract byte budget of Bench's stdout: the driver
  * parses the metric line out of the LAST ~2000 bytes of output, and
  * overflow silently loses the round's metrics (the BENCH_r01..r04
  * failure). Since round 9 the output is two lines — a sacrificial
  * per-query line first, then the compact parsed line — so the parsed line
  * must stay far inside the window REGARDLESS of query count, and the
  * per-query values use tier-after-rounding widths (9.999 s must print
  * "10.0", not the 5-char "10.00").
  */
class BenchFormatSpec extends AnyFunSuite {

  private val worstNoise =
    ""","noise":{"tw":9999.99,"te":9999.99,"r":99.99,"ls":99.99,"le":99.99,"lm":99.99}"""

  test("parsed metric line stays ≤500 bytes regardless of query count") {
    val names = SparkEntry.queries.keys.toSeq
    // worst case: every query at a huge contaminated value + worst noise +
    // a filter tag — the line no longer carries per-query values, so its
    // length must be flat in the query count
    val line = Bench.metricLine(names.map(_ -> 9999.99).toMap, "sf0.1",
      worstNoise, ""","filtered":true,"filter":"q1,q2,q3"""")
    info(s"${names.size} queries -> parsed line ${line.length} bytes")
    assert(line.length <= 500,
      s"parsed metric line ${line.length} B: must stay well inside the " +
        "driver's 2000-byte tail window even as queries are added")
  }

  test("tiered fmt picks the tier AFTER rounding (boundary values stay ≤4 chars)") {
    val names = SparkEntry.queries.keys.toSeq
    // 9.999 rounds to 10.00 in the 2-decimal tier (5 chars) unless the
    // tier is picked post-rounding; 99.99 likewise to 100.0. Probe the
    // true worst case of each tier, not just comfortably-inside values.
    for (v <- Seq(9.99, 9.999, 99.9, 99.99, 999.0, 999.9)) {
      val line = Bench.perQueryLine(names.map(_ -> v).toMap, "sf0.1")
      val widest = line.split("[:,]").filter(_.matches("[0-9.]+")).map(_.length).max
      assert(widest <= 4, s"value $v formatted wider than 4 chars in $line")
    }
  }

  test("per-query line is machine-readable and bounded") {
    val names = SparkEntry.queries.keys.toSeq
    val line = Bench.perQueryLine(names.map(_ -> 999.9).toMap, "sf0.1")
    info(s"${names.size} queries -> per-query line ${line.length} bytes")
    // not driver-parsed (it may be tail-clipped), but kept sane for humans
    // and whole-log tooling: ~12 bytes/query worst case
    assert(line.length <= 16 * names.size + 64)
  }

  test("rt/builds ride the per-query line; metric line carries only bt/bn") {
    val names = SparkEntry.queries.keys.toSeq
    val rt = Seq(("q212_cross_modal_verdict", 3.21, 0.31), ("q219_curate_mix_pack", 9.0, 1.5))
    val builds = Seq("cross_modal_verdict_s3_v2" -> 12.34, "frame_index_v1" -> 1.0)
    val line = Bench.perQueryLine(names.map(_ -> 1.0).toMap, "sf0.1", rt, builds)
    assert(line.contains(""""rt":{"q212":[3.21,0.31],"q219":[9.00,1.50]}"""))
    // fmt's tier-after-rounding applies to build values too: 12.34 → "12.3"
    assert(line.contains(""""builds":{"cross_modal_verdict_s3_v2":12.3,"frame_index_v1":1.00}"""))
    // the parsed line's budget is unchanged: builds appear only as bt/bn
    val metric = Bench.metricLine(names.map(_ -> 1.0).toMap, "sf0.1",
      worstNoise + ""","bt":13.34,"bn":2""", "")
    assert(metric.length <= 500)
    // empty retime/builds add zero bytes (the pre-r16 shape)
    assert(Bench.perQueryLine(names.map(_ -> 1.0).toMap, "sf0.1") ==
      Bench.perQueryLine(names.map(_ -> 1.0).toMap, "sf0.1", Seq.empty, Seq.empty))
  }

  test("prefix-compressed query keys stay unique") {
    val keys = Bench.shortKeys(SparkEntry.queries.keys)
    assert(keys.values.toSeq.distinct.size === keys.size)
  }
}
