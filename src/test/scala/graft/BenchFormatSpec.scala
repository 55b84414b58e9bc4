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

  // ---- contamination-gate replay on synthetic profiles (r19 verdict
  // task 1c: the gate decisions must be unit-testable, and the historical
  // escapes must be pinned as failing inputs) ----

  /** A synthetic n-query profile: `hot` of the queries carry a load sample
    * of `hotLoad`, the rest sit at the quiet endpoint load.
    */
  private def profile(n: Int, hot: Int, hotLoad: Double,
                      ls: Double, le: Double, lm: Double,
                      ratio: Double, warm: Double, cpus: Int = 4,
                      secPerQuery: Double = 1.2): Bench.SuiteProfile = {
    val names = (1 to n).map(i => f"q$i%03d_x")
    val loads = names.zipWithIndex.map { case (nm, i) =>
      nm -> (if (i < hot) hotLoad else math.min(ls, le))
    }.toMap
    Bench.SuiteProfile(names.map(_ -> secPerQuery).toMap, ratio, warm,
      ls, le, lm, loads, cpus, filtered = false)
  }

  test("gate: BENCH_r19's mid-run contamination is dirty under the absolute load bound") {
    // the published r19 profile: probe quiet (tw .73, r .76), endpoints
    // 3.05/3.97, lm 7.86 — the old relative trigger self-raised its
    // threshold to 2×3.97 = 7.94 and MISSED by 1%. The absolute bound is
    // max(3.97, 4 cpus) + 2 = 6.0: sustained samples at 7.86 are hot.
    val r19 = profile(n = 289, hot = 40, hotLoad = 7.86,
      ls = 3.05, le = 3.97, lm = 7.86, ratio = 0.76, warm = 0.73,
      secPerQuery = 833.0 / 289)
    assert(Bench.loadBound(r19) === 6.0)
    assert(Bench.dirtyReason(r19, probeAbsMax = 1.4) === Some("load_abs"))
  }

  test("gate: a single transient spike is NOT dirty but IS retimed (quiet r17 shape)") {
    // r17 published lm 9.76 on a clean run — one cron blip. A full-suite
    // retry would burn 5 minutes for nothing; the per-query retime repairs
    // exactly the spiked queries.
    val r17 = profile(n = 289, hot = 2, hotLoad = 9.76,
      ls = 4.01, le = 3.48, lm = 9.76, ratio = 1.32, warm = 0.42,
      secPerQuery = 282.9 / 289)
    assert(Bench.dirtyReason(r17, probeAbsMax = 1.4) === None)
    val sel = Bench.retimeSelection(r17, k = 6, cap = 64)
    assert(sel.toSet.intersect(Bench.hotQueries(r17)).size === 2,
      "both hot-sample queries must be selected for retime")
  }

  test("gate: load-sample-driven retime has no rank cliff (the q270 escape)") {
    // r19 published the 7th-worst query (q270, 60.7 s vs 1.61 s real)
    // un-retimed because selection was the fixed top-6. With 10 hot
    // samples, ALL 10 must be selected regardless of K.
    val p = profile(n = 289, hot = 10, hotLoad = 8.5,
      ls = 3.0, le = 3.5, lm = 8.5, ratio = 1.0, warm = 0.6)
    val sel = Bench.retimeSelection(p, k = 6, cap = 64)
    assert(Bench.hotQueries(p).subsetOf(sel.toSet),
      "every hot-sample query must be retimed, not just the top K")
    // and the cap bounds a fully-hot run's extra wall
    val allHot = profile(n = 289, hot = 289, hotLoad = 9.0,
      ls = 3.0, le = 3.5, lm = 9.0, ratio = 1.0, warm = 0.6)
    assert(Bench.retimeSelection(allHot, k = 6, cap = 64).size === 64)
  }

  test("gate: quiet profiles stay clean (r13/r14 shapes)") {
    val r13 = profile(n = 270, hot = 0, hotLoad = 0,
      ls = 3.61, le = 4.82, lm = 5.40, ratio = 0.77, warm = 0.64)
    assert(Bench.dirtyReason(r13, probeAbsMax = 1.4) === None)
    // endpoints themselves elevated but flat (our own warmup tail): bound
    // tracks the endpoints, so lm = le is never hot
    val r14 = profile(n = 270, hot = 0, hotLoad = 0,
      ls = 5.25, le = 6.55, lm = 6.55, ratio = 1.19, warm = 0.56)
    assert(Bench.dirtyReason(r14, probeAbsMax = 1.4) === None)
  }

  test("gate: uniform contamination (r18) is caught by the history-derived probe_abs") {
    // uniform load defeats every load trigger by construction (endpoints
    // as hot as the middle, all samples equal): the warm probe is the one
    // absolute reference. r18's contaminated run read tw = 1.08 s against
    // a 0.42–0.73 quiet band; the old fixed 1.4 default MISSED it, and so
    // would 2× the median. 1.75× median catches it without flagging the
    // quiet band.
    val history = Seq(0.54, 0.64, 0.56, 0.42, 0.73)
    val thr = Bench.probeAbsDefault(history)
    assert(thr < 1.08, f"threshold $thr%.3f must catch r18's 1.08 s warm probe")
    assert(thr >= 1.0, "sub-second jitter must never flag")
    val r18 = profile(n = 270, hot = 0, hotLoad = 0,
      ls = 8.0, le = 8.2, lm = 8.3, ratio = 0.95, warm = 1.08,
      secPerQuery = 726.9 / 270)
    assert(Bench.dirtyReason(r18, thr) === Some("probe_abs"))
    // no history -> the calibrated constant stands (this box's band)
    assert(Bench.probeAbsDefault(Seq.empty) === 1.4)
  }

  test("gate: history admits only near-min observations (threshold-drift guard)") {
    // observed failure mode: three gate-clean same-tree runs read
    // 0.93/1.01/1.37 as the box degraded — appending all three would
    // loosen the probe_abs bar by 40%. Min-anchored admission keeps the
    // calibration set honest: contention only adds time.
    assert(Bench.historyAdmits(Seq.empty, 0.93), "empty history seeds")
    assert(Bench.historyAdmits(Seq(0.93), 1.01), "near-min observations calibrate")
    assert(!Bench.historyAdmits(Seq(0.93, 1.01), 1.37),
      "a degraded-window observation must not loosen the threshold")
    // and the quiet historical band itself survives the guard
    val band = Seq(0.54, 0.64, 0.56, 0.42, 0.73)
    assert(band.tail.forall(v => Bench.historyAdmits(Seq(band.head), v) ||
      v > 1.25 * band.head),
      "guard semantics are purely min-anchored")
    assert(Bench.historyAdmits(Seq(0.54, 0.42), 0.52))
  }
}
