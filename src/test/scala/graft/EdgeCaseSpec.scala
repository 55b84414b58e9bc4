package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input battery: EMPTY and single-row corpora through the major
  * operators. A library caller hits these constantly (a fresh tenant, a
  * filter that matched nothing, day-one incremental runs) — each must return
  * a sane empty/singleton result, not throw from a head() on nothing or a
  * division by zero.
  */
class EdgeCaseSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private lazy val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val oneDoc    = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
  private lazy val emptyVecs = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
  private lazy val oneVec    = Seq((1L, Array(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")

  test("dedup family: empty and singleton corpora") {
    import graft.operators.Dedup
    assert(Dedup.exactDedup(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.exactDedup(oneDoc, "doc_id", "text").count() === 1)
    assert(Dedup.minhashLshPairs(emptyDocs, "doc_id", "text", 3, 16, 8, 0.5).count() === 0)
    assert(Dedup.minhashLshPairs(oneDoc, "doc_id", "text", 3, 16, 8, 0.5).count() === 0)
    assert(Dedup.prefixJaccardJoin(emptyDocs, "doc_id", "text", 3, 0.4).count() === 0)
    assert(Dedup.prefixJaccardJoin(oneDoc, "doc_id", "text", 3, 0.4).count() === 0)
  }

  test("cleaning/curation: empty and singleton corpora") {
    import graft.operators.{Curation, Decontaminate}
    assert(Decontaminate.decontaminate(emptyDocs, "doc_id", "text", oneDoc, "text", 3).count() === 0)
    // empty BENCHMARK: nothing to collide with — corpus passes through
    assert(Decontaminate.decontaminate(oneDoc, "doc_id", "text", emptyDocs, "text", 3).count() === 1)
    val f = Curation.funnel(emptyDocs, "doc_id", "text", emptyDocs, "text", "doc_id")
      .collect()
    assert(f.length === 5 && f.forall(_.getLong(2) === 0L)) // all stages count 0
  }

  test("sampling and validation: empty input") {
    import graft.operators.{Sampling, Validate}
    assert(Sampling.stratifiedSample(emptyDocs, "doc_id", "text", Map("en" -> 80), 60).count() === 0)
    val v = Validate.validate("t", emptyDocs,
      rowChecks = Seq(Validate.NotNull("text"))).collect()
    assert(v.length === 1 && v.head.getLong(1) === 0L) // 0 violations of 0 rows
  }

  test("vector search: empty and singleton corpora") {
    import graft.operators.TopK
    assert(TopK.topK(emptyVecs, "embedding", "vec_id", Seq(1.0, 0.0, 0.0, 0.0), 5).count() === 0)
    assert(TopK.topK(oneVec, "embedding", "vec_id", Seq(1.0, 0.0, 0.0, 0.0), 5).count() === 1)
    val q = oneVec.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    assert(TopK.knnJoin(q, "q_id", "q_vec",
      emptyVecs.withColumnRenamed("vec_id", "c_id"), "c_id", "embedding", 3).count() === 0)
    // self is the only corpus row and excludeSelf=true -> no neighbors
    assert(TopK.knnJoin(q, "q_id", "q_vec",
      oneVec.withColumnRenamed("vec_id", "c_id"), "c_id", "embedding", 3).count() === 0)
  }

  test("sketches: empty input reports zero, not a crash") {
    import graft.operators.Sketches
    val r = Sketches.hllDistinct(emptyDocs.select(col("doc_id").as("k")), "k", p = 9).collect()
    assert(r.length === 1 && r.head.getAs[Long]("exact_distinct") === 0L)
    assert(Sketches.kmvDistinctNgrams(emptyDocs, "text", 3, 64).count() === 1)
  }

  test("layout/diff/incremental: empty input") {
    import graft.operators.{Diff, Incremental, Layout}
    val e = Seq.empty[(Long, Long, Long)].toDF("k", "x", "y")
    assert(Layout.zorderAudit(e, "k", "x", "y", blockRows = 4).count() === 0)
    assert(Diff.snapshotDiff(emptyDocs, emptyDocs, Seq("doc_id")).count() === 0)
    // insert-only diff from an empty previous snapshot
    assert(Diff.snapshotDiff(emptyDocs, oneDoc, Seq("doc_id"))
      .head.getString(1) === "insert")
    val st = Incremental.aggState(oneDoc.withColumn("n_chars", length(col("text"))),
      Seq("doc_id"), Seq("n_chars"))
    assert(Incremental.applyDelta(st,
      emptyDocs.withColumn("n_chars", length(col("text"))),
      Seq("doc_id"), Seq("n_chars")).count() === 1)
  }

  test("round-9 operators: empty and singleton inputs") {
    import graft.operators.{AnnIndex, Dedup, Diff, Graph, Validate}
    // substring dedup: empty corpus, one doc (nothing cross-doc), short doc
    assert(Dedup.exactSubstrSpans(emptyDocs, "doc_id", "text", 50).count() === 0)
    assert(Dedup.exactSubstrSpans(oneDoc, "doc_id", "text", 50).count() === 0)
    assert(Dedup.anchorSubstrSpans(emptyDocs, "doc_id", "text", 50, 8).count() === 0)
    assert(Dedup.anchorSubstrSpans(oneDoc, "doc_id", "text", 50, 8).count() === 0)
    // applyDiff with an empty changelog is the identity
    val applied = Diff.applyDiff(oneDoc,
      Diff.snapshotDiff(oneDoc, oneDoc, Seq("doc_id")), Seq("doc_id"))
    assert(applied.collect().map(_.toSeq).toSeq === oneDoc.collect().map(_.toSeq).toSeq)
    // drift gates: both sides empty -> no groups, no crash; empty history
    // snapshots -> every group counts 0 there
    val eg = Seq.empty[(Long, String)].toDF("g", "x")
    assert(Validate.driftGate(eg, eg, "g").count() === 0)
    assert(Validate.driftHistoryGate(
      Seq(eg, eg, eg, oneDoc.select(col("doc_id").as("g"), col("text").as("x"))), "g")
      .count() === 1)
    // weighted PageRank on an empty edge list
    val ee = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "w")
    assert(Graph.pageRankWeighted(ee, "src", "dst", "w", iters = 1).count() === 0)
    // IVF assignment of an empty delta against a standing index
    assert(AnnIndex.ivfAssign(emptyVecs, oneVec, "vec_id", "embedding", 4).count() === 0)
  }

  test("round-10 operators: empty and singleton inputs") {
    import graft.multimodal.Multimodal
    import graft.operators.{Dedup, Sketches}
    // fingerprint substring spans: empty corpus, one doc, doc shorter than
    // the window
    assert(Dedup.fpSubstrSpans(emptyDocs, "doc_id", "text", 50).count() === 0)
    assert(Dedup.fpSubstrSpans(oneDoc, "doc_id", "text", 50).count() === 0)
    assert(Dedup.fpSubstrSpans(
      Seq((1L, "ab"), (2L, "ab")).toDF("doc_id", "text"), "doc_id", "text", 50).count() === 0)
    // spans from an EMPTY standing index
    assert(Dedup.spansFromAnchorIndex(
      Seq.empty[(Long, Int, String)].toDF("doc_id", "pos", "win"), "doc_id", 50).count() === 0)
    // media family: empty corpus, empty blob, one blob
    val emptyMedia = Seq.empty[(Long, String)].toDF("doc_id", "m")
    val oneMedia   = Seq((1L, "payload " * 40)).toDF("doc_id", "m")
    val zeroBlob   = Seq((1L, "")).toDF("doc_id", "m")
    assert(Multimodal.mediaDupPairs(emptyMedia, "doc_id", "m", 3).count() === 0)
    assert(Multimodal.mediaDupPairs(oneMedia, "doc_id", "m", 3).count() === 0)
    assert(Multimodal.frameAlignSpans(spark, emptyMedia, 64, 1).count() === 0)
    assert(Multimodal.frameAlignSpans(spark, oneMedia, 64, 1).count() === 0)
    assert(Multimodal.frameHashes(spark, zeroBlob, 64).count() === 0) // no frames, no crash
    assert(Multimodal.frameAlignSpansPerceptual(spark, emptyMedia, 64, 1, 3).count() === 0)
    assert(Multimodal.frameAlignSpansPerceptual(spark, oneMedia, 64, 1, 3).count() === 0)
    // quantile sketch: empty input yields an empty profile (no division by
    // zero on total = 0); a single value pins every quantile to its bin
    val noVals = Seq.empty[Double].toDF("v")
    assert(Sketches.histogramQuantiles(noVals, "v", 0.0, 100.0, 10, Seq(0.5)).count() === 0)
    val oneVal = Seq(42.0).toDF("v")
    val est = Sketches.histogramQuantiles(oneVal, "v", 0.0, 100.0, 10, Seq(0.5, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(est.keySet === Set(0.5, 0.99))
    est.values.foreach(e => assert(e >= 40.0 && e <= 50.0)) // inside 42's bin
    // residual PQ over a singleton corpus (cells = the one vector)
    import graft.operators.AnnIndex
    val q1 = Seq((9L, Array(1.0, 0.0, 0.0, 0.0))).toDF("q_id", "qv")
    val res = AnnIndex.pqResidualTopK(q1, "q_id", "qv", oneVec, "vec_id", "embedding",
      k = 1, m = 2, ksub = 1, dim = 4, nlist = 1, nprobe = 1, excludeSelf = false)
    assert(res.count() === 1)
  }

  test("round-11 operators: degenerate inputs for the KS/contamination family") {
    import graft.operators.{Scan, SuffixRank, Validate}
    // KS gate: empty-vs-empty must not crash; identical sides read 0; a
    // side that is entirely NULL/NaN contributes nothing
    val noVals = Seq.empty[Double].toDF("v")
    val vals = Seq(1.0, 2.0, 3.0).toDF("v")
    assert(Validate.ksGate(noVals, noVals, "v", threshold = 0.1).count() === 1)
    val withJunk = Seq(Some(1.0), Some(2.0), Some(3.0), None, Some(Double.NaN))
      .toDF("v")
    val r = Validate.ksGate(vals, withJunk, "v", threshold = 0.1).head
    assert(r.getDouble(0) === 0.0 && r.getLong(2) === 3L) // junk rows dropped
    // grouped KS: a group present on one side only is excluded, not a NaN
    val gPrev = Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)).toDF("g", "v")
    val gNext = Seq((1L, 1.0), (1L, 2.0)).toDF("g", "v")
    val gr = Validate.groupedKsGate(gPrev, gNext, "g", "v", 0.0, 10.0, 4, 0.1)
      .collect()
    assert(gr.map(_.getLong(0)).toSet === Set(1L))
    assert(gr.head.getDouble(1) === 0.0)
    // prefix scans: empty input
    assert(Scan.runningLast(Seq.empty[(Long, Option[Long])].toDF("k", "p"),
      Seq("k"), "p", parts = 3).count() === 0)
    // cross-corpus overlap: disjoint alphabets -> no spans; empty test side
    val train = Seq((1L, "aaaa bbbb")).toDF("doc_id", "t")
    val test = Seq((1L, "cccc dddd")).toDF("doc_id", "t")
    assert(SuffixRank.crossCorpusOverlap(spark, train, test, "doc_id", "t", 2).count() === 0)
    assert(SuffixRank.contaminationMask(spark, train, test, "doc_id", "t", 2).count() === 0)
    // rate report still covers the clean doc with zero mass
    val rate = SuffixRank.contaminationRate(spark, train, test, "doc_id", "t", 2, 0.5).head
    assert(rate.getLong(2) === 0L && rate.getLong(5) === 0L) // masked_chars, drop_doc
    // cross-corpus near-dup: empty sides, and a verbatim copy across sides
    // is found while an unrelated doc is not
    import graft.operators.Dedup
    val trDocs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val teDocs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "completely different words entirely here now ok yes")).toDF("doc_id", "text")
    val cross = Dedup.crossCorpusNearDupPairs(trDocs, teDocs, "doc_id", "text", 3, 32, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cross.toSeq === Seq((1L, 1L)))
    assert(Dedup.crossCorpusNearDupPairs(emptyDocs, teDocs, "doc_id", "text", 3, 32, 16, 0.5)
      .count() === 0)
    assert(Dedup.crossCorpusNearDupPairs(trDocs, emptyDocs, "doc_id", "text", 3, 32, 16, 0.5)
      .count() === 0)
  }

  test("ksGate with an empty side reports null ks and null verdict, not drift") {
    // the r11 advice trap: tp or tn = 0 makes cp/tp NaN, and NaN > threshold
    // is TRUE in Spark SQL — an empty snapshot must not silently flag drift
    import graft.operators.Validate
    val prev = Seq(1.0, 2.0, 3.0).toDF("v")
    val empty = Seq.empty[Double].toDF("v")
    val r = Validate.ksGate(prev, empty, "v", threshold = 0.05, scanParts = 2)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("ks")), "ks must be null on an empty side")
    assert(r.isNullAt(r.fieldIndex("is_drift")), "verdict must be null, not drift")
    val ok = Validate.ksGate(prev, prev, "v", threshold = 0.05, scanParts = 2)
      .collect().head
    assert(ok.getDouble(ok.fieldIndex("ks")) === 0.0)
    assert(ok.getLong(ok.fieldIndex("is_drift")) === 0L)
  }

  test("grouped exact KS excludes empty-side groups; identical sides read zero") {
    import graft.operators.Validate
    val prev = Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)).toDF("g", "v")
    val next = Seq((1L, 1.0), (1L, 2.0)).toDF("g", "v") // group 2 vanished
    val out = Validate.groupedKsGateExact(prev, next, "g", "v", threshold = 0.05)
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L),
      "a group with an empty side is the count gate's job, not KS's")
    val r1 = out.head
    assert(r1.getDouble(r1.fieldIndex("ks")) === 0.0)
    assert(r1.getLong(r1.fieldIndex("is_drift")) === 0L)
  }

  test("temperatureMix edge shapes: single source takes the whole budget; " +
    "zero-size sources are excluded") {
    import graft.operators.Sampling
    val one = Sampling.temperatureMix(Seq(("web", 1000L)).toDF("source", "n"),
      "source", "n", alpha = 0.5, budget = 77L).collect()
    assert(one.length === 1 && one.head.getLong(2) === 77L)
    val withZero = Sampling.temperatureMix(
      Seq(("web", 1000L), ("empty", 0L)).toDF("source", "n"),
      "source", "n", alpha = 0.5, budget = 10L).collect()
    assert(withZero.map(_.getString(0)).toSeq === Seq("web"))
    assert(withZero.head.getLong(2) === 10L)
  }

  test("semDeDup on an all-identical cell keeps exactly one member") {
    import graft.operators.Dedup
    val v = Seq.fill(8)(1.0)
    val df = (0L until 5L).map(i => (i, v)).toDF("vec_id", "vec")
    val cents = Seq(Seq.fill(8)(1.0), Seq.fill(8)(-1.0))
    val out = Dedup.semDeDup(df, "vec_id", "vec", cents, tau = 0.9999)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.size === 5)
    assert(out.values.count(_ == 0L) === 1, "exactly one survivor per ε-ball")
    // identical vectors tie on cent_sim, so the lowest id survives
    assert(out(0L) === 0L && (1L until 5L).forall(out(_) === 1L))
  }

  test("sq8Candidates: a constant dimension quantizes to its min without NaN; " +
    "self candidate ranks first") {
    import graft.operators.AnnIndex
    // dim 2 is CONSTANT across the corpus (mx - mn = 0 -> code 0, recon mn)
    val corpus = Seq(
      (0L, Seq(0.0, 10.0, 7.0, 100.0)),
      (1L, Seq(50.0, 20.0, 7.0, 0.0)),
      (2L, Seq(100.0, 0.0, 7.0, 50.0))).toDF("c_id", "v")
    val params = AnnIndex.sq8Train(corpus, "v").orderBy("pos")
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(params(2) === ((7.0, 7.0)), "constant dim trains mn = mx")
    val queries = corpus.filter($"c_id" === 0L)
      .select($"c_id".as("q_id"), $"v".as("q_vec"))
    val cand = AnnIndex.sq8Candidates(queries, "q_id", "q_vec", corpus, "c_id", "v",
        nlist = 2, nprobe = 2, params = params, excludeSelf = false)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(cand.length === 3, "nprobe = nlist must reach the whole corpus")
    assert(cand.forall { case (_, d) => !d.isNaN && d >= 0.0 },
      "constant dim must not divide by zero")
    // reconstruction error is bounded by the quantization step, so the
    // query's own row scores strictly below any distinct vector
    assert(cand.minBy(_._2)._1 === 0L)
  }
}
