package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Scratch measurement harness (not part of the product surface): SELF-
  * GENERATED scale-stress evidence for the top query chains (r13 verdict
  * task 3). The 100 TB claims rest on plan SHAPES (bucketed candidate
  * generation, prefix scans, broadcast parameters); this makes them
  * MEASURED: replicate documents/embeddings at 1×/3×/10× with id offsets,
  * run each chain on each factor, and report wall time, max single-task
  * time, and shuffle bytes — the scaling curve PERF_r15 records. Near-
  * linear wall/shuffle growth with bounded max-task = the plan distributes;
  * super-linear cells name the next fix.
  *
  * Replication preserves the corpus CHARACTER instead of exploding it:
  * replica k prefixes every token with "r<k>" (no shared shingles across
  * replicas — otherwise every replica of a doc near-duplicates every other
  * and candidate pairs grow quadratically, measuring data-character change
  * rather than scale) and rotates embedding vectors by k positions (norm
  * structure kept, bucket layout shifted). doc/vec ids offset by
  * (max_id + 1) per replica.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ScaleStress [factors]
  *        [qPrefixes...]   — defaults: factors 1,3,10; q197 q215 q217 q219 q221
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_CPUS: the memory-pressure cell (r16 verdict task 5) runs
    // the shuffle-heavy chains at local[4] under the default 8g driver heap
    // (SPARK_DRIVER_MEM) — fewer, fatter partitions, the harness-bar shape
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the first arg is a factor list only when it LOOKS like one — a bare
    // query-prefix invocation (`runMain ... q217`) must select queries at
    // the default factors, not die in Integer.parseInt (ADVICE r15)
    val factorsGiven = args.headOption.exists(_.matches("[0-9]+(,[0-9]+)*"))
    val factors =
      if (factorsGiven) args.head.split(',').toSeq.map(_.toInt)
      else Seq(1, 3, 10)
    val prefixArgs = if (factorsGiven) args.drop(1).toSeq else args.toSeq
    val prefixes =
      if (prefixArgs.nonEmpty) prefixArgs
      else Seq("q197", "q215", "q217", "q219", "q221")

    // --- listeners: max single-task wall + total shuffle write + SPILL ---
    val maxTaskMs = new AtomicLong(0)
    val shuffleBytes = new AtomicLong(0)
    val memSpill = new AtomicLong(0)
    val diskSpill = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val ms = te.taskInfo.duration
        var cur = maxTaskMs.get()
        while (ms > cur && !maxTaskMs.compareAndSet(cur, ms)) cur = maxTaskMs.get()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        memSpill.addAndGet(sc.stageInfo.taskMetrics.memoryBytesSpilled)
        diskSpill.addAndGet(sc.stageInfo.taskMetrics.diskBytesSpilled)
      }
    })

    // Replication REGIMES (SPARK_GRAFT_SCALE_MODE, default "remap"):
    //  - "identical" (or SPARK_GRAFT_SCALE_IDENTICAL=1): replicas keep
    //    IDENTICAL text — dup-growth; every duplicate group's size scales
    //    with the corpus (exercises exact-group collapse).
    //  - "remap": replica k prefixes every token with r<k> — DOMAIN-growth;
    //    holds dup-group sizes constant but creates k disjoint vocabulary
    //    domains, the adversarial case for embedding-space candidates
    //    (each domain's token profile survives global-mean centering).
    //  - "remix": replica docs are fresh word-mixtures drawn from the SAME
    //    base vocabulary (deterministic hash per (k, doc, pos)) — same-
    //    DISTRIBUTION growth, the common crawl-growth model: corpus token
    //    profile preserved, no new domains, residuals decorrelated.
    val mode = sys.env.get("SPARK_GRAFT_SCALE_MODE").getOrElse(
      if (sys.env.get("SPARK_GRAFT_SCALE_IDENTICAL").contains("1")) "identical"
      else "remap")
    val identical = mode == "identical"
    def replicate(factor: Int, outDir: String): Unit = {
      val d = spark.read.parquet(s"$srcDir/documents.parquet")
      val e = spark.read.parquet(s"$srcDir/embeddings.parquet")
      val maxDoc = d.agg(max("doc_id")).head.getLong(0) + 1
      val maxVec = e.agg(max("vec_id")).head.getLong(0) + 1
      val dim = e.select(size(col("embedding"))).head.getInt(0)
      // the base vocabulary, for the remix regime (parameter-sized: the
      // fixture's synthetic vocab is tiny; a measurement tool may collect)
      lazy val vocab = d.select(explode(split(col("text"), " ")).as("w"))
        .distinct().orderBy("w").collect().map(_.getString(0))
      lazy val vocabLit = array(vocab.map(lit): _*)
      def remixText(k: Int) = concat_ws(" ", transform(split(col("text"), " "),
        (_, i) => element_at(vocabLit,
          (pmod(xxhash64(lit(k), col("doc_id"), i), lit(vocab.length.toLong)) + 1L)
            .cast("int"))))
      val docs = (0 until factor).map { k =>
        if (k == 0) d
        else if (identical) d.select(
          (col("doc_id") + lit(k * maxDoc)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        else if (mode == "remix") d.select(
          (col("doc_id") + lit(k * maxDoc)).as("doc_id"),
          remixText(k).as("text"), col("lang"), col("source"),
          length(remixText(k)).cast("long").as("n_chars"))
        else d.select(
          (col("doc_id") + lit(k * maxDoc)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            w => concat(lit(s"r$k"), w))).as("text"),
          col("lang"),
          // SPARK_GRAFT_SCALE_TAG_SOURCE=1: remap replicas tag their source
          // per replica — the partition column then IDENTIFIES the vocab
          // domain (domain = crawl segment = source, the q244/q251
          // production shape). Off by default so the historical remap
          // curves of the untagged chains stay comparable.
          (if (sys.env.get("SPARK_GRAFT_SCALE_TAG_SOURCE").contains("1"))
            concat(lit(s"r${k}_"), col("source")) else col("source")).as("source"),
          length(concat_ws(" ", transform(split(col("text"), " "),
            w => concat(lit(s"r$k"), w)))).cast("long").as("n_chars"))
      }.reduce(_ unionByName _)
      val embs = (0 until factor).map { k =>
        if (k == 0) e
        else e.select(
          (col("vec_id") + lit(k * maxVec)).as("vec_id"),
          concat(slice(col("embedding"), k + 1, dim - k),
            slice(col("embedding"), 1, k)).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
      docs.repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      embs.repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      // the probed chains read only documents/embeddings; remaining tables
      // are byte-copied so any Tables.* loader still resolves
      val names = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")
      names.foreach { n =>
        val from = java.nio.file.Paths.get(s"$srcDir/$n.parquet")
        val to = java.nio.file.Paths.get(s"$outDir/$n.parquet")
        java.nio.file.Files.createDirectories(to.getParent)
        java.nio.file.Files.copy(from, to,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    // SUFFIX-RANK chains (r15 verdict task 2): the registered q183/q185/
    // q189 queries run on an oracle-capped corpus (doc_id < 8, 128 chars —
    // the brute-force DuckDB twin is O(n²·L)), so prefixing them here
    // measures a constant-size fixture. These synthetic chains run the SAME
    // operators over the FULL replicated corpus (char-capped at 256/doc so
    // 10× at sf0.1 stays a ~12.8M-position build) — the curve that actually
    // tests the O(n log L) claim. Fresh builds each time (no ArtifactStore):
    // the build IS the thing measured.
    def srCorpus(s: SparkSession, dir: String): DataFrame =
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), substring(col("text"), 1, 256).as("t"))

    /** The drift-migration measurement body, shared by mig_drift (full
      * training) and mig_sampled (fixed-size sampled training): v1 index,
      * regime drift, budgeted recall before/after, migrate wall.
      */
    def migDriftCell(sampleN: Option[Int], artifact: String, tag: String)
    : (SparkSession, String) => DataFrame = (s, dir) => {
      import graft.operators.AnnIndex
      import graft.pipeline.{ArtifactStore, IndexErasure, IndexMigration}
      import org.apache.spark.sql.expressions.Window
      val e = s.read.parquet(s"$dir/embeddings.parquet")
        // synthetic 32-cluster corpus keyed by vec_id (the q40-family
        // shape): true neighborhoods = clusters, so recall is a clean
        // signal — the raw fixture embeddings' 10-NN straddle any 32-cell
        // Voronoi partition and would cap recall at ~0.2 for EVERY
        // quantizer, masking the restoration this chain measures
        val corpus = e.select(col("vec_id").as("c_id"))
          .withColumn("v", expr(
            "transform(sequence(0, 63), d -> CAST((c_id % 32) * 100000 " +
              "+ pmod(hash(c_id * 64 + d), 200) AS DOUBLE))"))
          .cache()
        val n = corpus.count()
        val nlist = 32
        val budget = (2L * n / nlist).max(10L).toInt
        val root = ArtifactStore.rootFor(dir, artifact)
        val cents1 = AnnIndex.kmeansCentroids(corpus, "v", "c_id", nlist, 1)
        IndexErasure.ensurePartitioned(s, root, "cell") {
          AnnIndex.pqEncodedCorpus(corpus, "c_id", "v", 16, 16, 64, nlist,
            None, Some(cents1))
            .select(col("c_id"), col("__cell").cast("long").as("cell"), col("__codes"))
        }
        // the drift: same neighborhoods, new absolute regime
        val drifted = corpus.select(col("c_id"),
          expr("transform(v, x -> floor(x / 100.0) + 7000.0)").as("v")).cache()
        // pure id predicate, not limit() (review r19): an unordered limit
        // recomputed after cache eviction could select DIFFERENT rows for
        // the truth and candidate consumers — phantom recall regressions
        val queries = drifted.filter(col("c_id") % 100 === 0 && col("c_id") < 2000)
          .select(col("c_id").as("q_id"), col("v").as("qv")).cache()
        // exact truth: top-10 by exact L2 over the drifted corpus
        val truth = queries.crossJoin(drifted.filter(col("c_id") % 100 =!= 0))
          .withColumn("d", aggregate(
            zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, z) => acc + z))
          .withColumn("rn", row_number().over(
            Window.partitionBy("q_id").orderBy(col("d"), col("c_id"))))
          .filter(col("rn") <= 10).select("q_id", "c_id").cache()
        val nTruth = truth.count()
        def budgetedRecall(cents: Array[Seq[Double]]): (Long, Double, Double) = {
          val asg = AnnIndex.ivfAssignTrained(drifted, "c_id", "v", cents.toSeq)
            .join(drifted, "c_id")
          val occupied = asg.select("cell").distinct().count()
          // candidate budget per query: first `budget` members of the
          // probed cell by id (the fixed provisioning a deployment sizes
          // its latency around)
          val members = asg.withColumn("mrn", row_number().over(
            Window.partitionBy("cell").orderBy("c_id")))
            .filter(col("mrn") <= budget)
          val qcells = AnnIndex.ivfAssignTrained(
            queries.select(col("q_id").as("c_id"), col("qv").as("v")),
            "c_id", "v", cents.toSeq)
            .select(col("c_id").as("q_id"), col("cell"))
          val cand = qcells.join(queries, "q_id").join(members, "cell")
            .filter(col("c_id") =!= col("q_id"))
          val hits = cand.select("q_id", "c_id").join(truth, Seq("q_id", "c_id"))
            .count()
          val meanCand = cand.count().toDouble / math.max(queries.count(), 1)
          (occupied, hits.toDouble / math.max(nTruth, 1), meanCand)
        }
        val (occB, recB, candB) = budgetedRecall(cents1)
        val tm = System.nanoTime()
        val mig = IndexMigration.migrate(s, root, drifted, "c_id", "v",
          nlist, 16, 16, 64, trainSampleN = sampleN)
        val wall = (System.nanoTime() - tm) / 1e9
        val (occA, recA, candA) = budgetedRecall(mig.cents)
        println(f"[$tag] n $n%d budget $budget%d | stale: cells $occB%d/32 " +
          f"recall@10 $recB%.3f cand/q $candB%.0f | migrate $wall%.2f s " +
          f"(v${mig.versionBefore}->v${mig.versionAfter}) | migrated: cells $occA%d/32 " +
          f"recall@10 $recA%.3f cand/q $candA%.0f")
        corpus.unpersist(); drifted.unpersist(); truth.unpersist(); queries.unpersist()
        IndexErasure.readPartitioned(s, root, "cell").groupBy("cell").count()
    }

    val extraChains: Map[String, (SparkSession, String) => DataFrame] = Map(
      "sr183_dup_prefix_full" -> ((s, dir) =>
        graft.operators.SuffixRank.longestDupPrefix(s, srCorpus(s, dir),
          "doc_id", "t", minLen = 12)),
      "sr185_repeat_lexicon_full" -> ((s, dir) =>
        graft.operators.SuffixRank.maximalRepeats(s, srCorpus(s, dir),
          "doc_id", "t", minLen = 12)),
      "sr189_contamination_full" -> ((s, dir) => {
        val d = srCorpus(s, dir)
        graft.operators.SuffixRank.crossCorpusOverlap(s,
          d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0),
          "doc_id", "t", minLen = 12)
      }),
      // the SEMANTIC axis alone (attribution probe for the q212 family's
      // distinct-growth curve): corpus-derived SRP width, exact-cosine
      // verify at the fusion threshold
      "semaxis_losers" -> ((s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
        graft.operators.Dedup.semanticAxisLosers(docs.cache(), "doc_id", "text",
          embDim = 64, nbits = 0, cosThreshold = 0.95)._2
      }),
      // the CELL-SCOPED multi-domain path (q243) — the remap-regime answer
      "semcell_flags" -> ((s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
        graft.operators.Dedup.semanticCellDedupFlags(docs, "doc_id", "text",
          embDim = 64, k = 16, cosThreshold = 0.95)
      }),
      // q258's HASH-STRATIFIED init variant — head-to-head vs semcell_flags
      // on the remap regime (does arrival-order-free seeding fix the
      // domain-collapse spill?)
      "semstrat_flags" -> ((s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
        graft.operators.Dedup.semanticCellDedupFlags(docs, "doc_id", "text",
          embDim = 64, k = 16, cosThreshold = 0.95, stratifiedInit = true)
      }),
      // the k-scaling knob on the same fixture (k = 32 ≥ 10 domains,
      // stratified init): does giving the trainer one cell per domain
      // (with headroom) clear the residual?
      "semstrat32_flags" -> ((s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
        graft.operators.Dedup.semanticCellDedupFlags(docs, "doc_id", "text",
          embDim = 64, k = 32, cosThreshold = 0.95, stratifiedInit = true)
      }),
      // the r17-verdict-item-5 knob: k from the DATA (2× the source
      // cardinality, q267's autoCellK) instead of hand-picked — with
      // SPARK_GRAFT_SCALE_TAG_SOURCE=1 the remap replicas' sources
      // identify crawl segments, so the estimator sees the domain growth
      // and k scales with it (the 0-spill-without-hand-picking check)
      "semautok_flags" -> ((s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "text", "source")
        val k = graft.operators.Dedup.autoCellK(docs, "source")
        println(s"[scale-autok] k = $k")
        graft.operators.Dedup.semanticCellDedupFlags(docs, "doc_id", "text",
          embDim = 64, k = k, cosThreshold = 0.95, stratifiedInit = true)
      }),
      // the FULL MULTI-DOMAIN VERDICT (q251) — the remap cell re-measured
      // through the whole five-axis stack (r16 verdict task 4's perf leg).
      // Meaningful with SPARK_GRAFT_SCALE_TAG_SOURCE=1 so the partition
      // column identifies the replica domain (domain = crawl segment =
      // source, the production shape)
      "mdverdict_flags" -> ((s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "text", "source")
        graft.operators.Dedup.crossModalVerdictPartitioned(docs, "doc_id", "text",
          "source", shingleSize = 3, numHashes = 32, bands = 16,
          jacThreshold = 0.5, containThreshold = 0.6, maxHamming = 8,
          embDim = 64, cosThreshold = 0.95)
      }),
      // ERASURE REPAIR at FIXED tombstone mass (r16 verdict task 1's perf
      // leg): the cell-partitioned encoded corpus grows with the factor,
      // the tombstone set stays the BASE corpus's — repair wall/rewritten
      // rows must stay ~flat while the build (printed separately) grows
      // linearly. The harness wall for this chain includes the build; read
      // the [scale-erz] lines for the attribution.
      // SINGLE-PASS batch purge at FIXED tombstone mass (r18: purgeBatches
      // is one tagged union-read + touched-only staged rewrites): an
      // 8-batch range-partitioned hits-like artifact grows with the
      // factor, the tombstone set stays the BASE corpus's — so at f=1 the
      // base ids scatter over all 8 batches (all touched) while at f=10
      // they concentrate in the low-range batch (1 touched of 8): purge
      // write cost follows TOUCHED mass while the read stays one pass.
      "erz_purge_fixed" -> ((s, dir) => {
        import graft.pipeline.{ArtifactStore, IndexErasure}
        val D = graft.functions.MathFunctions.longDiv _
        val d = s.read.parquet(s"$dir/documents.parquet").select("doc_id")
        val baseMax = s.read.parquet(s"$srcDir/documents.parquet")
          .agg(max("doc_id")).head.getLong(0)
        val maxId = d.agg(max("doc_id")).head.getLong(0)
        val span = (maxId + 8L) / 8L
        val root = ArtifactStore.rootFor(dir, "erz_purge_hits_b8_v2")
        val tb = System.nanoTime()
        (0L until 8L).foreach { b =>
          ArtifactStore.appendBatchIfAbsent(s, root, b)(
            d.filter(D(col("doc_id"), lit(span)) === b)
              .select(col("doc_id").as("test_id"),
                // train ids offset OUT of the doc-id domain so the fixed
                // tombstone set matches only the test side — the batch
                // range-locality under test stays visible
                (pmod(col("doc_id") * 31L, lit(997L)) + 10000000L).as("train_id")))
        }
        println(f"[scale-purge] build ${(System.nanoTime() - tb) / 1e9}%.2f s")
        val tomb = d.filter(col("doc_id") % 97 === 3 && col("doc_id") <= baseMax)
          .select("doc_id")
        val tp = System.nanoTime()
        val manifest = IndexErasure.purgeBatches(s, root,
          Seq("test_id", "train_id"), tomb, "doc_id")
        val m = manifest.agg(sum("n_before"), sum("n_removed"),
          sum(when(col("n_removed") > 0L, 1L).otherwise(0L))).head()
        println(f"[scale-purge] purge ${(System.nanoTime() - tp) / 1e9}%.2f s  " +
          f"rows ${m.getLong(0)}%d  removed ${m.getLong(1)}%d  " +
          f"touched ${m.getLong(2)}%d/8 batches")
        manifest
      }),
      // QUANTIZER MIGRATION under drift (r18 verdict task 1's perf leg):
      // build the v1 index on the corpus, then DRIFT the whole corpus into
      // a new value regime (every component divided by 100 and shifted —
      // cluster structure preserved, absolute scale moved, the "new
      // embedder / new content era" scenario). Under the STALE v1
      // quantizer the drifted corpus collapses into 1–2 giant cells:
      // recall@10 at the provisioned candidate budget (2·n/nlist per
      // probe) craters because the budget covers a sliver of the giant
      // cell. IndexMigration.migrate retrains + re-encodes in one pass;
      // the same budgeted probe on the migrated index restores recall.
      // Printed: cells occupied + budgeted recall before/after, migration
      // wall (∝ one corpus pass — compare across factors).
      "mig_drift" -> migDriftCell(None, "mig_drift_enc_v1", "scale-mig"),
      // SAMPLED-TRAINING migration (r19 verdict task 3's perf leg): the
      // same drift scenario with trainSampleN = 1024 — training runs on a
      // fixed-size hash sample at EVERY factor, so migrate wall tracks
      // only the one-pass re-encode (compare against mig_drift's
      // full-corpus Lloyd growth at the same factors), while the budgeted
      // recall restoration must hold.
      "mig_sampled" -> migDriftCell(Some(1024), "mig_sampled_enc_v1", "scale-mig-sampled"),
      "erz_repair_fixed" -> ((s, dir) => {
        import graft.operators.AnnIndex
        import graft.pipeline.{ArtifactStore, IndexErasure}
        val e = s.read.parquet(s"$dir/embeddings.parquet")
        val corpus = e.select(col("vec_id").as("c_id"), col("embedding"))
        val baseMax = s.read.parquet(s"$srcDir/embeddings.parquet")
          .agg(max("vec_id")).head.getLong(0)
        val root = ArtifactStore.rootFor(dir, "erz_scale_enc_part_v1")
        val tb = System.nanoTime()
        IndexErasure.ensurePartitioned(s, root, "cell") {
          AnnIndex.pqEncodedCorpus(corpus, "c_id", "embedding",
            m = 16, ksub = 16, dim = 64, nlist = 32)
            .select(col("c_id"), col("__cell").cast("long").as("cell"), col("__codes"))
        }
        println(f"[scale-erz] build ${(System.nanoTime() - tb) / 1e9}%.2f s")
        val tomb = corpus.filter(col("c_id") % 32 === 5 && col("c_id") % 3 === 0
          && col("c_id") <= baseMax)
        val touched = AnnIndex.ivfAssign(tomb, corpus, "c_id", "embedding", nlist = 32)
          .select("cell").distinct().collect().map(_.getLong(0)).toSeq
        val tr = System.nanoTime()
        val manifest = IndexErasure.repairErased(s, root, "cell", touched, "c_id", tomb)
        val rows = manifest.agg(sum("n_before"), sum("n_removed")).head()
        println(f"[scale-erz] repair ${(System.nanoTime() - tr) / 1e9}%.2f s  " +
          f"touched ${touched.size}%d cells  rewrote ${rows.getLong(0)}%d rows  " +
          f"removed ${rows.getLong(1)}%d")
        manifest
      }))

    val scratch = java.nio.file.Files.createTempDirectory("graft_scale").toString
    println(s"[scale] source $srcDir scratch $scratch factors ${factors.mkString(",")}")
    for (f <- factors) {
      val dir = s"$scratch/f$f"
      val t0 = System.nanoTime()
      replicate(f, dir)
      println(f"[scale] f=$f%-3d replicated in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      // exact id match ("q215" must not sweep in "q215b"): a prefix selects
      // only itself or its own underscore-delimited name
      for (p <- prefixes; (name, fn) <- graft.SparkEntry.queries ++ extraChains
           if name == p || name.startsWith(p + "_")) {
        spark.catalog.clearCache()
        maxTaskMs.set(0); shuffleBytes.set(0); memSpill.set(0); diskSpill.set(0)
        val tq = System.nanoTime()
        val res = try {
          fn(spark, dir).write.mode("overwrite").format("noop").save(); "ok"
        } catch { case e: Throwable => s"FAIL ${String.valueOf(e.getMessage).take(80)}" }
        org.apache.spark.GraftListenerDrain.waitUntilEmpty(spark.sparkContext, 30000)
        val dt = (System.nanoTime() - tq) / 1e9
        println(f"[scale] f=$f%-3d $name%-28s wall $dt%8.2f s  maxTask ${maxTaskMs.get}%6d ms  " +
          f"shuffle ${shuffleBytes.get / 1048576.0}%9.2f MiB  " +
          f"spill ${memSpill.get / 1048576.0}%8.1f/${diskSpill.get / 1048576.0}%8.1f MiB  $res")
      }
    }
    graft.streaming.StreamingDrift.deleteTempDir(java.nio.file.Paths.get(scratch))
    spark.stop()
  }
}
