package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch plan-audit tool (not product surface): prints physical-plan
  * health counters — shuffle count, join strategies, cartesian products,
  * single-partition windows — for the round's new query chains. The
  * counters are the review checklist a 100 TB plan must pass: no
  * cartesian against a non-parameter relation, no corpus-sized
  * single-partition window, broadcasts on parameter-sized sides only.
  * Artifact-backed queries are audited through their BUILD chain (the
  * stored read plan is just a parquet scan).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    def docs = graft.Tables.documents(spark, dir)
    val chains: Seq[(String, () => DataFrame)] = Seq(
      // round-16 chains kept for drift checks
      "q243_build (semanticCellDedupFlags)" -> (() =>
        graft.operators.Dedup.semanticCellDedupFlags(docs, "doc_id", "text",
          embDim = 64, k = 16, cosThreshold = 0.95)),
      "q244_build (semanticPartitionDedupFlags)" -> (() =>
        graft.operators.Dedup.semanticPartitionDedupFlags(docs, "doc_id", "text",
          "source", embDim = 64, cosThreshold = 0.95)),
      // round-17 chains
      "q245b_sampled_recall" -> (() =>
        graft.SparkEntry.queries("q245b_semantic_recall_sampled")(spark, dir)),
      "q248_build (pqEncodedCorpus, trained)" -> (() => {
        val e = graft.Tables.embeddings(spark, dir)
          .select(org.apache.spark.sql.functions.col("vec_id").as("c_id"),
            org.apache.spark.sql.functions.col("embedding"))
        graft.operators.AnnIndex.pqEncodedCorpus(e, "c_id", "embedding",
          m = 16, ksub = 16, dim = 64, nlist = 32)
      }),
      "q249_manifest" -> (() =>
        graft.SparkEntry.queries("q249_erasure_repair_manifest")(spark, dir)),
      "q251_build (crossModalVerdictPartitioned)" -> (() =>
        graft.operators.Dedup.crossModalVerdictPartitioned(docs, "doc_id", "text",
          "source", shingleSize = 3, numHashes = 32, bands = 16,
          jacThreshold = 0.5, containThreshold = 0.6, maxHamming = 8,
          embDim = 64, cosThreshold = 0.95)),
      // round-18 chains
      "q262_sync_delete" -> (() =>
        graft.SparkEntry.queries("q262_sync_delete_propagation")(spark, dir)),
      "q264_purge_manifest" -> (() =>
        graft.SparkEntry.queries("q264_hits_purge_manifest")(spark, dir)),
      "q267_build (auto-k semanticCellDedupFlags)" -> (() =>
        graft.operators.Dedup.semanticCellDedupFlags(docs, "doc_id", "text",
          embDim = 64, k = graft.operators.Dedup.autoCellK(docs, "source"),
          cosThreshold = 0.95, stratifiedInit = true)))
    for ((name, fn) <- chains) {
      println(s"===== $name =====")
      try {
        // planning-cost probe (r17 verdict task 8): literal-bake regressions
        // (the CentroidArgmin pathology class) surface as expression-node
        // blowups and planning-wall growth long before they hurt execution —
        // these two columns make the check mechanical every round.
        val t0 = System.nanoTime()
        val df = fn()
        val tBuilt = System.nanoTime()
        val plan = df.queryExecution.executedPlan
        val tPlanned = System.nanoTime()
        val lines = plan.toString.split('\n')
        // count on the ANALYZED plan: under AQE the executed plan is an
        // AdaptiveSparkPlan shell whose children materialize lazily, so its
        // expression list reads 0 and the literal-bake tripwire goes blind
        val exprNodes = df.queryExecution.analyzed.collect { case p => p }
          .flatMap(_.expressions).map(e => e.collect { case x => x }.size).sum
        println(s"  Exchanges (shuffles):    ${lines.count(_.contains("Exchange"))}")
        println(s"  BroadcastHashJoin:       ${lines.count(_.contains("BroadcastHashJoin"))}")
        println(s"  SortMergeJoin:           ${lines.count(_.contains("SortMergeJoin"))}")
        println(s"  CartesianProduct:        ${lines.count(_.contains("CartesianProduct"))}")
        println(s"  single-partition window: ${lines.count(l => l.contains("Window") && l.contains("SinglePartition"))}")
        println(s"  plan expr nodes:         $exprNodes")
        println(f"  build ms (driver prep):  ${(tBuilt - t0) / 1e6}%.0f")
        println(f"  planning ms:             ${(tPlanned - tBuilt) / 1e6}%.0f")
      } catch { case e: Throwable => println(s"  SKIP: ${String.valueOf(e.getMessage).take(100)}") }
    }

    // ---- WRITE-LEG audits (r18 verdict task 8). The staged-write jobs of
    // the erasure/migration family run INSIDE their methods (repairErased's
    // dynamic-partition overwrite, purgeBatches' partitioned staged write,
    // migrate's full re-encode), so the query-chain audit above never sees
    // their shape. Audit them by EXECUTING each on a scratch copy under a
    // metrics listener: jobs/stages/tasks/shuffle-bytes plus the
    // rewritten-vs-standing directory ratio — the mechanical tripwire for
    // a regression that loses touched-only rewrites (ratio jumps to 1) or
    // grows a shuffle into the write path (bytes jump).
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
    import org.apache.spark.sql.functions._
    import java.util.concurrent.atomic.AtomicLong
    def latestMtime(d: java.io.File): Long =
      Option(d.listFiles()).getOrElse(Array.empty)
        .map(f => if (f.isDirectory) latestMtime(f) else f.lastModified())
        .foldLeft(d.lastModified())(math.max)
    def auditWrite(name: String, root: String)(mutate: => Any): Unit = {
      println(s"===== $name =====")
      try {
        val rootDir = new java.io.File(root)
        def liveDirs() = Option(rootDir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && !f.getName.startsWith("."))
        val before = liveDirs().map(d => d.getName -> latestMtime(d)).toMap
        val jobs = new AtomicLong; val stages = new AtomicLong
        val tasks = new AtomicLong; val shuffleB = new AtomicLong
        val listener = new SparkListener {
          override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
          override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
            stages.incrementAndGet()
            tasks.addAndGet(sc.stageInfo.numTasks)
            shuffleB.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          }
        }
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        try mutate
        finally {
          // remove + drain even when the mutate body throws (review r19):
          // a leaked listener keeps counting every later audit's events
          org.apache.spark.GraftListenerDrain.waitUntilEmpty(spark.sparkContext, 30000)
          spark.sparkContext.removeSparkListener(listener)
        }
        val after = liveDirs().map(d => d.getName -> latestMtime(d)).toMap
        val rewritten = after.count { case (n, m) => before.get(n).forall(_ != m) }
        val dropped = before.keySet.diff(after.keySet).size
        println(f"  wall ms:                 ${(System.nanoTime() - t0) / 1e6}%.0f")
        println(s"  spark jobs/stages/tasks: ${jobs.get}/${stages.get}/${tasks.get}")
        println(f"  shuffle write:           ${shuffleB.get / 1024.0}%.1f KiB")
        println(s"  dirs rewritten/standing: $rewritten/${before.size} (+${after.size - before.size + dropped} new, -$dropped dropped)")
      } catch { case e: Throwable => println(s"  SKIP: ${String.valueOf(e.getMessage).take(120)}") }
    }
    val scratchBase = java.nio.file.Files.createTempDirectory("graft_waudit").toString
    val embs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("c_id"), col("embedding"))
    // q248 write leg: cell-partitioned repair — touched-only dynamic overwrite
    locally {
      val root = s"$scratchBase/enc"
      graft.pipeline.IndexErasure.ensurePartitioned(spark, root, "cell") {
        graft.operators.AnnIndex.pqEncodedCorpus(embs, "c_id", "embedding",
          m = 16, ksub = 16, dim = 64, nlist = 32)
          .select(col("c_id"), col("__cell").cast("long").as("cell"), col("__codes"))
      }
      val tomb = embs.filter(col("c_id") % 32 === 5 && col("c_id") % 3 === 0)
      val touched = graft.operators.AnnIndex.ivfAssign(tomb, embs, "c_id", "embedding", 32)
        .select("cell").distinct().collect().map(_.getLong(0)).toSeq
      auditWrite("q248_write (repairErased, dynamic-partition overwrite)", root) {
        graft.pipeline.IndexErasure.repairErased(spark, root, "cell", touched,
          "c_id", tomb)
      }
    }
    // q264 write leg: batch purge — touched-only staged batch rewrites
    locally {
      val root = s"$scratchBase/hits"
      import spark.implicits._
      val d = graft.Tables.documents(spark, dir).select(col("doc_id"))
      (0L until 8L).foreach { b =>
        graft.pipeline.ArtifactStore.appendBatchIfAbsent(spark, root, b)(
          d.filter(col("doc_id") % 8 === b)
            .select(col("doc_id").as("test_id"),
              (col("doc_id") * 31 % 997 + 10000000L).as("train_id")))
      }
      auditWrite("q264_write (purgeBatches, staged batch rewrite)", root) {
        graft.pipeline.IndexErasure.purgeBatches(spark, root,
          Seq("test_id", "train_id"), Seq(3L, 11L, 19L).toDF("doc_id"), "doc_id")
      }
    }
    // q273 write leg: migration — one full re-encode pass + swap (expected
    // to rewrite EVERY cell dir: ratio 1 is correct here; the counters to
    // watch are stages/shuffle staying flat per corpus pass)
    locally {
      val root = s"$scratchBase/mig"
      graft.pipeline.IndexErasure.ensurePartitioned(spark, root, "cell") {
        graft.operators.AnnIndex.pqEncodedCorpus(embs, "c_id", "embedding",
          m = 16, ksub = 16, dim = 64, nlist = 32)
          .select(col("c_id"), col("__cell").cast("long").as("cell"), col("__codes"))
      }
      auditWrite("q273_write (IndexMigration.migrate, full re-encode + swap)", root) {
        graft.pipeline.IndexMigration.migrate(spark, root,
          embs.filter(col("c_id") % 32 =!= 7), "c_id", "embedding",
          nlist = 32, m = 16, ksub = 16, dim = 64)
      }
    }
    // q285 write leg: SAMPLED-training migration — same one-pass re-encode
    // (ratio 1 is the contract), but the training jobs aggregate a fixed
    // 512-row sample instead of the corpus: compare jobs/shuffle against
    // q273_write above — the delta is the training term sampling removes
    locally {
      val root = s"$scratchBase/migs"
      graft.pipeline.IndexErasure.ensurePartitioned(spark, root, "cell") {
        graft.operators.AnnIndex.pqEncodedCorpus(embs, "c_id", "embedding",
          m = 16, ksub = 16, dim = 64, nlist = 32)
          .select(col("c_id"), col("__cell").cast("long").as("cell"), col("__codes"))
      }
      auditWrite("q285_write (migrate trainSampleN=512, sampled train + full encode)", root) {
        graft.pipeline.IndexMigration.migrate(spark, root,
          embs.filter(col("c_id") % 32 =!= 7), "c_id", "embedding",
          nlist = 32, m = 16, ksub = 16, dim = 64, trainSampleN = Some(512))
      }
    }
    // q284 write leg: SQ8 migration — min/max refit (one posexplode
    // aggregate) + byte-code re-encode; the cheapest train step in the
    // family, visible as fewer jobs than the PQ migrations above
    locally {
      val root = s"$scratchBase/migq"
      val params0 = graft.operators.AnnIndex.sq8Train(embs, "embedding").collect()
        .sortBy(_.getLong(0)).map(r => (r.getDouble(1), r.getDouble(2)))
      graft.pipeline.IndexErasure.ensurePartitioned(spark, root, "cell") {
        graft.operators.AnnIndex.sq8EncodedCorpus(embs, "c_id", "embedding",
          nlist = 32, params0)
          .select(col("c_id"), col("__cell").cast("long").as("cell"), col("__codes"))
      }
      auditWrite("q284_write (IndexMigration.migrateSq8, refit + re-encode + swap)", root) {
        graft.pipeline.IndexMigration.migrateSq8(spark, root,
          embs.filter(col("c_id") % 32 =!= 7), "c_id", "embedding", nlist = 32)
      }
    }
    // q287 write legs: keepOld migration + rollback — the rollback's cost
    // statement is the point: two renames plus ONE restored-index scan to
    // name the tombstone-replay partitions, then a touched-only repair
    locally {
      val root = s"$scratchBase/migr"
      graft.pipeline.IndexErasure.ensurePartitioned(spark, root, "cell") {
        graft.operators.AnnIndex.pqEncodedCorpus(embs, "c_id", "embedding",
          m = 16, ksub = 16, dim = 64, nlist = 32)
          .select(col("c_id"), col("__cell").cast("long").as("cell"), col("__codes"))
      }
      // an erasure BEFORE the migration seeds the tombstone log the
      // rollback must replay
      val tomb = embs.filter(col("c_id") % 32 === 5 && col("c_id") % 9 === 0)
      val touched = graft.operators.AnnIndex.ivfAssign(tomb, embs, "c_id", "embedding", 32)
        .select("cell").distinct().collect().map(_.getLong(0)).toSeq
      graft.pipeline.IndexErasure.repairErased(spark, root, "cell", touched,
        "c_id", tomb)
      graft.pipeline.IndexMigration.migrate(spark, root,
        embs.filter(col("c_id") % 32 =!= 7), "c_id", "embedding",
        nlist = 32, m = 16, ksub = 16, dim = 64, keepOld = true)
      auditWrite("q287_write (IndexMigration.rollback, swap + log replay)", root) {
        graft.pipeline.IndexMigration.rollback(spark, root, "cell", "c_id")
      }
    }
    spark.stop()
  }
}
