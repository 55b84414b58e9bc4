package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ERASURE PROPAGATION through deployed index artifacts (round-16 verdict
  * task 1): the GDPR story covered export shards (q234) and packed
  * sequences (q241), but a deletion left the DEPLOYED ANN index artifacts —
  * encoded corpora, IVF assignments — still holding the erased vectors'
  * rows. This module is the repair path: the index artifact is laid out
  * PARTITIONED BY its coarse key (the IVF cell — one directory per cell,
  * exactly how a cluster deployment shards an inverted file), a tombstone
  * set names the cells requiring repair via a map-side assignment of the
  * tombstoned vectors (O(tombstones · nlist), never an index scan), and the
  * repair rewrites ONLY the touched cell directories in one distributed
  * dynamic-partition-overwrite job. Untouched cells' files are never read,
  * never rewritten — repair cost is proportional to the tombstone-touched
  * cell mass, not the corpus.
  *
  * Semantics contract (the public Faiss `remove_ids` practice): erasure
  * removes the erased vectors' ROWS — codes, cell assignments — from the
  * index; the trained quantizer PARAMETERS (coarse centroids, PQ
  * codebooks) are corpus-level aggregates and stand. "Repaired ≡ rebuilt"
  * therefore means: the repaired index equals a from-scratch re-encode of
  * the surviving corpus under the STANDING quantizer — which is exactly
  * what the q248 oracle computes in DuckDB (two-sided: Spark repairs
  * incrementally, the oracle rebuilds), so the equivalence is a hash, not
  * a claim.
  *
  * Layout notes: staging/retired directories are SIBLINGS of the live
  * root (`<root>.tmp-*` / `<root>.old` / `<root>.tombstones`), so
  * partition discovery under the root never sees them; batch-layout
  * staging (`bN.tmp-*` inside the root) is ignored because readers
  * full-match the `b\\d+` batch pattern; and Spark's own job staging is
  * dot-prefixed (`.spark-staging-*`), which Hadoop listing skips. A cell
  * whose every row is tombstoned can't ride dynamic overwrite (no rows →
  * no partition written) — its directory is deleted explicitly. All
  * mutation is `synchronized` against this object AND serialized
  * cross-process by the root's [[FsLock]] lock file, same contract as
  * [[ArtifactStore]].
  *
  * ERASE WINS under replay: every repair appends its tombstoned ids to a
  * persisted log (`<root>.tombstones`, single `__erased_id` column),
  * written BEFORE the index rewrite, and [[appendRows]] anti-joins its
  * delta against the log — so an at-least-once append pipeline that
  * replays an old append AFTER an erasure cannot resurrect erased rows,
  * regardless of interleaving. The batch layout gets the same contract:
  * [[purgeBatches]] logs its tombstones the same way and
  * [[appendBatchPurged]] filters every late-arriving batch against the
  * log on all reference columns. Re-adding an erased id is an explicit
  * administrative act — [[clearTombstones]] — never an accident of replay.
  */
object IndexErasure {

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def isLive(f: FileSystem, root: String): Boolean =
    f.exists(new Path(root, "_SUCCESS"))

  /** FsLock (cross-process) OUTSIDE, JVM monitor inside — the global lock
    * order (FsLock → monitor) that makes the nested
    * [[appendBatchPurged]] → [[ArtifactStore.appendBatchIfAbsent]] path
    * deadlock-free: a thread spinning on the file lock never holds a
    * monitor the lock holder needs, and a thread that already holds the
    * root's file lock re-enters it (per-thread re-entrancy in [[FsLock]]).
    */
  private def locked[T](spark: SparkSession, root: String)(body: => T): T =
    FsLock.withLock(fs(spark), root)(synchronized(body))

  /** Sibling tombstone log for the index at `root` — the persisted erased
    * set consulted by [[appendRows]]. A sibling (not a child) so partition
    * discovery under the root can never pick it up.
    */
  private def tombLog(root: String): String = root + ".tombstones"

  /** Append `tombstones`' ids to the persisted log. Called by every repair
    * BEFORE the index rewrite: a crash after the log write but before the
    * rewrite leaves a replayable (idempotent) repair whose erase already
    * binds future appends — the safe order. Duplicate ids across calls are
    * fine; [[erasedIds]] dedups on read. The log self-compacts past a
    * file-count threshold so a long deletion history never makes the
    * appendRows anti-join read expensive.
    */
  private def logTombstones(root: String, idCol: String,
                            tombstones: DataFrame): Unit = {
    tombstones.select(col(idCol).as("__erased_id")).distinct()
      .coalesce(1).write.mode("append").parquet(tombLog(root))
    if (logParts(fs(tombstones.sparkSession), root).length > TombLogCompactFiles)
      compactTombstoneLog(tombstones.sparkSession, root)
  }

  private val TombLogCompactFiles = 32

  private def logParts(f: FileSystem, root: String) = {
    val dir = new Path(tombLog(root))
    if (!f.exists(dir)) Array.empty[Path]
    else f.listStatus(dir).filter(s => s.isFile &&
      s.getPath.getName.endsWith(".parquet")).map(_.getPath)
  }

  /** Compact the tombstone log to one distinct file. CRASH-SAFE BY
    * SUPERSET, never by swap: the compacted file is APPENDED into the live
    * log dir first (from that moment any read covers everything), and only
    * then are the superseded files dropped — there is no instant at which
    * the log under-covers the erased set, which a retire-then-promote swap
    * cannot promise (its no-live-dir window would make [[erasedIds]] read
    * None and let a concurrent append resurrect erased rows). A crash
    * mid-delete leaves duplicates, which the distinct-on-read absorbs.
    * Idempotent; also runs automatically past [[TombLogCompactFiles]].
    */
  def compactTombstoneLog(spark: SparkSession, root: String): Unit = locked(spark, root) {
    val f = fs(spark)
    val old = logParts(f, root)
    if (old.length <= 1) return
    // read the EXPLICIT file list and write the compacted output to a
    // SIBLING temp dir, then rename it into the log dir (ADVICE r18: an
    // append into the directory being read within one action leaned on
    // Spark's eager listing — a re-resolved scan could pick up the
    // in-flight output or double-count)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(tombLog(root) + ".compact-" + tag)
    spark.read.parquet(old.map(_.toString): _*).select(col("__erased_id")).distinct()
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    // move the compacted part file(s) into the live log dir — from that
    // moment any read covers the full erased set — and only then drop the
    // superseded files (superset at every instant; a crash in between
    // leaves duplicates, absorbed by distinct-on-read)
    f.listStatus(tmp).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach { s =>
        val dst = new Path(tombLog(root), s"compact-$tag-${s.getPath.getName}")
        require(f.rename(s.getPath, dst), s"tombstone-log compaction rename failed: $dst")
      }
    f.delete(tmp, true)
    old.foreach(p => f.delete(p, false))
  }

  /** The persisted erased-id set for `root` (one `__erased_id` column),
    * or None when no erasure has ever run against it.
    */
  def erasedIds(spark: SparkSession, root: String): Option[DataFrame] = {
    // gate on the PART FILES, not directory existence, and read the listed
    // files explicitly (ADVICE r18: a crash after mkdir but before any
    // parquet commit leaves an empty dir, and a directory read then throws
    // 'Unable to infer schema' — wedging every subsequent append until
    // manual cleanup)
    val parts = logParts(fs(spark), root)
    if (parts.isEmpty) None
    else Some(spark.read.parquet(parts.map(_.toString): _*)
      .select(col("__erased_id")).distinct())
  }

  /** TOMBSTONE RE-ADMISSION (r18 verdict item 5): remove `ids` from the
    * persisted tombstone log so they may be indexed again. The header
    * contract says re-adding an erased id is "an explicit administrative
    * act" — this is that act as an API; without it an operator would
    * hand-edit parquet. Returns the number of ids actually cleared.
    *
    * Crash direction is the SAFE one at every instant: the remaining
    * (still-erased) set is renamed into the live log dir BEFORE any old
    * file drops, so non-cleared ids never lose coverage; a crash before
    * the old files drop leaves the cleared ids still blocked — the clear
    * simply hasn't completed, and a re-run converges (idempotent). The
    * failure mode is "re-admission delayed", never "erasure undone by
    * accident".
    *
    * Clearing does NOT restore rows: it only re-opens the door for a
    * future [[appendRows]]/[[appendBatchPurged]]/[[IndexMigration.migrate]]
    * delivery of that id. A replayed append AFTER the clear lands
    * normally (the re-admission + replay convergence leg in
    * IndexErasureSpec).
    */
  def clearTombstones(spark: SparkSession, root: String, ids: DataFrame,
                      idCol: String): Long = locked(spark, root) {
    val f = fs(spark)
    val old = logParts(f, root)
    if (old.isEmpty) return 0L
    val log = spark.read.parquet(old.map(_.toString): _*)
      .select(col("__erased_id")).distinct().cache()
    val nBefore = log.count()
    val remaining = log.join(
      broadcast(ids.select(col(idCol).as("__erased_id")).distinct()),
      Seq("__erased_id"), "left_anti")
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(tombLog(root) + ".clear-" + tag)
    remaining.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val nAfter = spark.read.parquet(tmp.toString).count()
    log.unpersist()
    if (nAfter == nBefore) { f.delete(tmp, true); return 0L }
    f.listStatus(tmp).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach { s =>
        val dst = new Path(tombLog(root), s"clear-$tag-${s.getPath.getName}")
        require(f.rename(s.getPath, dst), s"tombstone clear rename failed: $dst")
      }
    f.delete(tmp, true)
    old.foreach(p => f.delete(p, false))
    nBefore - nAfter
  }

  /** Materialize `build` at `root` PARTITIONED BY `partCol` if absent —
    * the deployment layout of [[ArtifactStore.loadOrBuild]]: one
    * subdirectory per coarse-key value, staged and atomically promoted.
    */
  def ensurePartitioned(spark: SparkSession, root: String, partCol: String)(
      build: => DataFrame): Unit = locked(spark, root) {
    val f = fs(spark)
    if (!isLive(f, root)) {
      val tmp = new Path(root + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      System.err.println(s"[index-erasure] building partitioned $root")
      WriteLayout.clusterBy(build, partCol)
        .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
      if (isLive(f, root)) f.delete(tmp, true) // a concurrent builder won
      else StagedSwap.swap(f, tmp, new Path(root), new Path(root + ".old"))
    }
  }

  /** The live partitioned index as one relation (partition column restored
    * by directory discovery, cast to long — inference would make it int).
    */
  def readPartitioned(spark: SparkSession, root: String, partCol: String): DataFrame =
    spark.read.parquet(root).withColumn(partCol, col(partCol).cast("long"))

  /** Erasure for ID-REFERENCE artifacts in the [[ArtifactStore
    * .appendBatchIfAbsent]] batch layout (hits tables, pair relations):
    * content artifacts partition by a coarse key, but a REFERENCE artifact
    * scatters an id across arbitrary rows, so the purge reads EVERY live
    * batch — but as ONE distributed pass, not one Spark job per batch
    * (r17 verdict item 3: the per-batch driver loop was hundreds of
    * sequential job submissions at a real batch count): a tagged
    * union-read of all live batches, one broadcast-tombstone flagging, a
    * bounded per-batch manifest collect, then one `partitionBy(batch)`
    * staged write of the survivors. Rows are dropped when ANY of `refCols`
    * matches a tombstoned id. Only batches that LOSE rows are rewritten —
    * untouched batches' files (and mtimes) never move, so purge cost is
    * proportional to the affected batch mass. Rewrites are staged under a
    * sibling dir and promoted per-batch ([[StagedSwap]]); retired/staging
    * names never full-match the `b\\d+` batch pattern, so a concurrent
    * [[ArtifactStore.readBatches]] cannot pick up debris. A fully-emptied
    * batch is swapped to a schema-bearing empty parquet dir — still
    * readable, still live.
    *
    * Returns the purge MANIFEST — one row per live batch: (batch,
    * n_before, n_removed, n_after) — the record a deletion run publishes
    * (the q249 shape, on the batch axis). Purge ≡ rebuild-on-survivors
    * whenever each row depends only on its referenced rows (the hits-table
    * contract) — q261 pins the hash. Idempotent: a re-run removes nothing,
    * rewrites nothing, and reports n_removed = 0 everywhere.
    */
  def purgeBatches(spark: SparkSession, root: String, refCols: Seq[String],
                   tombstones: DataFrame, idCol: String): DataFrame = locked(spark, root) {
    import spark.implicits._
    require(refCols.nonEmpty, "purgeBatches needs at least one reference column")
    val f = fs(spark)
    val rootPath = new Path(root)
    require(f.exists(rootPath), s"IndexErasure: no artifact at $root")
    val batches = f.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("b\\d+") &&
        isLive(f, s.getPath.toString))
      .sortBy(_.getPath.getName.drop(1).toLong)
    if (batches.isEmpty) {
      // nothing to validate and nothing to rewrite, but the erase must
      // still bind future appends (erase-wins): log, return empty manifest
      logTombstones(root, idCol, tombstones)
      return Seq.empty[(String, Long, Long, Long)]
        .toDF("batch", "n_before", "n_removed", "n_after")
    }
    // ONE tagged union-read of every live batch; all downstream actions
    // are single distributed jobs over it. Constructed BEFORE the log
    // mutates: schema reads happen here, so a corrupt batch aborts a purge
    // that has no durable side effects yet.
    val tagged = batches.map { st =>
      spark.read.parquet(st.getPath.toString)
        .withColumn("__batch", lit(st.getPath.getName))
    }.reduce(_ unionByName _)
    requireNoReservedCols(spark.read.parquet(batches.head.getPath.toString), refCols)
    // log only after everything that can abort the purge has passed, but
    // still BEFORE the rewrite — the erase-wins order (ADVICE r18: logging
    // first meant a purge rejected for reserved columns still permanently
    // logged its tombstones, and appendBatchPurged would then silently
    // filter ids whose purge never ran against the standing batches)
    logTombstones(root, idCol, tombstones)
    val dataCols = tagged.columns.filterNot(_ == "__batch")
    // flag rows referencing ANY tombstoned id: one broadcast left join per
    // reference column (ids are distinct, so joins cannot multiply rows).
    // ONE distinct tombstone relation, aliased per join — not recomputed
    // per reference column
    val tombIds = tombstones.select(col(idCol).as("__t")).distinct()
    val flagged = refCols.zipWithIndex.foldLeft(tagged) { case (acc, (c, i)) =>
      acc.join(broadcast(tombIds.select(col("__t").as(s"__t$i"))),
        acc(c) === col(s"__t$i"), "left")
    }.withColumn("__hit",
      when(refCols.indices.map(i => col(s"__t$i").isNotNull).reduce(_ || _), 1L)
        .otherwise(0L))
    // manifest BEFORE the rewrite (bounded collect: one row per batch)
    val manifest = flagged.groupBy(col("__batch"))
      .agg(count(lit(1)).as("n_before"), sum(col("__hit")).as("n_removed"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val perBatch = batches.map { st =>
      val name = st.getPath.getName
      // an already-empty batch contributes no union rows: (0, 0)
      val (nb, nr) = manifest.getOrElse(name, (0L, 0L))
      (name, nb, nr, nb - nr)
    }
    val touched = perBatch.filter(_._3 > 0L)
    if (touched.nonEmpty) {
      // one staged partitioned write of the surviving rows of the touched
      // batches; untouched batches are neither read again nor rewritten
      val touchedNames = touched.map(_._1)
      val staging = new Path(root + ".purge-tmp-" +
        java.util.UUID.randomUUID().toString.take(8))
      val survivors = flagged.filter(col("__hit") === 0L &&
        col("__batch").isin(touchedNames: _*))
        .select(col("__batch") +: dataCols.map(col): _*)
      // input is the tagged union-read of the touched batch dirs — rows
      // arrive batch-aligned per task, so no write-clustering (see
      // repairErased)
      survivors.write.mode("overwrite").partitionBy("__batch")
        .parquet(staging.toString)
      touched.foreach { case (name, _, _, nAfter) =>
        val live = new Path(root, name)
        if (nAfter > 0L) {
          val part = new Path(staging, s"__batch=$name")
          // the partitioned write leaves no per-partition _SUCCESS, and
          // readBatches requires one as the liveness marker — create it in
          // the STAGING dir so promotion is atomic w.r.t. liveness (a
          // crash between rename and a later marker write would leave the
          // batch silently invisible, its content stranded at .old)
          f.create(new Path(part, "_SUCCESS")).close()
          StagedSwap.swap(f, part, live, new Path(live.toString + ".old"))
        } else {
          // fully-emptied batch: no partition in the staged output — swap
          // in a schema-bearing empty dir (its own write includes the
          // _SUCCESS marker) so the batch stays readable
          val tmp = new Path(live.toString + ".tmp-" +
            java.util.UUID.randomUUID().toString.take(8))
          tagged.filter(lit(false)).select(dataCols.map(col): _*)
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          StagedSwap.swap(f, tmp, live, new Path(live.toString + ".old"))
        }
      }
      f.delete(staging, true) // drop the (now partly-renamed) staging root
    }
    perBatch.toDF("batch", "n_before", "n_removed", "n_after")
  }

  /** [[ArtifactStore.appendBatchIfAbsent]] for a batch-layout artifact
    * that has seen purges — the batch-layout half of the ERASE-WINS
    * contract (the other half is [[appendRows]] on partitioned indexes):
    * the batch content is anti-joined against the persisted tombstone log
    * on every reference column BEFORE it lands, so a late-arriving batch
    * whose content was computed before an erasure — an at-least-once
    * pipeline re-delivering under a fresh batch id — cannot re-introduce
    * purged references. Without this, `appendBatchIfAbsent`'s
    * skip-if-present idempotence only protects REPLAYS of the same batch
    * id; a re-keyed delivery would resurrect erased data. q272 pins the
    * adversarial order (append, purge, late batch) against the
    * rebuild-on-survivors oracle.
    */
  def appendBatchPurged(spark: SparkSession, root: String, batchId: Long,
                        refCols: Seq[String])(build: => DataFrame): Unit =
    // locked on THIS object + the root's FsLock (the purge lock, not only
    // ArtifactStore's): an unsynchronized append racing a concurrent
    // purgeBatches — in this JVM or another PROCESS — could read the log
    // before the purge writes it AND promote a batch the purge's batch
    // listing never saw — erased references resurrected through the gap.
    // Lock order is always FsLock → IndexErasure → ArtifactStore (never
    // the reverse), so the nesting cannot deadlock; the nested
    // appendBatchIfAbsent re-enters the same thread's held FsLock.
    locked(spark, root) {
      require(refCols.nonEmpty, "appendBatchPurged needs at least one reference column")
      ArtifactStore.appendBatchIfAbsent(spark, root, batchId) {
        val b = build
        requireNoReservedCols(b, refCols)
        erasedIds(spark, root).fold(b) { log =>
          refCols.zipWithIndex.foldLeft(b) { case (acc, (c, i)) =>
            acc.join(broadcast(log.select(col("__erased_id").as(s"__t$i"))),
              acc(c) === col(s"__t$i"), "left_anti")
          }
        }
      }
    }

  /** The purge machinery's working column names: a data column named like
    * one of these would be silently REPLACED by withColumn, not rejected —
    * fail loudly instead (ADVICE-class silent-corruption guard).
    */
  private def requireNoReservedCols(df: DataFrame, refCols: Seq[String]): Unit = {
    val reserved = df.columns.filter(c =>
      c == "__batch" || c == "__hit" || c == "__erased_id" ||
        refCols.indices.exists(i => c == s"__t$i"))
    require(reserved.isEmpty,
      s"purge machinery reserves column names ${reserved.mkString(", ")} — rename them")
  }

  /** Incremental APPEND — the insert half of the index-maintenance algebra
    * (erase is [[repairErased]]): add `rows` (encoded under the STANDING
    * quantizer — same parameters-stand contract) to their partitions,
    * rewriting only the partitions present in `rows`. Rows whose `idCol`
    * already exists in a touched partition are skipped (anti-join), so a
    * replayed append is a no-op — the [[ArtifactStore.appendBatchIfAbsent]]
    * idempotence contract without batch bookkeeping. Rows whose id appears
    * in the persisted tombstone log ([[erasedIds]]) are also skipped, so a
    * replayed append delivered AFTER an erasure of some of its ids cannot
    * resurrect them: append and erase converge to the same index under ANY
    * replay order or interleaving — erase wins. A partition value new
    * to the index simply gains a directory (dynamic overwrite writes what
    * the output contains).
    *
    * Scale shape: one distributed job over the touched partitions plus the
    * delta — never the standing index. The tombstone log joins broadcast
    * (erased ids, not corpus-sized).
    */
  def appendRows(spark: SparkSession, root: String, partCol: String,
                 idCol: String, rows0: DataFrame): Unit = locked(spark, root) {
    val f = fs(spark)
    require(isLive(f, root), s"IndexErasure: no live index at $root")
    val rows = erasedIds(spark, root).fold(rows0)(t =>
      rows0.join(broadcast(t), rows0(idCol) === t("__erased_id"), "left_anti"))
    val touched = rows.select(col(partCol)).distinct()
      .collect().map(_.getLong(0)).toSeq // bounded: one row per touched partition
    val livePaths = touched.sorted.map(v => s"$root/$partCol=$v")
      .filter(p => f.exists(new Path(p)))
    val existing =
      if (livePaths.isEmpty) None
      else Some(spark.read.option("basePath", root).parquet(livePaths: _*)
        .withColumn(partCol, col(partCol).cast("long")))
    val fresh = existing.fold(rows)(ex =>
      rows.join(ex.select(col(idCol)), Seq(idCol), "left_anti"))
    val merged = existing.fold(fresh)(ex =>
      ex.select(rows.columns.map(col): _*).unionByName(fresh))
    // existing rows arrive partition-aligned (touched-dir read); only the
    // delta's few tasks are unaligned — not worth a shuffle stage (see
    // repairErased)
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(root)
  }

  /** Incremental erasure repair: drop every row whose `idCol` appears in
    * `tombstones` from the partitions named by `touched`, leaving every
    * other partition's files untouched. Returns the repair manifest —
    * one row per touched live partition: (partCol, n_before, n_removed,
    * n_after) — the record a deletion run publishes.
    *
    * `touched` comes from the caller's map-side assignment of the
    * tombstoned vectors (cell = argmin distance to the standing coarse
    * centroids — O(tombstones · nlist)); partitions absent on disk (e.g. a
    * previous repair already emptied and dropped them) are skipped, which
    * is what makes a re-run of the same deletion plan a no-op — the same
    * idempotence contract as [[ArtifactStore.appendBatchIfAbsent]].
    *
    * COMPLETENESS PRECONDITION: `touched` must name every partition that
    * can hold a tombstoned row under the index's standing assignment — a
    * tombstoned id sitting in an un-named partition silently survives
    * while the manifest reads clean. For an IVF index that means assigning
    * the tombstoned VECTORS with the same standing centroids the index was
    * encoded under (drifted/retrained centroids break the precondition);
    * rows appended under a different assignment are outside the contract.
    * When `partCol` is a pure function of `idCol` (id-sharded layouts),
    * use [[repairErasedByKey]], which derives `touched` from the
    * tombstones and cannot under-name. Tests verify completeness with a
    * full anti-join (IndexErasureSpec); production relies on the
    * precondition, which is why it is stated here and not only at callers.
    *
    * Scale shape: ONE distributed job reads only the touched directories
    * (partition pruning by path), anti-joins the broadcast tombstone set,
    * and dynamic-partition-overwrite rewrites only the partitions present
    * in its output. At 1000 executors this is a handful of tasks over the
    * touched cells while the rest of a 100 TB index never moves.
    */
  def repairErased(spark: SparkSession, root: String, partCol: String,
                   touched: Seq[Long], idCol: String,
                   tombstones: DataFrame): DataFrame =
    repairErasedImpl(spark, root, partCol, touched, idCol, tombstones,
      alreadyLogged = false)

  /** [[repairErased]] whose `tombstones` ARE the persisted log (the
    * rollback/rollForward replay, [[IndexMigration.promoteRetired]]) —
    * re-appending the full log to itself every replay only grew the log
    * dir toward its compaction bound and cost a write job per rollback;
    * the crash-safety argument ("log first") is vacuous here because the
    * ids are already durably logged.
    */
  private[pipeline] def repairErasedLogged(spark: SparkSession, root: String,
                                           partCol: String, touched: Seq[Long],
                                           idCol: String,
                                           tombstones: DataFrame): DataFrame =
    repairErasedImpl(spark, root, partCol, touched, idCol, tombstones,
      alreadyLogged = true)

  private def repairErasedImpl(spark: SparkSession, root: String, partCol: String,
                               touched: Seq[Long], idCol: String,
                               tombstones: DataFrame,
                               alreadyLogged: Boolean): DataFrame = locked(spark, root) {
    import spark.implicits._
    val f = fs(spark)
    require(isLive(f, root), s"IndexErasure: no live index at $root")
    // log first: a crash between the log write and the rewrite leaves a
    // replayable repair whose erasure already binds future appendRows
    if (!alreadyLogged) logTombstones(root, idCol, tombstones)
    val livePaths = touched.sorted.map(v => s"$root/$partCol=$v")
      .filter(p => f.exists(new Path(p)))
    if (livePaths.isEmpty)
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF(partCol, "n_before", "n_removed", "n_after")
    val touchedDf = spark.read.option("basePath", root)
      .parquet(livePaths: _*)
      .withColumn(partCol, col(partCol).cast("long"))
    val tombIds = broadcast(tombstones.select(col(idCol)).distinct())
    // manifest BEFORE the rewrite (reads only the touched partitions)
    val manifest = touchedDf
      .join(tombIds.withColumn("__t", lit(1L)), Seq(idCol), "left")
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("n_before"),
        sum(coalesce(col("__t"), lit(0L))).as("n_removed"))
      .withColumn("n_after", col("n_before") - col("n_removed"))
      .orderBy(col(partCol))
      .collect() // bounded: one row per touched partition
    // no write-clustering here (unlike the corpus-shaped build/migration
    // writes): the input is the touched partition DIRECTORIES themselves,
    // so every scan task already holds rows of one partition value — the
    // write emits ~one file per touched dir as-is, and a REBALANCE would
    // only add a shuffle stage per repair (measured +0.3–0.5 s per write
    // on the id-sharded frame-index repairs, q257/q260/q271)
    val survivors = touchedDf.join(tombIds, Seq(idCol), "left_anti")
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(root)
    // fully-erased partitions produce no output rows — dynamic overwrite
    // leaves their old directory standing; drop it explicitly
    manifest.filter(_.getAs[Long]("n_after") == 0L).foreach { r =>
      val p = new Path(s"$root/$partCol=${r.getAs[Long](partCol)}")
      if (f.exists(p)) f.delete(p, true)
    }
    manifest.map(r => (r.getAs[Long](partCol), r.getAs[Long]("n_before"),
      r.getAs[Long]("n_removed"), r.getAs[Long]("n_after")))
      .toSeq.toDF(partCol, "n_before", "n_removed", "n_after")
  }

  /** [[repairErased]] for ID-SHARDED layouts, where the partition value is
    * a PURE FUNCTION of the id (`partOf`, e.g. `id div 64` for the frame
    * indexes): the touched set is derived HERE from the tombstones, so the
    * completeness precondition holds by construction — a caller cannot
    * under-name the touched partitions. One bounded collect (≤ one row per
    * touched partition), then the same single pruned-read repair job.
    */
  def repairErasedByKey(spark: SparkSession, root: String, partCol: String,
                        idCol: String, tombstones: DataFrame)(
      partOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val touched = tombstones.select(partOf(col(idCol)).as(partCol)).distinct()
      .collect().map(_.getLong(0)).toSeq // bounded: one row per touched partition
    repairErased(spark, root, partCol, touched, idCol, tombstones)
  }
}
