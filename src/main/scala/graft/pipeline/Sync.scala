package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** End-to-end incremental sync orchestration (SURVEY.md §3): scan → regex
  * filter → delta vs state → token guard → embed → index upsert → cache
  * write-back, preserving the reference's commit order (index before cache,
  * reference `vectrekker/main.py:185-188`) so a crash re-processes rather than
  * loses files (at-least-once, idempotent by keyed upsert).
  *
  * Divergences from the reference, both deliberate (SURVEY §0):
  *  - `dryRun = true` actually performs no side effects — the reference's
  *    `--dry-run` falls through and indexes anyway (`main.py:155-156`, missing
  *    `return`).
  *  - over-long documents are filtered + reported, not `assert`-crashed
  *    (`main.py:175-178`; chunking is the reference's acknowledged TODO).
  */
final class Sync(
    rootDir: String,
    statePath: String,
    indexPath: String,
    embedder: Embedder = HashingEmbedder(64),
    pathRegex: String = ".*\\.md$",
    maxTokens: Int = 8191) {

  case class Report(scanned: Long, changed: Long, skippedTooLong: Long,
                    indexed: Long, deleted: Long, dryRun: Boolean)

  def run(spark: SparkSession, dryRun: Boolean = false): Report = {
    import graft.functions.TextFunctions
    val state = new StateStore(statePath)
    val index = new VectorIndex(indexPath, embedder.dim, Some(embedder.id))

    val scan = FileScan.scan(spark, rootDir, pathRegex)
    // snapshot (path, mtime) ONCE: the state write below must record the
    // mtimes this run actually saw — re-listing at write time could record a
    // newer mtime for content that was embedded from the earlier read,
    // silently losing that edit on the next run
    val scanMeta = scan.select("path", "mtime").cache()
    val scanned  = scanMeta.count() // materializes the snapshot
    val stateDf  = state.read(spark)
    val delta = Delta.changed(scan, stateDf).cache() // two consumers
    // deletion propagation — the hole the reference never closes (its walk
    // yields only existing files, main.py:62-68, so a deleted file's vector
    // lives in Pinecone forever; SURVEY §2.7 names the anti-join fix):
    // cache entries whose file vanished tombstone BOTH stores.
    val gone    = Delta.deleted(scanMeta, stateDf).cache() // count + delete read it
    val guarded = delta.withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
    val ok      = guarded.filter(col("n_tokens") < maxTokens)
    val changed = delta.count()
    val okCount = ok.count()
    val tooLong = changed - okCount
    val goneN   = gone.count()

    if ((changed == 0 && goneN == 0) || dryRun) { // empty-delta early exit (main.py:149-151)
      delta.unpersist(); scanMeta.unpersist(); gone.unpersist()
      // a dry run REPORTS pending deletions like it reports pending
      // changes — returning deleted=0 here would make `--dry-run` print
      // "no changes" while the next real run erases vectors
      return Report(scanned, changed, tooLong, 0, goneN, dryRun)
    }

    // actions 1..2: INDEX mutations first (upsert, then erase) — each a
    // full staged rewrite, so both are SKIPPED when they would rewrite
    // identical content
    if (okCount > 0) {
      val vectors = ok.select(
        col("path").as("id"),
        embedder.embed(col("text")).as("embedding"),
        map().cast("map<string,string>").as("metadata"), // reference metadata is always {}
        col("mtime").as("version"))
      index.upsert(vectors)
    }
    // erase vanished files AND files that NEWLY crossed the token guard:
    // "filtered, not crashed" applies to the INDEX too — an edit that
    // pushes a previously indexed doc over the guard supersedes its old
    // content, so the stale pre-edit vector must not stay retrievable.
    // NEWLY is load-bearing (ADVICE r18): a path already recorded too_long
    // in state holds no vector, so deleting it again would be a no-op full
    // index rewrite — and since too-long paths are cached with their mtime
    // (flagged, below), they no longer resurface in the delta at all, so a
    // permanently over-long doc costs nothing after its first sync.
    val tooLongPaths = guarded.filter(col("n_tokens") >= maxTokens)
      .select("path").cache() // three consumers: delete set, state flags, count
    val newlyTooLong = tooLongPaths.join(
      stateDf.filter(!coalesce(col("too_long"), lit(false))).select("path"),
      Seq("path"), "left_semi")
    val newlyTooLongN = newlyTooLong.count()
    if (goneN > 0 || newlyTooLongN > 0)
      index.delete(gone.select(col("path").as("id"))
        .unionByName(newlyTooLong.select(col("path").as("id"))))
    // … action 3: cache snapshot after — from the cached scan snapshot.
    // Too-long documents are recorded WITH their mtime and a too_long flag
    // (not excluded): the flag is what lets the next run's delta skip them
    // and what distinguishes "newly crossed the guard" (erase the stale
    // vector) from "known over-long" (nothing to erase). Unchanged paths
    // carry their previous flag. Deleted paths drop out automatically (the
    // snapshot holds only existing files), and the index-before-cache order
    // keeps the crash contract: a crash between the index mutations and
    // this write re-derives the same delta AND the same tombstones next run
    // — upsert and delete are both idempotent (at-least-once, the
    // main.py:185-188 commit-order contract extended to erasure).
    state.write(
      scanMeta
        .join(tooLongPaths.withColumn("__tl", lit(true)), Seq("path"), "left")
        .join(ok.select(col("path"), lit(true).as("__ok")), Seq("path"), "left")
        .join(stateDf.select(col("path"), col("too_long").as("__prev")),
          Seq("path"), "left")
        .select(col("path"), col("mtime").as("last_edit_time"),
          coalesce(col("__tl"), when(col("__ok"), lit(false)), col("__prev"),
            lit(false)).as("too_long")))
    delta.unpersist(); scanMeta.unpersist(); gone.unpersist(); tooLongPaths.unpersist()
    Report(scanned, changed, tooLong, okCount, goneN, dryRun)
  }
}
