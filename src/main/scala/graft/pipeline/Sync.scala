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
    // identical content (a permanently over-long doc keeps changed > 0
    // forever; rewriting the whole index for its zero surviving vectors
    // every run would be two no-op I/O passes per sync)
    if (okCount > 0) {
      val vectors = ok.select(
        col("path").as("id"),
        embedder.embed(col("text")).as("embedding"),
        map().cast("map<string,string>").as("metadata"), // reference metadata is always {}
        col("mtime").as("version"))
      index.upsert(vectors)
    }
    // erase vanished files AND files whose current content is over-long:
    // "filtered, not crashed" applies to the INDEX too — an edit that
    // pushes a previously indexed doc over the token guard supersedes its
    // old content, so the stale pre-edit vector must not stay retrievable
    // (it would otherwise live forever: the doc resurfaces in every delta,
    // is skipped every run, and nothing ever removes the old embedding)
    val tooLongPaths = guarded.filter(col("n_tokens") >= maxTokens).select("path")
    if (goneN > 0 || tooLong > 0)
      index.delete(gone.select(col("path").as("id"))
        .unionByName(tooLongPaths.select(col("path").as("id"))))
    // … action 3: cache snapshot after — from the cached scan snapshot, minus
    // too-long documents, so skipped docs resurface (and are re-reported) on
    // every run instead of being silently dropped forever. Deleted paths drop
    // out automatically (the snapshot holds only existing files), and the
    // index-before-cache order keeps the crash contract: a crash between the
    // index mutations and this write re-derives the same delta AND the same
    // tombstones next run — upsert and delete are both idempotent
    // (at-least-once, the main.py:185-188 commit-order contract extended to
    // erasure).
    state.write(
      scanMeta.join(tooLongPaths, Seq("path"), "left_anti")
        .select(col("path"), col("mtime").as("last_edit_time")))
    delta.unpersist(); scanMeta.unpersist(); gone.unpersist()
    Report(scanned, changed, tooLong, okCount, goneN, dryRun)
  }
}
