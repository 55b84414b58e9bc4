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

  case class Report(scanned: Long, changed: Long, skippedTooLong: Long, indexed: Long, dryRun: Boolean)

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
    val delta = Delta.changed(scan, state.read(spark)).cache() // two consumers
    val guarded = delta.withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
    val ok      = guarded.filter(col("n_tokens") < maxTokens)
    val changed = delta.count()
    val okCount = ok.count()
    val tooLong = changed - okCount

    if (changed == 0 || dryRun) { // empty-delta early exit (main.py:149-151)
      delta.unpersist(); scanMeta.unpersist()
      return Report(scanned, changed, tooLong, 0, dryRun)
    }

    val vectors = ok.select(
      col("path").as("id"),
      embedder.embed(col("text")).as("embedding"),
      map().cast("map<string,string>").as("metadata"), // reference metadata is always {}
      col("mtime").as("version"))
    index.upsert(vectors)                   // action 1: index first …
    // … action 2: cache snapshot after — from the cached scan snapshot, minus
    // too-long documents, so skipped docs resurface (and are re-reported) on
    // every run instead of being silently dropped forever
    val tooLongPaths = guarded.filter(col("n_tokens") >= maxTokens).select("path")
    state.write(
      scanMeta.join(tooLongPaths, Seq("path"), "left_anti")
        .select(col("path"), col("mtime").as("last_edit_time")))
    delta.unpersist(); scanMeta.unpersist()
    Report(scanned, changed, tooLong, okCount, dryRun)
  }
}
