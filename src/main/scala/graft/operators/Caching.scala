package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cache-lifetime tooling for operators whose RETURNED LAZY PLAN pins an
  * internal `.cache()` (the "shared intermediate, several consumers" shape:
  * shingle sets, BM25 document lengths, IVF cell assignments, split token
  * counts, key histograms). Those caches cannot be released inside the
  * operator — a try/finally would drop them before the caller ever runs the
  * plan — so the lifetime contract is the CALLER's:
  *
  *  - the harness runners (Verify/Bench) isolate per query with
  *    `spark.catalog.clearCache()`;
  *  - a library caller doing a one-shot evaluation wraps it in
  *    [[materializeThenRelease]], which consumes the result and then
  *    unpersists exactly the caches that evaluation pinned;
  *  - a caller that deliberately keeps the plan hot (iterating on top of
  *    it) owns the eventual `clearCache()`.
  *
  * See ARCHITECTURE.md § "Cache lifetimes". Each pinned site carries a
  * `cache-lifetime:` comment pointing here.
  */
object Caching {

  /** Build a plan, consume it fully, then unpersist every cache the
    * evaluation created — tracked as the diff of the context's persistent
    * RDD set, so nothing the caller had cached before is touched. Executor
    * storage is released immediately (async); the catalog's plan-cache
    * entry remains and would lazily re-materialize only if the same plan
    * were re-run — harmless for the one-shot shape this is meant for, and
    * `spark.catalog.clearCache()` stays the full reset.
    */
  def materializeThenRelease[A](spark: SparkSession)(build: => DataFrame)(
      consume: DataFrame => A): A = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try consume(build)
    finally {
      val after = spark.sparkContext.getPersistentRDDs
      after.keysIterator.filterNot(before).foreach(id => after(id).unpersist(blocking = false))
    }
  }
}
