package graft.operators

import graft.functions.TextFunctions._
import graft.functions.MathFunctions.floorRound
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Deduplication family for LLM-corpus pipelines (SURVEY.md §2.8 X-D):
  * exact, n-gram Jaccard (exact pairs), MinHash-LSH (Broder, "On the
  * resemblance and containment of documents", 1997; banding per Leskovec/
  * Rajaraman/Ullman, Mining of Massive Datasets ch. 3), SimHash (Charikar,
  * "Similarity estimation techniques from rounding algorithms", STOC 2002).
  *
  * Scale design:
  *  - [[exactDedup]] is one hash-shuffle on the content hash — the canonical
  *    100 TB exact-dedup plan (hash first so the shuffle key is 16 bytes, not
  *    the document).
  *  - [[jaccardPairsExact]] enumerates O(n²) pairs — it exists as the *exact
  *    verifier / oracle anchor* for small n. Never the scale path.
  *  - [[minhashLshPairs]] is the scale path: signature (k seeded min-hashes) →
  *    band explode → equi-join on (band, band-hash). Shuffle volume is
  *    O(n · bands), candidates are only colliding pairs; exact Jaccard then
  *    prunes false positives. This is the standard shingle→minhash→band→
  *    bucket-join pipeline, expressed as joins Catalyst can plan (AQE handles
  *    skewed buckets).
  *  - [[simhashPairs]] uses 4×16-bit band buckets over a 64-bit SimHash —
  *    guaranteed recall for hamming distance ≤ 3, heuristic beyond.
  */
object Dedup {

  /** Keep one row per distinct value of `textCol` (lowest `idCol` wins). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Shingle sets represented by their SORTED 64-bit hashes: Jaccard over the
    * hash sets equals string-set Jaccard up to 64-bit collisions (≈1e-11
    * across a 5k-doc corpus). Sorting once per row lets every pair use the
    * allocation-free merge-walk kernel
    * [[graft.functions.expressions.SortedIntersectionCount]] instead of a
    * hash-set build per pair — the dominant cost of pair verification.
    */
  private def withShingles(df: DataFrame, idCol: String, textCol: String, n: Int) =
    // single fused kernel call per row (tokenize → token hash → rolling
    // shingle hash → sort+dedup); the equivalent HOF column tree was the
    // measured hotspot of the whole dedup family (~5 s of q22b's 9.5 s at
    // sf0.1) — per-element element_at bound checks and a materialized index
    // sequence add up over millions of shingles
    df.select(col(idCol),
        graft.functions.TextFunctions.shingleHashesFused(col(textCol), n).as("hs"))
      .filter(size(col("hs")) > 0)

  /** Jaccard over sorted hash arrays via the fused merge-walk kernel; same
    * integer inter/union counts as [[graft.functions.TextFunctions.jaccard]],
    * so oracle parity is unchanged.
    */
  private def jaccardSorted(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    import graft.functions.expressions.SortedIntersectionCount
    import org.apache.spark.sql.{GraftSqlBridge => B}
    val inter = B.column(SortedIntersectionCount(B.expression(a), B.expression(b))).cast("double")
    val uni   = (size(a) + size(b)).cast("double") - inter
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** All pairs (id_a < id_b) with shingle-set Jaccard >= threshold.
    * O(n²) — exact verifier for small corpora; see [[minhashLshPairs]] for
    * the scale path.
    */
  def jaccardPairsExact(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int, threshold: Double): DataFrame = {
    // cache: both sides of the self-join read this small relation; without
    // it the whole shingle+hash pipeline executes twice (aliased self-join
    // branches don't share exchanges)
    val sh = withShingles(df, idCol, textCol, shingleSize).cache()
    val a  = sh.select(col(idCol).as("id_a"), col("hs").as("hs_a"))
    val b  = sh.select(col(idCol).as("id_b"), col("hs").as("hs_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jac", floorRound(jaccardSorted(col("hs_a"), col("hs_b")), 4))
      .filter(col("jac") >= threshold)
      .select("id_a", "id_b", "jac")
      .orderBy("id_a", "id_b")
  }

  /** MinHash-LSH near-dup pairs: banding join for candidates, exact Jaccard
    * verify. `numHashes` must be divisible by `bands`.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int, numHashes: Int, bands: Int,
                      threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val sig = withShingles(df, idCol, textCol, shingleSize)
      .withColumn("sig", minhashSignatureFromHashes(col("hs"), numHashes))
      .cache() // self-joined below — avoid recomputing signatures per branch
    val banded = sig
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_key", xxhash64(col("band"), slice(col("sig"), col("band") * rows + 1, lit(rows))))
    // candidate generation over slim (id, band, band_key) rows only — the
    // per-band duplicates are dropped BEFORE the (heavy) shingle-hash arrays
    // are attached, so the dedup shuffle moves 16-byte rows, not kilobytes
    val slim = banded.select(col(idCol), col("band"), col("band_key"))
    val cand = slim.toDF("id_a", "band", "band_key")
      .join(slim.toDF("id_b", "band", "band_key"), Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    cand
      .join(sig.select(col(idCol).as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(sig.select(col(idCol).as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .withColumn("jac", floorRound(jaccardSorted(col("hs_a"), col("hs_b")), 4))
      .filter(col("jac") >= threshold)
      .select("id_a", "id_b", "jac")
      .orderBy("id_a", "id_b")
  }

  /** Greedy "keep first occurrence" policy over any (id_a < id_b) pair set:
    * a row survives iff it is not the higher-id member of any pair. Shared by
    * the exact (q44) and LSH (q45) corpus-dedup paths so the policy cannot
    * drift between them.
    */
  def keepFirst(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** The corpus-level dedup a training pipeline actually applies: drop every
    * document that near-duplicates an earlier (lower-id) one.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         shingleSize: Int, numHashes: Int, bands: Int,
                         threshold: Double): DataFrame =
    keepFirst(df, idCol,
      minhashLshPairs(df, idCol, textCol, shingleSize, numHashes, bands, threshold))

  /** Near-dup clusters via iterative min-label propagation over the pair
    * graph (connected components). Each iteration joins the current labels
    * across edges and takes the min — converges in O(diameter) rounds;
    * `maxIter` bounds runaway graphs. Returns (id, cluster) where cluster is
    * the minimum member id of the component.
    *
    * At scale each round is one shuffle join on id; checkpointing every few
    * rounds would truncate lineage for very deep graphs.
    */
  def clusters(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // undirected edge list (both directions) from (id_a, id_b) pairs
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src").as("id"), col("cluster"))
      val next = labels.union(viaNeighbor)
        .groupBy("id").agg(min("cluster").as("cluster"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), Seq("id"))
        .filter(col("cluster") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** SimHash near-dup pairs within `maxHamming` bits, candidates via 4×16-bit
    * band buckets.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val sh = df.select(col(idCol), simhash64(col(textCol)).as("sim")).cache()
    val banded = sh
      .withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk", expr("shiftright(sim, band*16) & 65535"))
    val l = banded.select(col(idCol).as("id_a"), col("sim").as("sim_a"), col("band"), col("chunk"))
    val r = banded.select(col(idCol).as("id_b"), col("sim").as("sim_b"), col("band"), col("chunk"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("sim_a"), col("sim_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }
}
