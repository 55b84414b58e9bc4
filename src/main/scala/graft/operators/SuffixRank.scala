package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed suffix ranking by PREFIX DOUBLING and the unbounded-length
  * duplicate-prefix report built on it (round-10 verdict task 2 — the
  * Lee et al. dedup quantity with NO fixed minLen: for every corpus
  * position, the length of the longest substring starting there that also
  * occurs anywhere else).
  *
  * Algorithm (Manber–Myers prefix doubling, distributed as in Flick &
  * Aluru, "Parallel distributed memory construction of suffix and LCP
  * arrays", SC '15): rank every (doc, pos) suffix by its first 2^j
  * characters, j = 0, 1, …, ⌈log₂ L⌉ — each round pairs a position's rank
  * with the rank at `pos + 2^j` (missing half → −1, the shorter-sorts-first
  * sentinel) and densifies via a distributed sort + zipWithIndex (the
  * TeraSort re-rank; deterministic: range-partitioned order is total).
  * The per-round shuffle is O(n) slim (doc, pos, rank) rows — O(n log L)
  * total, versus the O(n·L) a suffix-string sort would move; that contrast
  * is the whole point of doubling at 100 TB.
  *
  * The finish walks lexicographic NEIGHBOR pairs (final ranks are unique,
  * ties broken by id — equal suffixes stay adjacent) back DOWN the rank
  * tables: lcp(a, b) accumulates k for each power where the k-blocks at the
  * current offset match (a standard O(log L) LCP query against the retained
  * rank family). max(LCP with SA-prev, LCP with SA-next) IS the longest
  * match with ANY other suffix — so no suffix text ever shuffles, only
  * ranks.
  *
  * Retaining all ⌈log₂ L⌉ rank tables costs O(n log L) rows — the published
  * space trade of rank-table LCP queries; the tables are slim longs and
  * partition-local to (doc, pos).
  */
object SuffixRank {

  /** Per-round dense re-rank: distinct (r, r2) keys → range-sorted →
    * zipWithIndex (two slim jobs) → joined back. Ranks are dense longs,
    * order-preserving over the pair keys.
    */
  private def denseRank(keyed: DataFrame): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val indexed = keyed.select("r", "r2").distinct().orderBy("r", "r2")
      .rdd.zipWithIndex()
      .map { case (row, i) => (row.getLong(0), row.getLong(1), i) }
      .toDF("r", "r2", "nr")
    keyed.join(indexed, Seq("r", "r2"))
      .select(col("doc"), col("pos"), col("nr").as("r"))
  }

  /** All rank tables k = 1, 2, 4, … up to the first power ≥ maxLen, as
    * (k, ranks(doc, pos, r)) in ascending k. Each table is cached; caller
    * releases via [[Caching]] conventions (the tables back every LCP probe).
    */
  def rankTables(df: DataFrame, idCol: String, textCol: String): Seq[(Int, DataFrame)] = {
    val docs = df.select(col(idCol).cast("long").as("doc"), col(textCol).as("t"))
    val maxLen = docs.agg(coalesce(max(length(col("t"))), lit(0))).head.getInt(0)
    require(maxLen > 0, "corpus is empty")
    // k = 1: the character code itself is already an order-preserving rank
    val first = docs
      .select(col("doc"), posexplode(split(col("t"), "")))
      .filter(col("col") =!= "") // split("") may emit a trailing empty token
      .select(col("doc"), col("pos").cast("long").as("pos"), ascii(col("col")).cast("long").as("r"))
      .cache()
    var tables = List(1 -> first)
    var k = 1
    while (k < maxLen) {
      val cur = tables.head._2
      val shifted = cur.select(col("doc"), (col("pos") - k).as("pos"), col("r").as("r2"))
      val keyed = cur.join(shifted, Seq("doc", "pos"), "left")
        .select(col("doc"), col("pos"), col("r"), coalesce(col("r2"), lit(-1L)).as("r2"))
      val next = denseRank(keyed).cache()
      k *= 2
      tables ::= (k -> next)
    }
    tables.reverse
  }

  /** `(doc_id, pos, lcp)` for every position whose longest duplicated
    * prefix is ≥ `minLen` — unbounded length, exact. 0-based positions.
    */
  def longestDupPrefix(spark: SparkSession, df: DataFrame, idCol: String,
                       textCol: String, minLen: Int): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val tables = rankTables(df, idCol, textCol)
    val lens = df.select(col(idCol).cast("long").as("doc"),
      length(col(textCol)).cast("long").as("len"))
    import spark.implicits._
    // lexicographic suffix order: final rank is unique up to EQUAL suffixes;
    // (r, doc, pos) makes the order total and keeps equal suffixes adjacent
    val finalRanks = tables.last._2
    val sa = finalRanks.orderBy("r", "doc", "pos").rdd.zipWithIndex()
      .map { case (row, i) => (row.getLong(0), row.getLong(1), i) }
      .toDF("doc", "pos", "sa")
    val a = sa.select(col("doc").as("doc_a"), col("pos").as("pos_a"), col("sa"))
    val b = sa.select(col("doc").as("doc_b"), col("pos").as("pos_b"), (col("sa") - 1).as("sa"))
    var pairs = a.join(b, Seq("sa"))
      .join(lens.select(col("doc").as("doc_a"), col("len").as("len_a")), Seq("doc_a"))
      .join(lens.select(col("doc").as("doc_b"), col("len").as("len_b")), Seq("doc_b"))
      .withColumn("lcp", lit(0L))
    // walk the powers DOWN: add k when both k-blocks at the current offset
    // exist in full and share a rank — ≤ 2·log L slim equi-joins, no text
    for ((k, ranks) <- tables.reverse) {
      val ra = ranks.select(col("doc").as("doc_a"), col("pos").as("__pa"), col("r").as("__ra"))
      val rb = ranks.select(col("doc").as("doc_b"), col("pos").as("__pb"), col("r").as("__rb"))
      pairs = pairs
        .withColumn("__pa", col("pos_a") + col("lcp"))
        .withColumn("__pb", col("pos_b") + col("lcp"))
        .join(ra, Seq("doc_a", "__pa"), "left")
        .join(rb, Seq("doc_b", "__pb"), "left")
        .withColumn("lcp",
          when(col("__ra").isNotNull && col("__rb").isNotNull &&
            col("__ra") === col("__rb") &&
            col("pos_a") + col("lcp") + k <= col("len_a") &&
            col("pos_b") + col("lcp") + k <= col("len_b"),
            col("lcp") + k).otherwise(col("lcp")))
        .drop("__pa", "__pb", "__ra", "__rb")
    }
    // each neighbor pair bounds BOTH endpoints' best match; a position's
    // longest match with any other suffix is its max over ≤ 2 neighbors
    val contrib = pairs.select(col("doc_a").as("doc_id"), col("pos_a").as("pos"), col("lcp"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"), col("pos_b").as("pos"), col("lcp")))
    contrib.groupBy("doc_id", "pos")
      .agg(max("lcp").as("lcp"))
      .filter(col("lcp") >= minLen)
      .orderBy("doc_id", "pos")
  }
}
