package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Distributed suffix ranking by PREFIX DOUBLING and the unbounded-length
  * duplicate analyses built on it (round-10 verdict task 2 and round-11
  * backlog item 2 — the Lee et al. dedup quantities with NO fixed minLen).
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
  * Two finishes are built on the rank family:
  *
  *  - [[longestDupPrefix]] walks lexicographic NEIGHBOR pairs back DOWN the
  *    rank tables (a standard O(log L) LCP query), so no suffix text ever
  *    shuffles — per-position longest-duplicate length, the quantity
  *    ExactSubstr-style dedup consumes.
  *  - [[maximalRepeats]] enumerates the REPEAT LEXICON: every maximal
  *    repeat (Gusfield, "Algorithms on Strings, Trees and Sequences", §7.12:
  *    a substring with ≥ 2 occurrences that can be extended neither left nor
  *    right without losing one) with its occurrence count. Suffix-tree view:
  *    right-maximal repeats are exactly the internal nodes, i.e. the LCP
  *    intervals [a, b] whose depth ℓ equals min(lcp[a+1..b]); the
  *    enumeration materializes those intervals from the adjacent-LCP array
  *    with doubling sparse-min tables + a binary-descent extent walk
  *    (O(log n) slim equi-joins), then filters left-maximality from the
  *    members' preceding characters (the BWT column).
  *
  * Retaining all ⌈log₂ L⌉ rank tables costs O(n log L) rows — the published
  * space trade of rank-table LCP queries; the tables are slim longs and
  * partition-local to (doc, pos).
  */
object SuffixRank {

  /** Per-round dense re-rank: distinct (r, r2) keys → range-sorted →
    * zipWithIndex (two slim jobs) → joined back. Ranks are dense longs,
    * order-preserving over the pair keys.
    *
    * SKEW: the DISTINCT is safe on degenerate corpora (map-side partial
    * aggregation collapses repeats before the shuffle), but the join back
    * hashes every position with the same (r, r2) to ONE reducer — an
    * all-same-character corpus funnels the whole round through a single
    * task. `salt > 1` splits that hot key: the big (position) side salts by
    * a position hash, the one-row-per-key index side explodes ×salt — the
    * classic replicate-the-small-side salted join, row-identical by
    * construction (each position still meets exactly its own key's index
    * row; ScaleSpec asserts it, SkewProbe measures the task spread).
    */
  private def denseRank(keyed: DataFrame, salt: Int): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val indexed = keyed.select("r", "r2").distinct().orderBy("r", "r2")
      .rdd.zipWithIndex()
      .map { case (row, i) => (row.getLong(0), row.getLong(1), i) }
      .toDF("r", "r2", "nr")
    val joined =
      if (salt <= 1) keyed.join(indexed, Seq("r", "r2"))
      else keyed
        .withColumn("__salt", pmod(hash(col("doc"), col("pos")), lit(salt)))
        .join(indexed.withColumn("__salt",
          explode(sequence(lit(0), lit(salt - 1)))), Seq("r", "r2", "__salt"))
    joined.select(col("doc"), col("pos"), col("nr").as("r"))
  }

  /** Lineage cut with HONEST statistics: eager localCheckpoint (truncates
    * the logical tree to a leaf) + cache + count (materializes the
    * InMemoryRelation so its stats come from the MEASURED cached bytes).
    *
    * Both halves matter, and each alone is a trap this module hit:
    *  - cache() alone keeps the full analyzed tree. Table k's plan
    *    references table k/2's twice (cur + shifted), so the tree DOUBLES
    *    per doubling round — ~2^log L copies of the base scan by the last
    *    table — and the plan STRING Spark renders for every action's
    *    execution event OOMs the driver on the composed finishes.
    *  - localCheckpoint alone truncates the tree but PRESERVES the origin
    *    plan's statistics on the LogicalRDD leaf. Size estimates multiply
    *    up a join tree, so each checkpoint generation inherits and then
    *    re-multiplies the previous generation's inflated sizeInBytes —
    *    after the doubling rounds the leaves claim ~10^7-BIT BigInt sizes,
    *    and every later stats lookup (join selection, runtime-filter
    *    injection) spends MINUTES in BigInteger multiplication. The
    *    materialized cache resets every generation's stats to measured
    *    small numbers, which also keeps the broadcast-vs-SMJ choice sane.
    */
  private def cutLineage(df: DataFrame): DataFrame = {
    val cut = df.localCheckpoint(true).cache()
    cut.count() // materialize the IMR so computeStats sees measured bytes
    cut
  }

  /** All rank tables k = 1, 2, 4, … up to the first power ≥ maxLen, as
    * (k, ranks(doc, pos, r)) in ascending k. Each table is lineage-cut
    * ([[cutLineage]]); each was going to be materialized by the next
    * round's zipWithIndex anyway, so the eager cut costs no extra pass.
    * `saltRank > 1` salts each round's re-rank join against hot-key skew
    * (massively repeated prefixes — see [[denseRank]]); the default 1 is
    * right for natural corpora, where (r, r2) keys spread.
    */
  def rankTables(df: DataFrame, idCol: String, textCol: String,
                 saltRank: Int = 1): Seq[(Int, DataFrame)] = {
    val docs = df.select(col(idCol).cast("long").as("doc"), col(textCol).as("t"))
    val maxLen = docs.agg(coalesce(max(length(col("t"))), lit(0))).head.getInt(0)
    require(maxLen > 0, "corpus is empty")
    // k = 1: the character code itself is already an order-preserving rank
    val first = cutLineage(docs
      .select(col("doc"), posexplode(split(col("t"), "")))
      .filter(col("col") =!= "") // split("") may emit a trailing empty token
      .select(col("doc"), col("pos").cast("long").as("pos"), ascii(col("col")).cast("long").as("r")))
    var tables = List(1 -> first)
    var k = 1
    while (k < maxLen) {
      val cur = tables.head._2
      val shifted = cur.select(col("doc"), (col("pos") - k).as("pos"), col("r").as("r2"))
      val keyed = cur.join(shifted, Seq("doc", "pos"), "left")
        .select(col("doc"), col("pos"), col("r"), coalesce(col("r2"), lit(-1L)).as("r2"))
      val next = cutLineage(denseRank(keyed, saltRank))
      k *= 2
      tables ::= (k -> next)
    }
    tables.reverse
  }

  /** Suffix array from the FINAL rank table: final ranks are unique up to
    * EQUAL suffixes; (r, doc, pos) makes the order total and keeps equal
    * suffixes adjacent. Returns (doc, pos, sa) with `sa` the 0-based
    * lexicographic index.
    */
  private def suffixArray(spark: SparkSession, finalRanks: DataFrame): DataFrame = {
    import spark.implicits._
    finalRanks.orderBy("r", "doc", "pos").rdd.zipWithIndex()
      .map { case (row, i) => (row.getLong(0), row.getLong(1), i) }
      .toDF("doc", "pos", "sa")
  }

  /** Adjacent-pair LCPs: one row per suffix-array index i ≥ 1, pairing the
    * suffix at `sa = i` (the `_a` columns, keyed by `sa`) with its
    * lexicographic predecessor at `sa = i − 1` (the `_b` columns), with the
    * exact LCP accumulated by walking the powers DOWN the rank family: add
    * k when both k-blocks at the current offset exist in full and share a
    * rank — ≤ 2·log L slim equi-joins, no text.
    */
  private def adjacentLcp(sa: DataFrame, tables: Seq[(Int, DataFrame)],
                          lens: DataFrame): DataFrame = {
    val a = sa.select(col("doc").as("doc_a"), col("pos").as("pos_a"), col("sa"))
    val b = sa.select(col("doc").as("doc_b"), col("pos").as("pos_b"), (col("sa") + 1).as("sa"))
    val pairs = a.join(b, Seq("sa"))
      .join(lens.select(col("doc").as("doc_a"), col("len").as("len_a")), Seq("doc_a"))
      .join(lens.select(col("doc").as("doc_b"), col("len").as("len_b")), Seq("doc_b"))
    pairLcp(pairs, tables)
  }

  /** The rank-table LCP walk on ARBITRARY suffix pairs: accumulate k into
    * `lcp` whenever both k-blocks at the current offset exist in full and
    * share a rank, largest power first — ≤ 2·log L slim equi-joins, no
    * text. Input needs (doc_a, pos_a, len_a, doc_b, pos_b, len_b); extra
    * columns ride through. Shared by the adjacent-pair LCP array and the
    * cross-corpus side-neighbor probes.
    */
  private def pairLcp(pairs0: DataFrame, tables: Seq[(Int, DataFrame)]): DataFrame = {
    var pairs = pairs0.withColumn("lcp", lit(0L))
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
    pairs
  }

  /** The SELF-corpus materialization boundary (backlog r12 item 1, the
    * q189-family artifact pattern applied to the q183/q185 pair): the
    * suffix array `(doc, pos, sa)` and the UNFILTERED adjacent-LCP pair
    * table `(sa, doc_a, pos_a, doc_b, pos_b, lcp)` — everything the two
    * finishes ([[longestDupPrefixFromLcp]], [[maximalRepeatsFromArrays]])
    * need, and nothing the doubling build keeps private (the rank tables
    * themselves stay session-internal: the finishes never touch them once
    * the LCP walk has run). Both outputs are deterministic (range-sorted
    * zipWithIndex), so they qualify for [[graft.pipeline.ArtifactStore]].
    */
  def suffixArrays(spark: SparkSession, df: DataFrame, idCol: String,
                   textCol: String, saltRank: Int = 1): (DataFrame, DataFrame) = {
    val tables = rankTables(df, idCol, textCol, saltRank)
    val lens = df.select(col(idCol).cast("long").as("doc"),
      length(col(textCol)).cast("long").as("len"))
    val sa = cutLineage(suffixArray(spark, tables.last._2))
    val pairs = adjacentLcp(sa, tables, lens)
      .select("sa", "doc_a", "pos_a", "doc_b", "pos_b", "lcp")
    (sa, pairs)
  }

  /** `(doc_id, pos, lcp)` for every position whose longest duplicated
    * prefix is ≥ `minLen` — unbounded length, exact. 0-based positions.
    */
  def longestDupPrefix(spark: SparkSession, df: DataFrame, idCol: String,
                       textCol: String, minLen: Int,
                       saltRank: Int = 1): DataFrame =
    longestDupPrefixFromLcp(suffixArrays(spark, df, idCol, textCol, saltRank)._2,
      minLen)

  /** [[longestDupPrefix]]'s finish decoupled from the build: `lcpPairs` is
    * the adjacent-LCP table from [[suffixArrays]] — fresh or loaded from a
    * materialized artifact. Each neighbor pair bounds BOTH endpoints' best
    * match; a position's longest match with any other suffix is its max
    * over ≤ 2 neighbors.
    */
  def longestDupPrefixFromLcp(lcpPairs: DataFrame, minLen: Int): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val contrib = lcpPairs.select(col("doc_a").as("doc_id"), col("pos_a").as("pos"), col("lcp"))
      .unionByName(lcpPairs.select(col("doc_b").as("doc_id"), col("pos_b").as("pos"), col("lcp")))
    contrib.groupBy("doc_id", "pos")
      .agg(max("lcp").as("lcp"))
      .filter(col("lcp") >= minLen)
      .orderBy("doc_id", "pos")
  }

  /** The repeat LEXICON: every maximal repeat of length ≥ `minLen` as
    * `(repeat, len, n_occ, n_docs)`, ordered by the repeat text. A maximal
    * repeat (Gusfield §7.12) occurs ≥ 2 times and is extendable neither
    * right (two occurrences follow with different characters, or one ends
    * its document) nor left (two occurrences are preceded by different
    * characters, or one starts its document).
    *
    * Construction, all on the rank family — suffix TEXT never shuffles
    * until the final one-row-per-repeat substring fetch:
    *
    *  1. suffix array + adjacent-LCP array (shared with
    *     [[longestDupPrefix]]);
    *  2. doubling sparse-min tables over the LCP sequence: level w holds
    *     min(lcp[i..i+w)) for every full window — log n rounds of one slim
    *     self-join each (the classic sparse table, built as a dataframe);
    *  3. every i with lcp[i] ≥ minLen seeds a candidate at depth
    *     ℓ = lcp[i]; a binary-descent walk over the min tables (≤ 2·log n
    *     equi-joins) finds the maximal run of adjacent LCPs ≥ ℓ around i —
    *     the LCP interval [a, b] of all suffixes sharing the ℓ-prefix.
    *     min over the run is exactly ℓ (lcp[i] is in it), so two members
    *     diverge AT depth ℓ: the interval is precisely a right-maximal
    *     repeat, i.e. an internal suffix-tree node, and `n_occ = b − a + 1`
    *     with no member listing;
    *  4. left-maximality needs the members' preceding characters (the BWT
    *     column): intervals explode to (interval, sa) pairs and equi-join
    *     the suffix array — output-bound at Σ interval widths, the size of
    *     the occurrence listing itself (the suffix-tree subtree-size sum;
    *     `minLen` is the knob that bounds it on degenerate corpora). A
    *     position-0 occurrence is its own sentinel (distinct from every
    *     character), matching the end-of-document sentinel semantics the
    *     suffix ranks already give right-extension.
    *
    * Scale: steps 1–3 shuffle O(n log L) slim longs total; step 4 is
    * output-bound. Nothing is driver-side except the table-count loop
    * bounds (two scalar aggregates).
    */
  def maximalRepeats(spark: SparkSession, df: DataFrame, idCol: String,
                     textCol: String, minLen: Int): DataFrame = {
    val (sa, pairs) = suffixArrays(spark, df, idCol, textCol)
    maximalRepeatsFromArrays(df, idCol, textCol, sa, pairs, minLen)
  }

  /** [[maximalRepeats]]' construction decoupled from the doubling build:
    * `sa` and `lcpPairs` come from [[suffixArrays]] — fresh or loaded from
    * a materialized artifact. The min-table build, extent walks, and
    * member joins COMPOSE ~4·log n joins on top of the two arrays, so both
    * get the full lineage cut (tree truncation AND measured stats; see
    * [[cutLineage]] for why each half matters — a parquet-loaded artifact
    * arrives flat already, and the cut then just pins the multi-consumer
    * cache).
    */
  def maximalRepeatsFromArrays(df: DataFrame, idCol: String, textCol: String,
                               sa0: DataFrame, lcpPairs: DataFrame,
                               minLen: Int): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val docs = df.select(col(idCol).cast("long").as("doc"), col(textCol).as("t"))
    val sa = cutLineage(sa0)
    val lcp = cutLineage(lcpPairs.select(col("sa").as("i"), col("lcp")))
    val nSuffix = sa.count()
    // sparse-min tables: minTs head is the LARGEST window; inner self-joins
    // keep only FULL windows, so a missing row below means "out of range"
    var minTs: List[(Long, DataFrame)] =
      List(1L -> lcp.select(col("i"), col("lcp").as("mn")))
    var w = 1L
    while (w * 2 < nSuffix) {
      val cur = minTs.head._2
      val next = cutLineage(cur.join(cur.select((col("i") - w).as("i"), col("mn").as("mn2")), Seq("i"))
        .select(col("i"), least(col("mn"), col("mn2")).as("mn")))
      w *= 2
      minTs ::= (w -> next)
    }
    // binary descent: lp walks LEFT to the run start (window [lp−w, lp−1]
    // all ≥ ℓ → jump), rp walks RIGHT to the run end (window [rp+1, rp+w])
    var walk = lcp.filter(col("lcp") >= minLen)
      .select(col("i"), col("lcp").as("ell"))
      .withColumn("lp", col("i")).withColumn("rp", col("i"))
    for ((wk, t) <- minTs) {
      walk = walk
        .join(t.select(col("i").as("__li"), col("mn").as("__lmn")),
          col("__li") === col("lp") - wk, "left")
        .withColumn("lp", when(col("__lmn") >= col("ell"), col("lp") - wk).otherwise(col("lp")))
        .drop("__li", "__lmn")
        .join(t.select(col("i").as("__ri"), col("mn").as("__rmn")),
          col("__ri") === col("rp") + 1, "left")
        .withColumn("rp", when(col("__rmn") >= col("ell"), col("rp") + wk).otherwise(col("rp")))
        .drop("__ri", "__rmn")
    }
    // interval members are sa indices a..b (the run PLUS the left neighbor
    // the first LCP entry compares against); distinct collapses the seeds
    // that landed in the same interval
    val iv = walk.select((col("lp") - 1).as("a"), col("rp").as("b"), col("ell")).distinct()
    val members = iv.select(col("a"), col("b"), col("ell"),
        explode(sequence(col("a"), col("b"))).as("m"))
      .join(sa.select(col("sa").as("m"), col("doc"), col("pos")), Seq("m"))
    val withPrev = members.join(docs, Seq("doc"))
      .withColumn("__prev", when(col("pos") === 0, concat(lit("^"), col("doc")))
        .otherwise(col("t").substr(col("pos").cast("int"), lit(1))))
    val agg = withPrev.groupBy("a", "b", "ell")
      .agg(countDistinct(col("__prev")).as("__np"), countDistinct(col("doc")).as("n_docs"))
    // repeat text from ONE representative member (sa = a) — the only point
    // where document text is read, one row per surviving interval
    val reps = withPrev.filter(col("m") === col("a"))
      .select(col("a"), col("b"), col("ell"),
        col("t").substr((col("pos") + 1).cast("int"), col("ell").cast("int")).as("repeat"))
    agg.filter(col("__np") >= 2)
      .join(reps, Seq("a", "b", "ell"))
      .select(col("repeat"), col("ell").cast("long").as("len"),
        (col("b") - col("a") + 1).cast("long").as("n_occ"),
        col("n_docs").cast("long").as("n_docs"))
      .orderBy("repeat")
  }

  /** CROSS-CORPUS contamination spans — the third SuffixRank finish: for
    * every position of every `test` document, the length of the longest
    * substring starting there that occurs ANYWHERE in the `train` corpus.
    * Unbounded length, exact — the quantity a Lee-et-al-style
    * decontamination audit actually wants (the fixed-n Bloom gate,
    * [[Decontaminate]], answers "does any n-gram collide"; this answers
    * "HOW LONG is the longest shared span", which is what separates a
    * quoted benchmark answer from an incidental 13-gram).
    *
    * Construction: rank the UNION corpus (test doc ids are interleaved to
    * odd, train to even — sides stay disjoint whatever ids the caller
    * holds), take the suffix array, and give every test suffix its nearest
    * train NEIGHBOR on each side of the SA order via [[Scan.runningLast]]
    * (two two-pass prefix scans — no single-partition window). Because LCP
    * to a suffix only decreases with SA distance, the longest match of a
    * test suffix against the whole train SET is the max of its LCP to
    * those ≤ 2 neighbors (Gusfield §7.14.4's matching-statistics argument
    * on the generalized suffix array) — each probed by the [[pairLcp]]
    * rank walk, never by text comparison.
    *
    * Scale: everything is the q183 profile (O(n log L) slim shuffles for
    * ranks + SA) plus two prefix scans and one ≤ 2·|test-positions| pair
    * walk. Returns `(doc_id, pos, lcp)` over TEST ids, `lcp >= minLen`.
    */
  /** The decontamination DECISION layer on [[crossCorpusOverlap]]: each
    * qualifying position p contaminates the character interval
    * [p, p + lcp(p)); overlapping intervals union into maximal MASK SPANS
    * per test document — the ranges a pipeline blanks (or drops the doc
    * over) before training. Interval union is the classic island walk:
    * per-doc ordered running max of span ends marks island starts; the
    * window partitions by document, so parallelism is per-doc and the
    * partition size is bounded by document length — never corpus-sized.
    * Returns `(doc_id, span_start, span_len)`.
    */
  def contaminationMask(spark: SparkSession, train: DataFrame, test: DataFrame,
                        idCol: String, textCol: String, minLen: Int,
                        scanParts: Int = 32): DataFrame =
    maskSpansFromHits(
      crossCorpusOverlap(spark, train, test, idCol, textCol, minLen, scanParts))

  /** The island walk of [[contaminationMask]] decoupled from the build:
    * `hits` is a (doc_id, pos, lcp) overlap table — either freshly computed
    * by [[crossCorpusOverlap]] or loaded from a materialized artifact
    * ([[graft.pipeline.ArtifactStore]]), which is how a standing pipeline
    * runs every finish over ONE suffix-index build instead of three.
    */
  def maskSpansFromHits(hits0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = hits0.withColumn("end", col("pos") + col("lcp"))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    hits
      .withColumn("__new", (max("end").over(prevEnd).isNull ||
        col("pos") > max("end").over(prevEnd)).cast("long"))
      .withColumn("__island", sum("__new").over(byDoc))
      .groupBy("doc_id", "__island")
      .agg(min("pos").as("span_start"), (max("end") - min("pos")).as("span_len"))
      .select("doc_id", "span_start", "span_len")
      .orderBy("doc_id", "span_start")
  }

  /** Corpus-health summary of [[contaminationMask]]: per test document the
    * masked character count, length, contamination fraction, and the
    * drop/keep verdict at `maxFrac` — the report a decontamination gate
    * publishes. Documents with NO contamination appear with zero mass
    * (left join against the full test corpus), so the report covers the
    * whole corpus, not just the flagged tail.
    */
  def contaminationRate(spark: SparkSession, train: DataFrame, test: DataFrame,
                        idCol: String, textCol: String, minLen: Int,
                        maxFrac: Double, roundTo: Int = 4,
                        scanParts: Int = 32): DataFrame =
    rateFromHits(
      crossCorpusOverlap(spark, train, test, idCol, textCol, minLen, scanParts),
      test, idCol, textCol, maxFrac, roundTo)

  /** The rate report decoupled from the build (see [[maskSpansFromHits]]):
    * spans union from `hits`, then the per-document report against the full
    * `test` corpus.
    */
  def rateFromHits(hits: DataFrame, test: DataFrame, idCol: String,
                   textCol: String, maxFrac: Double,
                   roundTo: Int = 4): DataFrame = {
    import graft.functions.MathFunctions.floorRound
    val spans = maskSpansFromHits(hits)
    val masked = spans.groupBy("doc_id")
      .agg(sum("span_len").as("masked_chars"), count(lit(1)).as("n_spans"))
    test.select(col(idCol).cast("long").as("doc_id"),
        length(col(textCol)).cast("long").as("doc_len"))
      .join(masked, Seq("doc_id"), "left")
      .select(col("doc_id"), col("doc_len"),
        coalesce(col("masked_chars"), lit(0L)).as("masked_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
      .withColumn("frac", floorRound(
        col("masked_chars").cast("double") / col("doc_len").cast("double"), roundTo))
      .withColumn("drop_doc", (col("frac") > maxFrac).cast("long"))
      .orderBy("doc_id")
  }

  /** Side tagging packs (id, side) into one long as `id*2 + side` — ids must
    * satisfy |id| < Long.MaxValue/2 or the tag overflows silently. Negative
    * ids are supported: side recovery uses `pmod` (Spark's `%` keeps the
    * dividend's sign, so a plain `% 2 === 1` would drop negative odd tags),
    * and the id recovery `(doc − 1) / 2` is exact because the dividend is
    * always even.
    */
  def crossCorpusOverlap(spark: SparkSession, train: DataFrame, test: DataFrame,
                         idCol: String, textCol: String, minLen: Int,
                         scanParts: Int = 32): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    def tagged(df: DataFrame, side: Int) = df.select(
      (col(idCol).cast("long") * 2 + side).as(idCol), col(textCol))
    val union = tagged(train, 0).unionByName(tagged(test, 1))
    val tables = rankTables(union, idCol, textCol)
    val lens = union.select(col(idCol).as("doc"),
      length(col(textCol)).cast("long").as("len"))
    val sa = cutLineage(suffixArray(spark, tables.last._2))
    val sided = sa.withColumn("__train_sa",
      when(pmod(col("doc"), lit(2L)) === 0, col("sa")))
    val withPrev = Scan.runningLast(sided, Seq("sa"), "__train_sa", scanParts)
      .withColumnRenamed("prev___train_sa", "__lo")
      .withColumn("__neg", -col("sa"))
    val withBoth = Scan.runningLast(withPrev, Seq("__neg"), "__train_sa", scanParts)
      .withColumnRenamed("prev___train_sa", "__hi")
    val testSuffixes = withBoth.filter(pmod(col("doc"), lit(2L)) === 1)
      .select(col("doc").as("doc_a"), col("pos").as("pos_a"), col("__lo"), col("__hi"))
    def probe(nbr: String) = testSuffixes.filter(col(nbr).isNotNull)
      .join(sa.select(col("sa").as(nbr), col("doc").as("doc_b"), col("pos").as("pos_b")), Seq(nbr))
      .select("doc_a", "pos_a", "doc_b", "pos_b")
    val pairs = probe("__lo").unionByName(probe("__hi"))
      .join(lens.select(col("doc").as("doc_a"), col("len").as("len_a")), Seq("doc_a"))
      .join(lens.select(col("doc").as("doc_b"), col("len").as("len_b")), Seq("doc_b"))
    pairLcp(pairs, tables)
      .groupBy(col("doc_a"), col("pos_a"))
      .agg(max("lcp").as("lcp"))
      .filter(col("lcp") >= minLen)
      .select(((col("doc_a") - 1) / 2).cast("long").as("doc_id"), col("pos_a").as("pos"), col("lcp"))
      .orderBy("doc_id", "pos")
  }
}
