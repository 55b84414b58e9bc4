package graft.operators

import graft.functions.TextFunctions.tokenCount
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The LAST MILE of a training-data pipeline: exporting a curated corpus as
  * size-bounded shards with a verifiable manifest. The reference stops at
  * upserting vectors (`vectrekker/main.py:185`); a corpus that feeds a
  * training run ships as N files of ≈equal token mass plus a manifest the
  * loader (and any later audit) checks shard-by-shard.
  *
  * Shard assignment is deterministic and DISTRIBUTED: a document's shard is
  * `floor(global_start_offset / shardTokenBudget)` where the global offset
  * comes from [[Scan.cumSums]] (the two-pass Blelloch prefix scan — range
  * partition, per-partition partials, broadcast offsets), never a
  * single-partition window. Unlike [[Packing.packSequences]] documents are
  * NOT split across shards — a shard holds whole documents and overflows
  * its budget by at most one document, the standard export trade (loaders
  * re-chunk inside a shard; file boundaries must not cut a document).
  *
  * The manifest checksum is ORDER-SENSITIVE — md5 over the concatenation of
  * per-document `md5(text)` in ascending doc_id order — so a re-export that
  * reorders, drops, duplicates, or mutates any document inside a shard
  * changes that shard's line. Computed per shard group: the concatenation
  * is bounded by the shard budget (32 hex chars per document), not by the
  * corpus.
  */
object Export {

  /** Per-document shard assignment: (idCol, n_tok, start_off, shard_id).
    * One range-partitioned prefix scan; no global sort, no data-plane
    * collect.
    *
    * `countTokens` picks the token model the budget is denominated in —
    * whitespace [[tokenCount]] by default, or the vendored byte-level BPE
    * ([[graft.functions.TextFunctions.bpeTokenCount]]) when shards must be
    * sized in the unit a real training loader budgets (the reference's own
    * guard is tiktoken-based, `vectrekker/main.py:170,175`). Both are
    * codegen'd Catalyst expressions; the plan shape is identical.
    */
  def assignShards(df: DataFrame, idCol: String, textCol: String,
                   shardTokenBudget: Long, parts: Int = 32,
                   countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame = {
    require(shardTokenBudget > 0,
      s"shardTokenBudget must be positive, got $shardTokenBudget")
    val tc = df.select(col(idCol), countTokens(col(textCol)).cast("long").as("n_tok"))
    Scan.cumSums(tc, Seq(idCol), Seq("n_tok"), parts)
      .withColumn("start_off", col("cum_n_tok") - col("n_tok"))
      // non-negative offsets: integral `div` == the oracle's floor `//`,
      // exact at any offset magnitude (no double intermediate)
      .withColumn("shard_id",
        graft.functions.MathFunctions.longDiv(col("start_off"), lit(shardTokenBudget)))
      .select(col(idCol), col("n_tok"), col("start_off"), col("shard_id"))
  }

  /** The export manifest: one row per shard — document count, token mass,
    * id range, distinct sources, and the order-sensitive content checksum.
    * This is what a loader verifies before training and what an audit
    * re-derives from the shipped files; any divergence names the shard.
    *
    * Scale shape: one prefix scan for assignment, one hash aggregate on
    * shard_id. The checksum concatenation uses sort_array over the shard's
    * collected (doc_id, md5) pairs — bounded by the shard BUDGET (a config
    * constant), never the corpus; shards are the unit a single task is
    * sized to hold by construction.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
                    sourceCol: String, shardTokenBudget: Long,
                    parts: Int = 32,
                    countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame = {
    val assigned = assignShards(df, idCol, textCol, shardTokenBudget, parts, countTokens)
    manifestOf(
      df.select(col(idCol), col(sourceCol), md5(col(textCol)).as("__h"))
        .join(assigned, Seq(idCol)),
      idCol, sourceCol)
  }

  /** The manifest aggregate over pre-assigned rows (idCol, sourceCol, __h,
    * n_tok, shard_id) — shared by the batch path above and the
    * stream-maintained path ([[graft.streaming.StreamingExport]]) so the
    * two manifests agree by CONSTRUCTION, not by parallel implementations.
    */
  private[graft] def manifestOf(rows: DataFrame, idCol: String,
                                sourceCol: String): DataFrame =
    rows
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"),
        countDistinct(col(sourceCol)).as("n_sources"),
        // sort_array on struct(doc_id, h) orders by doc_id (first field);
        // the transform projects back to the hex digests in id order
        md5(concat_ws("", transform(
          sort_array(collect_list(struct(col(idCol), col("__h")))),
          x => x.getField("__h")))).as("checksum"))
      .select("shard_id", "n_docs", "n_tokens", "first_doc", "last_doc",
        "n_sources", "checksum")
      .orderBy("shard_id")

  /** Physically write the corpus as one directory per shard
    * (`outDir/shard_id=K/`), shard assignment identical to
    * [[shardManifest]]'s, and return the manifest of what was written.
    * `partitionBy` gives hive-style shard directories; within a shard the
    * writer task count follows the repartition on shard_id, so each shard's
    * rows land together (the loader reads one directory per shard).
    */
  def writeShards(df: DataFrame, idCol: String, textCol: String,
                  sourceCol: String, shardTokenBudget: Long,
                  outDir: String, parts: Int = 32): DataFrame = {
    // cached: the physical write and the manifest both consume the
    // assignment — without the cache the whole prefix-scan pipeline
    // (range shuffle + two passes) runs twice per export
    val assigned = assignShards(df, idCol, textCol, shardTokenBudget, parts).cache()
    df.join(assigned.select(col(idCol), col("shard_id")), Seq(idCol))
      .repartition(col("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(outDir)
    manifestOf(
      df.select(col(idCol), col(sourceCol), md5(col(textCol)).as("__h"))
        .join(assigned, Seq(idCol)),
      idCol, sourceCol)
  }

  /** CONTENT-DEFINED shard assignment — the CDC (content-defined chunking)
    * alternative to offset-based [[assignShards]]: a shard boundary falls
    * BEFORE every document whose content hash is below a threshold
    * (`substring(md5(text), 1, 2) < cutThresholdHex` — fixed-length
    * lowercase hex compares lexicographically ⇔ numerically, so the
    * predicate is bit-identical across engines), and a document's shard is
    * the running count of boundary docs up to and including itself (the
    * same two-pass prefix scan, summing the 0/1 cut indicator).
    *
    * Why: offset-based shards are token-exact but a mid-corpus edit shifts
    * every later offset — q224 measures the ripple (every downstream shard
    * re-ships). Content-defined boundaries depend only on the documents
    * themselves, so an insert/delete/mutation touches ONLY the shard(s)
    * containing it (unless the edited doc is itself a boundary). The cost
    * is shard-size variance: boundary gaps are geometric with mean
    * 256/threshold documents — the classic CDC trade (Muthitacharoen et
    * al., LBFS 2001), the same trick the anchor-sampled substring path
    * uses at character granularity.
    */
  def assignShardsCdc(df: DataFrame, idCol: String, textCol: String,
                      cutThresholdHex: String, parts: Int = 32): DataFrame = {
    require(cutThresholdHex.matches("[0-9a-f]{2}"),
      s"cutThresholdHex must be two lowercase hex chars, got '$cutThresholdHex'")
    val rows = df.select(col(idCol),
      tokenCount(col(textCol)).cast("long").as("n_tok"),
      when(substring(md5(col(textCol)), 1, 2) < lit(cutThresholdHex), 1L)
        .otherwise(0L).as("cut"))
    Scan.cumSums(rows, Seq(idCol), Seq("n_tok", "cut"), parts)
      .withColumn("start_off", col("cum_n_tok") - col("n_tok"))
      .withColumn("shard_id", col("cum_cut"))
      .select(col(idCol), col("n_tok"), col("start_off"), col("cut"), col("shard_id"))
  }

  /** TOKEN-AWARE content-defined boundaries — [[assignShardsCdc]] with the
    * cut probability scaled by document LENGTH: P(boundary before doc) =
    * min(1, n_tok / budget), so the boundary rate per TOKEN is constant
    * (1/budget) and MEAN shard token mass equals the budget regardless of
    * the document-length mix (the flat threshold's mean is docs-per-shard ×
    * average length — it drifts with the corpus). Gap VARIANCE stays
    * exponential (CV ≈ 1, measured 3867 ± 3586 at sf0.1/budget 4096 — the
    * plain-CDC property; TTTD-style min/max gap bounds are the standard
    * tightening if a deployment needs it). Documents of ≥ budget tokens
    * always cut (they isolate).
    *
    * The decision stays bit-identical across engines: the doc's 16-bit
    * content value hv = strpos-decoded first four md5 hex chars (pure
    * integer arithmetic over the hex alphabet — no engine-specific hex
    * parser), cut ⇔ hv · budget < n_tok · 65536, an exact integer
    * comparison. Edit locality is inherited from [[assignShardsCdc]]:
    * boundaries depend only on document content.
    */
  def assignShardsCdcTokenAware(df: DataFrame, idCol: String, textCol: String,
                                shardTokenBudget: Long, parts: Int = 32,
                                countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame = {
    require(shardTokenBudget > 0,
      s"shardTokenBudget must be positive, got $shardTokenBudget")
    val rows = df.select(col(idCol),
      countTokens(col(textCol)).cast("long").as("n_tok"),
      expr(hex4ValSql(s"md5($textCol)")).cast("long").as("__hv"))
      .withColumn("cut",
        when(col("__hv") * lit(shardTokenBudget) < col("n_tok") * lit(65536L), 1L)
          .otherwise(0L))
      .drop("__hv")
    Scan.cumSums(rows, Seq(idCol), Seq("n_tok", "cut"), parts)
      .withColumn("start_off", col("cum_n_tok") - col("n_tok"))
      .withColumn("shard_id", col("cum_cut"))
      .select(col(idCol), col("n_tok"), col("start_off"), col("cut"), col("shard_id"))
  }

  /** [[assignShardsCdcTokenAware]] with the MIN-threshold half of Eshghi &
    * Tang's TTTD tightening (the Two-Threshold Two-Divisor chunker,
    * HPL-2005-30): a cut CANDIDATE is suppressed when its token gap from
    * the PREVIOUS CANDIDATE (corpus start counts as a boundary) is below
    * `minGapTokens`. Because every surviving cut's previous candidate lies
    * at or after the previous surviving cut, this guarantees every
    * surviving cut-to-cut gap ≥ minGapTokens — a hard floor on shard mass
    * that kills the short-gap mass of the geometric distribution (the CV
    * reduction q235/PERF_r15 measure), while the decision stays a
    * function of candidate CONTENT + one lag — NOT of the previous
    * SURVIVING cut, so suppression never cascades and edit locality
    * survives: downstream gaps are offset DIFFERENCES (an upstream edit
    * shifts both ends equally), so only the first candidate gap spanning
    * the edit re-decides.
    *
    * The MAX-threshold half (force a cut at Tmax via a backup divisor) is
    * NOT implemented: its forced cuts are positioned relative to the last
    * SURVIVING cut — inherently sequential state that no fixed number of
    * window passes expresses; Eshghi & Tang run it as a linear scan. At
    * document granularity the residual risk is a long run of large docs
    * with no candidate — bounded in expectation by the geometric gap, and
    * recorded honestly here rather than approximated silently.
    *
    * Scale shape: one corpus prefix scan ([[Scan.cumSums]] over n_tok +
    * candidate flag), then everything else lives on the CANDIDATE relation
    * (corpus_tokens / budget rows — 1/4096th of the corpus): an
    * adjacent-rank self-join for the lag, a second (candidate-sized)
    * prefix scan for surviving-cut ranks, and one equi-join back to the
    * corpus rows on the inclusive candidate index. No single-partition
    * window touches a data-sized relation.
    */
  def assignShardsCdcTokenAwareMinGap(df: DataFrame, idCol: String,
                                      textCol: String, shardTokenBudget: Long,
                                      minGapTokens: Long,
                                      parts: Int = 32,
                                      countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame = {
    require(shardTokenBudget > 0,
      s"shardTokenBudget must be positive, got $shardTokenBudget")
    require(minGapTokens >= 0 && minGapTokens < shardTokenBudget * 16,
      s"minGapTokens must be in [0, 16*budget), got $minGapTokens")
    val rows = df.select(col(idCol),
      countTokens(col(textCol)).cast("long").as("n_tok"),
      expr(hex4ValSql(s"md5($textCol)")).cast("long").as("__hv"))
      .withColumn("cand",
        when(col("__hv") * lit(shardTokenBudget) < col("n_tok") * lit(65536L), 1L)
          .otherwise(0L))
      .drop("__hv")
    val cum = Scan.cumSums(rows, Seq(idCol), Seq("n_tok", "cand"), parts)
      .withColumn("start_off", col("cum_n_tok") - col("n_tok"))
    minGapSurvivorShardIds(cum, idCol, minGapTokens, parts)
  }

  /** The min-gap SURVIVOR-CUT finish, decoupled from how the global
    * cumulative sums were produced: `cum` carries per-doc (idCol, n_tok,
    * start_off, cand, cum_cand) — from the batch prefix scan above or from
    * the stream-maintained artifact ([[graft.streaming.StreamingExport]]'s
    * min-gap twin), so streamed ≡ batch is true by shared construction,
    * not by parallel reimplementation. All work below lives on the
    * CANDIDATE relation (corpus_tokens/budget rows).
    */
  private[graft] def minGapSurvivorShardIds(cum: DataFrame, idCol: String,
                                            minGapTokens: Long,
                                            parts: Int): DataFrame = {
    // the candidate relation: inclusive candidate index + cut offset
    val cands = cum.filter(col("cand") === 1L)
      .select(col("cum_cand").as("__ci"), col("start_off").as("__coff"))
    // lag by adjacent-rank self-join (no single-partition window); corpus
    // start is a boundary, so the first candidate lags offset 0
    val lagged = cands.join(
        cands.select((col("__ci") + 1L).as("__ci"), col("__coff").as("__poff")),
        Seq("__ci"), "left")
      .withColumn("survive",
        when(col("__coff") - coalesce(col("__poff"), lit(0L)) >= lit(minGapTokens), 1L)
          .otherwise(0L))
    // surviving-cut rank per candidate (candidate-sized prefix scan), then
    // every doc reads the rank of the last candidate at-or-before it
    val ranked = Scan.cumSums(lagged.select(col("__ci"), col("survive")),
      Seq("__ci"), Seq("survive"), parts)
      .select(col("__ci"), col("cum_survive").as("__sr"))
    // shard START offsets ride along (param-sized: one row per surviving
    // cut + the implicit corpus-start shard 0) so downstream bounds can
    // position within the shard without a corpus-wide window
    val starts = lagged.filter(col("survive") === 1L)
      .join(ranked, Seq("__ci"))
      .select(col("__sr").as("shard_id"), col("__coff").as("shard_start"))
    cum.join(ranked, cum("cum_cand") === ranked("__ci"), "left")
      .withColumn("shard_id", coalesce(col("__sr"), lit(0L)))
      .join(starts, Seq("shard_id"), "left")
      .withColumn("shard_start", coalesce(col("shard_start"), lit(0L)))
      .select(col(idCol), col("n_tok"), col("start_off"), col("cand"),
        col("shard_id"), col("shard_start"))
  }

  /** BOTH-SIDED shard-size bounds (the TTTD max-side decision, r15 verdict
    * task 8 — built, not wontfixed, but as a COMPOSITION rather than
    * Eshghi & Tang's backup divisor): [[assignShardsCdcTokenAwareMinGap]]
    * floors every content-defined shard at `minGapTokens`; this splits any
    * shard that still exceeds `maxShardTokens` at FIXED OFFSETS relative to
    * its own (content-defined) start — `sub_id = (start_off − shard_start)
    * / maxShardTokens`. The piece (shard_id, sub_id) then holds docs whose
    * starts lie in one maxShardTokens window, so piece mass <
    * maxShardTokens + one document — a HARD upper bound.
    *
    * Honesty note vs the paper: E&T's backup divisor places the forced cut
    * at a content position chosen by a second hash threshold, measured from
    * the last surviving cut — sequential state no fixed number of window
    * passes expresses (the r15 residual). This composition instead forces
    * offset cuts WITHIN an already-decided shard, so sub-boundaries are
    * content-defined only at their shard's head. The properties that
    * matter at 100 TB survive: both bounds hard, everything declarative
    * (two prefix scans + param-sized joins), and edit/deletion locality
    * holds at shard granularity — sub-cuts are shard-local, so an edit
    * re-derives sub-boundaries only inside the shards it already changed.
    */
  def assignShardsCdcTokenAwareBounded(df: DataFrame, idCol: String,
                                       textCol: String, shardTokenBudget: Long,
                                       minGapTokens: Long, maxShardTokens: Long,
                                       parts: Int = 32,
                                       countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame = {
    require(maxShardTokens >= shardTokenBudget,
      s"maxShardTokens must be >= budget, got $maxShardTokens < $shardTokenBudget")
    assignShardsCdcTokenAwareMinGap(df, idCol, textCol, shardTokenBudget,
      minGapTokens, parts, countTokens)
      .withColumn("sub_id", graft.functions.MathFunctions.longDiv(
        col("start_off") - col("shard_start"), lit(maxShardTokens)))
  }

  /** CONTENT-DEFINED sub-cuts — the TTTD backup-divisor refinement of
    * [[assignShardsCdcTokenAwareBounded]] (round-17 backlog item built
    * early): instead of splitting an oversized shard at fixed offsets,
    * split at BACKUP CUT CANDIDATES — docs passing Eshghi & Tang's weaker
    * second divisor (here: cut probability DOUBLED, `hv·budget <
    * n_tok·2·65536`; every main candidate is also a backup candidate, the
    * paper's divisor-nesting property). Window approximation, stated
    * plainly: the shard's local offset range is tiled into fixed
    * `maxShardTokens` windows; every non-tail window contributes one
    * boundary — the LAST backup candidate starting in it, or the window's
    * end as the content-blind fallback — and a doc's piece is the count of
    * boundaries at-or-before its local offset. E&T scan from the last
    * SURVIVING cut (sequential state); fixed windows trade that for
    * declarative shape at the cost of a 2× bound: consecutive boundaries
    * land in consecutive windows, so every (shard, sub) piece holds doc
    * starts spanning < 2·maxShardTokens — piece mass < 2·maxShardTokens +
    * one document, content-aligned wherever a backup candidate exists.
    *
    * Scale shape: the boundary relation is corpus_tokens/maxShardTokens
    * rows (window count), built by one GROUP BY; piece assignment is a
    * shard-keyed join against each shard's own few boundaries + one
    * per-doc aggregate. Edit locality: boundaries are shard-local, so an
    * edit re-derives sub-boundaries only inside shards the min-gap CDC
    * already re-decided.
    */
  def assignShardsCdcTokenAwareTttd(df: DataFrame, idCol: String,
                                    textCol: String, shardTokenBudget: Long,
                                    minGapTokens: Long, maxShardTokens: Long,
                                    parts: Int = 32,
                                    countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame = {
    require(maxShardTokens >= shardTokenBudget,
      s"maxShardTokens must be >= budget, got $maxShardTokens < $shardTokenBudget")
    val assigned = assignShardsCdcTokenAwareMinGap(df, idCol, textCol,
      shardTokenBudget, minGapTokens, parts, countTokens)
    val backup = df.select(col(idCol),
        countTokens(col(textCol)).cast("long").as("__nt2"),
        expr(hex4ValSql(s"md5($textCol)")).cast("long").as("__hv"))
      .withColumn("__bkp",
        when(col("__hv") * lit(shardTokenBudget) < col("__nt2") * lit(2L * 65536L), 1L)
          .otherwise(0L))
      .select(col(idCol), col("__bkp"))
    tttdPieceIds(assigned.join(backup, Seq(idCol)), idCol, maxShardTokens)
  }

  /** The backup-divisor PIECE finish decoupled from how the min-gap shard
    * assignment was produced (the [[minGapSurvivorShardIds]] factoring
    * pattern): `withBkp` carries (idCol, n_tok, start_off, cand, shard_id,
    * shard_start, __bkp) — batch-assigned or stream-maintained — so the
    * streamed twin calls this SAME tail and streamed ≡ batch by shared
    * construction.
    */
  private[graft] def tttdPieceIds(withBkp: DataFrame, idCol: String,
                                  maxShardTokens: Long): DataFrame = {
    val D = graft.functions.MathFunctions.longDiv _
    val docs2 = withBkp
      .withColumn("__loff", col("start_off") - col("shard_start"))
      .withColumn("__win", D(col("__loff"), lit(maxShardTokens)))
    val maxWin = docs2.groupBy("shard_id").agg(max("__win").as("__mw"))
    // one boundary per NON-TAIL window: last backup candidate starting in
    // it, else the window end (the fixed-offset fallback). Strictly inside
    // the shard (__loff > 0): the shard's FIRST doc is itself a backup
    // candidate by divisor nesting, and a "cut" at the shard start is a
    // no-op that would only shift piece labels and leave piece 0 empty
    val bkpBnd = docs2.filter(col("__bkp") === 1L && col("__loff") > 0L)
      .groupBy("shard_id", "__win").agg(max("__loff").as("__bpos"))
    // distinct: window w's content-blind fallback at (w+1)·maxShardTokens
    // coincides with window w+1's last backup candidate when that candidate
    // starts exactly at the window boundary — counting the position twice
    // would skip a sub_id and leave an empty piece (ADVICE r16)
    val allBnd = maxWin.filter(col("__mw") > 0L)
      .select(col("shard_id"), explode(sequence(lit(0L), col("__mw") - 1L)).as("__win"))
      .join(bkpBnd, Seq("shard_id", "__win"), "left")
      .withColumn("__bpos",
        coalesce(col("__bpos"), (col("__win") + 1L) * lit(maxShardTokens)))
      .select("shard_id", "__bpos").distinct()
    docs2.join(allBnd, Seq("shard_id"), "left")
      .withColumn("__le",
        when(col("__bpos").isNotNull && col("__bpos") <= col("__loff"), 1L).otherwise(0L))
      .groupBy(col(idCol), col("n_tok"), col("start_off"), col("cand"),
        col("shard_id"), col("shard_start"))
      .agg(sum("__le").as("sub_id"))
      .select(col(idCol), col("n_tok"), col("start_off"), col("cand"),
        col("shard_id"), col("sub_id"))
  }

  /** [[shardManifest]] over the TTTD backup-divisor boundaries. */
  def shardManifestCdcTokenAwareTttd(df: DataFrame, idCol: String,
                                     textCol: String, sourceCol: String,
                                     shardTokenBudget: Long,
                                     minGapTokens: Long, maxShardTokens: Long,
                                     parts: Int = 32,
                                     countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame =
    manifestBySub(
      assignShardsCdcTokenAwareTttd(df, idCol, textCol, shardTokenBudget,
        minGapTokens, maxShardTokens, parts, countTokens),
      df, idCol, textCol, sourceCol)

  private def manifestBySub(assigned: DataFrame, df: DataFrame, idCol: String,
                            textCol: String, sourceCol: String): DataFrame =
    manifestBySubOf(
      df.select(col(idCol), col(sourceCol), md5(col(textCol)).as("__h"))
        .join(assigned, Seq(idCol)),
      idCol, sourceCol)

  /** [[manifestOf]] keyed (shard_id, sub_id) — `rows` already carry the
    * id, source, content hash `__h`, n_tok and both keys (batch join or
    * stream-maintained).
    */
  private[graft] def manifestBySubOf(rows: DataFrame, idCol: String,
                                     sourceCol: String): DataFrame =
    rows.groupBy("shard_id", "sub_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"),
        countDistinct(col(sourceCol)).as("n_sources"),
        md5(concat_ws("", transform(
          sort_array(collect_list(struct(col(idCol), col("__h")))),
          x => x.getField("__h")))).as("checksum"))
      .select("shard_id", "sub_id", "n_docs", "n_tokens", "first_doc",
        "last_doc", "n_sources", "checksum")
      .orderBy("shard_id", "sub_id")

  /** [[shardManifest]] over the both-sided-bounded boundaries — the manifest
    * keyed (shard_id, sub_id); consumers treat the pair as the shard key.
    */
  def shardManifestCdcTokenAwareBounded(df: DataFrame, idCol: String,
                                        textCol: String, sourceCol: String,
                                        shardTokenBudget: Long,
                                        minGapTokens: Long, maxShardTokens: Long,
                                        parts: Int = 32,
                                        countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame =
    manifestBySub(
      assignShardsCdcTokenAwareBounded(df, idCol, textCol, shardTokenBudget,
        minGapTokens, maxShardTokens, parts, countTokens),
      df, idCol, textCol, sourceCol)

  /** [[shardManifest]] over min-gap-bounded token-aware CDC boundaries. */
  def shardManifestCdcTokenAwareMinGap(df: DataFrame, idCol: String,
                                       textCol: String, sourceCol: String,
                                       shardTokenBudget: Long,
                                       minGapTokens: Long,
                                       parts: Int = 32,
                                       countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame = {
    val assigned = assignShardsCdcTokenAwareMinGap(
      df, idCol, textCol, shardTokenBudget, minGapTokens, parts, countTokens)
    manifestOf(
      df.select(col(idCol), col(sourceCol), md5(col(textCol)).as("__h"))
        .join(assigned, Seq(idCol)),
      idCol, sourceCol)
  }

  /** 16-bit integer from the first four hex chars of `hexExpr` via strpos
    * arithmetic — one expression string, valid verbatim in Spark SQL AND
    * DuckDB (both have 1-based instr/strpos semantics via `instr`), so the
    * Spark side and the oracle share it token for token.
    */
  def hex4ValSql(hexExpr: String): String = {
    def nib(i: Int, w: Long) =
      s"(instr('0123456789abcdef', substr($hexExpr, $i, 1)) - 1) * $w"
    s"(${nib(1, 4096L)} + ${nib(2, 256L)} + ${nib(3, 16L)} + ${nib(4, 1L)})"
  }

  /** [[shardManifest]] over token-aware content-defined boundaries. */
  def shardManifestCdcTokenAware(df: DataFrame, idCol: String, textCol: String,
                                 sourceCol: String, shardTokenBudget: Long,
                                 parts: Int = 32,
                                 countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame = {
    val assigned = assignShardsCdcTokenAware(df, idCol, textCol, shardTokenBudget, parts, countTokens)
    manifestOf(
      df.select(col(idCol), col(sourceCol), md5(col(textCol)).as("__h"))
        .join(assigned, Seq(idCol)),
      idCol, sourceCol)
  }

  /** [[shardManifest]] over content-defined boundaries. */
  def shardManifestCdc(df: DataFrame, idCol: String, textCol: String,
                       sourceCol: String, cutThresholdHex: String,
                       parts: Int = 32): DataFrame = {
    val assigned = assignShardsCdc(df, idCol, textCol, cutThresholdHex, parts)
    manifestOf(
      df.select(col(idCol), col(sourceCol), md5(col(textCol)).as("__h"))
        .join(assigned, Seq(idCol)),
      idCol, sourceCol)
  }

  /** Incremental re-export planning: compare two manifests and report per
    * shard what a shipper must do — `added` (new corpus grew a shard),
    * `changed` (checksum differs: re-ship), `removed` (gone), `unchanged`
    * (skip). Under APPEND-ONLY growth (new documents get higher ids — the
    * id-ordered shard assignment's contract) every already-full shard's
    * offsets are untouched, so the delta is exactly the old TAIL shard
    * (its partial window gained documents) plus the new shards — the
    * incremental-export win this report quantifies. Manifest-sized
    * (config-scale) join, never touches the corpus.
    */
  def manifestDelta(oldManifest: DataFrame, newManifest: DataFrame): DataFrame = {
    val o = oldManifest.select(col("shard_id"), col("n_docs").as("n_docs_old"),
      col("checksum").as("checksum_old"))
    val n = newManifest.select(col("shard_id"), col("n_docs").as("n_docs_new"),
      col("checksum").as("checksum_new"))
    o.join(n, Seq("shard_id"), "full_outer")
      .withColumn("status",
        when(col("checksum_old").isNull, "added")
          .when(col("checksum_new").isNull, "removed")
          .when(col("checksum_old") === col("checksum_new"), "unchanged")
          .otherwise("changed"))
      .select("shard_id", "status", "n_docs_old", "n_docs_new",
        "checksum_old", "checksum_new")
      .orderBy("shard_id")
  }

  /** CONTENT-ADDRESSED manifest delta — the comparison a deduplicating
    * shipper actually runs: a shard is re-shipped iff its CHECKSUM is
    * absent from the old manifest, dropped iff its checksum no longer
    * appears in the new one, and skipped when present in both — membership
    * by content, not by ordinal shard id. This is what makes CDC boundaries
    * pay off under DELETION: removing a document renumbers every later
    * ordinal shard id (so [[manifestDelta]]'s id-keyed join reports them
    * all "changed"), but their BYTES are identical — the content-keyed
    * delta re-ships only the shard(s) that actually contained the deleted
    * document (plus the merge when the deleted doc was itself a boundary).
    * Offset-based shards, by contrast, genuinely change content from the
    * first deletion onward — this report quantifies that ripple honestly.
    *
    * Checksums are grouped (count per side) so coincidental duplicate shard
    * contents stay exact rather than multiplying through the join.
    * Manifest-sized (config-scale) aggregate + join, never touches the
    * corpus.
    *
    * Status contract (ADVICE r15): "keep" means the CONTENT is present on
    * both sides — it deliberately does NOT imply n_shards_old ==
    * n_shards_new. The model is a content-addressed store where one stored
    * copy serves any number of manifest references; a consumer that
    * instead stores one physical file per shard must ALSO compare the
    * n_shards_old/n_shards_new columns (emitted for exactly this purpose)
    * to detect reference-count changes of identical-content shards.
    */
  def manifestDeltaByContent(oldManifest: DataFrame,
                             newManifest: DataFrame): DataFrame = {
    val o = oldManifest.groupBy("checksum").agg(
      count(lit(1)).as("n_shards_old"), min("first_doc").as("first_doc_old"))
    val n = newManifest.groupBy("checksum").agg(
      count(lit(1)).as("n_shards_new"), min("first_doc").as("first_doc_new"))
    o.join(n, Seq("checksum"), "full_outer")
      .withColumn("status",
        when(col("n_shards_old").isNull, "reship")
          .when(col("n_shards_new").isNull, "drop")
          .otherwise("keep"))
      .select("checksum", "status", "n_shards_old", "n_shards_new",
        "first_doc_old", "first_doc_new")
      .orderBy("checksum")
  }

  /** Re-derive the manifest FROM a shards directory written by
    * [[writeShards]] — the audit a consumer runs on received files. Equal
    * output to the producer's manifest ⇔ the shipped bytes hold exactly the
    * intended corpus (see the checksum contract above).
    */
  def auditShards(spark: SparkSession, shardsDir: String, idCol: String,
                  textCol: String, sourceCol: String,
                  shardTokenBudget: Long, parts: Int = 32): DataFrame =
    shardManifest(
      spark.read.parquet(shardsDir).drop("shard_id"),
      idCol, textCol, sourceCol, shardTokenBudget, parts)
}
