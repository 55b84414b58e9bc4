package graft.operators

import graft.functions.MathFunctions.floorRound
import graft.functions.TextFunctions.tokenCount
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Sequence packing — the step after curation that fills fixed-capacity
  * training sequences (bins of `capacity` tokens) from variable-length
  * documents ("concat and chunk", the packing used by GPT-3 — Brown et al.
  * 2020 §2.2 — and T5 — Raffel et al. 2020 §2.2: documents cross sequence
  * boundaries rather than leaving pad waste). The reference pipeline stops
  * at upserting vectors (`vectrekker/main.py:185`); a training-data engine
  * must also answer what the actual training sequences look like.
  *
  * Two scale shapes for the same semantics:
  *
  *  - [[packBins]] (q61): packing PER SHARD (`shardCol`) — each shard's
  *    window cumsum is independent, so the plan is one hash shuffle on the
  *    shard key and never a global sort. Per-shard bins are what
  *    distributed pipelines ship anyway (one output file per shard).
  *    Output: per-document bin assignment.
  *  - [[packSequences]] (q215): ONE GLOBAL pack order (ascending id) when
  *    the run wants corpus-wide sequence ids — the global token offset is
  *    [[Scan.cumSums]], the two-pass Blelloch prefix scan (range-partition
  *    + partition partials + broadcast offsets), never a single-partition
  *    window over the corpus. Output: the per-SEQUENCE report (mix, doc
  *    boundaries, fill).
  *
  * Both are deterministic given (order key): no greedy bin-packing
  * heuristic (whose result depends on iteration order and doesn't
  * distribute) — the concat-and-chunk form is what large runs actually use
  * AND is exactly reproducible across engines.
  */
object Packing {

  /** Assign each document its bin and in-bin start offset.
    * Output columns: all of `df` plus `bin_id` (0-based within shard) and
    * `bin_offset` (token offset of the doc's first token within its bin).
    */
  def packBins(df: DataFrame, shardCol: String, orderCol: String,
               tokenCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__start", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("__start") / capacity).cast("long"))
      .withColumn("bin_offset", (col("__start") % capacity).cast("long"))
      .drop("__start")
  }

  /** Per-sequence packing report under ONE GLOBAL pack order (ascending
    * `idCol`, tie-free by contract): (seq_id, n_docs, n_starts, n_tokens,
    * fill) — documents overlapping the sequence, documents STARTING in it
    * (boundary count), tokens it holds, and its fill ratio (1.0 everywhere
    * but the tail by construction — asserting that is the point of
    * publishing it).
    *
    * Each document explodes to its spanned sequence ids (⌈len/seqLen⌉ + 1
    * rows at most — bounded by DOCUMENT length, not corpus size); the
    * report is one slim hash aggregate on seq_id.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Int, parts: Int = 32, roundTo: Int = 4,
                    countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val tc = df.select(col(idCol), countTokens(col(textCol)).cast("long").as("n_tok"))
    val cum = Scan.cumSums(tc, Seq(idCol), Seq("n_tok"), parts)
    val L = lit(seqLen.toLong)
    val spans = cum
      // a 0-token doc (reachable under a BPE countTokens on degenerate
      // text; whitespace counting is always >= 1) occupies no tokens and
      // must emit NO spans — without the filter end_off = start_off - 1
      // and Spark's sequence() would yield a DESCENDING phantom range
      // where the oracle's generate_series is empty
      .filter(col("n_tok") > 0)
      .withColumn("start_off", col("cum_n_tok") - col("n_tok"))
      .withColumn("end_off", col("cum_n_tok") - lit(1L))
      // non-negative offsets: integral `div` == the oracle's floor `//`,
      // exact at any offset magnitude (no double intermediate)
      .withColumn("seq_id", explode(sequence(
        graft.functions.MathFunctions.longDiv(col("start_off"), L),
        graft.functions.MathFunctions.longDiv(col("end_off"), L))))
    spans
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("start_off") >= col("seq_id") * L, 1L).otherwise(0L)).as("n_starts"),
        sum(least(col("end_off"), (col("seq_id") + 1) * L - 1) -
          greatest(col("start_off"), col("seq_id") * L) + 1).as("n_tokens"))
      .withColumn("fill", floorRound(col("n_tokens").cast("double") / L.cast("double"), roundTo))
      .select("seq_id", "n_docs", "n_starts", "n_tokens", "fill")
      .orderBy("seq_id")
  }

  /** Per-(sequence, document) token spans under concat-and-chunk packing —
    * the provenance relation an ERASURE audit needs: which packed training
    * sequences physically hold a given document's tokens. `shardTokenBudget
    * <= 0` packs the WHOLE corpus in one global order (q215's layout: the
    * global Blelloch prefix scan, sequences numbered corpus-wide);
    * `shardTokenBudget > 0` packs WITHIN token-aware CDC shards (q227's
    * content-pure cut flag): sequences restart at every shard boundary and
    * the shard is keyed by its FIRST doc id — a content-stable key, so
    * shard renumbering after a deletion (q234's ordinal problem) does not
    * masquerade as change. Shard-local packing is the erasure-friendly
    * layout: a re-pack after deletions rewrites only the shards that held
    * a deleted doc, where the global layout shifts every sequence
    * downstream of the first deletion.
    *
    * Output: (shard_key, seq_id, idCol, s, e) — within-sequence inclusive
    * token range [s, e] of the doc's overlap. Scale: one corpus prefix
    * scan (global) or one window per CDC shard (local) + the span explode,
    * bounded by ⌈len/seqLen⌉ + 1 rows per document. Honesty note on the
    * shard-local window: shard mass is EXPECTED-bounded (cut gaps are
    * geometric with mean ≈ budget), not hard-bounded — a degenerate
    * no-candidate corpus funnels one shard through one window partition,
    * the same residual the TTTD max-side bounds (q242/q246) exist to cap;
    * compose with [[Export.assignShardsCdcTokenAwareBounded]] keys when
    * that matters.
    */
  def packedSeqSpans(df: DataFrame, idCol: String, textCol: String,
                     seqLen: Int, shardTokenBudget: Long = 0L,
                     parts: Int = 32,
                     countTokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column = tokenCount): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val L = lit(seqLen.toLong)
    val tc = df.select(col(idCol),
      countTokens(col(textCol)).cast("long").as("n_tok"),
      expr(Export.hex4ValSql(s"md5($textCol)")).cast("long").as("__hv"))
    val offs =
      if (shardTokenBudget <= 0L)
        Scan.cumSums(tc.drop("__hv"), Seq(idCol), Seq("n_tok"), parts)
          .withColumn("shard_key", lit(0L))
          .withColumn("off", col("cum_n_tok") - col("n_tok"))
      else {
        val cut = tc.withColumn("cand",
          when(col("__hv") * lit(shardTokenBudget) < col("n_tok") * lit(65536L), 1L)
            .otherwise(0L)).drop("__hv")
        val sharded = Scan.cumSums(cut.select(col(idCol), col("cand")),
          Seq(idCol), Seq("cand"), parts)
          .select(col(idCol), col("cum_cand").as("__shard_ord"))
          .join(cut.drop("cand"), Seq(idCol))
        val byShard = Window.partitionBy("__shard_ord").orderBy(idCol)
        sharded
          .withColumn("shard_key", min(col(idCol)).over(
            Window.partitionBy("__shard_ord")))
          .withColumn("off", coalesce(
            sum("n_tok").over(byShard.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
      }
    val D = graft.functions.MathFunctions.longDiv _
    offs.filter(col("n_tok") > 0) // see packSequences: 0-token docs span nothing
      .withColumn("__e", col("off") + col("n_tok") - 1L)
      .withColumn("seq_id", explode(sequence(D(col("off"), L), D(col("__e"), L))))
      .select(col("shard_key"), col("seq_id"), col(idCol),
        (greatest(col("off"), col("seq_id") * L) - col("seq_id") * L).as("s"),
        (least(col("__e"), (col("seq_id") + 1) * L - 1) - col("seq_id") * L).as("e"))
  }

  /** ERASURE-propagation report over packed sequences (the GDPR question
    * q234 answers for export shards, asked of the PACKED artifact): given
    * the pre- and post-erasure span relations ([[packedSeqSpans]], same
    * layout parameters), classify every sequence by CONTENT fingerprint —
    * `kept` (byte-identical composition), `changed`, `removed`, `added` —
    * and flag the sequences that physically CONTAINED an erased doc's
    * tokens. One summary row per (status, contains_erased): under the
    * global layout `changed` spans everything downstream of the first
    * erasure while `contains_erased` stays erasure-sized — the measured
    * argument for shard-local packing, where `changed` collapses to the
    * affected shards.
    *
    * Fingerprints are order-pinned (doc-id-sorted `id:s:e` list, md5), so
    * the classification is oracle-reproducible; everything aggregates to
    * sequence granularity before the join (corpus_tokens/seqLen rows).
    */
  def packedErasureDelta(oldSpans: DataFrame, newSpans: DataFrame,
                         erased: DataFrame, idCol: String): DataFrame = {
    def fps(spans: DataFrame) = spans.groupBy("shard_key", "seq_id")
      .agg(md5(concat_ws(",", transform(
        sort_array(collect_list(struct(col(idCol), col("s"), col("e")))),
        x => concat_ws(":", x.getField(idCol).cast("string"),
          x.getField("s").cast("string"), x.getField("e").cast("string")))))
        .as("fp"))
    val contains = oldSpans
      .join(erased.select(col(idCol)), Seq(idCol), "left_semi")
      .select("shard_key", "seq_id").distinct()
      .withColumn("__ce", lit(1L))
    fps(oldSpans).withColumnRenamed("fp", "fp_old")
      .join(fps(newSpans).withColumnRenamed("fp", "fp_new"),
        Seq("shard_key", "seq_id"), "full_outer")
      .join(contains, Seq("shard_key", "seq_id"), "left")
      .withColumn("status",
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "kept")
          .otherwise("changed"))
      .withColumn("contains_erased", coalesce(col("__ce"), lit(0L)))
      .groupBy("status", "contains_erased")
      .agg(count(lit(1)).as("n_seqs"))
      .orderBy("status", "contains_erased")
  }
}
