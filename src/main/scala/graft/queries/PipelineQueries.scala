package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import graft.operators.Upsert
import graft.pipeline.Delta
import graft.streaming.StreamingAgg
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** The reference's own pipeline semantics exercised on the relational
  * fixtures so they stay DuckDB-oracle-checkable: keyed upsert
  * (SURVEY.md §2.3 C1, reference `vectrekker/main.py:113-123,185`),
  * incremental mtime delta (J1+P2, `main.py:143-147`), the streaming analog
  * (§2.7), and the multimodal binary-column plumbing.
  */
object PipelineQueries {

  def all: ListMap[String, Q] = ListMap(
    "q29_upsert_merge" -> Q(
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val base = cust.select(col("c_custkey"), col("c_acctbal")).withColumn("version", lit(1L))
        val upd = cust.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"), (col("c_acctbal") + lit(100.0)).as("c_acctbal"))
          .withColumn("version", lit(2L))
        Upsert.merge(base, upd, Seq("c_custkey"), "version")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, version FROM (
             |  SELECT c_custkey, c_acctbal, version,
             |    row_number() OVER (PARTITION BY c_custkey ORDER BY version DESC, src DESC) AS rn
             |  FROM (
             |    SELECT c_custkey, c_acctbal, CAST(1 AS BIGINT) AS version, 0 AS src FROM customer
             |    UNION ALL
             |    SELECT c_custkey, c_acctbal + CAST(100.0 AS DOUBLE), CAST(2 AS BIGINT), 1
             |    FROM customer WHERE c_custkey % 10 = 0))
             |WHERE rn = 1 ORDER BY c_custkey""".stripMargin)),

    // The FULL sync maintenance algebra relationally (r17 verdict task 2's
    // oracle face): a standing index + state cache, one new scan where some
    // files changed (%10=0: newer mtime, new content) and some vanished
    // (%7=0) — changed rows UPSERT (J1+P2 delta → C1 merge), vanished rows
    // DELETE (Delta.deleted anti-join), exactly the operator composition
    // Sync.run performs against the vector index. The oracle recomputes the
    // surviving merged state from scratch; hash equality = incremental
    // upsert+delete ≡ rebuild.
    "q262_sync_delete_propagation" -> Q(
      (s, dir) => {
        val o  = Tables.orders(s, dir)
        val mt = unix_timestamp(col("o_orderdate"))
        // yesterday: every order indexed at version = epoch(o_orderdate)
        val index0 = o.select(col("o_orderkey").as("key"),
          col("o_totalprice").as("val"), mt.as("version"))
        val cache = o.select(col("o_orderkey").as("key"), mt.as("last_edit_time"))
        // today's scan: %7=0 deleted; %10=0 edited (+10 s, value +100)
        val scan = o.filter(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey").as("key"),
            (mt + when(col("o_orderkey") % 10 === 0, 10L).otherwise(0L)).as("mtime"),
            (col("o_totalprice") +
              when(col("o_orderkey") % 10 === 0, 100.0).otherwise(0.0)).as("val"))
        val changed = Delta.changed(scan, cache, keyCol = "key", mtimeCol = "mtime")
        val merged = Upsert.merge(index0,
          changed.select(col("key"), col("val"), col("mtime").as("version")),
          Seq("key"), "version")
        val gone = Delta.deleted(scan, cache, keyCol = "key")
        merged.join(gone.select("key"), Seq("key"), "left_anti")
          .select("key", "val", "version")
          .orderBy("key")
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey AS key, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS mt,
             |    o_totalprice AS val
             |  FROM orders),
             |scan AS (
             |  SELECT key,
             |    mt + CASE WHEN key % 10 = 0 THEN 10 ELSE 0 END AS mtime,
             |    val + CASE WHEN key % 10 = 0 THEN CAST(100.0 AS DOUBLE)
             |              ELSE CAST(0.0 AS DOUBLE) END AS val
             |  FROM o WHERE key % 7 <> 0),
             |merged AS (
             |  SELECT key, val, version FROM (
             |    SELECT key, val, version,
             |      row_number() OVER (PARTITION BY key ORDER BY version DESC, src DESC) AS rn
             |    FROM (
             |      SELECT key, val, mt AS version, 0 AS src FROM o
             |      UNION ALL
             |      SELECT s.key, s.val, s.mtime AS version, 1 AS src
             |      FROM scan s JOIN o c ON s.key = c.key
             |      WHERE s.mtime > c.mt))
             |  WHERE rn = 1)
             |SELECT m.key, m.val, m.version FROM merged m
             |WHERE m.key NOT IN (
             |  SELECT c.key FROM o c WHERE c.key NOT IN (SELECT key FROM scan))
             |ORDER BY m.key""".stripMargin)),

    "q30_incremental_delta" -> Q(
      (s, dir) => {
        // orders as the "scan": key = o_orderkey, mtime = epoch(o_orderdate).
        // cache covers keys %3=0; odd keys among them are stale by 10s.
        val scan = Tables.orders(s, dir).select(
          col("o_orderkey").as("key"),
          unix_timestamp(col("o_orderdate")).as("mtime"))
        val cache = scan.filter(col("key") % 3 === 0)
          .select(col("key"), (col("mtime") - (col("key") % 2) * 10).as("last_edit_time"))
        Delta.changed(scan, cache, keyCol = "key", mtimeCol = "mtime")
          .orderBy("key")
      },
      Some("""WITH scan AS (
             |  SELECT o_orderkey AS key, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS mtime FROM orders),
             |cache AS (
             |  SELECT key, mtime - (key % 2) * 10 AS last_edit_time FROM scan WHERE key % 3 = 0)
             |SELECT s.key, s.mtime FROM scan s LEFT JOIN cache c ON s.key = c.key
             |WHERE s.mtime > coalesce(c.last_edit_time, 0)
             |ORDER BY s.key""".stripMargin)),

    // Stateful streaming sessionization (flatMapGroupsWithState, AvailableNow)
    // — same oracle as the batch q36: the streaming result must equal it.
    "q37_stream_sessions" -> Q(
      (s, dir) => graft.streaming.Sessionize.streaming(s, dir, gapMinutes = 30),
      Some(EventQueries.SessionizeOracle)),

    "q31_stream_monthly" -> Q(
      (s, dir) => StreamingAgg.monthlyOrderStats(s, dir),
      Some(s"""SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
             |  ${graft.functions.MathFunctions.floorRoundSql("sum(o_totalprice)", 2)} AS total
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Streaming incremental view maintenance: foreachBatch folds each
    // micro-batch into a keyed additive state via Incremental's monoid
    // merge; the maintained view must equal the from-scratch recompute
    // bit-exactly (cents), whatever the micro-batching — that recompute is
    // the oracle. Complements q31 (engine-managed complete-mode state) with
    // the externally-managed state-table pattern.
    "q142_stream_incremental_agg" -> Q(
      (s, dir) => graft.streaming.StreamingIncremental.monthlyOrderState(s, dir),
      Some(s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |  CAST(count(*) AS BIGINT) AS n,
             |  ${graft.functions.MathFunctions.floorRoundSql(
                  "CAST(sum(CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE) / CAST(100.0 AS DOUBLE)", 2)} AS total
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Stream-stream inner equi-join (symmetric join state across
    // micro-batches); oracle = the equivalent batch join.
    "q63_stream_stream_join" -> Q(
      (s, dir) => StreamingAgg.streamStreamJoin(s, dir),
      Some("""SELECT o_orderkey, o_custkey, l_linenumber, l_quantity
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderkey % 50 = 0
             |ORDER BY o_orderkey, l_linenumber""".stripMargin)),

    // Stateful streaming dedup (dropDuplicates through the engine's state
    // store, exactly-once per key across micro-batches); oracle = batch
    // DISTINCT equivalence.
    "q59_stream_dedup" -> Q(
      (s, dir) => StreamingAgg.distinctCustomers(s, dir),
      Some("SELECT DISTINCT o_custkey FROM orders ORDER BY 1")),

    // Watermark-BOUNDED streaming dedup (dropDuplicatesWithinWatermark):
    // state holds a key only until the watermark passes it — the production
    // shape for unbounded streams. Same oracle as q59: parity shows the
    // bounded variant loses nothing here while capping state.
    "q143_stream_dedup_bounded" -> Q(
      (s, dir) => StreamingAgg.distinctCustomersBounded(s, dir),
      Some("SELECT DISTINCT o_custkey FROM orders ORDER BY 1")),

    // HLL distinct THROUGH THE STREAMING ENGINE: register max commutes
    // across micro-batches, so bounded state (2^p rows) reproduces the batch
    // sketch exactly — same oracle as the batch q115 event_id row, proving
    // stream/batch parity for the sketch (where streaming count-distinct
    // would need unbounded state).
    "q126_stream_hll" -> Q(
      (s, dir) => graft.streaming.StreamingSketch.hllDistinct(
        s, dir, "events.parquet", "event_id", p = 9),
      Some(graft.operators.Sketches.hllSql("events", "event_id", p = 9))),

    // NOTE: the stub checksum folds UTF-8 BYTES while the oracle folds ascii
    // codepoints — equivalent only because the fixture corpus is pure ASCII
    // (verified); a multi-byte fixture would need a byte-level oracle.
    "q32_multimodal_meta" -> Q(
      (s, dir) => Multimodal.extractMeta(s, Tables.documents(s, dir)).orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  1 + CAST(octet_length(encode(text)) AS BIGINT) % 64 AS fake_width,
             |  1 + CAST(octet_length(encode(text)) AS BIGINT) % 37 AS fake_height,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(generate_series(1, length(text)),
             |      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
             |    (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Deletion propagation (the reference never deletes — SURVEY §2.7): cache
    // entries whose source row vanished, via left-anti join.
    "q43_deleted_tombstones" -> Q(
      (s, dir) => {
        val scan = Tables.orders(s, dir).filter(col("o_orderkey") % 5 =!= 0)
          .select(col("o_orderkey").as("key"))
        val cache = Tables.orders(s, dir)
          .select(col("o_orderkey").as("key"), unix_timestamp(col("o_orderdate")).as("last_edit_time"))
        Delta.deleted(scan, cache, keyCol = "key").orderBy("key")
      },
      Some("""SELECT o_orderkey AS key, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS last_edit_time
             |FROM orders c
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM orders s WHERE s.o_orderkey = c.o_orderkey AND s.o_orderkey % 5 <> 0)
             |ORDER BY 1""".stripMargin)),

    // Frame sampling over media blobs: 256-byte frames + per-frame rolling
    // checksum. Oracle mirrors via substr windows over the (ASCII) text.
    "q46_media_frames" -> Q(
      (s, dir) => Multimodal.sampleFrames(s, Tables.documents(s, dir), frameBytes = 256)
        .orderBy("doc_id", "frame_id"),
      Some("""WITH f AS (
             |  SELECT doc_id, text,
             |    unnest(generate_series(0,
             |      CAST(floor((length(text)-1) / CAST(256 AS DOUBLE)) AS BIGINT))) AS frame_id
             |  FROM documents)
             |SELECT doc_id, frame_id,
             |  CAST(length(substr(text, CAST(frame_id*256+1 AS INTEGER), 256)) AS BIGINT) AS n_bytes,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(generate_series(1, length(substr(text, CAST(frame_id*256+1 AS INTEGER), 256))),
             |      i -> CAST(ascii(substr(substr(text, CAST(frame_id*256+1 AS INTEGER), 256), CAST(i AS INTEGER), 1)) AS BIGINT))),
             |    (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum
             |FROM f ORDER BY doc_id, frame_id""".stripMargin)),

    // The reference's complete loop — embed the corpus, then cosine-search
    // it (main.py's entire purpose) — as ONE oracle-checked query. Raw
    // (integer-count) embeddings keep every intermediate exact: dot and
    // norms are integer sums in both engines, so the only FP ops are one
    // sqrt/multiply/divide chain, performed identically.
    "q62_embed_search" -> Q(
      (s, dir) => {
        val emb  = graft.pipeline.HashingEmbedder(64)
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), emb.embedRaw(col("text")).as("vec"))
        val qv = docs.filter(col("doc_id") === 0).select(col("vec")).head().getSeq[Double](0)
        graft.operators.TopK.topK(docs.filter(col("doc_id") =!= 0), "vec", "doc_id", qv, k = 10)
          .select(col("doc_id"), col("score"))
      },
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
             |b AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(w)),
             |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
             |      (acc, x) -> (acc * 31 + x) % 1000000007) % 64 AS bucket
             |  FROM tok),
             |c AS (SELECT doc_id, bucket, count(*) AS n FROM b GROUP BY 1, 2),
             |norms AS (SELECT doc_id, sqrt(CAST(sum(n * n) AS DOUBLE)) AS nrm FROM c GROUP BY 1),
             |q AS (SELECT bucket, n FROM c WHERE doc_id = 0),
             |qn AS (SELECT nrm AS qnrm FROM norms WHERE doc_id = 0),
             |dots AS (
             |  SELECT c.doc_id, CAST(sum(c.n * q.n) AS DOUBLE) AS dot
             |  FROM c JOIN q USING (bucket) WHERE c.doc_id <> 0 GROUP BY 1)
             |SELECT n.doc_id,
             |  ${graft.functions.MathFunctions.floorRoundSql(
                   "coalesce(d.dot, CAST(0 AS DOUBLE)) / (n.nrm * qn.qnrm)", 6)} AS score
             |FROM norms n LEFT JOIN dots d ON n.doc_id = d.doc_id, qn
             |WHERE n.doc_id <> 0 AND n.nrm > 0
             |ORDER BY score DESC, n.doc_id LIMIT 10""".stripMargin)),

    // The reference's embed step (main.py:180-183) as a batch query: the
    // pluggable HashingEmbedder over the document corpus. The poly-hash
    // bucket assignment is DuckDB-expressible, so the whole embedding
    // pipeline is oracle-checked: raw_norm is exact integer math; the
    // normalized max_component matches because FP division by a shared
    // positive norm is monotone (max of quotients = quotient of max).
    "q35_embed_documents" -> Q(
      (s, dir) => {
        import graft.functions.MathFunctions.floorRound
        import graft.functions.VectorFunctions.l2Norm
        val emb = graft.pipeline.HashingEmbedder(64)
        Tables.documents(s, dir)
          .select(col("doc_id"),
            emb.embed(col("text")).as("embedding"),
            emb.embedRaw(col("text")).as("__raw"))
          .select(
            col("doc_id"),
            size(col("embedding")).cast("long").as("dim"),
            floorRound(l2Norm(col("__raw")), 6).as("raw_norm"),
            floorRound(array_max(col("embedding")), 6).as("max_component"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
             |b AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(w)),
             |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
             |      (acc, x) -> (acc * 31 + x) % 1000000007) % 64 AS bucket
             |  FROM tok),
             |c AS (SELECT doc_id, bucket, count(*) AS n FROM b GROUP BY 1, 2),
             |st AS (
             |  SELECT doc_id, sqrt(CAST(sum(n * n) AS DOUBLE)) AS nrm,
             |    CAST(max(n) AS DOUBLE) AS mx
             |  FROM c GROUP BY 1)
             |SELECT doc_id, CAST(64 AS BIGINT) AS dim,
             |  ${graft.functions.MathFunctions.floorRoundSql("nrm", 6)} AS raw_norm,
             |  ${graft.functions.MathFunctions.floorRoundSql("mx / nrm", 6)} AS max_component
             |FROM st ORDER BY doc_id""".stripMargin)),
  )
}
