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

  private def frs(e: String, n: Int): String =
    graft.functions.MathFunctions.floorRoundSql(e, n)

  /** The q62 poly-hash bucket (HashingEmbedder's SQL mirror) of token `w`
    * at dim 64.
    */
  private def polyBucket(w: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, length($w)),
       |        i -> CAST(ascii(substr($w, CAST(i AS INTEGER), 1)) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % 1000000007) % 64""".stripMargin

  /** Shared CTEs of the chunk-retrieval family (q274/q275/q276): 25 LONG
    * documents (deterministic concat of the fixture docs by doc_id % 25 —
    * ~1k tokens each at sf0.01, ~11k at sf0.1, past the reference's 8191
    * guard), 5 snippet queries (32 tokens from DEEP inside their source
    * doc, past the first chunk window), the 64/48 chunk decomposition
    * (q38's oracle), per-chunk and per-query hashing-embedder bucket
    * counts (q62's oracle), and the exact (query, doc, chunk) cosine
    * relation `sims`. Integer bucket counts → exact dots; shared-norm
    * division floor-rounds identically in both engines.
    */
  private val chunkRetrievalCtes: String =
    s"""ld AS (
       |  SELECT doc_id % 25 AS doc_id, string_agg(text, ' ' ORDER BY doc_id) AS text
       |  FROM documents GROUP BY 1),
       |qs AS (
       |  SELECT doc_id AS q_id,
       |    array_to_string((string_split(text, ' '))[257:288], ' ') AS q_text
       |  FROM ld WHERE doc_id % 5 = 2),
       |ct AS (
       |  SELECT doc_id, toks, unnest(generate_series(0,
       |    CAST(floor((greatest(0, len(toks)-64) + 47) / CAST(48 AS DOUBLE)) AS BIGINT))) AS chunk_id
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM ld)),
       |cc AS (
       |  SELECT doc_id, chunk_id, bucket, count(*) AS n FROM (
       |    SELECT doc_id, chunk_id, ${polyBucket("w")} AS bucket FROM (
       |      SELECT doc_id, chunk_id, unnest(toks[chunk_id*48+1 : chunk_id*48+64]) AS w FROM ct))
       |  GROUP BY 1, 2, 3),
       |cn AS (SELECT doc_id, chunk_id, sqrt(CAST(sum(n*n) AS DOUBLE)) AS nrm
       |  FROM cc GROUP BY 1, 2),
       |qc AS (
       |  SELECT q_id, bucket, count(*) AS n FROM (
       |    SELECT q_id, ${polyBucket("w")} AS bucket FROM (
       |      SELECT q_id, unnest(string_split(q_text, ' ')) AS w FROM qs))
       |  GROUP BY 1, 2),
       |qn AS (SELECT q_id, sqrt(CAST(sum(n*n) AS DOUBLE)) AS nrm FROM qc GROUP BY 1),
       |cdots AS (
       |  SELECT qc.q_id, cc.doc_id, cc.chunk_id, CAST(sum(cc.n * qc.n) AS DOUBLE) AS dot
       |  FROM cc JOIN qc USING (bucket) GROUP BY 1, 2, 3),
       |sims AS (
       |  SELECT n.q_id, c.doc_id, c.chunk_id,
       |    ${frs("coalesce(d.dot, CAST(0 AS DOUBLE)) / (c.nrm * n.nrm)", 6)} AS sim
       |  FROM cn c CROSS JOIN qn n
       |  LEFT JOIN cdots d ON d.q_id = n.q_id AND d.doc_id = c.doc_id AND d.chunk_id = c.chunk_id
       |  WHERE c.nrm > 0 AND n.nrm > 0)""".stripMargin

  /** DENSE 64-component chunk/query vectors from the sparse bucket counts
    * of [[chunkRetrievalCtes]] — the (key, vec) relation the ANN chains
    * consume in SQL (q276's LSH buckets, q281's trained IVF cells).
    */
  private val chunkDenseVecCtes: String =
    s"""ckeys AS (SELECT DISTINCT doc_id, chunk_id FROM cc),
       |cv AS (
       |  SELECT doc_id, chunk_id, list(CAST(coalesce(n, 0) AS DOUBLE) ORDER BY b) AS v
       |  FROM (
       |    SELECT k.doc_id, k.chunk_id, b.b, c2.n
       |    FROM ckeys k
       |    CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) b
       |    LEFT JOIN cc c2 ON c2.doc_id = k.doc_id AND c2.chunk_id = k.chunk_id
       |      AND c2.bucket = b.b)
       |  GROUP BY 1, 2),
       |qv AS (
       |  SELECT q_id, list(CAST(coalesce(n, 0) AS DOUBLE) ORDER BY b) AS v
       |  FROM (
       |    SELECT k.q_id, b.b, q2.n
       |    FROM (SELECT DISTINCT q_id FROM qc) k
       |    CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) b
       |    LEFT JOIN qc q2 ON q2.q_id = k.q_id AND q2.bucket = b.b)
       |  GROUP BY 1)""".stripMargin

  /** The long-doc corpus + snippet queries, Spark side — shared by the
    * chunk-retrieval family. Concat order is pinned by array_sort over
    * (doc_id, text) structs, mirroring string_agg(... ORDER BY doc_id).
    */
  private def longDocsAndQueries(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val grouped = Tables.documents(s, dir)
      .select(pmod(col("doc_id"), lit(25L)).as("g"),
        struct(col("doc_id"), col("text")).as("st"))
    val ldocs = grouped.groupBy("g")
      .agg(array_join(
        transform(array_sort(collect_list(col("st"))), x => x.getField("text")),
        " ").as("text"))
      .select(col("g").as("doc_id"), col("text"))
    val qs = ldocs.filter(pmod(col("doc_id"), lit(5L)) === 2L)
      .select(col("doc_id").as("q_id"),
        array_join(slice(split(col("text"), " "), 257, 32), " ").as("q_text"))
    (ldocs, qs)
  }

  /** Doc ids erased from the chunk index by q277/q278 — 7 is a QUERY's own
    * source doc, so the query-visibility leg shows the erased content
    * vanishing from its best-matching query's results.
    */
  private val ChunkTomb = Seq(7L, 13L, 21L)

  /** The keyed chunk-vector relation (c_id = packed (doc, chunk) key,
    * cvec = hashing-embedded chunk) — the corpus side of the chunk-PQ
    * DEPLOYED-index family (q289/q290/q292). Cached: tombstone
    * derivation, encode-on-build-miss, and migration input all read it.
    */
  private def chunkVecs(s: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame = {
    val (ldocs, _) = longDocsAndQueries(s, dir)
    val emb = graft.pipeline.HashingEmbedder(64)
    graft.operators.Chunker.chunk(ldocs, "doc_id", "text",
      chunkTokens = 64, overlap = 16)
      .select(graft.operators.ChunkRetrieval.packedChunkKey(
        col("doc_id"), col("chunk_id")).as("c_id"),
        emb.embedRaw(col("chunk_text")).as("cvec"))
      .cache()
  }

  /** The chunk index's TRAINED v1 quantizer parameters as artifacts —
    * the `trainedCents`/`trainedCodebooks` convention the doc-level
    * chains established (r12 verdict: quantizer parameters are artifacts
    * of a training run, not something each query session re-derives; a
    * deployment ships them with the index). Deterministic functions of
    * the chunk corpus (floor-rounded means, lowest-key init), so a load
    * is byte-equal to a retrain — the DEPLOYED-index queries
    * (q289/q290/q292) previously retrained both per run, paying the full
    * Lloyd + codebook passes on every execution. q286/q281 keep training
    * live by their stated live-train/encode contract.
    */
  private def chunkPqParams(s: org.apache.spark.sql.SparkSession, dir: String,
                            chunks: org.apache.spark.sql.DataFrame)
      : (Array[Seq[Double]], Array[Array[Seq[Double]]]) = {
    import graft.pipeline.ArtifactStore
    import s.implicits._
    val centsDf = ArtifactStore.loadOrBuild(s,
      ArtifactStore.rootFor(dir, "chunk_ivf_cents_ld_k32_i1_v1")) {
      graft.operators.AnnIndex.kmeansCentroids(chunks, "cvec", "c_id",
        k = 32, iters = 1)
        .zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("ci", "cv")
    }
    val cents = centsDf.orderBy("ci").collect().map(_.getSeq[Double](1))
    val cbsDf = ArtifactStore.loadOrBuild(s,
      ArtifactStore.rootFor(dir, "chunk_pq_cb_ld_m16_k16_i1_v1")) {
      graft.operators.AnnIndex.pqTrainCodebooks(chunks, "c_id", "cvec",
        m = 16, ksub = 16, dim = 64, iters = 1)
        .zipWithIndex.flatMap { case (cb, j) =>
          cb.zipWithIndex.map { case (v, code) => (j, code, v) }
        }.toSeq.toDF("j", "code", "vec")
    }
    val rows = cbsDf.collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val m = rows.map(_._1).max + 1
    (cents, Array.tabulate(m)(j => rows.filter(_._1 == j).sortBy(_._2).map(_._3)))
  }

  /** The chunk-PQ retrieval oracle (q286, and q290 with the tombstoned
    * docs excluded from the candidate relation): kmeans + raw-PQ
    * train/encode re-rooted on the keyed chunk vectors, per-(query,
    * subspace, code) ADC terms, min-distance doc windows. `candWhere`
    * restricts the candidate relation (the survivor-rebuilt ranking);
    * `extraCols` appends literal output columns (q286's byte columns).
    */
  private def chunkPqRetrievalSql(extraCols: String = "",
                                  candWhere: String = ""): String = {
    val sl = (v: String, j: String) =>
      s"list_slice($v, $j*${VectorQueries.PqDsub}+1, $j*${VectorQueries.PqDsub}+${VectorQueries.PqDsub})"
    val sq = VectorQueries.sqSql _
    s"""WITH $chunkRetrievalCtes,
       |$chunkDenseVecCtes,
       |cvk AS (
       |  SELECT doc_id * 1000000 + chunk_id AS vec_id, v FROM cv),
       |${VectorQueries.kmeansCtesOn("cvk", "c")},
       |${VectorQueries.rawEncodeCtesOn(trainSrc = "cvk", encSrc = "cvk")},
       |cprobes AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q.q_id, c.ci AS cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY c.c2 - CAST(2.0 AS DOUBLE) * list_inner_product(q.v, c.cv), c.ci) AS rn
       |    FROM qv q CROSS JOIN ccents c)
       |  WHERE rn <= 2),
       |cterms AS (
       |  SELECT q.q_id, su.j, su.pci,
       |    ${sq(sl("q.v", "su.j"))} + su.c2
       |      - CAST(2.0 AS DOUBLE) * list_inner_product(${sl("q.v", "su.j")}, su.s) AS t
       |  FROM qv q CROSS JOIN psubs su),
       |cadist AS (
       |  SELECT ca.q_id, ca.c_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(t.t ORDER BY t.j)), (a, x) -> a + x) AS d
       |  FROM (
       |    SELECT p.q_id, a.vec_id AS c_id
       |    FROM cprobes p JOIN casg a ON p.cell = a.cell$candWhere) ca
       |  JOIN pcodes co ON co.vec_id = ca.c_id
       |  JOIN cterms t ON t.q_id = ca.q_id AND t.j = co.j AND t.pci = co.code
       |  GROUP BY 1, 2),
       |cdist AS (
       |  SELECT q_id, c_id // 1000000 AS doc_id, c_id % 1000000 AS chunk_id,
       |    ${frs("d", 6)} AS d
       |  FROM cadist),
       |best AS (
       |  SELECT q_id, doc_id, chunk_id, d,
       |    row_number() OVER (PARTITION BY q_id, doc_id ORDER BY d, chunk_id) AS cr
       |  FROM cdist)
       |SELECT q_id, doc_id, CAST(best_chunk AS BIGINT) AS best_chunk,
       |  score, CAST(rn AS BIGINT) AS rn$extraCols
       |FROM (
       |  SELECT q_id, doc_id, chunk_id AS best_chunk, d AS score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d, doc_id) AS rn
       |  FROM best WHERE cr = 1)
       |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin
  }

  /** Build-if-absent the doc-sharded CHUNK INDEX artifact over the long-doc
    * corpus — (doc_id, chunk_id, vec, n_tokens) partitioned by
    * dshard = doc_id div 4 (an id-sharded layout: the partition is a pure
    * function of the erasure key, so [[graft.pipeline.IndexErasure
    * .repairErasedByKey]] derives the touched shards from the tombstones) —
    * then apply the ChunkTomb erasure (idempotent, so each caller is
    * self-contained in a fresh session). Returns the root.
    */
  private def chunkIndexRepaired(s: org.apache.spark.sql.SparkSession,
                                 dir: String): String = {
    import s.implicits._
    val (ldocs, _) = longDocsAndQueries(s, dir)
    val emb = graft.pipeline.HashingEmbedder(64)
    val root = graft.pipeline.ArtifactStore.rootFor(dir, "chunk_index_ld_v1")
    graft.pipeline.IndexErasure.ensurePartitioned(s, root, "dshard") {
      graft.operators.Chunker.chunk(ldocs, "doc_id", "text",
        chunkTokens = 64, overlap = 16)
        .select(col("doc_id"), col("chunk_id"),
          emb.embedRaw(col("chunk_text")).as("vec"), col("n_tokens"))
        .withColumn("dshard",
          graft.functions.MathFunctions.longDiv(col("doc_id"), lit(4L)))
    }
    graft.pipeline.IndexErasure.repairErasedByKey(s, root, "dshard", "doc_id",
      ChunkTomb.toDF("doc_id"))(
      id => graft.functions.MathFunctions.longDiv(id, lit(4L)))
    root
  }

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

    // CHUNK-GRANULAR RETRIEVAL (r18 verdict task 2) — the splitting TODO
    // (main.py:177) completed END TO END: q38 chunks, this retrieves BY
    // chunk. 25 synthetic long documents (concat of fixture docs — past
    // the reference's 8191-token guard at sf0.1, so the whole-doc pipeline
    // cannot index them at all); 5 queries are 32-token snippets from DEEP
    // inside their source doc (past the first chunk window). Chunk → embed
    // → cosine → DOC-level top-3 by max-over-chunk-scores with the winning
    // window named. The oracle mirrors every stage: q38's chunk windows,
    // q62's poly-hash embedding, window max, rank — hash-checked.
    "q274_chunk_retrieval" -> Q(
      (s, dir) => {
        val (ldocs, qs) = longDocsAndQueries(s, dir)
        graft.operators.ChunkRetrieval.chunkDocTopK(qs, "q_id", "q_text",
          ldocs, "doc_id", "text", chunkTokens = 64, overlap = 16,
          embDim = 64, k = 3)
      },
      Some(s"""WITH $chunkRetrievalCtes,
             |best AS (
             |  SELECT q_id, doc_id, chunk_id, sim,
             |    row_number() OVER (PARTITION BY q_id, doc_id
             |      ORDER BY sim DESC, chunk_id) AS cr
             |  FROM sims)
             |SELECT q_id, doc_id, CAST(best_chunk AS BIGINT) AS best_chunk,
             |  score, CAST(rn AS BIGINT) AS rn
             |FROM (
             |  SELECT q_id, doc_id, chunk_id AS best_chunk, sim AS score,
             |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS rn
             |  FROM best WHERE cr = 1)
             |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin)),

    // The chunk-vs-whole-doc EVAL (q228-style): per method and query, the
    // RANK the method gives the snippet's true source doc, and the score
    // it assigns it (0/0 = unreachable). Three methods: chunk_max (q274's
    // retrieval), whole_doc (one embedding of the full long doc — legal
    // but DILUTED: a 32-token snippet against an 11k-token bag), and
    // whole_doc_guarded (the reference's actual pipeline: docs past the
    // 8191-token guard are never indexed — at sf0.1 every long doc is
    // guarded out and the truth is UNREACHABLE, rank 0). The row the
    // verdict asked for: chunk retrieval beats whole-doc embedding for
    // docs past the token guard.
    "q275_chunk_vs_wholedoc_eval" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val (ldocs, qs) = longDocsAndQueries(s, dir)
        def rankOfTruth(rel: org.apache.spark.sql.DataFrame, method: String) = {
          val w = Window.partitionBy(col("q_id")).orderBy(desc("score"), col("doc_id"))
          val ranked = rel.withColumn("rn", row_number().over(w).cast("long"))
          qs.select("q_id")
            .join(ranked.filter(col("doc_id") === col("q_id")), Seq("q_id"), "left")
            .select(lit(method).as("method"), col("q_id"),
              coalesce(col("rn"), lit(0L)).as("rank_of_truth"),
              coalesce(col("score"), lit(0.0)).as("truth_score"))
        }
        def docScores(docs: org.apache.spark.sql.DataFrame, chunkTokens: Int) =
          graft.operators.ChunkRetrieval.chunkScores(qs, "q_id", "q_text",
            docs, "doc_id", "text", chunkTokens, overlap = 0, embDim = 64,
            roundTo = 6)
            .groupBy("q_id", "doc_id").agg(max(col("__sim")).as("score"))
        // chunk retrieval uses the q274 windows; whole-doc is the
        // degenerate one-chunk-per-doc case of the same scorer
        val chunkRel = graft.operators.ChunkRetrieval.chunkScores(qs, "q_id", "q_text",
          ldocs, "doc_id", "text", chunkTokens = 64, overlap = 16,
          embDim = 64, roundTo = 6)
          .groupBy("q_id", "doc_id").agg(max(col("__sim")).as("score"))
        val wholeRel = docScores(ldocs, chunkTokens = 1000000)
        val guardedRel = docScores(
          ldocs.filter(size(split(col("text"), " ")) < 8191), chunkTokens = 1000000)
        rankOfTruth(chunkRel, "chunk_max")
          .unionByName(rankOfTruth(wholeRel, "whole_doc"))
          .unionByName(rankOfTruth(guardedRel, "whole_doc_guarded"))
          .orderBy("method", "q_id")
      },
      Some(s"""WITH $chunkRetrievalCtes,
             |cmax AS (SELECT q_id, doc_id, max(sim) AS score FROM sims GROUP BY 1, 2),
             |crank AS (SELECT q_id, doc_id, score,
             |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rn
             |  FROM cmax),
             |dtok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM ld),
             |dc AS (
             |  SELECT doc_id, bucket, count(*) AS n FROM (
             |    SELECT doc_id, ${polyBucket("w")} AS bucket FROM (
             |      SELECT doc_id, unnest(toks) AS w FROM dtok))
             |  GROUP BY 1, 2),
             |dn AS (SELECT doc_id, sqrt(CAST(sum(n*n) AS DOUBLE)) AS nrm FROM dc GROUP BY 1),
             |wdots AS (
             |  SELECT qc.q_id, dc.doc_id, CAST(sum(dc.n * qc.n) AS DOUBLE) AS dot
             |  FROM dc JOIN qc USING (bucket) GROUP BY 1, 2),
             |wsims AS (
             |  SELECT n.q_id, d.doc_id,
             |    ${frs("coalesce(w.dot, CAST(0 AS DOUBLE)) / (d.nrm * n.nrm)", 6)} AS score
             |  FROM dn d CROSS JOIN qn n
             |  LEFT JOIN wdots w ON w.q_id = n.q_id AND w.doc_id = d.doc_id
             |  WHERE d.nrm > 0 AND n.nrm > 0),
             |wrank AS (SELECT q_id, doc_id, score,
             |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rn
             |  FROM wsims),
             |grank AS (SELECT q_id, doc_id, score,
             |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rn
             |  FROM wsims WHERE doc_id IN (SELECT doc_id FROM dtok WHERE len(toks) < 8191))
             |SELECT method, q_id, rank_of_truth, truth_score FROM (
             |  SELECT 'chunk_max' AS method, q.q_id,
             |    CAST(coalesce(r.rn, 0) AS BIGINT) AS rank_of_truth,
             |    coalesce(r.score, CAST(0 AS DOUBLE)) AS truth_score
             |  FROM qs q LEFT JOIN crank r ON r.q_id = q.q_id AND r.doc_id = q.q_id
             |  UNION ALL
             |  SELECT 'whole_doc', q.q_id, CAST(coalesce(r.rn, 0) AS BIGINT),
             |    coalesce(r.score, CAST(0 AS DOUBLE))
             |  FROM qs q LEFT JOIN wrank r ON r.q_id = q.q_id AND r.doc_id = q.q_id
             |  UNION ALL
             |  SELECT 'whole_doc_guarded', q.q_id, CAST(coalesce(r.rn, 0) AS BIGINT),
             |    coalesce(r.score, CAST(0 AS DOUBLE))
             |  FROM qs q LEFT JOIN grank r ON r.q_id = q.q_id AND r.doc_id = q.q_id)
             |ORDER BY method, q_id""".stripMargin)),

    // ANN OVER CHUNKS — the scale path of q274: chunk candidates from the
    // sign-hyperplane LSH buckets (query bucket + hamming-1 multiprobe,
    // q27's machinery over the CHUNK relation) instead of the exact
    // cross-score; a 50-chunk shortlist per query competes in the same
    // doc-max finish. The oracle mirrors the bucket assignment (10 planes,
    // the integer-hash components), the hamming-≤1 candidate join, the
    // shortlist rank (chunk-key tiebreak), and the doc-level windows.
    "q276_chunk_retrieval_ann" -> Q(
      (s, dir) => {
        val (ldocs, qs) = longDocsAndQueries(s, dir)
        graft.operators.ChunkRetrieval.chunkDocTopKLsh(qs, "q_id", "q_text",
          ldocs, "doc_id", "text", chunkTokens = 64, overlap = 16,
          embDim = 64, k = 3, nbits = 10, chunkShortlist = 50)
      },
      Some(s"""WITH $chunkRetrievalCtes,
             |$chunkDenseVecCtes,
             |planes AS (
             |  SELECT list(list_transform(generate_series(0, 63), d ->
             |      CAST(((j*64+d+1)*(j*64+d+1) * 2654435761 + 97*(j*64+d+1) + 12345) % 1000003
             |        - 501001 AS DOUBLE)) ORDER BY j) AS ws
             |  FROM (SELECT unnest(generate_series(0, 9)) AS j)),
             |cbk AS (
             |  SELECT doc_id, chunk_id, v,
             |    list_sum(list_transform(generate_series(1, 10),
             |      j -> CASE WHEN list_inner_product(v, planes.ws[j]) >= CAST(0.0 AS DOUBLE)
             |           THEN (CAST(1 AS BIGINT) << (j-1)) ELSE CAST(0 AS BIGINT) END)) AS bucket
             |  FROM cv, planes),
             |qbk AS (
             |  SELECT q_id, v,
             |    list_sum(list_transform(generate_series(1, 10),
             |      j -> CASE WHEN list_inner_product(v, planes.ws[j]) >= CAST(0.0 AS DOUBLE)
             |           THEN (CAST(1 AS BIGINT) << (j-1)) ELSE CAST(0 AS BIGINT) END)) AS bucket
             |  FROM qv, planes),
             |cand AS (
             |  SELECT q.q_id, c.doc_id, c.chunk_id, q.v AS qvv, c.v AS cvv
             |  FROM qbk q JOIN cbk c ON bit_count(xor(q.bucket, c.bucket)) <= 1
             |  WHERE list_sum(list_transform(q.v, x -> x*x)) > 0
             |    AND list_sum(list_transform(c.v, x -> x*x)) > 0),
             |shortl AS (
             |  SELECT q_id, doc_id, chunk_id, sim FROM (
             |    SELECT q_id, doc_id, chunk_id,
             |      ${frs("list_cosine_similarity(qvv, cvv)", 6)} AS sim,
             |      row_number() OVER (PARTITION BY q_id
             |        ORDER BY ${frs("list_cosine_similarity(qvv, cvv)", 6)} DESC,
             |          doc_id * 1000000 + chunk_id) AS srn
             |    FROM cand)
             |  WHERE srn <= 50),
             |best AS (
             |  SELECT q_id, doc_id, chunk_id, sim,
             |    row_number() OVER (PARTITION BY q_id, doc_id
             |      ORDER BY sim DESC, chunk_id) AS cr
             |  FROM shortl)
             |SELECT q_id, doc_id, CAST(best_chunk AS BIGINT) AS best_chunk,
             |  score, CAST(rn AS BIGINT) AS rn
             |FROM (
             |  SELECT q_id, doc_id, chunk_id AS best_chunk, sim AS score,
             |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS rn
             |  FROM best WHERE cr = 1)
             |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin)),

    // CHUNK-INDEX ERASURE — the GDPR closure extended to the artifact
    // family this round introduced: the chunk index is (doc_id, chunk_id,
    // vec, n_tokens) sharded by doc_id div 4 (partition = pure function of
    // the erasure key, so repairErasedByKey derives the touched shards
    // from the tombstones — complete by construction), and erasing a doc
    // removes EVERY chunk row of it while untouched shards' files never
    // move. The oracle rebuilds the surviving docs' chunk relation from
    // scratch (q38's windows + q62's embedding norms): repaired ≡ rebuilt.
    "q277_chunk_index_erasure" -> Q(
      (s, dir) => {
        import graft.functions.MathFunctions.floorRound
        import graft.functions.VectorFunctions.l2Norm
        val root = chunkIndexRepaired(s, dir)
        graft.pipeline.IndexErasure.readPartitioned(s, root, "dshard")
          .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
            floorRound(l2Norm(col("vec")), 6).as("raw_norm"))
          .orderBy("doc_id", "chunk_id")
      },
      Some(s"""WITH $chunkRetrievalCtes
             |SELECT ct.doc_id, ct.chunk_id,
             |  CAST(len(ct.toks[ct.chunk_id*48+1 : ct.chunk_id*48+64]) AS BIGINT) AS n_tokens,
             |  ${frs("cn.nrm", 6)} AS raw_norm
             |FROM ct JOIN cn ON cn.doc_id = ct.doc_id AND cn.chunk_id = ct.chunk_id
             |WHERE ct.doc_id NOT IN (${ChunkTomb.mkString(", ")})
             |ORDER BY 1, 2""".stripMargin)),

    // Chunk erasure is QUERY-VISIBLE (the q259 shape on the chunk family):
    // retrieval SERVED FROM the repaired chunk index must never surface an
    // erased doc, at any rank — including for the query whose own source
    // doc (7) was erased, which now ranks its next-best matches instead.
    // Scoring runs live against the stored chunk vectors; the oracle is
    // q274's ranking with the tombstoned docs excluded from the candidate
    // relation — the survivor-rebuilt ranking, hash-equal.
    "q278_chunk_erasure_query_visibility" -> Q(
      (s, dir) => {
        import graft.functions.MathFunctions.floorRound
        import graft.functions.VectorFunctions.{cosineFromNormSq, l2NormSq}
        val (_, qs) = longDocsAndQueries(s, dir)
        val root = chunkIndexRepaired(s, dir)
        val emb = graft.pipeline.HashingEmbedder(64)
        val idx = graft.pipeline.IndexErasure.readPartitioned(s, root, "dshard")
          .withColumn("__nsq_c", l2NormSq(col("vec")))
        val qv = qs.select(col("q_id"), emb.embedRaw(col("q_text")).as("__qvec"))
          .withColumn("__nsq_q", l2NormSq(col("__qvec")))
        val scored = idx.crossJoin(broadcast(qv))
          .withColumn("__sim", floorRound(
            cosineFromNormSq(col("__qvec"), col("vec"),
              col("__nsq_q"), col("__nsq_c")), 6))
          .filter(col("__sim").isNotNull)
          .select(col("q_id"), col("doc_id"), col("chunk_id"), col("__sim"))
        graft.operators.ChunkRetrieval.docMaxTopK(scored, "q_id", "doc_id", k = 3)
      },
      Some(s"""WITH $chunkRetrievalCtes,
             |best AS (
             |  SELECT q_id, doc_id, chunk_id, sim,
             |    row_number() OVER (PARTITION BY q_id, doc_id
             |      ORDER BY sim DESC, chunk_id) AS cr
             |  FROM sims WHERE doc_id NOT IN (${ChunkTomb.mkString(", ")}))
             |SELECT q_id, doc_id, CAST(best_chunk AS BIGINT) AS best_chunk,
             |  score, CAST(rn AS BIGINT) AS rn
             |FROM (
             |  SELECT q_id, doc_id, chunk_id AS best_chunk, sim AS score,
             |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS rn
             |  FROM best WHERE cr = 1)
             |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin)),

    // The chunk × TRAINED-INDEX matrix cell: q276 draws chunk candidates
    // from LSH sign buckets; here the chunk relation gets the trained IVF
    // treatment — Lloyd coarse cells over the chunk vectors (k=32,
    // lowest-key init), queries probe their nprobe=2 nearest cells, and
    // only those cells' members are cosine-scored before the same doc-max
    // finish. The oracle retrains the cells from scratch (the standing
    // kmeans CTEs re-rooted on the keyed chunk-vector relation) and
    // mirrors probing, scoring, and the doc-level windows.
    "q281_chunk_retrieval_ivf" -> Q(
      (s, dir) => {
        import graft.functions.MathFunctions.longDiv
        import graft.operators.AnnIndex
        val (ldocs, qs) = longDocsAndQueries(s, dir)
        val emb = graft.pipeline.HashingEmbedder(64)
        val chunks = graft.operators.Chunker.chunk(ldocs, "doc_id", "text",
          chunkTokens = 64, overlap = 16)
          .select(graft.operators.ChunkRetrieval.packedChunkKey(
            col("doc_id"), col("chunk_id")).as("c_id"),
            emb.embedRaw(col("chunk_text")).as("cvec"))
          .cache() // trainer + candidate join both read it
        val cents = AnnIndex.kmeansCentroids(chunks, "cvec", "c_id", k = 32, iters = 1)
        val qv = qs.select(col("q_id"), emb.embedRaw(col("q_text")).as("qvec"))
        val cand = AnnIndex.ivfTopK(qv, "q_id", "qvec",
          chunks, "c_id", "cvec", k = 1 << 20, nlist = 32, nprobe = 2,
          excludeSelf = false, coarseCentroids = Some(cents))
        val scored = cand.select(col("q_id"),
          longDiv(col("c_id"), lit(1000000L)).as("doc_id"),
          pmod(col("c_id"), lit(1000000L)).as("chunk_id"),
          col("score").as("__sim"))
        graft.operators.ChunkRetrieval.docMaxTopK(scored, "q_id", "doc_id", k = 3)
      },
      Some(s"""WITH $chunkRetrievalCtes,
             |$chunkDenseVecCtes,
             |cvk AS (
             |  SELECT doc_id * 1000000 + chunk_id AS vec_id, v FROM cv),
             |${VectorQueries.kmeansCtesOn("cvk", "c")},
             |qprobe AS (
             |  SELECT q_id, cell FROM (
             |    SELECT q.q_id, c.ci AS cell,
             |      row_number() OVER (PARTITION BY q.q_id
             |        ORDER BY c.c2 - CAST(2.0 AS DOUBLE) * list_inner_product(q.v, c.cv), c.ci) AS rn
             |    FROM qv q CROSS JOIN ccents c)
             |  WHERE rn <= 2),
             |csims AS (
             |  SELECT p.q_id, a.vec_id // 1000000 AS doc_id, a.vec_id % 1000000 AS chunk_id,
             |    ${frs("list_cosine_similarity(q.v, a.v)", 6)} AS sim
             |  FROM qprobe p
             |  JOIN casg a ON a.cell = p.cell
             |  JOIN qv q ON q.q_id = p.q_id),
             |best AS (
             |  SELECT q_id, doc_id, chunk_id, sim,
             |    row_number() OVER (PARTITION BY q_id, doc_id
             |      ORDER BY sim DESC, chunk_id) AS cr
             |  FROM csims)
             |SELECT q_id, doc_id, CAST(best_chunk AS BIGINT) AS best_chunk,
             |  score, CAST(rn AS BIGINT) AS rn
             |FROM (
             |  SELECT q_id, doc_id, chunk_id AS best_chunk, sim AS score,
             |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS rn
             |  FROM best WHERE cr = 1)
             |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin)),

    // CHUNK-INDEX PQ (r19 verdict task 4 — the chunk memory knob): q281's
    // trained chunk index stores RAW 64-d vectors — 512 B/chunk, and chunk
    // counts run ~20× doc counts at 100 TB. Here the chunk vectors are
    // PQ-ENCODED (the same chain-agnostic machinery every doc-level index
    // uses: Lloyd cells + per-subspace trained codebooks over the chunk
    // relation), queries probe nprobe=2 cells and score candidates by ADC
    // over the 8-byte codes, and the doc-max finish is unchanged (min-
    // distance form). bytes_per_chunk/bytes_raw make the 64× memory win a
    // measured column (the q197 frontier convention: PQ m·log2(ksub)/8 =
    // 8 B vs raw 64·8 = 512 B). Oracle: the standing kmeans + raw-PQ
    // train/encode SQL re-rooted on the keyed chunk-vector relation, ADC
    // terms per (query, subspace, code), same doc windows.
    "q286_chunk_retrieval_ivfpq" -> Q(
      (s, dir) => {
        import graft.functions.MathFunctions.longDiv
        import graft.operators.AnnIndex
        val (ldocs, qs) = longDocsAndQueries(s, dir)
        val emb = graft.pipeline.HashingEmbedder(64)
        val chunks = graft.operators.Chunker.chunk(ldocs, "doc_id", "text",
          chunkTokens = 64, overlap = 16)
          .select(graft.operators.ChunkRetrieval.packedChunkKey(
            col("doc_id"), col("chunk_id")).as("c_id"),
            emb.embedRaw(col("chunk_text")).as("cvec"))
          .cache() // cell trainer, codebook trainer, and encode all read it
        val cents = AnnIndex.kmeansCentroids(chunks, "cvec", "c_id", k = 32, iters = 1)
        val cbs = AnnIndex.pqTrainCodebooks(chunks, "c_id", "cvec",
          m = 16, ksub = 16, dim = 64, iters = 1)
        val qv = qs.select(col("q_id"), emb.embedRaw(col("q_text")).as("qvec"))
        val cand = AnnIndex.pqCandidates(qv, "q_id", "qvec",
          chunks, "c_id", "cvec", m = 16, ksub = 16, dim = 64,
          nlist = 32, nprobe = 2, excludeSelf = false,
          codebooks = Some(cbs), coarseCentroids = Some(cents))
        val scored = cand.select(col("q_id"),
          longDiv(col("c_id"), lit(1000000L)).as("doc_id"),
          pmod(col("c_id"), lit(1000000L)).as("chunk_id"),
          col("score").as("__sim"))
        graft.operators.ChunkRetrieval.docMinTopK(scored, "q_id", "doc_id", k = 3)
          .withColumn("bytes_per_chunk", lit(8L))
          .withColumn("bytes_raw", lit(512L))
      },
      Some(chunkPqRetrievalSql(
        """,
          |  CAST(8 AS BIGINT) AS bytes_per_chunk, CAST(512 AS BIGINT) AS bytes_raw""".stripMargin))),

    // The chunk-PQ index as a DEPLOYED, ERASABLE artifact: q286
    // trains/encodes live; here the chunk codes are materialized
    // CELL-PARTITIONED (the same inverted-file layout every doc-level
    // chain deploys) and a doc-deletion request erases ALL of a doc's
    // chunks through it — tombstoned chunk keys name their touched cells
    // map-side (O(chunks-of-tombstoned-docs · nlist), never an index
    // scan) and repairErased rewrites only those cell directories. The
    // oracle re-trains and re-encodes the chunk PQ chain from scratch and
    // drops the tombstoned docs' chunks from the output: repaired ≡
    // rebuilt under the standing quantizer, per-(chunk, subspace) code
    // hash. Erased docs: the q277/q278 ChunkTomb set, so the SAME
    // deletion request is now proven against BOTH chunk-index layouts
    // (doc-sharded raw vectors there, cell-partitioned PQ codes here).
    "q289_chunk_pq_index_erasure" -> Q(
      (s, dir) => {
        import graft.functions.MathFunctions.longDiv
        import graft.operators.AnnIndex
        val chunks = chunkVecs(s, dir)
        val (cents, cbs) = chunkPqParams(s, dir, chunks)
        val root = graft.pipeline.ArtifactStore.rootFor(dir, "chunk_pq_enc_ld_v1")
        graft.pipeline.IndexErasure.ensurePartitioned(s, root, "cell") {
          AnnIndex.pqEncodedCorpus(chunks, "c_id", "cvec",
            m = 16, ksub = 16, dim = 64, nlist = 32, Some(cbs), Some(cents))
            .select(col("c_id"), col("__cell").cast("long").as("cell"), col("__codes"))
        }
        // the deletion request names DOCS; the tombstone set is every
        // chunk key of those docs (derived from the corpus — the
        // at-least-once world still holds the content)
        val tombChunks = chunks
          .filter(longDiv(col("c_id"), lit(1000000L)).isin(ChunkTomb: _*))
        val touched = AnnIndex.ivfAssignTrained(tombChunks, "c_id", "cvec", cents.toSeq)
          .select("cell").distinct().collect().map(_.getLong(0)).toSeq // ≤ nlist rows
        graft.pipeline.IndexErasure.repairErased(s, root, "cell", touched,
          "c_id", tombChunks)
        graft.pipeline.IndexErasure.readPartitioned(s, root, "cell")
          .select(longDiv(col("c_id"), lit(1000000L)).as("doc_id"),
            pmod(col("c_id"), lit(1000000L)).as("chunk_id"), col("cell"),
            posexplode(col("__codes")).as(Seq("j", "code")))
          .select(col("doc_id"), col("chunk_id"), col("cell"),
            col("j").cast("long").as("j"), col("code").cast("long").as("code"))
          .orderBy("doc_id", "chunk_id", "j")
      },
      Some(s"""WITH $chunkRetrievalCtes,
             |$chunkDenseVecCtes,
             |cvk AS (
             |  SELECT doc_id * 1000000 + chunk_id AS vec_id, v FROM cv),
             |${VectorQueries.kmeansCtesOn("cvk", "c")},
             |${VectorQueries.rawEncodeCtesOn(trainSrc = "cvk", encSrc = "cvk")}
             |SELECT a.vec_id // 1000000 AS doc_id, a.vec_id % 1000000 AS chunk_id,
             |  CAST(a.cell AS BIGINT) AS cell,
             |  CAST(co.j AS BIGINT) AS j, CAST(co.code AS BIGINT) AS code
             |FROM casg a JOIN pcodes co ON co.vec_id = a.vec_id
             |WHERE a.vec_id // 1000000 NOT IN (${ChunkTomb.mkString(", ")})
             |ORDER BY 1, 2, 4""".stripMargin)),

    // Chunk-PQ erasure is QUERY-VISIBLE: q286's retrieval served FROM the
    // q289-repaired artifact (ADC over the stored codes; scoring live,
    // index loaded) must rank exactly as the survivor-rebuilt chunk index
    // — no chunk of an erased doc competing in any doc-max, at any rank.
    // Doc 7 is a query's own source (the best-possible match), so the
    // erasure visibly changes that query's winner. Completes the chunk-PQ
    // lifecycle at the retrieval surface, mirroring q278 (raw doc-sharded
    // layout) and q259/q288 (doc-level chains).
    "q290_chunk_pq_erasure_query_visibility" -> Q(
      (s, dir) => {
        import graft.functions.MathFunctions.longDiv
        import graft.operators.AnnIndex
        val (_, qs) = longDocsAndQueries(s, dir)
        val emb = graft.pipeline.HashingEmbedder(64)
        val chunks = chunkVecs(s, dir)
        val (cents, cbs) = chunkPqParams(s, dir, chunks)
        val root = graft.pipeline.ArtifactStore.rootFor(dir, "chunk_pq_enc_ld_v1")
        graft.pipeline.IndexErasure.ensurePartitioned(s, root, "cell") {
          AnnIndex.pqEncodedCorpus(chunks, "c_id", "cvec",
            m = 16, ksub = 16, dim = 64, nlist = 32, Some(cbs), Some(cents))
            .select(col("c_id"), col("__cell").cast("long").as("cell"), col("__codes"))
        }
        val tombChunks = chunks
          .filter(longDiv(col("c_id"), lit(1000000L)).isin(ChunkTomb: _*))
        val touched = AnnIndex.ivfAssignTrained(tombChunks, "c_id", "cvec", cents.toSeq)
          .select("cell").distinct().collect().map(_.getLong(0)).toSeq // ≤ nlist rows
        graft.pipeline.IndexErasure.repairErased(s, root, "cell", touched,
          "c_id", tombChunks)
        val enc = graft.pipeline.IndexErasure.readPartitioned(s, root, "cell")
          .select(col("c_id"), col("cell").cast("int").as("__cell"), col("__codes"))
        val qv = qs.select(col("q_id"), emb.embedRaw(col("q_text")).as("qvec"))
        val cand = AnnIndex.pqCandidates(qv, "q_id", "qvec",
          chunks, "c_id", "cvec", m = 16, ksub = 16, dim = 64,
          nlist = 32, nprobe = 2, excludeSelf = false,
          codebooks = Some(cbs), coarseCentroids = Some(cents),
          encoded = Some(enc))
        val scored = cand.select(col("q_id"),
          longDiv(col("c_id"), lit(1000000L)).as("doc_id"),
          pmod(col("c_id"), lit(1000000L)).as("chunk_id"),
          col("score").as("__sim"))
        graft.operators.ChunkRetrieval.docMinTopK(scored, "q_id", "doc_id", k = 3)
      },
      Some(chunkPqRetrievalSql(candWhere =
        s" AND a.vec_id // 1000000 NOT IN (${ChunkTomb.mkString(", ")})"))),

    // The chunk-PQ index MIGRATES like every other artifact family: when
    // the long-doc corpus drifts (here docs ≡ 4 mod 5 leave — a fifth of
    // the corpus, shifting the chunk distribution the v1 quantizer was
    // trained on), IndexMigration.migrate retrains cells + codebooks on
    // the surviving chunk relation and re-encodes it in one pass through
    // the chain-agnostic swap/versioning core — the SAME API the
    // doc-level chains use, applied to the chunk root unchanged. The
    // oracle re-roots the chunk-PQ training SQL on the filtered chunk
    // relation (the cfFilteredCte trick at the chunk level): migrated ≡
    // from-scratch rebuild under the NEW quantizer, per-(chunk, subspace)
    // code hash. With q289 (erasure) and q290 (query visibility) this
    // completes the chunk chain's lifecycle.
    "q292_chunk_pq_index_migration" -> Q(
      (s, dir) => {
        import graft.functions.MathFunctions.longDiv
        import graft.operators.AnnIndex
        val chunks = chunkVecs(s, dir)
        val (cents, cbs) = chunkPqParams(s, dir, chunks)
        val root = graft.pipeline.ArtifactStore.rootFor(dir, "chunk_pq_enc_ld_mig_v1")
        graft.pipeline.IndexErasure.ensurePartitioned(s, root, "cell") {
          AnnIndex.pqEncodedCorpus(chunks, "c_id", "cvec",
            m = 16, ksub = 16, dim = 64, nlist = 32, Some(cbs), Some(cents))
            .select(col("c_id"), col("__cell").cast("long").as("cell"), col("__codes"))
        }
        val current = chunks.filter(
          pmod(longDiv(col("c_id"), lit(1000000L)), lit(5L)) =!= 4L)
        graft.pipeline.IndexMigration.migrate(s, root, current, "c_id", "cvec",
          nlist = 32, m = 16, ksub = 16, dim = 64)
        graft.pipeline.IndexErasure.readPartitioned(s, root, "cell")
          .select(longDiv(col("c_id"), lit(1000000L)).as("doc_id"),
            pmod(col("c_id"), lit(1000000L)).as("chunk_id"), col("cell"),
            posexplode(col("__codes")).as(Seq("j", "code")))
          .select(col("doc_id"), col("chunk_id"), col("cell"),
            col("j").cast("long").as("j"), col("code").cast("long").as("code"))
          .orderBy("doc_id", "chunk_id", "j")
      },
      Some(s"""WITH $chunkRetrievalCtes,
             |$chunkDenseVecCtes,
             |cvka AS (
             |  SELECT doc_id * 1000000 + chunk_id AS vec_id, v FROM cv),
             |cvk AS (
             |  SELECT vec_id, v FROM cvka WHERE (vec_id // 1000000) % 5 <> 4),
             |${VectorQueries.kmeansCtesOn("cvk", "c")},
             |${VectorQueries.rawEncodeCtesOn(trainSrc = "cvk", encSrc = "cvk")}
             |SELECT a.vec_id // 1000000 AS doc_id, a.vec_id % 1000000 AS chunk_id,
             |  CAST(a.cell AS BIGINT) AS cell,
             |  CAST(co.j AS BIGINT) AS j, CAST(co.code AS BIGINT) AS code
             |FROM casg a JOIN pcodes co ON co.vec_id = a.vec_id
             |ORDER BY 1, 2, 4""".stripMargin)),
  )
}
