package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.expressions.Window
import graft.functions.MathFunctions.floorRound
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate nearest-neighbor search via random-hyperplane LSH (Charikar,
  * STOC 2002) and IVF coarse quantization (Jégou/Douze/Schmid, "Product
  * quantization for nearest neighbor search", TPAMI 2011 — the inverted-file
  * part, without PQ residuals).
  * The scale path next to [[TopK]]'s brute-force baseline: corpus is
  * bucketed once by sign-pattern against `nbits` fixed hyperplanes; a query
  * probes its own bucket plus the `nbits` hamming-1 neighbors (multiprobe),
  * so per-query work drops from O(n) to O(n·(nbits+1)/2^nbits) expected, and
  * the candidate join is a plain equi-join on the bucket id —
  * co-partitionable and AQE-skew-handled at cluster scale.
  *
  * Hyperplane components are a fixed integer hash of (plane, dim) — fully
  * deterministic AND expressible in plain SQL, which is what lets the ANN
  * queries carry a DuckDB oracle (q27/q28). Recall < 1 by construction;
  * [[autoNbits]] scales the bucket count with the corpus and multiprobe buys
  * the recall back.
  */
object AnnIndex {

  import graft.functions.expressions.{CentroidArgmin, CentroidLookup, CentroidProbes}
  import org.apache.spark.sql.{GraftSqlBridge => B}

  /** The IVF cell argmin / probe-ranking / centroid-lookup columns as ONE
    * codegen kernel node each ([[graft.functions.expressions
    * .CentroidArgmin]] family): the unrolled Column form baked nlist·dim
    * centroid literals into the plan — invisible at fixture parameters
    * (nlist=32·dim=64 → 2 k nodes), an analysis/codegen explosion at
    * production IVF (nlist 4096 · dim 1536 → 6.3 M nodes) and a per-micro-
    * batch re-plan on the streaming paths (the q214/[[bandBucketsCol]]
    * pathology class — r17 verdict task 1). Same arithmetic, same
    * tie-breaks, bit-identical cells/probes (pinned in OperatorsSpec and by
    * every IVF-family oracle hash).
    */
  private[graft] def argminCell(vec: Column, cents: Array[Array[Double]]): Column =
    B.column(CentroidArgmin(B.expression(asDouble(vec)), cents))
  private[graft] def probeCells(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    B.column(CentroidProbes(B.expression(asDouble(vec)), cents, nprobe))
  private[graft] def centroidOf(cell: Column, cents: Array[Array[Double]]): Column =
    B.column(CentroidLookup(B.expression(cell), cents))
  private[graft] def centMat(cents: Seq[Seq[Double]]): Array[Array[Double]] =
    cents.map(_.toArray).toArray

  /** Bucket-count policy: smallest b with targetBucket·2ᵇ ≥ n (i.e.
    * ceil(log2(n/targetBucket))) clamped to [minBits, maxBits] — expected
    * bucket size tracks `targetBucket` instead of the fixed 2⁴ = 16 buckets
    * that degenerates to O(n²/16) same-bucket joins at 100× corpus.
    *
    * Pure INTEGER shifts, no libm: the q27/q28 oracles mirror this with
    * `min(b) WHERE (128::BIGINT << b) >= count(*)` — a double-precision
    * ceil(log2(…)) on both sides would hinge on two libm implementations
    * agreeing to the last ulp at power-of-two corpus sizes.
    */
  def autoNbits(n: Long, targetBucket: Int = 128,
                minBits: Int = 4, maxBits: Int = 20): Int = {
    var b = 0
    while (b < maxBits && (targetBucket.toLong << b) < n) b += 1
    math.max(minBits, b)
  }

  /** Per-band SRP width for [[cosineNearDupPairsBandedCentered]]: the least
    * r with `targetBucket · 2^r ≥ n` (same integer-shift derivation as
    * [[autoNbits]], mirrored verbatim in the oracles' params CTE). With
    * corpus-mean-centered vectors the unrelated-pair sign-agreement rate is
    * ≈ 1/2, so a band's chance-collision probability is 2^−r ≈
    * targetBucket/n and expected chance candidates stay ≈
    * bands·targetBucket·n/2 — LINEAR in the corpus at any scale, the
    * property the single-table hamming-1 probe loses on correlated
    * embeddings (measured r16: 2.2 GiB shuffle at 10× sf0.1 distinct-growth
    * — the positive-orthant baseline cosine ≈ 0.6 made every pair a
    * near-candidate).
    */
  def autoBandBits(n: Long, targetBucket: Int = 16,
                   minBits: Int = 4, maxBits: Int = 30): Int = {
    var b = 0
    while (b < maxBits && (targetBucket.toLong << b) < n) b += 1
    math.max(minBits, b)
  }

  /** Deterministic hyperplanes: component d of plane j is the centered
    * integer hash `((k²·2654435761 + 97k + 12345) mod 1000003) − 501001` with
    * `k = j·dim + d + 1`. The quadratic term breaks the affine structure a
    * plain multiplicative hash would have across consecutive k; all
    * intermediates stay < 2⁶³, so DuckDB BIGINT arithmetic reproduces the
    * values exactly (the SQL-expressibility that buys the q27/q28 oracle —
    * a seeded Gaussian would be marginally more spherical but unverifiable).
    */
  def hyperplanes(nbits: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(nbits) { j =>
      Seq.tabulate(dim) { d =>
        val k = j.toLong * dim + d + 1
        ((k * k * 2654435761L + 97L * k + 12345L) % 1000003L - 501001L).toDouble
      }
    }

  /** Bucket id: one sign bit per hyperplane, packed into a long. Uses the
    * fused sequential dot kernel — bit-identical accumulation to the oracle's
    * `list_inner_product`, so the sign (and hence the bucket) matches exactly.
    */
  def bucketCol(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val vd = asDouble(vec)
    planes.zipWithIndex.map { case (p, i) =>
      val pl = array(p.map(lit): _*)
      when(dotFused(vd, pl) >= 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** The query-side multiprobe set: own bucket + each single-bit flip. A
    * corpus row lives in exactly one bucket and two buckets differ in ≥1 bit,
    * so exactly one probe can match a given candidate — no pair dedup needed.
    */
  def probesCol(bucket: Column, nbits: Int): Column =
    array(bucket +: (0 until nbits).map(j => bucket.bitwiseXOR(lit(1L << j))): _*)

  /** Approximate top-k cosine neighbors per query; candidates from the
    * query's bucket plus its hamming-1 probes. Output: (q_id, c_id, score, rn).
    */
  def annTopK(queries: DataFrame, qIdCol: String, qVecCol: String,
              corpus: DataFrame, cIdCol: String, cVecCol: String,
              k: Int, nbits: Int, dim: Int,
              roundTo: Int = 6, excludeSelf: Boolean = true,
              multiprobe: Boolean = true): DataFrame = {
    // excludeSelf: set false when queries and corpus come from DIFFERENT
    // tables whose ids coincidentally collide
    val planes = hyperplanes(nbits, dim)
    val cb = corpus.withColumn("__bucket", bucketCol(col(cVecCol), planes))
      .withColumn("__nsq_c", l2NormSq(col(cVecCol)))
    val qb0 = queries.withColumn("__qbucket", bucketCol(col(qVecCol), planes))
      .withColumn("__nsq_q", l2NormSq(col(qVecCol)))
    val qb =
      if (multiprobe)
        qb0.withColumn("__bucket", explode(probesCol(col("__qbucket"), nbits))).drop("__qbucket")
      else qb0.withColumnRenamed("__qbucket", "__bucket")
    val scored = cb.join(broadcast(qb), Seq("__bucket"))
      .filter(lit(!excludeSelf) || col(qIdCol) =!= col(cIdCol))
      .withColumn("score", floorRound(
        cosineFromNormSq(col(qVecCol), col(cVecCol), col("__nsq_q"), col("__nsq_c")), roundTo))
      .filter(col("score").isNotNull) // zero-norm rows don't compete
    val w = Window.partitionBy(col(qIdCol)).orderBy(desc("score"), col(cIdCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(qIdCol), col(cIdCol), col("score"), col("rn"))
      .orderBy(col(qIdCol), col("rn"))
  }

  /** IVF (inverted-file) ANN: corpus is partitioned into `nlist` coarse cells
    * (nearest deterministic centroid); a query scores only the `nprobe`
    * nearest cells' members. Next to the hyperplane LSH variant this is the
    * other classic ANN scale path: candidate selection is an equi-join on the
    * cell id, per-query work O(n · nprobe / nlist).
    *
    * Coarse centroids are the `nlist` lowest-id corpus vectors (deterministic,
    * no iterative training — a k-means refinement would slot in here without
    * changing the query plan). Cell assignment uses
    * argmin(|c|² − 2·v·c) ≡ argmin squared-L2, computed as `nlist` fused dot
    * products per row, map-only.
    */
  /** Cell assignments (id, cell) for `df` against the deterministic coarse
    * centroids of `centroidSource` (its `nlist` lowest-id vectors, the same
    * policy as [[ivfTopK]]). Separating the centroid source from the
    * assigned rows is what makes the index INCREMENTALLY MAINTAINABLE: a
    * delta of new vectors is assigned against the STANDING centroids and
    * unioned with the standing assignments — identical to a full rebuild
    * whenever the centroid rows are stable (the lowest-id policy makes
    * stability checkable: delta ids above the centroid range). q156 proves
    * standing ∪ delta-assign ≡ full rebuild against the full-table oracle;
    * the delta pass costs O(delta · nlist), never a corpus rescan.
    */
  def ivfAssign(df: DataFrame, centroidSource: DataFrame,
                idCol: String, vecCol: String, nlist: Int): DataFrame = {
    val cents: Array[Array[Double]] = centroidSource
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .orderBy(col(idCol)).limit(nlist)
      .collect().map(_.getSeq[Double](1).toArray)
    df.select(col(idCol), argminCell(col(vecCol), cents).cast("long").as("cell"))
  }

  /** Cell assignments (id, cell) of `df` under TRAINED coarse centroids —
    * [[ivfAssign]]'s map-side argmin with the centroid array handed in
    * directly (the [[kmeansCentroids]] artifact). The erasure-repair
    * entry point ([[graft.pipeline.IndexErasure]]): naming the cells a
    * tombstone set touches is one map pass over the TOMBSTONED rows —
    * O(tombstones · nlist), never an index or corpus scan.
    */
  def ivfAssignTrained(df: DataFrame, idCol: String, vecCol: String,
                       cents: Seq[Seq[Double]]): DataFrame =
    df.select(col(idCol),
      argminCell(col(vecCol), centMat(cents)).cast("long").as("cell"))

  /** Per-cell OCCUPANCY histogram of `df` under TRAINED coarse centroids —
    * the embedding-space distribution profile (r12 verdict task 4): cell
    * assignment is the same argmin(|c|² − 2·v·c) map-side expression every
    * IVF consumer uses (ties to the lower index), and the output is the
    * `(bin, n)` shape [[Validate.psiGateFromCounts]] takes, so cell-
    * occupancy drift between corpus snapshots rides the existing PSI
    * machinery with the trained cells as the (categorical) binning. One
    * map-side-combined count shuffle, ≤ nlist result rows — the corpus is
    * never shuffled by anything wider than the cell id.
    */
  def cellOccupancyCounts(df: DataFrame, vecCol: String,
                          cents: Seq[Seq[Double]]): DataFrame =
    df.select(argminCell(col(vecCol), centMat(cents)).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))

  /** Per-GROUP cell occupancy — [[cellOccupancyCounts]] keyed by a group
    * column, the `(g, bin, n)` shape
    * [[Validate.groupedPsiGateFromCounts]] takes: one histogram per
    * source/label, so an embedding-distribution shift confined to ONE
    * group flags exactly that group (the multi-source form of the
    * embedding drift gate). State ≤ groups·nlist rows.
    */
  def cellOccupancyCountsByGroup(df: DataFrame, vecCol: String, groupCol: String,
                                 cents: Seq[Seq[Double]]): DataFrame =
    df.select(col(groupCol).as("g"),
        argminCell(col(vecCol), centMat(cents)).cast("long").as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("n"))

  def ivfTopK(queries: DataFrame, qIdCol: String, qVecCol: String,
              corpus: DataFrame, cIdCol: String, cVecCol: String,
              k: Int, nlist: Int, nprobe: Int, roundTo: Int = 6,
              excludeSelf: Boolean = true,
              coarseCentroids: Option[Array[Seq[Double]]] = None): DataFrame = {
    require(nprobe <= nlist, "nprobe must be <= nlist")
    // coarseCentroids: trained cells (e.g. [[kmeansCentroids]]) — the
    // lowest-id default keeps q40/q78-era oracles byte-stable.
    val cents: Array[Array[Double]] = coarseCentroids
      .map(_.map(_.toArray).toArray)
      .getOrElse(corpus
        .select(col(cIdCol), asDouble(col(cVecCol)).as("v"))
        .orderBy(col(cIdCol)).limit(nlist)
        .collect().map(_.getSeq[Double](1).toArray))

    val cb = corpus
      .withColumn("__cell", argminCell(col(cVecCol), cents))
      .withColumn("__nsq_c", l2NormSq(col(cVecCol)))
    val qb = queries
      .withColumn("__cell", explode(probeCells(col(qVecCol), cents, nprobe)))
      .withColumn("__nsq_q", l2NormSq(col(qVecCol)))
    val scored = cb.join(broadcast(qb), Seq("__cell"))
      .filter(lit(!excludeSelf) || col(qIdCol) =!= col(cIdCol))
      .withColumn("score", floorRound(
        cosineFromNormSq(col(qVecCol), col(cVecCol), col("__nsq_q"), col("__nsq_c")), roundTo))
      .filter(col("score").isNotNull) // zero-norm rows don't compete
    val w = Window.partitionBy(col(qIdCol)).orderBy(desc("score"), col(cIdCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(qIdCol), col(cIdCol), col("score"), col("rn"))
      .orderBy(col(qIdCol), col("rn"))
  }

  /** Product-quantization codebooks: for subspace j (of `m`), the `ksub`
    * lowest-id corpus vectors' j-th subvector slice — deterministic and
    * SQL-expressible, the same no-training policy as [[ivfTopK]]'s coarse
    * centroids (which is what lets q135 carry a DuckDB oracle).
    * [[kmeansCentroids]] over a sliced subvector column slots in for trained
    * codebooks without changing the query plan (exercised in OperatorsSpec).
    */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int, ksub: Int, dim: Int): Array[Array[Seq[Double]]] = {
    val dsub = dim / m
    val base = corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .orderBy(col(idCol)).limit(ksub)
      .collect().map(_.getSeq[Double](1))
    Array.tabulate(m)(j => base.map(v => v.slice(j * dsub, (j + 1) * dsub)))
  }

  /** One-pass trained PQ codebooks: per-subspace k-means, all `m` subspaces
    * in a SINGLE job per Lloyd iteration (assignments for every subspace
    * computed row-parallel, then one per-(subspace, code, pos) mean
    * aggregation; the collect is m·ksub·dsub doubles — bounded parameter
    * data). Arithmetic is identical to running [[kmeansCentroids]] once per
    * sliced subspace (asserted in OperatorsSpec) — this exists because m
    * separate trainers cost 2·m sequential job launches, which dominate at
    * interactive scale and waste scheduler round-trips at cluster scale.
    * Init entries are the `ksub` lowest-id rows' slices; empty cells keep
    * their entry; centroid components floor-round to 9 decimals per
    * iteration (the SQL-mirror determinism contract).
    */
  def pqTrainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int, ksub: Int, dim: Int, iters: Int): Array[Array[Seq[Double]]] = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    val base = corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .orderBy(col(idCol)).limit(ksub)
      .collect().map(_.getSeq[Double](1))
    var cbs: Array[Array[Seq[Double]]] =
      Array.tabulate(m)(j => base.map(_.slice(j * dsub, (j + 1) * dsub)))
    import graft.functions.expressions.PqEncode
    import org.apache.spark.sql.{GraftSqlBridge => B}
    for (_ <- 1 to iters) {
      // assignment via the native PqEncode kernel — the unrolled m·ksub
      // expression formulation fails whole-stage compilation (see pqTopK)
      val cbArr: Array[Array[Array[Double]]] = cbs.map(_.map(_.toArray))
      val assigned = corpus
        .select(B.column(PqEncode(B.expression(asDouble(col(vecCol))), cbArr)).as("__codes"),
          asDouble(col(vecCol)).as("__v"))
        .select(explode(array((0 until m).map(j =>
          struct(lit(j).as("j"), col("__codes").getItem(j).as("code"),
            slice(col("__v"), j * dsub + 1, dsub).as("sv"))): _*)).as("a"))
        .select(col("a.j"), col("a.code"), posexplode(col("a.sv")))
      val means = assigned.groupBy(col("j"), col("code"), col("pos"))
        .agg(floorRound(avg("col"), 9).as("mc"))
        .collect()
      val byJC = means.groupBy(r => (r.getInt(0), r.getInt(1)))
      cbs = Array.tabulate(m) { j =>
        cbs(j).indices.map { c =>
          byJC.get((j, c)) match {
            case Some(rows) => rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
            case None       => cbs(j)(c) // empty cell keeps its entry
          }
        }.toArray
      }
    }
    cbs
  }

  /** IVF-PQ approximate nearest neighbor (Jégou/Douze/Schmid, TPAMI 2011):
    * the 100-TB vector-search shape — coarse IVF cells bound the candidate
    * set (equi-join on the cell id, no all-pairs), and candidates are scored
    * by PRODUCT-QUANTIZED codes instead of raw vectors: each corpus vector is
    * encoded once as `m` small codes (argmin codebook entry per subvector;
    * uint8 semantics for ksub ≤ 256), and a query scores a candidate with `m`
    * TABLE LOOKUPS into its precomputed asymmetric-distance table rather than
    * a dim-wide dot product. At cluster scale the index is codes-only
    * (m bytes/vector instead of 4·dim), the scan is memory-bandwidth-bound
    * lookups, and the shuffle moves slim (cell, codes) rows — the raw vectors
    * never travel.
    *
    * This is the no-residual IVFADC variant (codes quantize the vector
    * itself, not v − centroid): recall trades a little vs residual encoding,
    * but every stage stays deterministic and exactly SQL-mirrorable —
    * codebooks are [[pqCodebooks]]'s lowest-id slices, so code assignment AND
    * reconstructed distances verify in exact arithmetic (q135), and the
    * recall audit vs the exact scan is itself oracle-checked (q136).
    *
    * Scores are reconstructed SQUARED L2 distances (smaller = closer);
    * ranking ties break by candidate id.
    */
  def pqTopK(queries: DataFrame, qIdCol: String, qVecCol: String,
             corpus: DataFrame, cIdCol: String, cVecCol: String,
             k: Int, m: Int, ksub: Int, dim: Int,
             nlist: Int, nprobe: Int, roundTo: Int = 6,
             excludeSelf: Boolean = true,
             codebooks: Option[Array[Array[Seq[Double]]]] = None,
             coarseCentroids: Option[Array[Seq[Double]]] = None,
             encoded: Option[DataFrame] = None): DataFrame = {
    val (enc, qbOf, adist) =
      pqParts(corpus, cIdCol, cVecCol, m, ksub, dim, nlist, nprobe, codebooks,
        coarseCentroids, encoded)
    val qb = qbOf(queries, qIdCol, qVecCol)
    val scored = enc.join(broadcast(qb), Seq("__cell"))
      .filter(lit(!excludeSelf) || col(qIdCol) =!= col(cIdCol))
      .withColumn("score", floorRound(adist, roundTo))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("score"), col(cIdCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(qIdCol), col(cIdCol), col("score"), col("rn"))
      .orderBy(col(qIdCol), col("rn"))
  }

  /** The IVF-PQ plan pieces, shared verbatim between the batch top-k
    * ([[pqTopK]], q135) and the streaming probe
    * ([[graft.streaming.StreamingAnn]], q151): (encoded corpus with cell
    * assignments, a query-banding builder usable on batch OR streaming
    * query relations, the ADC distance column over the joined pair). One
    * arithmetic, two execution topologies — which is exactly what makes
    * stream ≡ batch provable row-for-row.
    */
  private[graft] def pqParts(corpus: DataFrame, cIdCol: String, cVecCol: String,
      m: Int, ksub: Int, dim: Int, nlist: Int, nprobe: Int,
      codebooks: Option[Array[Array[Seq[Double]]]],
      coarseCentroids: Option[Array[Seq[Double]]] = None,
      encoded: Option[DataFrame] = None)
      : (DataFrame, (DataFrame, String, String) => DataFrame, Column) = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(nprobe <= nlist, "nprobe must be <= nlist")
    val dsub = dim / m
    val cbs = codebooks.getOrElse(pqCodebooks(corpus, cIdCol, cVecCol, m, ksub, dim))
    require(cbs.length == m && cbs.forall(cb => cb.length == ksub && cb.forall(_.length == dsub)),
      s"codebooks must be m=$m groups of ksub=$ksub $dsub-dim entries (ADC offsets assume it)")

    // coarse IVF cells — lowest-id default as ivfTopK, or trained centroids
    val cents: Array[Array[Double]] = coarseCentroids
      .map(_.map(_.toArray).toArray)
      .getOrElse(corpus
        .select(col(cIdCol), asDouble(col(cVecCol)).as("v"))
        .orderBy(col(cIdCol)).limit(nlist)
        .collect().map(_.getSeq[Double](1).toArray))

    // Encoding and ADC table as native kernel expressions
    // (functions.expressions.PqExpressions): the unrolled Column formulation
    // (m·ksub struct/dot subtrees) blows past janino's method limits — the
    // whole-stage compile FAILS (≈5 s per attempt) and execution falls back
    // to interpreted. Same arithmetic, one compact codegen'd call per row.
    import graft.functions.expressions.{PqAdcTable, PqEncode}
    import org.apache.spark.sql.{GraftSqlBridge => B}
    val cbArr: Array[Array[Array[Double]]] = cbs.map(_.map(_.toArray))
    def codesCol(vec: Column): Column = B.column(PqEncode(B.expression(vec), cbArr))
    def dtabCol(vec: Column): Column = B.column(PqAdcTable(B.expression(vec), cbArr))

    // `encoded`: a pre-materialized (cIdCol, __cell, __codes) index table —
    // the DEPLOYMENT shape (r12 verdict task 8: the encoded corpus IS the
    // artifact a real IVF-PQ index ships; scoring stays live). Content is
    // a pure function of (corpus, codebooks, centroids), so load-vs-encode
    // can never change a result.
    val enc = encoded.getOrElse(corpus.select(col(cIdCol),
      argminCell(col(cVecCol), cents).as("__cell"),
      codesCol(asDouble(col(cVecCol))).as("__codes")))
    def qbOf(queries: DataFrame, qIdCol: String, qVecCol: String): DataFrame = queries
      .select(col(qIdCol),
        probeCells(col(qVecCol), cents, nprobe).as("__probes"),
        dtabCol(asDouble(col(qVecCol))).as("__dtab"))
      // posexplode, not explode: the probe's 0-based position is the cell's
      // rank in the query's probe order — `__probe_rn` = pos + 1, the knob
      // the nprobe frontier sweep (q197) slices on
      .select(col(qIdCol), col("__dtab"), posexplode(col("__probes")))
      .withColumn("__cell", col("col"))
      .withColumn("__probe_rn", (col("pos") + 1).cast("long"))
      .drop("pos", "col")
    // ADC scan: m lookups + adds per candidate — no vector arithmetic
    val adist = (0 until m)
      .map(j => element_at(col("__dtab"), col("__codes").getItem(j) + lit(j * ksub + 1)))
      .reduce(_ + _)
    (enc, qbOf, adist)
  }

  /** ALL scored IVF-PQ candidates within the `nprobe` nearest cells, each
    * tagged with its probing cell's rank in the query's probe order — the
    * single relation every operating point of a recall-vs-cost sweep
    * (q197) slices: the nprobe = p point is `probe_rn <= p`, so the sweep
    * re-ranks one cached slim table instead of re-scanning the index per
    * point. Returns (qIdCol, cIdCol, score, probe_rn).
    */
  def pqCandidates(queries: DataFrame, qIdCol: String, qVecCol: String,
                   corpus: DataFrame, cIdCol: String, cVecCol: String,
                   m: Int, ksub: Int, dim: Int, nlist: Int, nprobe: Int,
                   roundTo: Int = 6, excludeSelf: Boolean = true,
                   codebooks: Option[Array[Array[Seq[Double]]]] = None,
                   coarseCentroids: Option[Array[Seq[Double]]] = None,
                   encoded: Option[DataFrame] = None): DataFrame = {
    val (enc, qbOf, adist) =
      pqParts(corpus, cIdCol, cVecCol, m, ksub, dim, nlist, nprobe, codebooks,
        coarseCentroids, encoded)
    enc.join(broadcast(qbOf(queries, qIdCol, qVecCol)), Seq("__cell"))
      .filter(lit(!excludeSelf) || col(qIdCol) =!= col(cIdCol))
      .withColumn("score", floorRound(adist, roundTo))
      .select(col(qIdCol), col(cIdCol), col("score"), col("__probe_rn").as("probe_rn"))
  }

  /** [[pqCandidates]] for the residual (optionally OPQ-rotated) chain. */
  def pqResidualCandidates(queries: DataFrame, qIdCol: String, qVecCol: String,
                           corpus: DataFrame, cIdCol: String, cVecCol: String,
                           m: Int, ksub: Int, dim: Int, nlist: Int, nprobe: Int,
                           roundTo: Int = 6, excludeSelf: Boolean = true,
                           codebooks: Option[Array[Array[Seq[Double]]]] = None,
                           coarseCentroids: Option[Array[Seq[Double]]] = None,
                           rotation: Option[Array[Array[Double]]] = None,
                           encoded: Option[DataFrame] = None): DataFrame = {
    val (enc, qbOf, adist) =
      pqResidualParts(corpus, cIdCol, cVecCol, m, ksub, dim, nlist, nprobe,
        codebooks, coarseCentroids, rotation, encoded)
    enc.join(broadcast(qbOf(queries, qIdCol, qVecCol)), Seq("__cell"))
      .filter(lit(!excludeSelf) || col(qIdCol) =!= col(cIdCol))
      .withColumn("score", floorRound(adist, roundTo))
      .select(col(qIdCol), col(cIdCol), col("score"), col("__probe_rn").as("probe_rn"))
  }

  /** The ENCODED corpus `(id, __cell, __codes)` as a standalone relation —
    * what a deployed IVF-PQ index actually persists (r12 verdict task 8):
    * cell assignment + PQ codes for every vector, a pure function of
    * (corpus, codebooks, centroids), so it qualifies for
    * [[graft.pipeline.ArtifactStore]]. Consumers pass the loaded table back
    * through the `encoded` parameter of [[pqTopK]]/[[pqCandidates]];
    * candidate SCORING stays live — an audit that loads its own prior
    * scores would be weaker evidence than one that recomputes them.
    */
  def pqEncodedCorpus(corpus: DataFrame, cIdCol: String, cVecCol: String,
                      m: Int, ksub: Int, dim: Int, nlist: Int,
                      codebooks: Option[Array[Array[Seq[Double]]]] = None,
                      coarseCentroids: Option[Array[Seq[Double]]] = None): DataFrame =
    pqParts(corpus, cIdCol, cVecCol, m, ksub, dim, nlist, nprobe = 1,
      codebooks, coarseCentroids)._1

  /** [[pqEncodedCorpus]] for the residual (optionally OPQ-rotated) chain. */
  def pqResidualEncodedCorpus(corpus: DataFrame, cIdCol: String, cVecCol: String,
                              m: Int, ksub: Int, dim: Int, nlist: Int,
                              codebooks: Option[Array[Array[Seq[Double]]]] = None,
                              coarseCentroids: Option[Array[Seq[Double]]] = None,
                              rotation: Option[Array[Array[Double]]] = None): DataFrame =
    pqResidualParts(corpus, cIdCol, cVecCol, m, ksub, dim, nlist, nprobe = 1,
      codebooks, coarseCentroids, rotation)._1

  /** Per-dimension SQ8 scalar-quantization parameters — the corpus min/max
    * per component (public Faiss `ScalarQuantizer QT_8bit` practice): the
    * trained-parameter relation a deployment materializes once
    * ([[graft.pipeline.ArtifactStore]]). Output (pos, mn, mx), pos
    * 0-based. One posexplode + a 64-key min/max aggregate — the cheapest
    * training step in the quantizer family.
    */
  def sq8Train(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.select(posexplode(asDouble(col(vecCol))))
      .groupBy(col("pos").cast("long").as("pos"))
      .agg(min("col").as("mn"), max("col").as("mx"))
      .orderBy("pos")

  /** Per-dimension SQ8 byte codes as a LONG array — the column a deployed
    * SQ8 index persists per vector. Token-for-token the encode of
    * [[sq8Candidates]] (`clamp(⌊(x−mn)·255/(mx−mn)⌋, 0, 255)`, 0 on a
    * degenerate range); the cast to long is exact (codes are
    * integer-valued doubles in [0, 255]) and mirrors the oracle's
    * `CAST(… AS BIGINT)`.
    */
  private def sq8CodesCol(vec: Column, params: Array[(Double, Double)]): Column = {
    val mnA = array(params.map(p => lit(p._1)): _*)
    val rngA = array(params.map(p => lit(p._2 - p._1)): _*)
    val dv = zip_with(vec, mnA, (x, mn) => x - mn)
    val codes = zip_with(dv, rngA, (d, r) =>
      when(r > lit(0.0),
        least(greatest(floor(d * lit(255.0) / r).cast("double"), lit(0.0)), lit(255.0)))
        .otherwise(lit(0.0)))
    transform(codes, c => c.cast("long"))
  }

  /** The SQ8 DEPLOYMENT index relation `(id, __cell, __codes)` — the
    * cell-partitioned artifact shape of [[pqEncodedCorpus]] for the
    * scalar-quantization chain (r19 verdict missing #1: raw/residual/OPQ
    * all had deployed artifacts with erasure + migration; SQ8 — the chain
    * a deployment picks for per-dim fidelity at dim bytes/vector — had
    * neither). One byte-code per dimension under the trained per-dim
    * min/max ([[sq8Train]]); cells from the trained coarse centroids.
    * Map-only encode, a pure function of (corpus, params, centroids), so
    * it rides [[graft.pipeline.IndexErasure]]/[[graft.pipeline
    * .IndexMigration]] exactly like the PQ chains.
    */
  def sq8EncodedCorpus(corpus: DataFrame, cIdCol: String, cVecCol: String,
                       nlist: Int, params: Array[(Double, Double)],
                       coarseCentroids: Option[Array[Seq[Double]]] = None): DataFrame = {
    val cents: Array[Array[Double]] = coarseCentroids
      .map(_.map(_.toArray).toArray)
      .getOrElse(corpus
        .select(col(cIdCol), asDouble(col(cVecCol)).as("v"))
        .orderBy(col(cIdCol)).limit(nlist)
        .collect().map(_.getSeq[Double](1).toArray))
    corpus.select(col(cIdCol),
      argminCell(col(cVecCol), cents).as("__cell"),
      sq8CodesCol(asDouble(col(cVecCol)), params).as("__codes"))
  }

  /** The SQ8 reconstruction x̂ of `vec` under `params` — encode + decode
    * in one expression (`x̂_i = mn_i + clamp(⌊(x_i−mn_i)·255/rng_i⌋)·
    * rng_i/255`), the quantity every SQ8 scorer ranks against. Exposed
    * for the fidelity evals (q291's A/B gate reconstructs the SAME
    * corpus under stale and refit params side by side).
    */
  def sq8Reconstruct(vec: Column, params: Array[(Double, Double)]): Column = {
    val mnA = array(params.map(p => lit(p._1)): _*)
    val rngA = array(params.map(p => lit(p._2 - p._1)): _*)
    val dv = zip_with(vec, mnA, (x, mn) => x - mn)
    val codes = zip_with(dv, rngA, (d, r) =>
      when(r > lit(0.0),
        least(greatest(floor(d * lit(255.0) / r).cast("double"), lit(0.0)), lit(255.0)))
        .otherwise(lit(0.0)))
    val rec = zip_with(codes, rngA, (c, r) => c * r / lit(255.0))
    zip_with(rec, mnA, (a, b) => a + b)
  }

  /** SQ8 top-k served FROM a deployed byte-code artifact (`encoded`:
    * `(cIdCol, cell, __codes)` — [[sq8EncodedCorpus]]'s cell-partitioned
    * relation as [[graft.pipeline.IndexErasure.readPartitioned]] returns
    * it): candidates from the query's `nprobe` nearest cells, each scored
    * against the RECONSTRUCTION decoded from its stored codes
    * (`x̂_i = mn_i + code_i·(mx_i−mn_i)/255` — the same IEEE ops, in the
    * same order, as [[sq8Candidates]]' encode-then-reconstruct, with the
    * clamp already baked into the stored code), so serving from the
    * artifact is bit-identical to encoding live. The q288
    * erasure-query-visibility leg serves a REPAIRED artifact through
    * this: hash-equality with the survivor-rebuilt ranking proves no
    * erased id is retrievable at any rank, for any probe.
    */
  def sq8TopKEncoded(queries: DataFrame, qIdCol: String, qVecCol: String,
                     encoded: DataFrame, cIdCol: String,
                     k: Int, nlist: Int, nprobe: Int,
                     params: Array[(Double, Double)],
                     coarseCentroids: Array[Seq[Double]],
                     roundTo: Int = 6, excludeSelf: Boolean = true): DataFrame = {
    import graft.functions.VectorFunctions.dotFused
    require(nprobe <= nlist, "nprobe must be <= nlist")
    val cents = coarseCentroids.map(_.toArray)
    val mnA = array(params.map(p => lit(p._1)): _*)
    val rngA = array(params.map(p => lit(p._2 - p._1)): _*)
    val xhat = {
      val rec = zip_with(col("__codes").cast("array<double>"), rngA,
        (c, r) => c * r / lit(255.0))
      zip_with(rec, mnA, (a, b) => a + b)
    }
    val enc = encoded.select(col(cIdCol), col("cell").cast("long").as("__cell"),
        xhat.as("__xhat"))
      .withColumn("__x2", l2NormSq(col("__xhat")))
    val qb = queries
      .select(col(qIdCol), asDouble(col(qVecCol)).as("__qv"),
        probeCells(col(qVecCol), cents, nprobe).as("__probes"))
      .withColumn("__q2", l2NormSq(col("__qv")))
      .select(col(qIdCol), col("__qv"), col("__q2"), explode(col("__probes")).as("__cellp"))
      .withColumn("__cell", col("__cellp").cast("long"))
      .drop("__cellp")
    val scored = enc.join(broadcast(qb), Seq("__cell"))
      .filter(lit(!excludeSelf) || col(qIdCol) =!= col(cIdCol))
      .withColumn("score", floorRound(
        col("__q2") + col("__x2") - lit(2.0) * dotFused(col("__qv"), col("__xhat")), roundTo))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("score"), col(cIdCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(qIdCol), col(cIdCol), col("score"), col("rn"))
      .orderBy(col(qIdCol), col("rn"))
  }

  /** SQ8 candidates within the `nprobe` nearest cells — the CHEAP-MEMORY
    * operating point of the quantizer frontier (r12 verdict task 5): each
    * component quantizes independently to one byte,
    * `code_i = clamp(⌊(x_i − mn_i)·255/(mx_i − mn_i)⌋, 0, 255)`, and the
    * asymmetric distance scores the query against the RECONSTRUCTION
    * `x̂_i = mn_i + code_i·(mx_i − mn_i)/255` as |q|² + |x̂|² − 2·q·x̂ —
    * dim bytes/vector (64 here) vs PQ's m·log₂(ksub)/8 (8 here): 8× the
    * memory, no codebook training, per-dim fidelity. Same probe plumbing
    * and `probe_rn` tagging as [[pqCandidates]], so the frontier sweep
    * slices it identically. Encode→reconstruct is map-only on the corpus;
    * mn/mx arrive as trained literals (the [[sq8Train]] artifact).
    *
    * Determinism: the corpus components and the trained mn/mx are
    * integer-valued doubles on the audit corpus, and every expression
    * (subtract, ·255, divide, floor, clamp, reconstruct) is mirrored
    * token-for-token in the oracle SQL — identical IEEE ops in identical
    * order, so codes and distances agree bit-for-bit cross-engine.
    */
  def sq8Candidates(queries: DataFrame, qIdCol: String, qVecCol: String,
                    corpus: DataFrame, cIdCol: String, cVecCol: String,
                    nlist: Int, nprobe: Int,
                    params: Array[(Double, Double)],
                    coarseCentroids: Option[Array[Seq[Double]]] = None,
                    roundTo: Int = 6, excludeSelf: Boolean = true): DataFrame = {
    import graft.functions.VectorFunctions.dotFused
    require(nprobe <= nlist, "nprobe must be <= nlist")
    val cents: Array[Array[Double]] = coarseCentroids
      .map(_.map(_.toArray).toArray)
      .getOrElse(corpus
        .select(col(cIdCol), asDouble(col(cVecCol)).as("v"))
        .orderBy(col(cIdCol)).limit(nlist)
        .collect().map(_.getSeq[Double](1).toArray))
    val enc = corpus.select(col(cIdCol),
      argminCell(col(cVecCol), cents).as("__cell"),
      sq8Reconstruct(asDouble(col(cVecCol)), params).as("__xhat"))
      .withColumn("__x2", l2NormSq(col("__xhat")))
    val qb = queries
      .select(col(qIdCol), asDouble(col(qVecCol)).as("__qv"),
        probeCells(col(qVecCol), cents, nprobe).as("__probes"))
      .withColumn("__q2", l2NormSq(col("__qv")))
      .select(col(qIdCol), col("__qv"), col("__q2"), posexplode(col("__probes")))
      .withColumn("__cell", col("col"))
      .withColumn("__probe_rn", (col("pos") + 1).cast("long"))
      .drop("pos", "col")
    enc.join(broadcast(qb), Seq("__cell"))
      .filter(lit(!excludeSelf) || col(qIdCol) =!= col(cIdCol))
      .withColumn("score", floorRound(
        col("__q2") + col("__x2") - lit(2.0) * dotFused(col("__qv"), col("__xhat")), roundTo))
      .select(col(qIdCol), col(cIdCol), col("score"), col("__probe_rn").as("probe_rn"))
  }

  /** RESIDUAL IVF-PQ (Jégou/Douze/Schmid, TPAMI 2011 §III — the IVFADC the
    * paper actually specifies): codes quantize the residual `v −
    * centroid(cell(v))` rather than the raw vector, so each codebook only
    * has to cover the spread WITHIN a coarse cell instead of the whole
    * space — the standard construction users expect, recovering recall on
    * clustered corpora at identical index size. The query side pays one ADC
    * table per PROBED CELL (the table is over `q − centroid(cell)`, which
    * differs per cell) instead of one per query: m·ksub doubles × nprobe —
    * still parameter-sized broadcast state.
    *
    * Every stage stays deterministic and SQL-mirrorable (q164): the coarse
    * quantizer is byte-identical to [[pqParts]], the residual is one exact
    * double subtraction, and training/encoding run the same kernels on the
    * residual column.
    */
  def pqResidualTopK(queries: DataFrame, qIdCol: String, qVecCol: String,
                     corpus: DataFrame, cIdCol: String, cVecCol: String,
                     k: Int, m: Int, ksub: Int, dim: Int,
                     nlist: Int, nprobe: Int, roundTo: Int = 6,
                     excludeSelf: Boolean = true,
                     codebooks: Option[Array[Array[Seq[Double]]]] = None,
                     coarseCentroids: Option[Array[Seq[Double]]] = None,
                     rotation: Option[Array[Array[Double]]] = None,
                     encoded: Option[DataFrame] = None): DataFrame = {
    val (enc, qbOf, adist) =
      pqResidualParts(corpus, cIdCol, cVecCol, m, ksub, dim, nlist, nprobe,
        codebooks, coarseCentroids, rotation, encoded)
    val qb = qbOf(queries, qIdCol, qVecCol)
    val scored = enc.join(broadcast(qb), Seq("__cell"))
      .filter(lit(!excludeSelf) || col(qIdCol) =!= col(cIdCol))
      .withColumn("score", floorRound(adist, roundTo))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("score"), col(cIdCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(qIdCol), col(cIdCol), col("score"), col("rn"))
      .orderBy(col(qIdCol), col("rn"))
  }

  /** The residual corpus `(id, v − centroid(cell(v)))` under the
    * deterministic lowest-id coarse centroids — the training input for
    * residual codebooks ([[pqTrainCodebooks]] runs on it unchanged).
    */
  def pqResidualCorpus(corpus: DataFrame, idCol: String, vecCol: String,
                       nlist: Int,
                       coarseCentroids: Option[Array[Seq[Double]]] = None): DataFrame = {
    val cents: Array[Array[Double]] = coarseCentroids
      .map(_.map(_.toArray).toArray)
      .getOrElse(corpus
        .select(col(idCol), asDouble(col(vecCol)).as("v"))
        .orderBy(col(idCol)).limit(nlist)
        .collect().map(_.getSeq[Double](1).toArray))
    val v = asDouble(col(vecCol))
    corpus.select(col(idCol),
      zip_with(v, centroidOf(argminCell(v, cents), cents),
        (a, b) => a - b).as("__resid"))
  }

  /** Residual-encoding plan pieces — [[pqParts]]' shape with the residual
    * subtraction spliced in on both sides of the join key.
    */
  private[graft] def pqResidualParts(corpus: DataFrame, cIdCol: String, cVecCol: String,
      m: Int, ksub: Int, dim: Int, nlist: Int, nprobe: Int,
      codebooks: Option[Array[Array[Seq[Double]]]],
      coarseCentroids: Option[Array[Seq[Double]]] = None,
      rotation: Option[Array[Array[Double]]] = None,
      encoded: Option[DataFrame] = None)
      : (DataFrame, (DataFrame, String, String) => DataFrame, Column) = {
    import graft.functions.VectorFunctions.{dotFused, matVec}
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(nprobe <= nlist, "nprobe must be <= nlist")
    require(rotation.forall(r => r.length == dim && r.forall(_.length == dim)),
      s"rotation must be $dim×$dim")
    val dsub = dim / m
    val cbs = codebooks.getOrElse {
      val rc0 = pqResidualCorpus(corpus, cIdCol, cVecCol, nlist, coarseCentroids)
      val rc = rotation.fold(rc0)(r =>
        rc0.select(col(cIdCol), matVec(col("__resid"), r).as("__resid")))
      pqCodebooks(rc, cIdCol, "__resid", m, ksub, dim)
    }
    require(cbs.length == m && cbs.forall(cb => cb.length == ksub && cb.forall(_.length == dsub)),
      s"codebooks must be m=$m groups of ksub=$ksub $dsub-dim entries (ADC offsets assume it)")
    val cents: Array[Array[Double]] = coarseCentroids
      .map(_.map(_.toArray).toArray)
      .getOrElse(corpus
        .select(col(cIdCol), asDouble(col(cVecCol)).as("v"))
        .orderBy(col(cIdCol)).limit(nlist)
        .collect().map(_.getSeq[Double](1).toArray))
    // OPQ composition point ([[Opq]]): the learned orthogonal rotation is
    // applied to the RESIDUAL on both sides of the join — distances are
    // rotation-invariant, so the ADC arithmetic downstream is untouched;
    // only the space the codebooks quantize becomes variance-balanced.
    def resid(vec: Column, cell: Column): Column = {
      val r0 = zip_with(vec, centroidOf(cell, cents), (a, b) => a - b)
      rotation.fold(r0)(rm => matVec(r0, rm))
    }

    import graft.functions.expressions.{PqAdcTable, PqEncode}
    import org.apache.spark.sql.{GraftSqlBridge => B}
    val cbArr: Array[Array[Array[Double]]] = cbs.map(_.map(_.toArray))
    def codesCol(vec: Column): Column = B.column(PqEncode(B.expression(vec), cbArr))
    def dtabCol(vec: Column): Column = B.column(PqAdcTable(B.expression(vec), cbArr))

    // see pqParts: `encoded` is the materialized deployment index table
    val enc = encoded.getOrElse(corpus
      .withColumn("__cell", argminCell(col(cVecCol), cents))
      .select(col(cIdCol), col("__cell"),
        codesCol(resid(asDouble(col(cVecCol)), col("__cell"))).as("__codes")))
    def qbOf(queries: DataFrame, qIdCol: String, qVecCol: String): DataFrame = queries
      .select(col(qIdCol),
        probeCells(col(qVecCol), cents, nprobe).as("__probes"),
        asDouble(col(qVecCol)).as("__qv"))
      // posexplode for the probe-rank column — see pqParts.qbOf
      .select(col(qIdCol), col("__qv"), posexplode(col("__probes")))
      .withColumn("__cell", col("col"))
      .withColumn("__probe_rn", (col("pos") + 1).cast("long"))
      .withColumn("__dtab", dtabCol(resid(col("__qv"), col("__cell"))))
      .drop("pos", "col", "__qv")
    val adist = (0 until m)
      .map(j => element_at(col("__dtab"), col("__codes").getItem(j) + lit(j * ksub + 1)))
      .reduce(_ + _)
    (enc, qbOf, adist)
  }

  /** SemDeDup-style semantic dedup (Abbas et al., "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", arXiv 2023):
    * assign every embedding to an IVF coarse cell, generate cosine pairs only
    * WITHIN each cell, and drop the higher-id member of every pair scoring
    * `>= threshold` (keep-first, the same policy as [[Dedup.keepFirst]]).
    * Returns the surviving rows of `df` plus their `cell` id.
    *
    * This is the embedding-space dedup that actually ships at corpus scale:
    * candidate generation is an equi-join on the cell id, so pair work is
    * O(n²/nlist) spread across nlist independent cells instead of one global
    * O(n²) — and the cells are exactly the IVF partitions [[ivfTopK]] already
    * maintains. Cell assignment mirrors [[ivfTopK]] (nlist lowest-id vectors
    * as deterministic coarse centroids, argmin |c|²−2·v·c), so the whole
    * operator is SQL-expressible and oracle-checked (q83).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, nlist: Int, roundTo: Int = 6): DataFrame = {
    val cents: Array[Array[Double]] = df
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .orderBy(col(idCol)).limit(nlist)
      .collect().map(_.getSeq[Double](1).toArray)
    // slim (id, cell) relation cached once — the cell expression is nlist
    // fused dot products, so letting Catalyst substitute it into both sides
    // of the self-join would double the assignment work (the q28 lesson)
    val slim = df.select(col(idCol).as("__id"),
        argminCell(col(vecCol), cents).cast("long").as("cell"))
      .cache() // cache-lifetime: pinned by the returned plan — caller releases (see Caching)
    val cand = slim.select(col("__id").as("id_a"), col("cell"))
      .join(slim.select(col("__id").as("id_b"), col("cell")), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
    val v = df.select(col(idCol).as("__vid"), col(vecCol).as("__vec"))
      .withColumn("__nsq", l2NormSq(col("__vec")))
    val drops = cand
      .join(v.select(col("__vid"), col("__vec").as("__vec_a"), col("__nsq").as("__nsq_a")),
            col("id_a") === col("__vid")).drop("__vid")
      .join(v.select(col("__vid"), col("__vec").as("__vec_b"), col("__nsq").as("__nsq_b")),
            col("id_b") === col("__vid")).drop("__vid")
      .withColumn("__score", floorRound(
        cosineFromNormSq(col("__vec_a"), col("__vec_b"), col("__nsq_a"), col("__nsq_b")), roundTo))
      .filter(col("__score") >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
      .join(slim.withColumnRenamed("__id", idCol), Seq(idCol))
  }

  /** Lloyd-iteration k-means refinement of the IVF coarse centroids:
    * assignment is the same argmin(|c|²−2·v·c) expression, the update is a
    * relational posexplode + per-(cell,pos) mean — one shuffle per iteration,
    * centroids collected to the driver (k·dim doubles, tiny). Deterministic
    * up to floating summation order; centroids are floor-rounded to 9 decimal
    * places each iteration so cross-run assignment flips need a ~1e-9
    * coincidence.
    */
  def kmeansCentroids(corpus: DataFrame, vecCol: String, idCol: String,
                      k: Int, iters: Int): Array[Seq[Double]] = {
    val init: Array[Seq[Double]] = corpus
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .orderBy(col(idCol)).limit(k)
      .collect().map(_.getSeq[Double](1))
    kmeansIterate(corpus, vecCol, init, iters)
  }

  /** Lloyd iterations from an EXPLICIT initial centroid set — the init
    * policy factored out of [[kmeansCentroids]] so callers can stratify it
    * (lowest-id init seeds every centroid from the id-range head, which
    * collapses domains that arrive at higher ids — the PERF_r17 §2
    * pathology; a content-hash-ordered init spreads the seeds uniformly
    * over the corpus regardless of arrival order). Same arithmetic per
    * iteration: argmin assignment, per-(cell,pos) floor-rounded mean,
    * empty cells keep their entry.
    */
  def kmeansIterate(corpus: DataFrame, vecCol: String,
                    init: Array[Seq[Double]], iters: Int): Array[Seq[Double]] = {
    var cents: Array[Seq[Double]] = init
    for (_ <- 1 to iters) {
      val assigned = corpus
        .select(asDouble(col(vecCol)).as("v"))
        .withColumn("__cell", argminCell(col("v"), centMat(cents.toSeq)))
      val means = assigned
        .select(col("__cell"), posexplode(col("v")))
        .groupBy("__cell", "pos")
        .agg(floorRound(avg("col"), 9).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      cents = cents.indices.map { i =>
        byCell.get(i) match {
          case Some(rows) => rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          case None       => cents(i) // empty cell keeps its centroid
        }
      }.toArray
    }
    cents
  }

  /** Johnson–Lindenstrauss random projection: dim → outDim via the same
    * deterministic integer-hash plane family as the LSH buckets (JL needs
    * only a sub-Gaussian projection matrix — the centered hash components
    * qualify; Achlioptas, "Database-friendly random projections", PODS 2001
    * shows even ±1 entries do). Components are scaled by 1/(|p_j|·√outDim)
    * so projected L2 distances approximate original ones, and floor-rounded
    * so the DuckDB oracle reproduces them bit-exactly.
    *
    * The scale story: map-only (one codegen'd projection per row, no
    * shuffle), and downstream ANN / clustering / near-dup over the outDim
    * columns costs dim/outDim less per distance — project once, search many.
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
                       outDim: Int, dim: Int, roundTo: Int = 6): DataFrame = {
    val planes = hyperplanes(outDim, dim)
    val vd = asDouble(col(vecCol))
    val proj = array(projectionCols(vd, planes, outDim, roundTo): _*)
    df.select(col(idCol), proj.as("proj"))
  }

  /** [[randomProjection]] with one flat DOUBLE column per component
    * (`c0..c{outDim-1}`) instead of an array — no Generate/explode in the
    * plan, so the whole projection stays inside one WholeStageCodegen span
    * (the array+posexplode form drops the 16-dot projection out of codegen:
    * measured ~5× slower at sf0.1). The shape downstream columnar consumers
    * (and the q67 oracle) want anyway.
    */
  def randomProjectionWide(df: DataFrame, idCol: String, vecCol: String,
                           outDim: Int, dim: Int, roundTo: Int = 6): DataFrame = {
    val planes = hyperplanes(outDim, dim)
    val vd = asDouble(col(vecCol))
    val cols = projectionCols(vd, planes, outDim, roundTo)
      .zipWithIndex.map { case (c, j) => c.as(s"c$j") }
    df.select(col(idCol) +: cols: _*)
  }

  private def projectionCols(vd: Column, planes: Seq[Seq[Double]],
                             outDim: Int, roundTo: Int): Seq[Column] =
    planes.map { p =>
      val norm = math.sqrt(p.map(x => x * x).sum) * math.sqrt(outDim.toDouble)
      floorRound(dotFused(vd, array(p.map(lit): _*)) / lit(norm), roundTo)
    }

  /** Near-duplicate pairs by embedding cosine >= threshold, LSH-bucketed
    * candidates (same bucket or hamming-1 neighbors via multiprobe — exactly
    * one probe can match a pair, so no dedup join is needed). The
    * embedding-space analog of [[Dedup.minhashLshPairs]].
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nbits: Int, dim: Int,
                         roundTo: Int = 6, multiprobe: Boolean = true): DataFrame = {
    val planes = hyperplanes(nbits, dim)
    // Slim-candidate pattern (same as Dedup.minhashLshPairs): the bucket id
    // is computed ONCE on a two-column (id, bucket) relation and cached —
    // two longs per row, so the columnar cache is cheap, unlike caching the
    // nested float arrays. Without the cache barrier Catalyst collapses the
    // probe projection into the bucket projection and substitutes the full
    // nbits-dot-product bucket expression into every slot of the probe
    // array, multiplying the per-row work by ~nbits (q28 at sf0.1 went
    // 2.5 s → 25.9 s in BENCH_r03 when the barrier was dropped). Vectors are
    // attached to the slim candidate pairs afterwards — at cluster scale the
    // wide arrays shuffle once per side on the id, never on the bucket.
    val slim = df.select(col(idCol).as("__id"), bucketCol(col(vecCol), planes).as("__bucket"))
      .cache() // cache-lifetime: pinned by the returned plan — caller releases (see Caching)
    val l =
      if (multiprobe)
        slim.select(col("__id").as("id_a"), explode(probesCol(col("__bucket"), nbits)).as("__bucket"))
      else slim.select(col("__id").as("id_a"), col("__bucket"))
    val r = slim.select(col("__id").as("id_b"), col("__bucket"))
    val cand = l.join(r, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val v = df.select(col(idCol).as("__vid"), col(vecCol).as("__vec"))
      .withColumn("__nsq", l2NormSq(col("__vec")))
    cand
      .join(v.select(col("__vid"), col("__vec").as("vec_a"), col("__nsq").as("__nsq_a")),
            col("id_a") === col("__vid")).drop("__vid")
      .join(v.select(col("__vid"), col("__vec").as("vec_b"), col("__nsq").as("__nsq_b")),
            col("id_b") === col("__vid")).drop("__vid")
      .withColumn("score", floorRound(
        cosineFromNormSq(col("vec_a"), col("vec_b"), col("__nsq_a"), col("__nsq_b")), roundTo))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
      .orderBy("id_a", "id_b")
  }

  /** The per-dim FLOORED corpus mean of an integer-valued vector column —
    * the centering parameter of [[cosineNearDupPairsBandedCentered]]: one
    * aggregate job returning `dim` longs (`⌊Σx_i / n⌋`, exact integer
    * arithmetic on both engines; the floor costs < 1 count per dim, noise
    * against token-count magnitudes). Centering by the CORPUS mean — not
    * the per-vector mean — is what decorrelates unrelated documents:
    * bucket-count embeddings share the corpus token profile (common-word
    * buckets are hot in every doc), so raw vectors of unrelated docs sit at
    * cosine ≈ 0.6 and ANY sign-projection family sees them as neighbors;
    * residuals around the corpus mean sit at cosine ≈ 0 (measured r16 at
    * sf0.1: unrelated mean 0.089 centered vs 0.611 raw, while true ≥0.95
    * near-dups keep centered cosine ≥ 0.78).
    */
  def flooredMeanVec(df: DataFrame, vecCol: String, dim: Int): Seq[Long] = {
    val aggs = count(lit(1)).as("__n") +:
      (0 until dim).map(i =>
        sum(element_at(col(vecCol), i + 1).cast("long")).as(s"__s$i"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    require(n > 0, "flooredMeanVec needs a non-empty relation")
    (0 until dim).map(i => Math.floorDiv(row.getLong(i + 1), n))
  }

  /** The array of `bands` band buckets of a (corpus-mean-centered) vector:
    * band b's bucket packs the signs of planes [b·rbits, (b+1)·rbits) —
    * shared by [[cosineNearDupPairsBandedCentered]] and the streamed
    * semantic gate (index and probe sides MUST center by the same `m`).
    * One codegen'd kernel ([[graft.functions.expressions.SrpBandBuckets]])
    * computing the [[hyperplanes]] values arithmetically — the literal-array
    * form put bands·rbits·dim ≈ 10⁵ doubles into the plan and the streamed
    * gate re-planned that tree every micro-batch (see the kernel scaladoc).
    */
  def bandBucketsCol(vec: Column, rbits: Int, bands: Int, m: Seq[Long]): Column = {
    import org.apache.spark.sql.{GraftSqlBridge => B}
    val mLit = array(m.map(x => lit(x.toDouble)): _*)
    B.column(graft.functions.expressions.SrpBandBuckets(
      B.expression(asDouble(vec)), B.expression(mLit), rbits, bands))
  }

  /** [[bandBucketsCol]] with the centering mean as a COLUMN — the per-cell
    * variant: the mean array arrives by join (one row per cell), not as a
    * plan literal, so a corpus of any cell count carries exactly one kernel
    * in the plan.
    */
  def bandBucketsColOf(vec: Column, mean: Column, rbits: Int, bands: Int): Column = {
    import org.apache.spark.sql.{GraftSqlBridge => B}
    B.column(graft.functions.expressions.SrpBandBuckets(
      B.expression(asDouble(vec)), B.expression(asDouble(mean)), rbits, bands))
  }

  /** CELL-SCOPED banded-centered near-dup pairs — the multi-domain scale
    * path (round-16 PERF §2's one open residual, closed here): a corpus of
    * distinct vocabulary DOMAINS (languages, sources, crawl segments) keeps
    * each domain's token profile after GLOBAL-mean centering, so
    * within-domain pairs stay sign-correlated and candidates grow
    * super-linearly. SemDeDup's composition (Abbas et al. 2023, §2 —
    * cluster first, compare within clusters) fixes the geometry: assign
    * every vector to a Lloyd-trained cell, center by ITS CELL's floored
    * mean, and band WITHIN the cell ((cell, band, bucket) equi-join).
    * Measured on the 3× disjoint-vocab fixture: cell purity 0.97 after ONE
    * Lloyd step from lowest-id init, within-cell centered cosine mean 0.106
    * (vs 0.5+ under the global mean). The published trade is inherited
    * honestly: pairs SPLIT across cells are never candidates (SemDeDup
    * compares within clusters only) — near-identical vectors co-assign
    * except at argmin knife-edges, so the loss is boundary-measure small.
    *
    * `assigned` carries (idCol, vecCol, cellCol); verification is exact
    * RAW cosine ≥ threshold, as everywhere in this family. Per-cell means
    * are a GROUP BY relation joined back — parameter-free plans at any
    * cell count.
    */
  /** Per-cell FLOORED integer mean of `assigned` (idCol, vecCol, cellCol) —
    * Math.floorDiv semantics, matching [[flooredMeanVec]] (the q243/q244
    * oracles' BIGINT `//` truncates, but their bucket-count components are
    * nonnegative so floor ≡ truncate there; the operator contract floors
    * for any integer-valued input). Output: one row per cell,
    * (cellCol, __mu array<double>) — the centering-parameter relation the
    * batch pair path ([[cosineNearDupPairsCellBanded]]) and the streamed
    * cell gate ([[graft.streaming.StreamingDedup]]) both join.
    */
  def perCellFlooredMeans(assigned: DataFrame, vecCol: String,
                          cellCol: String): DataFrame =
    assigned
      .select(col(cellCol), posexplode(asDouble(col(vecCol))).as(Seq("__i", "__x")))
      .groupBy(col(cellCol), col("__i"))
      .agg(graft.functions.MathFunctions.floorLongDiv(
        sum(col("__x").cast("long")), count(lit(1))).as("__m"))
      .groupBy(col(cellCol))
      .agg(transform(sort_array(collect_list(struct(col("__i"), col("__m")))),
        x => x.getField("__m").cast("double")).as("__mu"))

  /** The cell-scoped banded-SRP index rows of `assigned`: one (idCol,
    * cellCol, __band, __bucket) row per band, buckets over the PER-CELL
    * floored-mean-centered vector — the slim relation the within-cell
    * candidate join runs on, shared verbatim between the batch self-join
    * and the streamed probe (index side static, arriving rows computed by
    * the same kernel).
    */
  def cellBandBuckets(assigned: DataFrame, idCol: String, vecCol: String,
                      cellCol: String, rbits: Int, bands: Int): DataFrame =
    assigned.join(perCellFlooredMeans(assigned, vecCol, cellCol), Seq(cellCol))
      .select(col(idCol), col(cellCol),
        posexplode(bandBucketsColOf(col(vecCol), col("__mu"), rbits, bands))
          .as(Seq("__band", "__bucket")))

  def cosineNearDupPairsCellBanded(assigned: DataFrame, idCol: String,
                                   vecCol: String, cellCol: String,
                                   threshold: Double, rbits: Int, bands: Int,
                                   roundTo: Int = 6): DataFrame = {
    require(rbits > 0 && rbits <= 62, s"rbits must be in (0, 62], got $rbits")
    require(bands > 0, s"bands must be positive, got $bands")
    val slim = cellBandBuckets(assigned, idCol, vecCol, cellCol, rbits, bands)
      .select(col(idCol).as("__id"), col(cellCol).as("__cell"),
        col("__band"), col("__bucket"))
      .cache() // cache-lifetime: pinned by the returned plan — caller releases (see Caching)
    val cand = slim.select(col("__id").as("id_a"), col("__cell"), col("__band"), col("__bucket"))
      .join(slim.select(col("__id").as("id_b"), col("__cell"), col("__band"), col("__bucket")),
        Seq("__cell", "__band", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val v = assigned.select(col(idCol).as("__vid"), col(vecCol).as("__vec"))
      .withColumn("__nsq", l2NormSq(col("__vec")))
    cand
      .join(v.select(col("__vid"), col("__vec").as("vec_a"), col("__nsq").as("__nsq_a")),
            col("id_a") === col("__vid")).drop("__vid")
      .join(v.select(col("__vid"), col("__vec").as("vec_b"), col("__nsq").as("__nsq_b")),
            col("id_b") === col("__vid")).drop("__vid")
      .withColumn("score", floorRound(
        cosineFromNormSq(col("vec_a"), col("vec_b"), col("__nsq_a"), col("__nsq_b")), roundTo))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
      .orderBy("id_a", "id_b")
  }

  /** Near-duplicate pairs by RAW-vector cosine ≥ threshold, with candidates
    * from BANDED sign-random-projection over corpus-mean-CENTERED vectors —
    * the scale path for correlated (e.g. nonnegative bag-of-words)
    * embeddings where [[cosineNearDupPairs]]' single-table hamming-1 probe
    * degenerates (see [[flooredMeanVec]] for the geometry and
    * [[autoBandBits]] for the linear-candidates argument). AND-OR
    * amplification (Leskovec–Rajaraman–Ullman §3.6.3 / the
    * [[Dedup.minhashLshPairs]] banding): `bands` independent r-bit SRP
    * tables, a pair is a candidate when ANY band agrees on all r signs,
    * verification is exact cosine on the RAW vectors — so the centering
    * changes RECALL only, never which verified pairs qualify.
    *
    * Scale shape: slim (id, band, bucket) relation cached behind the q28
    * barrier, band-keyed equi-join, pair dedup (a pair can match several
    * bands), vectors attached AFTER candidate generation.
    */
  def cosineNearDupPairsBandedCentered(df: DataFrame, idCol: String, vecCol: String,
                                       threshold: Double, rbits: Int, bands: Int,
                                       dim: Int, roundTo: Int = 6): DataFrame = {
    require(rbits > 0 && rbits <= 62, s"rbits must be in (0, 62], got $rbits")
    require(bands > 0, s"bands must be positive, got $bands")
    val m = flooredMeanVec(df, vecCol, dim)
    // slim-candidate pattern + cache barrier (see cosineNearDupPairs)
    val slim = df.select(col(idCol).as("__id"),
        posexplode(bandBucketsCol(col(vecCol), rbits, bands, m))
          .as(Seq("__band", "__bucket")))
      .cache() // cache-lifetime: pinned by the returned plan — caller releases (see Caching)
    val cand = slim.select(col("__id").as("id_a"), col("__band"), col("__bucket"))
      .join(slim.select(col("__id").as("id_b"), col("__band"), col("__bucket")),
        Seq("__band", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val v = df.select(col(idCol).as("__vid"), col(vecCol).as("__vec"))
      .withColumn("__nsq", l2NormSq(col("__vec")))
    cand
      .join(v.select(col("__vid"), col("__vec").as("vec_a"), col("__nsq").as("__nsq_a")),
            col("id_a") === col("__vid")).drop("__vid")
      .join(v.select(col("__vid"), col("__vec").as("vec_b"), col("__nsq").as("__nsq_b")),
            col("id_b") === col("__vid")).drop("__vid")
      .withColumn("score", floorRound(
        cosineFromNormSq(col("vec_a"), col("vec_b"), col("__nsq_a"), col("__nsq_b")), roundTo))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
      .orderBy("id_a", "id_b")
  }
}
