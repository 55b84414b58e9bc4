package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata extracted per partition. The image/audio decode libraries are not
  * available in this container, so the decode step is a clearly-marked
  * deterministic STUB; the Spark-side plumbing — schema, typed Dataset,
  * partition-wise batch processing, no driver collect — is real and tested.
  */
final case class MediaRecord(doc_id: Long, data: Array[Byte])
final case class MediaMeta(doc_id: Long, n_bytes: Long, fake_width: Long,
                           fake_height: Long, checksum: Long)
final case class MediaFrame(doc_id: Long, frame_id: Long, n_bytes: Long, checksum: Long)

object Multimodal {

  /** STUB decode: deterministic fake metadata from the raw bytes. A real
    * deployment swaps the body for an actual decoder (e.g. image headers /
    * audio frames) — the partition-wise iterator shape stays the same.
    */
  def decodeStub(r: MediaRecord): MediaMeta = {
    val n = r.data.length.toLong
    val checksum = r.data.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    MediaMeta(r.doc_id, n, 1 + n % 64, 1 + n % 37, checksum)
  }

  /** Typed per-partition metadata extraction over a binary column. */
  def extractMeta(spark: SparkSession, docs: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("binary").as("data"))
      .as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
      .toDF()
  }

  /** Frame sampling: split each media blob into fixed-size byte frames (the
    * video/audio analog of text chunking) — one output row per frame with a
    * per-frame checksum. Explodes inside the partition iterator; no driver
    * collect, no shuffle.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame, frameBytes: Int,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import spark.implicits._
    require(frameBytes > 0)
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("binary").as("data"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        r.data.grouped(frameBytes).zipWithIndex.map { case (frame, i) =>
          val checksum = frame.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
          MediaFrame(r.doc_id, i.toLong, frame.length.toLong, checksum)
        }
      })
      .toDF()
  }

  /** 60-bit byte-level dHash (gradient perceptual hash) of a binary column
    * ([[graft.functions.expressions.DHashBytes]], codegen'd).
    */
  def dHash(bytes: Column): Column = {
    import graft.functions.expressions.DHashBytes
    import org.apache.spark.sql.{GraftSqlBridge => B}
    B.column(DHashBytes(B.expression(bytes)))
  }

  /** 60-bit byte-level aHash (average perceptual hash) of a binary column
    * ([[graft.functions.expressions.AHashBytes]], codegen'd).
    */
  def aHash(bytes: Column): Column = {
    import graft.functions.expressions.AHashBytes
    import org.apache.spark.sql.{GraftSqlBridge => B}
    B.column(AHashBytes(B.expression(bytes)))
  }

  /** 4×15-bit band/chunk explode over a `ph` hash column — the ONE banding
    * definition every perceptual pairing site shares ([[mediaDupPairs]],
    * [[frameAlignSpansPerceptual]], the streaming probe) and the DuckDB
    * band CTEs mirror; recall radius (guaranteed ≤ 3 bits) changes HERE or
    * nowhere.
    */
  private[graft] def banded(df: DataFrame): DataFrame = df
    .withColumn("band", explode(sequence(lit(0), lit(3))))
    .withColumn("chunk", expr("shiftright(ph, band*15) & 32767"))

  /** Media near-dup pairs within `maxHamming` bits of byte-level dHash,
    * candidates via 4×15-bit band buckets — the media-modality sibling of
    * [[graft.operators.Dedup.simhashPairs]], same banding structure
    * (guaranteed recall for distance ≤ 3, heuristic beyond).
    *
    * Scale shape: hashing is map-only codegen; candidates come from an
    * equi-join on (band, chunk) — never an all-pairs comparison (the blob
    * column is dropped before the join, so only 16-byte hash rows shuffle).
    */
  def mediaDupPairs(df: DataFrame, idCol: String, bytesCol: String,
                    maxHamming: Int, salts: Int = 1): DataFrame = {
    import graft.functions.TextFunctions.hamming64
    import graft.operators.Salting
    // cache-lifetime: pinned by the returned plan — caller releases (see
    // Caching); both join sides read the hashed (id, ph) rows, and without
    // the pin each side re-derives the blobs AND re-hashes them
    val hashed = df.select(col(idCol), dHash(col(bytesCol).cast("binary")).as("ph")).cache()
    val bk = banded(hashed)
    val l = bk.select(col(idCol).as("id_a"), col("ph").as("ph_a"), col("band"), col("chunk"))
    val r = bk.select(col(idCol).as("id_b"), col("ph").as("ph_b"), col("band"), col("chunk"))
    // salts > 1: spread a hot band bucket's O(k²) pair work over `salts`
    // tasks ([[Salting.saltedSelfJoin]]) — identical output, bounded tasks
    Salting.saltedSelfJoin(l, r, Seq("band", "chunk"), "id_b", salts)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ph_a", "ph_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("ph_a"), col("ph_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** Keep-first PERCEPTUAL LOSERS at scale — the verdict-axis sibling of
    * [[mediaDupPairs]] that never materializes within-group pairs. Reused
    * footage makes identical-hash groups grow WITH the corpus (the
    * ScaleStress 10× replication grew q217's pair shuffle 23× — quadratic
    * in the reuse-group size), but the verdict never needs those pairs:
    * keep-first only asks, per document, whether ANY smaller-id document
    * sits within `maxHamming`. So identical hashes collapse to one
    * representative (min id) BEFORE the band join — the join is then
    * quadratic only in DISTINCT hashes per band bucket — and a document
    * loses iff min over its hash's hamming neighborhood (the hash itself
    * included, via the self-pair every band bucket produces) of the
    * representative ids is smaller than its own id. Equivalent to
    * `pairLosers(mediaDupPairs(...))` by definition of keep-first;
    * pinned by test against it on the fixture.
    */
  def mediaDupLosers(df: DataFrame, idCol: String, bytesCol: String,
                     maxHamming: Int, flag: String): DataFrame = {
    import graft.functions.TextFunctions.hamming64
    // cache-lifetime: pinned by the returned plan — caller releases (see
    // Caching); the hashed rows feed both the group collapse and the final
    // loser filter
    val hashed = df.select(col(idCol),
      dHash(col(bytesCol).cast("binary")).as("ph")).cache()
    val groups = hashed.groupBy("ph").agg(min(col(idCol)).as("rep_id"))
    val bk = banded(groups)
    val l = bk.select(col("ph").as("ph_a"), col("band"), col("chunk"))
    val r = bk.select(col("ph").as("ph_b"), col("rep_id").as("rep_b"),
      col("band"), col("chunk"))
    val neigh = l.join(r, Seq("band", "chunk"))
      .filter(hamming64(col("ph_a"), col("ph_b")) <= maxHamming)
      .groupBy("ph_a").agg(min("rep_b").as("__nmin"))
    hashed.join(neigh, hashed("ph") === neigh("ph_a"))
      .filter(col(idCol) > col("__nmin"))
      .select(col(idCol)).withColumn(flag, lit(1L))
  }

  /** Caption↔frame (text↔media) join: per-document media-side frame stats
    * (frame count, media bytes, duplicate-frame ratio from exact checksum
    * collisions) joined with caption-side token counts — the per-record
    * modality-alignment report a caption-supervised training pipeline gates
    * on (a record whose media is all repeated frames, or whose caption is
    * empty, is a curation reject).
    *
    * Scale shape: frame explode is map-only; the stats are one hash
    * aggregation on doc_id; the caption join is keyed on the same doc_id, so
    * AQE co-partitions both sides — no second shuffle of the media bytes
    * (they are reduced to per-frame checksums before the aggregate).
    */
  def captionFrameStats(spark: SparkSession, docs: DataFrame, frameBytes: Int,
                        idCol: String = "doc_id", textCol: String = "text",
                        mediaCol: String = "text",
                        passthroughCols: Seq[String] = Seq("source")): DataFrame = {
    import graft.functions.MathFunctions.floorRound
    import graft.functions.TextFunctions.tokenCount
    val frames = sampleFrames(spark, docs, frameBytes, idCol, mediaCol)
    val mediaAgg = frames.groupBy("doc_id").agg(
      count(lit(1)).as("n_frames"),
      sum("n_bytes").as("media_bytes"),
      countDistinct("checksum").as("distinct_frames"))
    // Carried caption-side columns are a parameter (default `source`), not a
    // hardcoded schema assumption — callers whose input lacks them pass Nil
    // (ADVICE r10).
    val carried = passthroughCols.map(col)
    val captions = docs.select(col(idCol).cast("long").as("doc_id") +:
      carried :+ tokenCount(col(textCol)).cast("long").as("caption_tokens"): _*)
    captions.join(mediaAgg, Seq("doc_id"))
      .withColumn("dup_frame_ratio",
        floorRound(lit(1.0) - col("distinct_frames").cast("double") / col("n_frames").cast("double"), 6))
      .select(col("doc_id").as(idCol) +: carried ++: Seq(col("caption_tokens"),
        col("n_frames"), col("media_bytes"), col("distinct_frames"), col("dup_frame_ratio")): _*)
  }

  /** Temporal frame-alignment spans — the media analog of exact-substring
    * dedup ([[graft.operators.Dedup.exactSubstrSpans]] at frame rather than
    * character granularity): for every media pair sharing verbatim frames,
    * the maximal runs of CONSECUTIVE frames at a CONSTANT temporal offset —
    * shared intros/outros/segments between re-cut media, which whole-blob
    * perceptual hashing ([[mediaDupPairs]]) cannot see.
    *
    * Output: (id_a, id_b, a_start, b_start, n_frames), id_a < id_b, frame
    * ids 0-based, one row per maximal aligned run of length ≥ `minRun`.
    *
    * Scale shape: frames explode map-side; candidate pairs come from ONE
    * equi-join on the frame checksum (never an all-pairs media join); a run
    * is an island of consecutive `frame_a` within each (pair, offset) group
    * — one keyed window. Skew: a frame appearing in k media yields O(k²)
    * pair rows (the same degenerate-content blowup as substring dedup's
    * shared windows); `maxDf` drops checksums seen in more than that many
    * media first — the stop-frame filter (black frames, silence) a real
    * media pipeline always applies.
    */
  def frameAlignSpans(spark: SparkSession, media: DataFrame, frameBytes: Int,
                      minRun: Int, maxDf: Option[Int] = None,
                      idCol: String = "doc_id", mediaCol: String = "m"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    // cache-lifetime: pinned by the returned plan — caller releases (see
    // Caching); the frame rows feed the df-cap aggregate AND both sides of
    // the pair join — uncached, the media re-frames once per consumer
    val frames = sampleFrames(spark, media, frameBytes, idCol, mediaCol)
      .select(col("doc_id"), col("frame_id"), col("checksum")).cache()
    frameAlignSpansFromFrames(frames, minRun, maxDf)
  }

  /** [[frameAlignSpans]] from a PRE-BUILT frame index `(doc_id, frame_id,
    * checksum)` — the maintenance composition point (the
    * `spansFromAnchorIndex` pattern): the index is append-only per media id
    * (frames are a pure function of the blob, ids are immutable), so a
    * standing index unioned with a delta batch's frames IS the full
    * rebuild — q181 hash-proves that against the full-corpus oracle. The
    * delta pass costs O(delta blob bytes / frameBytes), never a corpus
    * rescan; the df-cap aggregate re-runs over the slim index rows (the
    * cap must see GLOBAL frame frequencies, so it belongs to the consumer,
    * not the index build).
    */
  def frameAlignSpansFromFrames(frames: DataFrame, minRun: Int,
                                maxDf: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    val filtered = maxDf match {
      case Some(cap) =>
        val keep = frames.groupBy("checksum")
          .agg(countDistinct("doc_id").as("__df")).filter(col("__df") <= cap)
          .select("checksum")
        frames.join(keep, Seq("checksum"))
      case None => frames
    }
    val l = filtered.select(col("doc_id").as("id_a"), col("frame_id").as("fa"), col("checksum"))
    val r = filtered.select(col("doc_id").as("id_b"), col("frame_id").as("fb"), col("checksum"))
    val pairs = l.join(r, Seq("checksum"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("fa"), col("fb"),
        (col("fa") - col("fb")).as("__off"))
      // two identical frames WITHIN one media (a loop) would make (pair,
      // offset, fa) non-unique and break the island arithmetic — dedup
      .dropDuplicates("id_a", "id_b", "__off", "fa")
    val w = Window.partitionBy("id_a", "id_b", "__off").orderBy("fa")
    pairs
      .withColumn("__g", col("fa") - row_number().over(w))
      .groupBy("id_a", "id_b", "__off", "__g")
      .agg(min("fa").as("a_start"), min("fb").as("b_start"),
        count(lit(1)).as("n_frames"))
      .filter(col("n_frames") >= minRun)
      .select("id_a", "id_b", "a_start", "b_start", "n_frames")
      .orderBy("id_a", "id_b", "a_start", "b_start")
  }

  /** Per-frame media rows `(doc_id, frame_id, ph)` with a 60-bit dHash per
    * frame — the perceptual frame index: [[sampleFrames]]' exact checksum
    * replaced by a hash that tolerates small in-place byte noise, so
    * re-encoded footage still collides. Map-only (explode + codegen'd hash
    * per frame); the index is one slim row per frame.
    */
  def frameHashes(spark: SparkSession, media: DataFrame, frameBytes: Int,
                  idCol: String = "doc_id", mediaCol: String = "m"): DataFrame = {
    import spark.implicits._
    require(frameBytes > 0)
    media.select(col(idCol).cast("long").as("doc_id"), col(mediaCol).cast("binary").as("data"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        r.data.grouped(frameBytes).zipWithIndex.map { case (frame, i) =>
          (r.doc_id, i.toLong, graft.functions.expressions.PerceptualHash.dhash(frame))
        }
      })
      .toDF("doc_id", "frame_id", "ph")
  }

  /** PERCEPTUAL frame alignment — [[frameAlignSpans]] with tolerance: two
    * frames match when their dHashes sit within `maxHamming` bits
    * (candidates via the 4×15-bit band equi-join, never all-pairs), and
    * matches merge into maximal offset-consistent runs exactly as the
    * exact-checksum variant does. This is segment-level near-dup for
    * re-encoded footage: byte-identical frames have hamming 0, lightly
    * noised re-encodes stay within τ, unrelated frames don't band-collide.
    *
    * `maxDf` (stop-frame filter) counts media per BAND BUCKET: a frame
    * whose bucket holds more than `maxDf` distinct media is dropped from
    * that bucket before pairing — same skew bound as the exact variant.
    */
  def frameAlignSpansPerceptual(spark: SparkSession, media: DataFrame, frameBytes: Int,
                                minRun: Int, maxHamming: Int, maxDf: Option[Int] = None,
                                idCol: String = "doc_id", mediaCol: String = "m",
                                salts: Int = 1): DataFrame = {
    // cache-lifetime: pinned by the returned plan — caller releases (see
    // Caching); both sides of the band join read the hashed frame rows
    val fh = frameHashes(spark, media, frameBytes, idCol, mediaCol).cache()
    frameAlignSpansPerceptualFromHashes(fh, minRun, maxHamming, maxDf, salts)
  }

  /** [[frameAlignSpansPerceptual]] from a PRE-BUILT perceptual frame index
    * `(doc_id, frame_id, ph)` — the artifact composition point (the
    * [[frameAlignSpansFromFrames]] pattern on the perceptual axis): frame
    * hashes are a pure function of the blob, so a materialized index
    * ([[graft.pipeline.ArtifactStore]]) or a standing-index-plus-delta
    * union feeds the same band join the inline build does. The stop-frame
    * cap counts media per band BUCKET and must see global frequencies, so
    * it stays with the consumer, not the index build.
    */
  def frameAlignSpansPerceptualFromHashes(fh: DataFrame, minRun: Int,
                                          maxHamming: Int, maxDf: Option[Int] = None,
                                          salts: Int = 1): DataFrame = {
    import graft.functions.TextFunctions.hamming64
    import graft.operators.Salting
    import org.apache.spark.sql.expressions.Window
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    val bk = banded(fh)
    val filtered = maxDf match {
      case Some(cap) =>
        val keep = bk.groupBy("band", "chunk")
          .agg(countDistinct("doc_id").as("__df")).filter(col("__df") <= cap)
          .select("band", "chunk")
        bk.join(keep, Seq("band", "chunk"))
      case None => bk
    }
    val l = filtered.select(col("doc_id").as("id_a"), col("frame_id").as("fa"),
      col("ph").as("ph_a"), col("band"), col("chunk"))
    val r = filtered.select(col("doc_id").as("id_b"), col("frame_id").as("fb"),
      col("ph").as("ph_b"), col("band"), col("chunk"))
    // salts > 1: a hot (band, chunk) bucket under the maxDf cap still holds
    // O(cap²·frames²) pair work in one task — the salt spreads it
    val pairs = Salting.saltedSelfJoin(l, r, Seq("band", "chunk"), "id_b", salts)
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b", "fa", "fb")
      .filter(hamming64(col("ph_a"), col("ph_b")) <= maxHamming)
      .select(col("id_a"), col("id_b"), col("fa"), col("fb"),
        (col("fa") - col("fb")).as("__off"))
    // (pair, off, fa) is unique after the band dedup — off + fa fix fb —
    // so the islands below see each aligned frame exactly once
    val w = Window.partitionBy("id_a", "id_b", "__off").orderBy("fa")
    pairs
      .withColumn("__g", col("fa") - row_number().over(w))
      .groupBy("id_a", "id_b", "__off", "__g")
      .agg(min("fa").as("a_start"), min("fb").as("b_start"),
        count(lit(1)).as("n_frames"))
      .filter(col("n_frames") >= minRun)
      .select("id_a", "id_b", "a_start", "b_start", "n_frames")
      .orderBy("id_a", "id_b", "a_start", "b_start")
  }

  /** Modality-aware curation: keep records whose caption AND media both pass,
    * then drop perceptual near-duplicates (higher id loses, as in
    * [[graft.operators.Dedup]]'s policies). Gates:
    *   - caption: `caption_tokens >= minCaptionTokens`;
    *   - media: `n_frames >= minFrames` and `dup_frame_ratio <= maxDupFrameRatio`
    *     (a blob of repeated frames is decode junk);
    *   - cross-record: no surviving record within `maxHamming` dHash bits of
    *     a lower-id survivor (banded candidates, never all-pairs).
    *
    * The media-column analog of the q57 text curation funnel: same
    * filter→anti-join shape with the quality scalar swapped for frame stats.
    */
  def curateMedia(spark: SparkSession, docs: DataFrame, frameBytes: Int,
                  minCaptionTokens: Long, minFrames: Long, maxDupFrameRatio: Double,
                  maxHamming: Int, idCol: String = "doc_id",
                  textCol: String = "text", mediaCol: String = "text"): DataFrame = {
    val stats = captionFrameStats(spark, docs, frameBytes, idCol, textCol, mediaCol)
    val gated = stats
      .filter(col("caption_tokens") >= minCaptionTokens &&
        col("n_frames") >= minFrames &&
        col("dup_frame_ratio") <= maxDupFrameRatio)
    val gatedDocs = docs.join(gated.select(idCol), Seq(idCol))
    val losers = mediaDupPairs(gatedDocs, idCol, mediaCol, maxHamming)
      .select(col("id_b").as(idCol)).distinct()
    gatedDocs.join(losers, Seq(idCol), "left_anti")
  }
}
