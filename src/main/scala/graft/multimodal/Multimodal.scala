package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
