package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * opaque binary payloads + typed metadata, with decode / feature-extract
  * / resize / frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * mapPartitions batch processing, deterministic outputs — but the codec
  * itself is a STUB: real image/audio libraries are not available in this
  * container, so "decode" parses a deterministic fake header
  * (magic | kind | width | height | channels | payload) instead of
  * JPEG/PNG/WAV bit streams. Swap `decodeStub` for a real codec to
  * productionize; nothing else changes.
  */
object Multimodal {

  val Magic: Int = 0x47465449 // "GFTI"

  final case class MediaMeta(kind: String, width: Int, height: Int, channels: Int)
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, width: Int,
                                 height: Int, channels: Int, n_bytes: Int,
                                 histogram: Array[Double])

  /** Deterministic synthetic media table: payload bytes derived from the
    * id with a seeded LCG; kind cycles image/audio/video.
    */
  def synthesize(spark: SparkSession, n: Long, numPartitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val width = 16 + (id % 48).toInt
      val height = 16 + (id % 32).toInt
      val channels = if (kind == "image") 3 else 1
      val payloadLen = width * height * channels min 4096
      val buf = java.nio.ByteBuffer.allocate(20 + payloadLen)
      buf.putInt(Magic)
      buf.putInt(kind.hashCode)
      buf.putInt(width)
      buf.putInt(height)
      buf.putInt(channels)
      var state = id * 6364136223846793005L + 1442695040888963407L
      var i = 0
      while (i < payloadLen) {
        state = state * 6364136223846793005L + 1442695040888963407L
        buf.put((state >>> 56).toByte)
        i += 1
      }
      MediaRow(id, kind, buf.array())
    }
  }

  /** STUB decode: parse the fake header. A real implementation would
    * decode JPEG/PNG/FLAC here; the signature and batch shape are what a
    * real codec stage uses.
    */
  def decodeStub(content: Array[Byte]): Option[MediaMeta] = {
    if (content.length < 20) return None
    val buf = java.nio.ByteBuffer.wrap(content)
    if (buf.getInt() != Magic) return None
    val kindHash = buf.getInt()
    val kind = Seq("image", "audio", "video").find(_.hashCode == kindHash).getOrElse("unknown")
    Some(MediaMeta(kind, buf.getInt(), buf.getInt(), buf.getInt()))
  }

  /** Normalized byte histogram of the payload (16 bins) — the stand-in
    * for real feature extraction, deterministic and batch-friendly.
    */
  def byteHistogram(content: Array[Byte], bins: Int = 16): Array[Double] = {
    val counts = new Array[Long](bins)
    var i = 20 // skip header
    while (i < content.length) {
      counts(((content(i) & 0xff) * bins) >> 8) += 1
      i += 1
    }
    val total = math.max(1L, content.length - 20L)
    counts.map(_.toDouble / total)
  }

  /** Decode + feature extraction as a partition-preserving batch stage:
    * one pass per partition, no shuffle, codec state reusable per batch.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here (real codecs are stateful)
      it.flatMap { row =>
        decodeStub(row.content).map { meta =>
          MediaFeatures(row.media_id, meta.kind, meta.width, meta.height,
            meta.channels, row.content.length, byteHistogram(row.content))
        }
      }
    }
  }

  /** STUB resize: recompute target dims preserving aspect; payload left
    * opaque (a real stage would resample pixels).
    */
  def resizeDims(meta: MediaMeta, maxSide: Int): (Int, Int) = {
    val scale = maxSide.toDouble / math.max(meta.width, meta.height)
    if (scale >= 1.0) (meta.width, meta.height)
    else (math.max(1, (meta.width * scale).toInt), math.max(1, (meta.height * scale).toInt))
  }

  /** STUB frame sampling for video rows: deterministic frame offsets. */
  def frameOffsets(nFrames: Int, sampleEvery: Int): Array[Int] =
    (0 until nFrames by sampleEvery).toArray
}
