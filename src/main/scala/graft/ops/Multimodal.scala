package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, batch "decode"/feature-extract inside `mapPartitions`.
  *
  * The actual media codecs are NOT in this container, so the decode step
  * is a clearly-marked deterministic STUB (`stubDecode`); everything
  * around it — the schema (binary payload + metadata struct), the
  * partition-local batching, the feature-column contract — is the real
  * Spark plumbing a production decode (mapInPandas / JNI codec) would
  * drop into.
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int, nBytes: Long)
  final case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeature(
      doc_id: Long,
      payload_len: Long,
      feature_hash: String,
      thumb_w: Int,
      thumb_h: Int
  )

  /** Wrap a text corpus as opaque binary payloads with typed metadata —
    * the input shape a real image/audio table would have.
    */
  def asMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").cast("long"),
      col("text"),
      col("n_chars").cast("long")
    ).as[(Long, String, Long)].map {
      case (id, text, nChars) =>
        val bytes = text.getBytes("UTF-8")
        MediaRow(id, bytes, MediaMeta("application/x-fake", (nChars % 640).toInt, 480, bytes.length.toLong))
    }
  }

  /** STUB decode: a real implementation would decode the codec here
    * (per-partition batches, one codec instance per partition). The stub
    * derives deterministic pseudo-features (md5 of payload, a "resize"
    * of the metadata) so the plumbing is testable end-to-end.
    */
  def stubDecode(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition "codec" init happens once here (stubbed)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        md.reset()
        val hash = md.digest(m.payload).map("%02x".format(_)).mkString
        MediaFeature(
          m.doc_id,
          m.meta.nBytes,
          hash,
          math.max(1, m.meta.width / 4),
          m.meta.height / 4
        )
      }
    }
  }

  /** The full stub pipeline as one DataFrame (used by SparkEntry; the
    * oracle recomputes md5+arithmetic in SQL).
    */
  def features(spark: SparkSession, docs: DataFrame): DataFrame =
    stubDecode(spark, asMedia(spark, docs)).toDF()

  final case class Frame(doc_id: Long, frame_idx: Int, frame_offset: Long, frame_hash: String)

  /** STUB frame-sampling: a video decoder would seek to every Nth frame;
    * the stub samples fixed-size byte windows at deterministic offsets.
    * The plumbing is the real thing — one input row fans out to
    * min(maxFrames, payload/frameBytes) frame rows inside a
    * partition-local batch (per-partition "codec" init), which is exactly
    * the shape a JNI/ffmpeg decode drops into.
    *
    * The frame hash is md5 of the UPPERCASE HEX encoding of the byte
    * window (not of the raw bytes): DuckDB 1.0's md5 only accepts
    * VARCHAR, so hashing the hex string is the strongest byte-exact
    * contract BOTH engines can compute — raw-byte hashing would make the
    * oracle silently wrong for any multi-byte UTF-8 payload (char
    * windows != byte windows).
    */
  def frameSample(
      spark: SparkSession,
      media: Dataset[MediaRow],
      frameBytes: Int = 32,
      maxFrames: Int = 4
  ): Dataset[Frame] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val n = math.min(maxFrames.toLong, math.max(1L, m.meta.nBytes / frameBytes)).toInt
        (0 until n).iterator.map { i =>
          val off = i.toLong * frameBytes
          val end = math.min(m.payload.length.toLong, off + frameBytes).toInt
          val hex = new StringBuilder((end - off.toInt) * 2)
          var j = off.toInt
          while (j < end) { hex.append(f"${m.payload(j) & 0xff}%02X"); j += 1 }
          md.reset()
          val h = md.digest(hex.toString.getBytes("US-ASCII")).map("%02x".format(_)).mkString
          Frame(m.doc_id, i, off, h)
        }
      }
    }
  }
}
