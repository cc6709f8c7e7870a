package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, batch decode/feature-extract inside `mapPartitions`.
  *
  * The image path is a REAL byte-level decoder: [[parseImageHeader]]
  * reads the PNG signature + IHDR chunk (with CRC32 verification) and
  * scans JPEG marker segments to SOF0/1/2/3 for width×height — pure
  * JVM, no codec dependency, exactly the container-header pass a
  * production ingest runs before deciding whether a full pixel decode
  * is worth scheduling. Full PIXEL decode (IDAT inflate / DCT) is out
  * of scope in this container; the `mapPartitions` batch shape with
  * per-partition codec init is where a JNI/ffmpeg decoder drops in.
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int, nBytes: Long)
  final case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

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

  /** Parsed container-header facts for one image payload. `width`/
    * `height` are -1 when `ok` is false; `err` names the first violated
    * structural invariant (empty when ok). `dimOffset` is the byte
    * offset of the dimension fields THE PARSER FOUND (PNG: IHDR
    * width+height, 8 bytes; JPEG: SOF height+width, 4 bytes; -1 when
    * not ok) — callers that re-read the raw dim bytes must use it
    * instead of assuming any fixed layout, so the decode stays
    * payload-generic.
    */
  final case class ImageHeader(
      format: String, width: Int, height: Int, ok: Boolean, err: String, dimOffset: Int = -1)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) | ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Byte-level image header parse — PNG signature + IHDR chunk (with
    * CRC32 verification over chunk type+data) or JPEG marker-segment
    * scan to the first SOF0/1/2/3 frame header. Pure JVM, no codec
    * dependency. The `crc` instance is caller-supplied so `mapPartitions`
    * can init it once per partition (the per-partition-codec shape).
    */
  def parseImageHeader(bytes: Array[Byte], crc: java.util.zip.CRC32 = new java.util.zip.CRC32()): ImageHeader = {
    def bad(fmt: String, why: String) = ImageHeader(fmt, -1, -1, ok = false, why)
    if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig)) {
      // PNG: sig(8) | len(4) type(4) data(len) crc(4) | ... ; first chunk MUST be IHDR, len 13
      if (bytes.length < 8 + 8 + 13 + 4) return bad("png", "truncated before IHDR")
      val len = be32(bytes, 8)
      val typ = new String(bytes, 12, 4, "US-ASCII")
      if (typ != "IHDR" || len != 13) return bad("png", s"first chunk $typ len=$len, want IHDR len=13")
      crc.reset()
      crc.update(bytes, 12, 4 + 13) // CRC covers chunk type + data
      if (crc.getValue != be32(bytes, 12 + 4 + 13)) return bad("png", "IHDR crc mismatch")
      val w = be32(bytes, 16)
      val h = be32(bytes, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return bad("png", "non-positive dims")
      ImageHeader("png", w.toInt, h.toInt, ok = true, "", dimOffset = 16)
    } else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      // JPEG: SOI, then marker segments; SOFn (C0-C3) carries dims.
      var i = 2
      while (i + 1 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return bad("jpeg", f"expected marker at $i, got 0x${bytes(i) & 0xff}%02x")
        var j = i + 1
        while (j < bytes.length && (bytes(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= bytes.length) return bad("jpeg", "truncated in marker")
        val m = bytes(j) & 0xff
        if (m >= 0xc0 && m <= 0xc3) { // SOF0..SOF3 (baseline/extended/progressive/lossless)
          if (j + 8 >= bytes.length) return bad("jpeg", "truncated SOF")
          val h = be16(bytes, j + 4)
          val w = be16(bytes, j + 6)
          if (w <= 0 || h <= 0) return bad("jpeg", "non-positive dims")
          return ImageHeader("jpeg", w, h, ok = true, "", dimOffset = j + 4)
        }
        if (m == 0xd9 || m == 0xda) return bad("jpeg", "reached EOI/SOS without SOF")
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i = j + 1 // standalone markers: no length
        else {
          if (j + 2 >= bytes.length) return bad("jpeg", "truncated segment length")
          val segLen = be16(bytes, j + 1)
          if (segLen < 2) return bad("jpeg", s"segment length $segLen < 2")
          i = j + 1 + segLen
        }
      }
      bad("jpeg", "ran off end without SOF")
    } else bad("unknown", "no PNG/JPEG signature")
  }

  // ---- deterministic synthetic image fixtures ------------------------
  // Dim/length formulas are the oracle contract (mirrored in DuckDB SQL
  // by SparkEntry.oracleSql): even doc_id -> PNG, odd -> JPEG,
  //   width  = 16 + doc_id % 480
  //   height = 16 + (doc_id * 7) % 360
  //   extra  = doc_id % 32   (filler-segment payload bytes)
  //   payload_len = (57 | 45) + extra   (png | jpeg fixed framing)

  private[ops] def synthWidth(docId: Long): Int = (16 + docId % 480).toInt
  private[ops] def synthHeight(docId: Long): Int = (16 + (docId * 7) % 360).toInt
  private[ops] def synthExtra(docId: Long): Int = (docId % 32).toInt

  /** A minimal valid PNG: signature, IHDR (real CRC32), one IDAT of
    * `extra` deterministic bytes, IEND. 57 + extra bytes total.
    */
  def syntheticPng(width: Int, height: Int, extra: Int, seed: Long = 0L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(57 + extra)
    val crc = new java.util.zip.CRC32()
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      crc.reset(); crc.update(t); crc.update(data)
      val c = crc.getValue
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
    }
    out.write(PngSig)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    chunk("IDAT", Array.tabulate(extra)(i => ((seed + i) % 256).toByte))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A minimal valid JPEG header stream: SOI, APP0/JFIF, a COM segment
    * of `extra` payload bytes (exercises the marker-skip path), SOF0
    * (3 components), EOI. 45 + extra bytes total; the SOF dim bytes sit
    * at byte offset 29 + extra (height BE16, then width BE16).
    */
  def syntheticJpeg(width: Int, height: Int, extra: Int, seed: Long = 0L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(45 + extra)
    def seg(marker: Int, data: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      val len = data.length + 2
      out.write(len >>> 8); out.write(len & 0xff)
      out.write(data)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, "JFIF\u0000".getBytes("US-ASCII") ++ Array[Byte](1, 2, 0, 0, 1, 0, 1, 0, 0)) // APP0, 14 data bytes
    seg(0xfe, Array.tabulate(extra)(i => ((seed + 31 * i) % 127).toByte)) // COM filler
    val sof = java.nio.ByteBuffer.allocate(15)
      .put(8.toByte).putShort(height.toShort).putShort(width.toShort).put(3.toByte)
      .put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)).array()
    seg(0xc0, sof) // SOF0 baseline
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** The per-doc fixture: even ids get a PNG, odd ids a JPEG, dims and
    * filler length derived from the id by the formulas above.
    */
  def syntheticImage(docId: Long): Array[Byte] =
    if (docId % 2 == 0) syntheticPng(synthWidth(docId), synthHeight(docId), synthExtra(docId), docId)
    else syntheticJpeg(synthWidth(docId), synthHeight(docId), synthExtra(docId), docId)

  final case class ImageFeature(
      doc_id: Long,
      format: String,
      width: Long,
      height: Long,
      payload_len: Long,
      header_ok: Boolean,
      dims_hex: String
  )

  /** Docs table -> synthetic image payload table (the input shape a real
    * image ingest would read from object storage).
    */
  def asImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val bytes = syntheticImage(id)
      val mime = if (id % 2 == 0) "image/png" else "image/jpeg"
      MediaRow(id, bytes, MediaMeta(mime, synthWidth(id), synthHeight(id), bytes.length.toLong))
    }
  }

  /** REAL header decode over binary payloads: parse PNG IHDR / scan JPEG
    * markers to SOF inside `mapPartitions` (one CRC32 instance per
    * partition — the per-partition-codec-init shape a full pixel decoder
    * drops into). `dims_hex` is a raw byte read of the dim fields at the
    * offset THE PARSER FOUND (`ImageHeader.dimOffset`) — payload-generic,
    * no fixture-layout assumption; on the synthetic corpus the parser's
    * offset coincides with the doc_id formulas (PNG 16, JPEG 29+extra),
    * which is what the DuckDB oracle replays. Unparseable payloads get an
    * empty `dims_hex` (header_ok already flags them).
    */
  def decodeHeaders(spark: SparkSession, media: Dataset[MediaRow]): Dataset[ImageFeature] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val crc = new java.util.zip.CRC32() // per-partition "codec" init
      it.map { m =>
        val h = parseImageHeader(m.payload, crc)
        val dimLen = if (h.format == "png") 8 else 4 // 2×BE32 | 2×BE16
        val hex = new StringBuilder(dimLen * 2)
        if (h.ok) {
          val end = math.min(m.payload.length, h.dimOffset + dimLen)
          var j = h.dimOffset
          while (j < end) { hex.append(f"${m.payload(j) & 0xff}%02X"); j += 1 }
        }
        ImageFeature(m.doc_id, h.format, h.width.toLong, h.height.toLong,
          m.payload.length.toLong, h.ok, hex.toString)
      }
    }
  }

  /** The full image-header pipeline as one DataFrame (SparkEntry's
    * `q20_multimodal`; the oracle recomputes dims/lengths/dim-bytes from
    * the doc_id formulas in SQL).
    */
  def features(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeHeaders(spark, asImages(spark, docs)).toDF()

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
      // nibble tables instead of per-byte String.format (the format
      // call was ~6.4M invocations per sf1 pass for identical output)
      val upper = "0123456789ABCDEF".toCharArray
      val lower = "0123456789abcdef".toCharArray
      it.flatMap { m =>
        val n = math.min(maxFrames.toLong, math.max(1L, m.meta.nBytes / frameBytes)).toInt
        (0 until n).iterator.map { i =>
          val off = i.toLong * frameBytes
          val end = math.min(m.payload.length.toLong, off + frameBytes).toInt
          val hex = new Array[Char]((end - off.toInt) * 2)
          var j = off.toInt
          while (j < end) {
            val b = m.payload(j) & 0xff
            hex(2 * (j - off.toInt)) = upper(b >> 4)
            hex(2 * (j - off.toInt) + 1) = upper(b & 0xf)
            j += 1
          }
          md.reset()
          val d = md.digest(new String(hex).getBytes("US-ASCII"))
          val hx = new Array[Char](32)
          var x = 0
          while (x < 16) {
            hx(2 * x) = lower((d(x) >> 4) & 0xf)
            hx(2 * x + 1) = lower(d(x) & 0xf)
            x += 1
          }
          Frame(m.doc_id, i, off, new String(hx))
        }
      }
    }
  }
}
