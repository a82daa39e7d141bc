package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side contract
  * — schema, batch iteration shape, partition sizing — is real, and so is
  * the MEDIA header decode: a pure-JVM binary parse of PNG IHDR fields, a
  * JPEG marker-segment walk to SOFn, and a WAV/RIFF chunk walk to
  * "fmt " (no external media libraries).
  * Only video frame COUNTING remains a declared stub (no container parser
  * in this environment); see [[videoFrameCountStub]].
  *
  * Scale notes: payloads stay in executor memory only for the lifetime of
  * one `mapPartitions` batch; `spark.sql.files.maxPartitionBytes` bounds
  * the bytes per task, and feature extraction emits small fixed-size rows,
  * so the wide binary column is dropped as early as possible.
  */
object Multimodal {

  /** Parsed image header. `format` is detected from magic bytes (never
    * trusted from metadata); dimensions are None when the payload is not a
    * recognized image or is truncated/corrupt before the header fields.
    */
  case class ImageHeader(
      format: String, width: Option[Int], height: Option[Int],
      bitDepth: Option[Int],
      channels: Option[Int] = None, sampleRate: Option[Int] = None)

  private val PngMagic =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Decode an image payload's header — real byte parsing, not a fake.
    *
    * PNG (RFC 2083): 8-byte signature, then the IHDR chunk which is
    * REQUIRED to be first — 4-byte length, "IHDR" tag, width and height as
    * 4-byte big-endian at payload offsets 16/20, bit depth at 24. Chunk
    * CRCs are NOT verified (header triage, not integrity checking).
    *
    * JPEG (ITU T.81): SOI then a walk over marker segments, each
    * `FF <code> <2-byte big-endian length including itself>`; standalone
    * markers (TEM, RSTn) carry no length. The first SOFn frame header
    * (C0–CF minus DHT C4 / JPG C8 / DAC CC) carries sample precision (1
    * byte), then height and width as 2-byte big-endian. The walk stops at
    * SOS/EOI or any malformed segment — dimensions stay None rather than
    * reading garbage.
    *
    * WAV (RIFF 1991): chunk walk from offset 12 to the "fmt " chunk —
    * channels, sample rate, bits per sample, all little-endian; see the
    * inline comment for the alignment rules.
    *
    * Anything without a recognized magic is `unknown` with no fields
    * (video containers ride the same binary contract; only their frame
    * counting is stubbed elsewhere).
    */
  def decodeHeader(bytes: Array[Byte]): ImageHeader = {
    if (bytes == null) return ImageHeader("unknown", None, None, None)
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)

    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def tag(i: Int, t: String): Boolean =
      i + t.length <= bytes.length && t.indices.forall(j => u8(i + j) == t(j))

    val isPng = bytes.length >= PngMagic.length &&
      PngMagic.indices.forall(i => u8(i) == PngMagic(i))
    val isJpeg = bytes.length >= 3 &&
      u8(0) == 0xff && u8(1) == 0xd8 && u8(2) == 0xff
    val isWav = tag(0, "RIFF") && bytes.length >= 12 && tag(8, "WAVE")
    // GIF87a/GIF89a: logical-screen descriptor at fixed offsets — width
    // u16le at 6, height u16le at 8; the packed byte at 10 carries the
    // color-resolution bits (4-6), reported as bit depth.
    val isGif = bytes.length >= 6 && tag(0, "GIF8") &&
      (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a'
    // BMP (BITMAPINFOHEADER): 'BM' magic, DIB header size u32le at 14
    // (>= 40 for the modern header), signed width/height at 18/22
    // (negative height = top-down rows; dimensions reported as-is),
    // bit count u16le at 28.
    val isBmp = bytes.length >= 30 && tag(0, "BM") && u32le(14) >= 40
    // TIFF 6.0: byte-order mark II*\0 (little-endian) or MM\0*
    // (big-endian); every integer after it — including the 4-byte IFD
    // offset at 4 and the IFD entries themselves — follows that order.
    val isTiffLe = bytes.length >= 8 &&
      u8(0) == 'I' && u8(1) == 'I' && u8(2) == 42 && u8(3) == 0
    val isTiffBe = bytes.length >= 8 &&
      u8(0) == 'M' && u8(1) == 'M' && u8(2) == 0 && u8(3) == 42

    if (isPng) {
      val hasIhdr = bytes.length >= 26 &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R'
      if (hasIhdr)
        ImageHeader("png", Some(u32(16).toInt), Some(u32(20).toInt),
          Some(u8(24)))
      else ImageHeader("png", None, None, None)
    } else if (isJpeg) {
      var i = 2
      var result = ImageHeader("jpeg", None, None, None)
      var done = false
      while (!done && i + 1 < bytes.length) {
        if (u8(i) != 0xff) done = true // lost sync: stop, no dims
        else {
          val code = u8(i + 1)
          val standalone = code == 0x01 || (code >= 0xd0 && code <= 0xd7)
          val isSof = code >= 0xc0 && code <= 0xcf &&
            code != 0xc4 && code != 0xc8 && code != 0xcc
          if (standalone) i += 2
          else if (code == 0xd9 || code == 0xda) done = true // EOI / SOS
          else if (i + 3 >= bytes.length) done = true        // truncated
          else {
            val len = u16(i + 2)
            if (len < 2) done = true // malformed length
            else if (isSof) {
              // FF code LL LL precision HH HH WW WW ...
              if (i + 8 < bytes.length)
                result = ImageHeader("jpeg", Some(u16(i + 7)),
                  Some(u16(i + 5)), Some(u8(i + 4)))
              done = true
            } else i += 2 + len
          }
        }
      }
      result
    } else if (isWav) {
      // RIFF chunk walk (RIFF 1991 spec / WAVE): from offset 12, each
      // chunk is a 4-byte id + 4-byte little-endian size + payload,
      // word-aligned (odd sizes carry one pad byte). The "fmt " chunk —
      // NOT guaranteed first; LIST/JUNK chunks legally precede it —
      // holds channels (u16le at +2), sample rate (u32le at +4) and bits
      // per sample (u16le at +14). Malformed/truncated walks stop with
      // whatever was parsed (format detected, fields None).
      var i = 12
      var result = ImageHeader("wav", None, None, None)
      var done = false
      while (!done && i + 8 <= bytes.length) {
        val size = u32le(i + 4)
        if (size < 0 || size > Int.MaxValue) done = true
        else if (tag(i, "fmt ")) {
          if (size >= 16 && i + 8 + 16 <= bytes.length)
            result = ImageHeader("wav", None, None,
              Some(u16le(i + 8 + 14)),
              channels = Some(u16le(i + 8 + 2)),
              sampleRate = Some(u32le(i + 8 + 4).toInt))
          done = true
        } else i += 8 + size.toInt + (size.toInt & 1)
      }
      result
    } else if (isGif) {
      if (bytes.length >= 11)
        ImageHeader("gif", Some(u16le(6)), Some(u16le(8)),
          Some(((u8(10) >> 4) & 7) + 1))
      else ImageHeader("gif", None, None, None)
    } else if (isBmp) {
      ImageHeader("bmp", Some(u32le(18).toInt), Some(u32le(22).toInt),
        Some(u16le(28)))
    } else if (isTiffLe || isTiffBe) {
      // IFD walk (TIFF 6.0 §2): 2-byte entry count at the IFD offset,
      // then 12-byte entries (tag u16, type u16, count u32, value u32).
      // A SHORT (type 3) value of count 1 is LEFT-JUSTIFIED in the
      // value field — its FIRST two bytes in the file's byte order; a
      // LONG (type 4) uses all four. ImageWidth/ImageLength/
      // BitsPerSample are tags 256/257/258. Truncated or out-of-bounds
      // IFDs leave the fields None rather than reading garbage.
      val r16: Int => Int = if (isTiffLe) u16le else u16
      val r32: Int => Long = if (isTiffLe) u32le else u32
      val off = r32(4)
      if (off >= 8 && off + 2 <= bytes.length) {
        val n = r16(off.toInt)
        var w: Option[Int] = None
        var h: Option[Int] = None
        var b: Option[Int] = None
        var i = 0
        while (i < n && off.toInt + 2 + (i + 1) * 12 <= bytes.length) {
          val e = off.toInt + 2 + i * 12
          val tagId = r16(e); val typ = r16(e + 2); val cnt = r32(e + 4)
          if (cnt == 1 && (typ == 3 || typ == 4)) {
            val v = if (typ == 3) r16(e + 8) else r32(e + 8).toInt
            if (tagId == 256) w = Some(v)
            else if (tagId == 257) h = Some(v)
            else if (tagId == 258) b = Some(v)
          }
          i += 1
        }
        ImageHeader("tiff", w, h, b)
      } else ImageHeader("tiff", None, None, None)
    } else ImageHeader("unknown", None, None, None)
  }

  /** Uppercase hex rendering of a byte array — byte-identical to Spark's
    * and DuckDB's `hex(binary)`.
    */
  private[ext] def hexUpper(bytes: Array[Byte]): String = {
    val digits = "0123456789ABCDEF"
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach { b =>
      sb.append(digits((b >> 4) & 0xf)); sb.append(digits(b & 0xf))
    }
    sb.toString
  }

  /** Lowercase-hex md5 of the payload's UPPERCASE-hex rendering. The hex
    * hop exists because the oracle engine (DuckDB) has no `md5(BLOB)` —
    * `md5(hex(payload))` is computable bit-identically in Spark SQL,
    * DuckDB, and here.
    */
  private[ext] def contentMd5(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(
      hexUpper(bytes).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val digits = "0123456789abcdef"
    val sb = new java.lang.StringBuilder(d.length * 2)
    d.foreach { b =>
      sb.append(digits((b >> 4) & 0xf)); sb.append(digits(b & 0xf))
    }
    sb.toString
  }

  /** Declared STUB — the one remaining fake in this module: frame counting
    * for video payloads would need a container parser (MP4/MKV demux) that
    * this environment cannot host. Deterministic in the payload size so
    * the sampling plumbing stays testable; images are single-frame by
    * definition.
    */
  private[ext] def videoFrameCountStub(kind: String, nBytes: Long): Int =
    if (kind == "video") (nBytes % 300L).toInt + 1 else 1

  /** A decoded media feature row: fixed-size, no payload. `kind` is the
    * caller-declared modality (routing metadata); `format` is what the
    * bytes actually are.
    */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      format: String,
      n_bytes: Long,
      content_md5: String,
      width: Option[Int],
      height: Option[Int],
      bit_depth: Option[Int],
      channels: Option[Int],
      sample_rate: Option[Int],
      n_frames: Int)

  /** Input row shape for [[extractFeatures]] (public: Catalyst's generated
    * deserializer cannot access private classes).
    */
  case class MediaIn(media_id: Long, kind: String, payload: Array[Byte])

  private def decode(m: MediaIn): MediaFeatures = {
    // NULL payload (nullable BINARY per the schema contract) decodes as an
    // empty asset, not an executor-killing NPE mid-partition
    val bytes = if (m.payload == null) Array.emptyByteArray else m.payload
    val h = decodeHeader(bytes)
    MediaFeatures(
      media_id = m.media_id,
      kind = m.kind,
      format = h.format,
      n_bytes = bytes.length.toLong,
      content_md5 = contentMd5(bytes),
      width = h.width,
      height = h.height,
      bit_depth = h.bitDepth,
      channels = h.channels,
      sample_rate = h.sampleRate,
      n_frames = videoFrameCountStub(m.kind, bytes.length.toLong))
  }

  /** Batch feature extraction over binary payloads: the `mapPartitions`
    * shape a production decoder extends — per-partition iteration,
    * payloads consumed streaming, small feature rows out. The header
    * decode itself ([[decodeHeader]]) is real.
    *
    * @param df columns: media_id LONG, kind STRING, payload BINARY
    */
  def extractFeatures(spark: SparkSession, df: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("kind").cast("string"),
        col("payload").cast("binary"))
      .as[MediaIn]
      .mapPartitions(_.map(decode))
  }

  /** Frame sampling plumbing for video payloads: emits one row per sampled
    * frame index (frame COUNT is the declared stub; the explode shape —
    * rows multiply, payload does not travel with them — is the real
    * contract).
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, everyN: Int): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val feats = extractFeatures(spark, df)
    feats.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(everyN))))
      .select("media_id", "kind", "frame_idx", "content_md5")
  }
}
