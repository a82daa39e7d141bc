package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side contract
  * — schema, batch iteration shape, partition sizing — is real, and so is
  * the MEDIA header decode: a pure-JVM binary parse of PNG IHDR fields, a
  * JPEG marker-segment walk to SOFn, and a WAV/RIFF chunk walk to
  * "fmt " (no external media libraries), and an MP4/ISO-BMFF box walk to
  * the sample table for video frame counting ([[mp4FrameCount]]).
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
    * (video containers ride the same binary contract; their box walk
    * lives in [[mp4FrameCount]]).
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
    // ISO-BMFF (MP4): the first box is `ftyp` — 4-byte size then the tag.
    val isMp4 = tag(4, "ftyp")

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
    } else if (isMp4) {
      ImageHeader("mp4", None, None, None)
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

  /** Reusable ISO-BMFF (ISO 14496-12) box walk over an in-memory payload
    * — shared by [[mp4FrameCount]] and the video keyframe extractor
    * ([[VideoFingerprint]]). The file is a sequence of boxes `u32be
    * size, 4-byte type, payload`; `size == 1` means a 64-bit largesize
    * follows the type, `size == 0` means the box runs to EOF. Container
    * boxes hold child boxes immediately after their 8/16-byte header.
    */
  private[ext] final class Mp4Walk(bytes0: Array[Byte]) {
    val bytes: Array[Byte] =
      if (bytes0 == null) Array.emptyByteArray else bytes0

    def u8(i: Int): Int = bytes(i) & 0xff
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def typ(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** ftyp brand sniff — must hold before any walk. */
    def isMp4: Boolean = bytes.length >= 16 && typ(4) == "ftyp"

    /** (type, payloadStart, boxEnd) of the box at `i`, or None when the
      * header is truncated/insane. `end` clamps to the buffer so a size
      * field larger than the payload fails closed.
      */
    def box(i: Int, limit: Int): Option[(String, Int, Int)] = {
      if (i + 8 > limit) return None
      val size = u32(i)
      val (hdr, boxLen) =
        if (size == 1) { if (i + 16 > limit) return None; (16, u64(i + 8)) }
        else if (size == 0) (8, (limit - i).toLong) // to end of enclosing box
        else (8, size)
      if (boxLen < hdr || i + boxLen > limit) None
      else Some((typ(i + 4), i + hdr, (i + boxLen).toInt))
    }

    /** First child named `name` inside [from, limit). */
    def find(name: String, from: Int, limit: Int): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= limit) {
        box(i, limit) match {
          case Some((t, p, e)) =>
            if (t == name) return Some((p, e))
            i = e
          case None => return None
        }
      }
      None
    }

    /** The first trak's sample table: descends the pure-container chain
      * `moov → trak → mdia → minf → stbl`.
      */
    def stbl: Option[(Int, Int)] =
      for {
        (moovP, moovE) <- find("moov", 0, bytes.length)
        (trakP, trakE) <- find("trak", moovP, moovE)
        (mdiaP, mdiaE) <- find("mdia", trakP, trakE)
        (minfP, minfE) <- find("minf", mdiaP, mdiaE)
        r <- find("stbl", minfP, minfE)
      } yield r
  }

  /** MP4 frame counting — a real pure-JVM box walk ([[Mp4Walk]]), no
    * container library. Reads the sample count from the sample table:
    *
    *  - `stsz` (§8.7.3, a FullBox: 4 bytes version/flags, then
    *    `sample_size u32, sample_count u32`) — `sample_count` IS the
    *    number of samples (frames for a video track);
    *  - else `stts` (§8.6.1.2: version/flags, `entry_count u32`, then
    *    `entry_count × (sample_count u32, sample_delta u32)`) — the frame
    *    count is the sum of the entries' sample_counts.
    *
    * Only the FIRST trak is counted (the testdata contract carries one
    * video track; multi-track files would take the max over video traks,
    * which needs hdlr inspection — out of scope). Truncated, misaligned,
    * or stbl-less payloads return None rather than a guess.
    */
  def mp4FrameCount(bytes: Array[Byte]): Option[Int] = {
    val w = new Mp4Walk(bytes)
    if (!w.isMp4) return None
    for {
      (stblP, stblE) <- w.stbl
      n <- w.find("stsz", stblP, stblE) match {
        case Some((p, e)) if p + 12 <= e => Some(w.u32(p + 8).toInt)
        case _ =>
          w.find("stts", stblP, stblE).flatMap { case (p, e) =>
            if (p + 8 > e) None
            else {
              val entries = w.u32(p + 4)
              var sum = 0L
              var ok = p + 8 + entries * 8 <= e
              var i = 0
              while (ok && i < entries) {
                sum += w.u32(p + 8 + i * 8); i += 1
              }
              if (ok) Some(sum.toInt) else None
            }
          }
      }
    } yield n
  }

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
      // Real container frame count for MP4 payloads ([[mp4FrameCount]]);
      // stills/audio/unparseable payloads are single-frame.
      n_frames =
        (if (h.format == "mp4") mp4FrameCount(bytes) else None).getOrElse(1))
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

  /** Frame sampling for video payloads: emits one row per sampled frame
    * index — the frame count comes from the real MP4 sample-table parse
    * ([[mp4FrameCount]]); the explode shape (rows multiply, payload does
    * not travel with them) keeps the wide binary out of the fan-out.
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
