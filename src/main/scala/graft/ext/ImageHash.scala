package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-level perceptual image hashing — the piece that lets a
  * multimodal corpus dedup RESIZED/RE-ENCODED images, where
  * [[Multimodal.contentMd5]] (exact bytes) and header triage both fail:
  * a real pixel decode (pure JVM: BMP 24-bit and PNG 8-bit including
  * zlib inflate + per-row unfiltering — no external media libraries),
  * then three classic perceptual hashes over the decoded luma plane:
  *
  *  - dHash (difference hash): 9×8 area-averaged grid, each bit a
  *    horizontal gradient comparison — the cheap, robust default;
  *  - aHash (average hash): 8×8 grid thresholded at the grid mean;
  *  - pHash (DCT hash): 16×16 grid → 2-D DCT-II in FIXED-POINT integer
  *    arithmetic (quantized cosine table, scale 10⁶) → the low 8×8
  *    frequency block thresholded at its median (DC excluded).
  *
  * Every stage is integer-exact — area means are floor-divided sums,
  * the DCT is a sum of long products, the median is an exact order
  * statistic — so the hashes are bit-reproducible across engines and
  * across runs, which is what makes [[qImagePhash]]-style oracle
  * replays possible and keeps near-dup banding deterministic.
  *
  * Near-dup pairing reuses the [[Dedup.simhashPairs]] shape: the 64-bit
  * dHash splits into 8 disjoint 8-bit bands; a pair within Hamming
  * distance 7 must agree on at least one band (pigeonhole), so
  * candidates are a bucket join — O(n·8), never all-pairs — then
  * verified with the exact Hamming distance.
  *
  * Reference scope note: the reference pipeline (a pandas security-log
  * script) has no image surface at all; this extends the engine toward
  * the multimodal corpus-curation workload (same motivation as
  * pHash/dHash in any production crawl pipeline).
  */
object ImageHash {

  /** Decoded luma plane: row-major, top-down, values 0..255. */
  case class Pixels(width: Int, height: Int, luma: Array[Int])

  /** Decode a payload's pixels to luma. BMP: 24-bit uncompressed
    * (BI_RGB), bottom-up or top-down (negative height), row stride
    * padded to 4 bytes. PNG: 8-bit depth, color types 0 (gray),
    * 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), no interlace;
    * IDAT chunks concatenated, zlib-inflated, and unfiltered per row
    * (filters 0–4 incl. Paeth). GIF 87a/89a: first frame, real LZW,
    * global/local palette, non-interlaced. TIFF 6.0 baseline: 8-bit
    * gray/RGB uncompressed strips, both byte orders. JPEG is the
    * documented restriction (entropy decode out of scope — hashes
    * NULL). Anything else — or any truncated / malformed structure —
    * returns None rather than garbage pixels. Luma is integer
    * Rec.601: (299·R + 587·G + 114·B) div 1000.
    */
  def decodeLuma(bytes: Array[Byte]): Option[Pixels] = {
    if (bytes == null || bytes.length < 8) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    val isPng = bytes.length >= 8 &&
      u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G'
    val isBmp = u8(0) == 'B' && u8(1) == 'M'
    val isGif = u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8'
    val isTiff =
      (u8(0) == 'I' && u8(1) == 'I' && u8(2) == 42 && u8(3) == 0) ||
        (u8(0) == 'M' && u8(1) == 'M' && u8(2) == 0 && u8(3) == 42)
    val isJpeg = u8(0) == 0xff && u8(1) == 0xd8 && u8(2) == 0xff
    if (isPng) decodePng(bytes)
    else if (isBmp) decodeBmp(bytes)
    else if (isGif) decodeGif(bytes)
    else if (isTiff) decodeTiff(bytes)
    else if (isJpeg) JpegDecoder.decodeLuma(bytes) // baseline, Y plane
    else None
  }

  private def luma601(r: Int, g: Int, b: Int): Int =
    (299 * r + 587 * g + 114 * b) / 1000

  private def decodeBmp(bytes: Array[Byte]): Option[Pixels] = {
    if (bytes.length < 54) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def s32le(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val dataOffset = s32le(10)
    if (s32le(14) < 40) return None // need BITMAPINFOHEADER+
    val w = s32le(18)
    val hRaw = s32le(22)
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    if (w <= 0 || h == 0 || u16le(28) != 24 || s32le(30) != 0) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (dataOffset < 54 ||
      dataOffset.toLong + stride.toLong * h > bytes.length) return None
    val out = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      val src = if (topDown) row else h - 1 - row
      val base = dataOffset + src * stride
      var x = 0
      while (x < w) {
        val i = base + x * 3
        // BMP stores B, G, R
        out(row * w + x) = luma601(u8(i + 2), u8(i + 1), u8(i))
        x += 1
      }
      row += 1
    }
    Some(Pixels(w, h, out))
  }

  private def decodePng(bytes: Array[Byte]): Option[Pixels] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def tag(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 8 + 25) return None
    var w = 0; var h = 0; var colorType = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var sawIhdr = false
    var done = false
    while (!done && i + 8 <= bytes.length) {
      val len = u32(i)
      if (len < 0 || len > Int.MaxValue ||
        i + 12 + len > bytes.length) return None
      val t = tag(i + 4)
      val p = i + 8
      t match {
        case "IHDR" =>
          if (len < 13) return None
          w = u32(p).toInt; h = u32(p + 4).toInt
          val depth = u8(p + 8); colorType = u8(p + 9)
          val compression = u8(p + 10); val filter = u8(p + 11)
          val interlace = u8(p + 12)
          if (depth != 8 || compression != 0 || filter != 0 ||
            interlace != 0 ||
            !Set(0, 2, 3, 4, 6).contains(colorType)) return None
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
          sawIhdr = true
        case "PLTE" =>
          palette = java.util.Arrays.copyOfRange(bytes, p, p + len.toInt)
        case "IDAT" =>
          idat.write(bytes, p, len.toInt)
        case "IEND" =>
          done = true
        case _ => // ancillary chunk: skip
      }
      i += 12 + len.toInt
    }
    if (!sawIhdr || idat.size() == 0) return None
    if (colorType == 3 && (palette == null || palette.length % 3 != 0))
      return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    val rowLen = w * channels
    val raw = new Array[Byte](h * (1 + rowLen))
    val inflater = new java.util.zip.Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        off += n
      }
      if (off < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // Unfilter in place into a flat sample buffer (PNG spec §6: the
    // filter byte leads each row; left/up/avg/Paeth predictors operate
    // bytewise at a bytes-per-pixel offset — 1:1 with channels at
    // 8-bit depth).
    val samples = new Array[Int](h * rowLen)
    val bpp = channels
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + rowLen)) & 0xff
      val rowOff = y * (1 + rowLen) + 1
      var xB = 0
      while (xB < rowLen) {
        val cur = raw(rowOff + xB) & 0xff
        val left = if (xB >= bpp) samples(y * rowLen + xB - bpp) else 0
        val up = if (y > 0) samples((y - 1) * rowLen + xB) else 0
        val ul =
          if (y > 0 && xB >= bpp) samples((y - 1) * rowLen + xB - bpp) else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            val p0 = left + up - ul
            val pa = math.abs(p0 - left)
            val pb = math.abs(p0 - up)
            val pc = math.abs(p0 - ul)
            cur + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up
                   else ul)
          case _ => return None
        }
        samples(y * rowLen + xB) = v & 0xff
        xB += 1
      }
      y += 1
    }
    val out = new Array[Int](w * h)
    var p = 0
    while (p < w * h) {
      val s = p * channels
      out(p) = colorType match {
        case 0 | 4 => samples(s) // gray (alpha ignored)
        case 2 | 6 => luma601(samples(s), samples(s + 1), samples(s + 2))
        case 3 =>
          val idx = samples(s) * 3
          if (idx + 2 >= palette.length) return None
          luma601(palette(idx) & 0xff, palette(idx + 1) & 0xff,
            palette(idx + 2) & 0xff)
      }
      p += 1
    }
    Some(Pixels(w, h, out))
  }

  /** GIF 87a/89a FIRST image frame — real LZW decompression (LSB-first
    * variable-width codes, clear/EOI handling, 12-bit cap), global or
    * local palette, non-interlaced only (bit 6 of the image packed
    * field rejects). The frame decodes at its own dimensions;
    * screen-placement compositing is animation semantics, out of scope
    * for a content hash.
    */
  private def decodeGif(bytes: Array[Byte]): Option[Pixels] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (bytes.length < 13) return None
    if (u8(4) != '7' && u8(4) != '9') return None
    if (u8(5) != 'a') return None
    val packed = u8(10)
    val hasGct = (packed & 0x80) != 0
    val gctLen = if (hasGct) 3 * (1 << ((packed & 7) + 1)) else 0
    if (13 + gctLen > bytes.length) return None
    val gct = if (hasGct)
      java.util.Arrays.copyOfRange(bytes, 13, 13 + gctLen) else null
    var i = 13 + gctLen
    while (i < bytes.length) {
      u8(i) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label, then length-prefixed sub-blocks
          i += 2
          while (i < bytes.length && u8(i) != 0) i += 1 + u8(i)
          i += 1
        case 0x2c =>
          if (i + 10 > bytes.length) return None
          val w = u16le(i + 5); val h = u16le(i + 7)
          val ipacked = u8(i + 9)
          if ((ipacked & 0x40) != 0) return None // interlaced: unsupported
          val hasLct = (ipacked & 0x80) != 0
          val lctLen = if (hasLct) 3 * (1 << ((ipacked & 7) + 1)) else 0
          var p = i + 10
          if (p + lctLen >= bytes.length) return None
          val pal = if (hasLct)
            java.util.Arrays.copyOfRange(bytes, p, p + lctLen) else gct
          if (pal == null || w <= 0 || h <= 0 ||
            w.toLong * h > (1L << 26)) return None
          p += lctLen
          val minCode = u8(p); p += 1
          if (minCode < 2 || minCode > 11) return None
          // concatenate the length-prefixed data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var ok = true
          while (ok && p < bytes.length && u8(p) != 0) {
            val len = u8(p)
            if (p + 1 + len > bytes.length) ok = false
            else { data.write(bytes, p + 1, len); p += 1 + len }
          }
          if (!ok) return None
          val idx = gifLzw(minCode, data.toByteArray, w * h)
            .getOrElse(return None)
          val out = new Array[Int](w * h)
          var q = 0
          while (q < out.length) {
            val pi = idx(q) * 3
            if (pi + 2 >= pal.length) return None
            out(q) = luma601(pal(pi) & 0xff, pal(pi + 1) & 0xff,
              pal(pi + 2) & 0xff)
            q += 1
          }
          return Some(Pixels(w, h, out))
        case _ => return None
      }
    }
    None
  }

  /** GIF-flavor LZW: LSB-first bit stream, initial code width
    * `minCode`+1, dictionary reset on CLEAR (2^minCode), stop at EOI,
    * width grows when the dictionary fills its current range (capped at
    * 12 bits). Returns exactly `expected` palette indices or None on
    * any malformed stream.
    */
  private def gifLzw(
      minCode: Int, data: Array[Byte], expected: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Int](expected)
    var outN = 0
    // dictionary as (prefix code, appended index); roots are -1-prefixed
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    var dictN = 0
    def reset(): Unit = {
      dictN = clear + 2
      var c = 0
      while (c < clear) { prefix(c) = -1; append(c) = c; c += 1 }
    }
    reset()
    var codeSize = minCode + 1
    var acc = 0; var accBits = 0; var bi = 0
    var prev = -1
    val buf = new Array[Int](4096)
    while (outN < expected) {
      while (accBits < codeSize) {
        if (bi >= data.length) return None
        acc |= (data(bi) & 0xff) << accBits; accBits += 8; bi += 1
      }
      val code = acc & ((1 << codeSize) - 1)
      acc >>>= codeSize; accBits -= codeSize
      if (code == clear) { reset(); codeSize = minCode + 1; prev = -1 }
      else if (code == eoi) return if (outN == expected) Some(out) else None
      else {
        // expand `code` (or prev+firstOf(prev) for the just-created code)
        var emit = code
        var kwFirst = -1
        if (code >= dictN) {
          if (code != dictN || prev < 0) return None
          emit = prev
          kwFirst = 0 // placeholder; the first index of prev is appended below
        }
        var n = 0
        var c = emit
        while (c >= 0) { buf(n) = append(c); n += 1; c = prefix(c) }
        val first = buf(n - 1)
        // reversed expansion → output
        var j = n - 1
        while (j >= 0) {
          if (outN >= expected) return None
          out(outN) = buf(j); outN += 1; j -= 1
        }
        if (kwFirst == 0) { // the KwKwK case: append first symbol again
          if (outN >= expected) return None
          out(outN) = first; outN += 1
        }
        if (prev >= 0 && dictN < 4096) {
          prefix(dictN) = prev; append(dictN) = first; dictN += 1
          if (dictN == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  /** TIFF 6.0 baseline, uncompressed strips: 8-bit grayscale
    * (PhotometricInterpretation 0/1) and 8-bit RGB, both byte orders,
    * single or multiple strips. Anything else (compression,
    * tiles, planar, palettes, other depths) returns None.
    */
  private def decodeTiff(bytes: Array[Byte]): Option[Pixels] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    val le = u8(0) == 'I'
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le)
        u8(i).toLong | (u8(i + 1).toLong << 8) |
          (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else
        (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (bytes.length < 8) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = u16(ifd.toInt)
    if (ifd + 2 + n * 12 > bytes.length) return None
    // tag → (type, count, value-or-offset field position)
    var w = 0; var h = 0; var compression = 1; var photometric = -1
    var spp = 1; var rowsPerStrip = Int.MaxValue
    var bitsOk = true
    var offField = -1; var offType = 0; var offCount = 0L
    var cntField = -1; var cntType = 0; var cntCount = 0L
    var e = 0
    while (e < n) {
      val p = ifd.toInt + 2 + e * 12
      val tag = u16(p); val typ = u16(p + 2); val cnt = u32(p + 4)
      def scalar: Int =
        if (typ == 3) u16(p + 8) else u32(p + 8).toInt
      tag match {
        case 256 => w = scalar
        case 257 => h = scalar
        case 258 => // BitsPerSample: every sample must be 8
          if (cnt == 1) bitsOk = scalar == 8
          else {
            // SHORT array: inline when cnt <= 2, else at offset
            val base = if (cnt <= 2) p + 8 else u32(p + 8).toInt
            if (typ != 3 || base + cnt * 2 > bytes.length) bitsOk = false
            else {
              var k = 0
              while (k < cnt && bitsOk) {
                if (u16(base + k * 2) != 8) bitsOk = false
                k += 1
              }
            }
          }
        case 259 => compression = scalar
        case 262 => photometric = scalar
        case 273 => offField = p; offType = typ; offCount = cnt
        case 277 => spp = scalar
        case 278 => rowsPerStrip = scalar
        case 279 => cntField = p; cntType = typ; cntCount = cnt
        case _ => ()
      }
      e += 1
    }
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    if (compression != 1 || !bitsOk) return None
    if (offField < 0 || cntField < 0) return None
    if (!(photometric == 0 || photometric == 1 || photometric == 2))
      return None
    if (photometric == 2 && spp < 3) return None
    if (photometric != 2 && spp != 1) return None
    def arrayVals(field: Int, typ: Int, cnt: Long): Option[Array[Long]] = {
      val width = if (typ == 3) 2 else if (typ == 4) 4 else return None
      val base =
        if (cnt * width <= 4) field + 8 else u32(field + 8).toInt
      if (base < 0 || base + cnt * width > bytes.length) return None
      Some(Array.tabulate(cnt.toInt) { k =>
        if (typ == 3) u16(base + k * 2).toLong else u32(base + k * 4)
      })
    }
    val offs = arrayVals(offField, offType, offCount).getOrElse(return None)
    val cnts = arrayVals(cntField, cntType, cntCount).getOrElse(return None)
    if (offs.length != cnts.length || offs.isEmpty) return None
    val rowBytes = w * spp
    val out = new Array[Int](w * h)
    var row = 0
    var strip = 0
    while (row < h) {
      if (strip >= offs.length) return None
      val sRows = math.min(rowsPerStrip, h - row)
      val sOff = offs(strip); val sLen = cnts(strip)
      if (sOff < 0 || sOff + sLen > bytes.length ||
        sLen < sRows.toLong * rowBytes) return None
      var r = 0
      while (r < sRows) {
        val base = (sOff + r.toLong * rowBytes).toInt
        var x = 0
        while (x < w) {
          val s = base + x * spp
          out((row + r) * w + x) =
            if (photometric == 2)
              luma601(u8(s), u8(s + 1), u8(s + 2))
            else if (photometric == 1) u8(s)
            else 255 - u8(s) // white-is-zero
          x += 1
        }
        r += 1
      }
      row += sRows
      strip += 1
    }
    Some(Pixels(w, h, out))
  }

  /** Area-averaged downscale to a tw×th grid, integer-exact: cell
    * (cx, cy) covers source columns [cx·W div tw, (cx+1)·W div tw) ×
    * rows [cy·H div th, (cy+1)·H div th), value = floor(mean). None
    * when the source is smaller than the target grid (some cells would
    * be empty).
    */
  private[graft] def gridAvg(p: Pixels, tw: Int, th: Int): Option[Array[Long]] = {
    if (p.width < tw || p.height < th) return None
    val out = new Array[Long](tw * th)
    var cy = 0
    while (cy < th) {
      val y0 = cy * p.height / th
      val y1 = (cy + 1) * p.height / th
      var cx = 0
      while (cx < tw) {
        val x0 = cx * p.width / tw
        val x1 = (cx + 1) * p.width / tw
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += p.luma(y * p.width + x); x += 1 }
          y += 1
        }
        out(cy * tw + cx) = sum / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    Some(out)
  }

  /** dHash: 9×8 grid, bit (cx, cy) = grid(cx+1, cy) > grid(cx, cy),
    * packed row-major MSB-first (bit 63 = top-left comparison).
    */
  def dHash(p: Pixels): Option[Long] =
    gridAvg(p, 9, 8).map { g =>
      var hash = 0L
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          if (g(cy * 9 + cx + 1) > g(cy * 9 + cx))
            hash |= 1L << (63 - (cy * 8 + cx))
          cx += 1
        }
        cy += 1
      }
      hash
    }

  /** aHash: 8×8 grid, bit = cell > floor(mean of the 64 cells), packed
    * row-major MSB-first.
    */
  def aHash(p: Pixels): Option[Long] =
    gridAvg(p, 8, 8).map { g =>
      val mean = g.sum / 64
      var hash = 0L
      var i = 0
      while (i < 64) {
        if (g(i) > mean) hash |= 1L << (63 - i)
        i += 1
      }
      hash
    }

  /** pHash DCT input grid edge. */
  val PhashN = 16

  /** Quantized DCT-II cosine table: CosQ(k)(n) =
    * round(cos(π·(2n+1)·k / (2·[[PhashN]])) · 10⁶). Computed once here
    * and EMBEDDED as integer literals into the oracle SQL
    * ([[graft.queries]]), so both engines multiply identical constants
    * — float cos never crosses the engine boundary.
    */
  private[graft] val CosQ: Array[Array[Long]] =
    Array.tabulate(PhashN, PhashN) { (k, n) =>
      math.round(math.cos(math.Pi * (2 * n + 1) * k / (2 * PhashN)) * 1e6)
    }

  /** pHash: 16×16 grid → fixed-point 2-D DCT-II (long products of two
    * 10⁶-scaled cosines; |F| ≤ 255·10¹²·256 < 2⁶³) → low 8×8 block →
    * bit (u, v) = F(u, v) > median of the 63 non-DC coefficients (the
    * exact 32nd smallest), DC bit always 0. Packed row-major (v, u)
    * MSB-first.
    */
  def pHash(p: Pixels): Option[Long] =
    gridAvg(p, PhashN, PhashN).map { g =>
      val f = new Array[Long](64)
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var acc = 0L
          var y = 0
          while (y < PhashN) {
            var x = 0
            while (x < PhashN) {
              acc += g(y * PhashN + x) * CosQ(u)(x) * CosQ(v)(y)
              x += 1
            }
            y += 1
          }
          f(v * 8 + u) = acc
          u += 1
        }
        v += 1
      }
      val nonDc = java.util.Arrays.copyOfRange(f, 1, 64)
      java.util.Arrays.sort(nonDc)
      val median = nonDc(31) // 32nd smallest of 63
      var hash = 0L
      var i = 1 // DC bit (i = 0) stays 0
      while (i < 64) {
        if (f(i) > median) hash |= 1L << (63 - i)
        i += 1
      }
      hash
    }

  /** Output row of [[imageHashes]]: fixed-size, payload dropped. */
  case class ImageHashRow(
      media_id: Long, format: String,
      dhash: Option[Long], ahash: Option[Long], phash: Option[Long])

  /** Input row shape (public: Catalyst's generated deserializer cannot
    * access private classes).
    */
  case class ImageIn(media_id: Long, payload: Array[Byte])

  /** Per-image perceptual hashes over binary payloads — the same
    * `mapPartitions` shape as [[Multimodal.extractFeatures]]: payloads
    * live only for one batch, small fixed-size rows out, wide binary
    * dropped immediately. Undecodable payloads (wrong format, truncated,
    * smaller than the hash grids) carry NULL hashes rather than failing
    * the partition.
    *
    * @param df columns: media_id LONG, payload BINARY
    */
  def imageHashes(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload").cast("binary"))
      .as[ImageIn]
      .mapPartitions(_.map { m =>
        val fmt = Multimodal.decodeHeader(
          if (m.payload == null) Array.emptyByteArray else m.payload).format
        decodeLuma(m.payload) match {
          case Some(px) =>
            ImageHashRow(m.media_id, fmt, dHash(px), aHash(px), pHash(px))
          case None => ImageHashRow(m.media_id, fmt, None, None, None)
        }
      })
      .toDF()
  }

  /** Image near-duplicate pairs by dHash Hamming distance — the
    * [[Dedup.simhashPairs]] recipe on the perceptual fingerprint:
    * disjoint bands guarantee recall for Hamming ≤ bands − 1
    * (pigeonhole: a pair differing in ≤ bands − 1 bits agrees exactly
    * on ≥ 1 band), so candidate generation is a band-bucket join —
    * O(n·bands), never all-pairs — and every candidate is verified
    * with the exact bit_count(xor) distance. Undecodable images (NULL
    * dHash) never pair.
    *
    * Banding defaults to the scale-optimal count for the verify
    * threshold — `maxHamming + 1` bands, the widest that still
    * guarantee recall ([[HammingBands]]): maxHamming = 3 → 4 × 16-bit
    * bands (65 536 bucket values each), whose candidate join stays
    * near-linear ~256× longer than the saturating 8 × 8-bit config
    * (256 values/band). Raise `maxHamming` for looser matching — the
    * band width adapts; pass `bands` explicitly only to OVER-band for
    * recall beyond the verify threshold.
    *
    * @param df columns: media_id LONG, payload BINARY
    */
  def imageNearDupPairs(
      spark: SparkSession, df: DataFrame, maxHamming: Int = 3,
      bands: Int = 0): DataFrame = {
    val fpBits = 64
    val nBands = HammingBands.resolveBands(maxHamming, bands, fpBits)
    // Pinned: the signature table feeds BOTH sides of the band
    // self-join — without the checkpoint each side replays the full
    // decode + hash pass over the payload bytes (the multi-consumer
    // lesson; decode is the expensive stage here).
    val sigs = imageHashes(spark, df)
      .where(col("dhash").isNotNull)
      .select(col("media_id"), col("dhash"))
      .localCheckpoint(true)
    val bandKeys = HammingBands.bandKeys(col("dhash"), fpBits, nBands)
    val bucketed = sigs.select(col("media_id"), col("dhash"),
      explode(array(bandKeys: _*)).as("bucket"))
    val a = bucketed.select(col("media_id").as("id1"),
      col("dhash").as("h1"), col("bucket"))
    val b = bucketed.select(col("media_id").as("id2"),
      col("dhash").as("h2"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      // a pair can collide in several bands — dedup across bands
      .select("id1", "id2", "hamming").distinct()
  }

  /** Connected components over the VERIFIED near-dup pair graph —
    * transitive image duplicate groups (the [[Dedup.minhashDedupClusters]]
    * role for the perceptual fingerprint): iterated min-label
    * propagation over [[imageNearDupPairs]]' edges, each round one
    * pinned edge join (labels spread one hop per iteration, so `iters`
    * must be ≥ the largest component's diameter — near-dup components
    * are shallow in practice; raise it for pathological chains). Emits
    * `(media_id, cluster_id)` for every image that participates in at
    * least one verified pair, `cluster_id` = the component's minimum
    * id. Verification-first matters: clustering RAW band collisions
    * would chain false positives; here every edge already passed the
    * exact Hamming check.
    */
  def imageDupClusters(
      spark: SparkSession, df: DataFrame,
      maxHamming: Int = 3, iters: Int = 4, bands: Int = 0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val pairs = imageNearDupPairs(spark, df, maxHamming, bands)
      .select("id1", "id2").localCheckpoint(true)
    val edges = pairs.union(
      pairs.select(col("id2").as("id1"), col("id1").as("id2")))
    var labels = pairs
      .select(explode(array(col("id1"), col("id2"))).as("media_id"))
      .distinct()
      .withColumn("cluster_id", col("media_id"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    // Early fixed-point exit (optimization r20, the GraphOps rule): the
    // step is a deterministic min-fold over the static edge list, so a
    // round that changes no label has converged and every later round
    // is the identity — output identical to the full unroll.
    while (i < iters && !converged) {
      val viaNb = edges
        .join(labels.select(col("media_id").as("id2"),
          col("cluster_id").as("_nb")), "id2")
        .groupBy(col("id1").as("media_id"))
        .agg(min(col("_nb")).as("_m"))
      val next = labels.join(viaNb, Seq("media_id"), "left")
        .select(col("media_id"),
          least(col("cluster_id"),
            coalesce(col("_m"), col("cluster_id"))).as("cluster_id"),
          col("cluster_id").as("_prev"))
        .localCheckpoint(true)
      // the final round's probe is dead weight — its answer gates nothing
      converged = i < iters - 1 &&
        next.where(col("cluster_id") =!= col("_prev")).isEmpty
      labels = next.drop("_prev")
      i += 1
    }
    labels
  }

  /** Persisted bucket index of an ACCEPTED image corpus — the
    * [[graft.ext.Dedup.minhashBucketIndex]] role for the perceptual
    * fingerprint. Unlike MinHash (where a bucket collision IS the
    * match), Hamming dedup VERIFIES candidates exactly, so the index
    * must carry every member's hash per bucket, not just a
    * representative: `(bucket, media_id, dhash)` — n·bands rows,
    * written once per accepted corpus and re-read by every crawl cycle.
    */
  def imageBucketIndex(
      spark: SparkSession, df: DataFrame, maxHamming: Int = 3,
      bands: Int = 0): DataFrame = {
    val nBands = HammingBands.resolveBands(maxHamming, bands, 64)
    val sigs = imageHashes(spark, df)
      .where(col("dhash").isNotNull)
      .select(col("media_id"), col("dhash"))
    sigs.select(col("media_id"), col("dhash"),
        explode(array(HammingBands.bandKeys(col("dhash"), 64, nBands): _*))
          .as("bucket"))
      // stamped AFTER the explode: the analyzer's generator extraction
      // drops alias metadata on a generator expression itself. Column
      // order stays the documented (bucket, media_id, dhash) for
      // positional consumers of persisted indexes (review r18).
      .select(HammingBands.withLayoutMeta(col("bucket"), nBands),
        col("media_id"), col("dhash"))
  }

  /** Incremental near-dup ADMISSION for images — the recurring crawl
    * cycle: screen each new-batch image against the accepted corpus'
    * bucket index ([[imageBucketIndex]]; the corpus is never re-decoded
    * or re-hashed), then against its own batch peers. Output: one row
    * per batch image with `rep_id` / `is_dup` — `rep_id` is the
    * smallest corpus id within `maxHamming` (corpus is authoritative:
    * an admitted image always wins over a batch peer), else the
    * smallest batch id within `maxHamming` (self included, Hamming 0),
    * else the image itself. Undecodable payloads carry no hash, hence
    * no buckets, and pass through admitted — the near-dup screen has
    * no evidence about them (the [[graft.ext.Dedup.minhashDedup]]
    * omission contract).
    *
    * The banding is DERIVED from the index (advice r16): an explicit
    * `bands` that contradicts the index fails loudly, and the recall
    * guarantee spans the two sides jointly by construction.
    */
  def incrementalImageDedup(
      spark: SparkSession, batch: DataFrame, bucketIndex: DataFrame,
      maxHamming: Int = 3, bands: Int = 0): DataFrame = {
    // Pinned: the batch signature table feeds the corpus join, the peer
    // self-join, AND the output spine (decode is the costly stage).
    val sigs = imageHashes(spark, batch)
      .select(col("media_id"), col("dhash"))
      .localCheckpoint(true)
    HammingBands.incrementalScreen(sigs, bucketIndex, "dhash", 64,
      maxHamming, bands)
  }
}
