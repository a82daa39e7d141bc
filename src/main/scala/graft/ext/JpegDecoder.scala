package graft.ext

/** Baseline JPEG (ITU T.81) LUMA decoder — pure JVM, no imaging
  * library: marker parse, DQT/DHT tables, canonical Huffman decoding
  * (the spec's MINCODE/MAXCODE/VALPTR walk), the entropy-coded scan
  * with 0xFF00 byte stuffing and restart markers, differential DC,
  * AC run-length/EOB/ZRL, dequantization, and a double-precision
  * separable 8-point IDCT.
  *
  * Scope: baseline sequential (SOF0) and extended sequential (SOF1),
  * 8-bit samples, grayscale or YCbCr where the Y component carries the
  * maximum sampling factors (every common 4:4:4 / 4:2:2 / 4:2:0 file).
  * Only the Y plane is RECONSTRUCTED — JFIF Y is exactly the Rec.601
  * luma the perceptual hashes consume — but chroma blocks are still
  * entropy-DECODED (and discarded) to keep the bitstream aligned and
  * their DC predictors correct. Progressive (SOF2), arithmetic coding,
  * 12-bit, and hierarchical files return None, as does any malformed
  * stream — never garbage pixels.
  */
object JpegDecoder {

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in the spec's decode form. */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr per code length 1..16
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        k += bits(l)
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader: handles 0xFF00 stuffing; stops at any
    * marker (0xFF xx, xx != 0) and reports it.
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var bits = 0
    var atMarker = -1 // marker code when the scan data ended

    def bit(): Int = {
      if (bits == 0) {
        if (atMarker >= 0) return -1
        if (pos >= bytes.length) { atMarker = 0xd9; return -1 }
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) { atMarker = 0xd9; return -1 }
          val b2 = bytes(pos) & 0xff
          if (b2 == 0x00) { pos += 1 } // stuffed 0xFF data byte
          else { atMarker = b2; pos += 1; return -1 }
        }
        acc = b; bits = 8
      }
      bits -= 1
      (acc >> bits) & 1
    }

    /** Align to the next byte and consume an expected RSTn marker. */
    def restart(): Boolean = {
      bits = 0
      if (atMarker >= 0xd0 && atMarker <= 0xd7) { atMarker = -1; true }
      else if (atMarker >= 0) false
      else {
        // marker not yet consumed: it must be next in the stream
        if (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff) {
          val m = bytes(pos + 1) & 0xff
          if (m >= 0xd0 && m <= 0xd7) { pos += 2; true } else false
        } else false
      }
    }
  }

  private def decodeHuff(br: BitReader, h: Huff): Int = {
    var code = br.bit()
    if (code < 0) return -1
    var l = 1
    while (l <= 16) {
      if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
        return h.values(h.valPtr(l) + code - h.minCode(l))
      val b = br.bit()
      if (b < 0) return -1
      code = (code << 1) | b
      l += 1
    }
    -1
  }

  /** EXTEND (spec F.2.2.1): map a magnitude-category bit pattern to a
    * signed value.
    */
  private def receiveExtend(br: BitReader, s: Int): Int = {
    if (s == 0) return 0
    var v = 0
    var i = 0
    while (i < s) {
      val b = br.bit()
      if (b < 0) return Int.MinValue
      v = (v << 1) | b
      i += 1
    }
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
  }

  // separable IDCT basis: c(k)·cos((2n+1)kπ/16), computed once
  private val IdctCos: Array[Array[Double]] = Array.tabulate(8, 8) { (k, n) =>
    val ck = if (k == 0) 1.0 / math.sqrt(2.0) else 1.0
    ck * math.cos((2 * n + 1) * k * math.Pi / 16.0)
  }

  /** 2-D IDCT of one dequantized block (natural order) + level shift,
    * clamped to 0..255.
    */
  private def idct(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    // rows: for each row y over coefficient rows v
    var x = 0
    while (x < 8) { // columns of the coefficient block
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += IdctCos(v)(y) * coef(v * 8 + x); v += 1 }
        tmp(y * 8 + x) = s / 2.0
        y += 1
      }
      x += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var xx = 0
      while (xx < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += IdctCos(u)(xx) * tmp(y * 8 + u); u += 1 }
        val v = math.round(s / 2.0 + 128.0).toInt
        out(y * 8 + xx) = if (v < 0) 0 else if (v > 255) 255 else v
        xx += 1
      }
      y += 1
    }
    out
  }

  private case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var dcTable: Int = 0, var acTable: Int = 0, var dcPred: Int = 0)

  /** Decode the luma plane. See the object scaladoc for scope. */
  def decodeLuma(bytes: Array[Byte]): Option[ImageHash.Pixels] = {
    if (bytes == null || bytes.length < 4) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (u8(0) != 0xff || u8(1) != 0xd8) return None // SOI

    val quant = Array.fill(4)(null: Array[Int])
    val dcHuff = Array.fill(4)(null: Huff)
    val acHuff = Array.fill(4)(null: Huff)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0

    var i = 2
    while (i + 4 <= bytes.length) {
      if (u8(i) != 0xff) return None
      val marker = u8(i + 1)
      if (marker == 0xd9) return None // EOI before any scan
      val len = u16(i + 2)
      if (len < 2 || i + 2 + len > bytes.length) return None
      val p = i + 4
      marker match {
        case 0xdb => // DQT: one or more tables
          var q = p
          while (q < i + 2 + len) {
            val pq = u8(q) >> 4; val tq = u8(q) & 15
            if (tq > 3) return None
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              t(ZigZag(k)) =
                if (pq == 0) u8(q + 1 + k) else u16(q + 1 + 2 * k)
              k += 1
            }
            quant(tq) = t
            q += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xc4 => // DHT: one or more tables
          var q = p
          while (q < i + 2 + len) {
            val tc = u8(q) >> 4; val th = u8(q) & 15
            if (tc > 1 || th > 3) return None
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(q + l); total += bits(l); l += 1 }
            if (total > 256 || q + 17 + total > bytes.length) return None
            val vals = Array.tabulate(total)(k => u8(q + 17 + k))
            val h = new Huff(bits, vals)
            if (tc == 0) dcHuff(th) = h else acHuff(th) = h
            q += 17 + total
          }
        case 0xc0 | 0xc1 => // SOF0/1: baseline / extended sequential
          if (u8(p) != 8) return None // 8-bit only
          height = u16(p + 1); width = u16(p + 3)
          val nc = u8(p + 5)
          if (width <= 0 || height <= 0 ||
            width.toLong * height > (1L << 26)) return None
          if (nc != 1 && nc != 3) return None
          comps = Array.tabulate(nc) { c =>
            val b = p + 6 + c * 3
            Component(u8(b), u8(b + 1) >> 4, u8(b + 1) & 15, u8(b + 2))
          }
          if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4))
            return None
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          return None // progressive/lossless/arithmetic: out of scope
        case 0xdd => // DRI
          restartInterval = u16(p)
        case 0xda => // SOS — decode the scan
          if (comps == null) return None
          val ns = u8(p)
          if (ns != comps.length) return None
          var c = 0
          while (c < ns) {
            val cid = u8(p + 1 + c * 2)
            val tabs = u8(p + 2 + c * 2)
            comps.find(_.id == cid) match {
              case Some(comp) =>
                comp.dcTable = tabs >> 4; comp.acTable = tabs & 15
              case None => return None
            }
            c += 1
          }
          return decodeScan(bytes, i + 2 + len, comps, quant,
            dcHuff, acHuff, width, height, restartInterval)
        case _ => () // APPn / COM / others: skip
      }
      i += 2 + len
    }
    None
  }

  private def decodeScan(
      bytes: Array[Byte], scanStart: Int, comps: Array[Component],
      quant: Array[Array[Int]], dcHuff: Array[Huff], acHuff: Array[Huff],
      width: Int, height: Int, restartInterval: Int)
      : Option[ImageHash.Pixels] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val y = comps(0)
    // luma-only reconstruction requires Y at full resolution
    if (y.h != maxH || y.v != maxV) return None
    comps.foreach { c =>
      if (quant(c.tq) == null) return None
      if (dcHuff(c.dcTable) == null || acHuff(c.acTable) == null) return None
    }
    val mcuW = 8 * maxH
    val mcuH = 8 * maxV
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    val plane = new Array[Int](width * height)
    val br = new BitReader(bytes, scanStart)
    val coef = new Array[Int](64)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!br.restart()) return None
          comps.foreach(_.dcPred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val comp = comps(ci)
          val isY = ci == 0
          val qt = quant(comp.tq)
          var by = 0
          while (by < comp.v) {
            var bx = 0
            while (bx < comp.h) {
              // ---- one 8×8 block ----
              java.util.Arrays.fill(coef, 0)
              val t = decodeHuff(br, dcHuff(comp.dcTable))
              if (t < 0 || t > 15) return None
              val diff = receiveExtend(br, t)
              if (diff == Int.MinValue) return None
              comp.dcPred += diff
              coef(0) = comp.dcPred * qt(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = decodeHuff(br, acHuff(comp.acTable))
                if (rs < 0) return None
                val r = rs >> 4; val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += r
                  if (k > 63) return None
                  val v = receiveExtend(br, s)
                  if (v == Int.MinValue) return None
                  coef(ZigZag(k)) = v * qt(ZigZag(k))
                  k += 1
                }
              }
              if (isY) {
                val px = idct(coef)
                val x0 = mx * mcuW + bx * 8
                val y0 = my * mcuH + by * 8
                var ry = 0
                while (ry < 8) {
                  val yy = y0 + ry
                  if (yy < height) {
                    var rx = 0
                    while (rx < 8) {
                      val xx = x0 + rx
                      if (xx < width) plane(yy * width + xx) = px(ry * 8 + rx)
                      rx += 1
                    }
                  }
                  ry += 1
                }
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    Some(ImageHash.Pixels(width, height, plane))
  }
}
