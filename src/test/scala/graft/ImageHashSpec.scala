package graft

import graft.ext.ImageHash
import org.apache.spark.sql.functions._

/** Pixel decoders (BMP 24-bit, PNG 8-bit incl. zlib + all five filter
  * types) and the perceptual hash pipeline. Payloads are built by the
  * spec's own minimal encoders — real byte layouts, no media library —
  * so every assertion exercises the production decode path.
  */
class ImageHashSpec extends SparkSpec {

  // ---- encoders (test-side only) -----------------------------------

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** 24-bit BMP from row-major top-down RGB triples. */
  private def bmp(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int),
      topDown: Boolean): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new java.io.ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(54 + stride * h)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)); out.write(le32(w))
    out.write(le32(if (topDown) -h else h))
    out.write(le16(1)); out.write(le16(24)); out.write(le32(0))
    out.write(le32(stride * h))
    out.write(le32(0)); out.write(le32(0)); out.write(le32(0)); out.write(le32(0))
    val rows = if (topDown) 0 until h else (h - 1) to 0 by -1
    rows.foreach { y =>
      var n = 0
      (0 until w).foreach { x =>
        val (r, g, b) = rgb(x, y)
        out.write(b); out.write(g); out.write(r); n += 3
      }
      while (n < stride) { out.write(0); n += 1 }
    }
    out.toByteArray
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val tb = typ.getBytes("US-ASCII")
    crc.update(tb); crc.update(data)
    be32(data.length) ++ tb ++ data ++ be32(crc.getValue & 0xFFFFFFFFL)
  }

  /** PNG from pre-filtered raw scanlines (each row = filter byte +
    * filtered samples) — lets a test pick the filter per row.
    */
  private def pngRaw(w: Int, h: Int, colorType: Int,
      raw: Array[Byte], palette: Array[Byte] = null): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    sig ++ pngChunk("IHDR", ihdr) ++
      (if (palette != null) pngChunk("PLTE", palette)
       else Array.emptyByteArray) ++
      pngChunk("IDAT", java.util.Arrays.copyOf(buf, n)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Filter-0 PNG from row-major top-down RGB triples. */
  private def pngRgb(w: Int, h: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + w * 3))
    (0 until h).foreach { y =>
      raw(y * (1 + w * 3)) = 0
      (0 until w).foreach { x =>
        val (r, g, b) = rgb(x, y)
        val o = y * (1 + w * 3) + 1 + x * 3
        raw(o) = r.toByte; raw(o + 1) = g.toByte; raw(o + 2) = b.toByte
      }
    }
    pngRaw(w, h, 2, raw)
  }

  private def pattern(x: Int, y: Int): (Int, Int, Int) = {
    val v = (x * 37 + y * 101) % 256
    (v, (v + 40) % 256, (v + 80) % 256)
  }

  /** LSB-first bit writer for hand-built LZW streams. */
  private class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var bits = 0
    def put(v: Int, width: Int): Unit = {
      acc |= v << bits; bits += width
      while (bits >= 8) { out.write(acc & 0xff); acc >>>= 8; bits -= 8 }
    }
    def bytes: Array[Byte] = {
      if (bits > 0) { out.write(acc & 0xff); acc = 0; bits = 0 }
      out.toByteArray
    }
  }

  /** GIF with a 256-entry gray global palette and a literals-only LZW
    * stream (CLEAR re-emitted before the code width would grow — the
    * classic "uncompressed GIF" construction, itself a legal stream).
    */
  private def gif(w: Int, h: Int, idx: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(w)); out.write(le16(h))
    out.write(0x80 | 7); out.write(0); out.write(0) // GCT, 256 entries
    (0 until 256).foreach { v => out.write(v); out.write(v); out.write(v) }
    out.write(0x2c) // image descriptor: full frame, no LCT, no interlace
    out.write(le16(0)); out.write(le16(0)); out.write(le16(w)); out.write(le16(h))
    out.write(0)
    out.write(8) // LZW min code size (256-color)
    val bw = new BitWriter
    bw.put(256, 9) // CLEAR
    var sinceClear = 0
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        if (sinceClear == 250) { bw.put(256, 9); sinceClear = 0 }
        bw.put(idx(x, y) & 0xff, 9); sinceClear += 1
      }
    }
    bw.put(257, 9) // EOI
    val data = bw.bytes
    var o = 0
    while (o < data.length) { // length-prefixed sub-blocks
      val n = math.min(255, data.length - o)
      out.write(n); out.write(data, o, n); o += n
    }
    out.write(0); out.write(0x3b)
    out.toByteArray
  }

  /** Baseline TIFF: 8-bit samples, uncompressed strips, selectable
    * byte order, photometric, samples-per-pixel, and rows-per-strip.
    */
  private def tiff(w: Int, h: Int, sample: (Int, Int, Int) => Int,
      le: Boolean, photometric: Int, spp: Int,
      rowsPerStrip: Int): Array[Byte] = {
    def b16(v: Int): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def b32(v: Long): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val rowBytes = w * spp
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
      val buf = new Array[Byte](rows * rowBytes)
      (0 until rows).foreach { r =>
        (0 until w).foreach { x =>
          (0 until spp).foreach { c =>
            buf(r * rowBytes + x * spp + c) =
              sample(x, s * rowsPerStrip + r, c).toByte
          }
        }
      }
      buf
    }
    // layout: 8-byte header | IFD | [strip offset/count arrays] | strips
    val entries = 9
    val ifdSize = 2 + entries * 12 + 4
    val arraysAt = 8 + ifdSize
    val arrayBytes = if (nStrips > 1) nStrips * 8 else 0
    var stripAt = arraysAt + arrayBytes
    val stripOffs = strips.map { s => val o = stripAt; stripAt += s.length; o }
    val out = new java.io.ByteArrayOutputStream()
    out.write(if (le) "II".getBytes else "MM".getBytes)
    out.write(b16(42)); out.write(b32(8))
    out.write(b16(entries))
    def entry(tag: Int, typ: Int, cnt: Long, value: Array[Byte]): Unit = {
      out.write(b16(tag)); out.write(b16(typ)); out.write(b32(cnt))
      out.write(value); (value.length until 4).foreach(_ => out.write(0))
    }
    def shortVal(v: Int): Array[Byte] =
      if (le) b16(v) ++ Array[Byte](0, 0) else b16(v) ++ Array[Byte](0, 0)
    entry(256, 3, 1, shortVal(w))
    entry(257, 3, 1, shortVal(h))
    entry(258, 3, 1, shortVal(8))
    entry(259, 3, 1, shortVal(1))
    entry(262, 3, 1, shortVal(photometric))
    entry(273, 4, nStrips,
      if (nStrips == 1) b32(stripOffs.head) else b32(arraysAt))
    entry(277, 3, 1, shortVal(spp))
    entry(278, 3, 1, shortVal(rowsPerStrip))
    entry(279, 4, nStrips,
      if (nStrips == 1) b32(strips.head.length)
      else b32(arraysAt + nStrips * 4))
    out.write(b32(0)) // next IFD
    if (nStrips > 1) {
      stripOffs.foreach(o => out.write(b32(o)))
      strips.foreach(s => out.write(b32(s.length)))
    }
    strips.foreach(out.write)
    out.toByteArray
  }

  // ---- decode correctness ------------------------------------------

  test("GIF decode: literal LZW round-trip matches BMP of same gray pixels") {
    def lum(x: Int, y: Int): Int = (x * 37 + y * 101) % 256
    val fromGif = ImageHash.decodeLuma(gif(16, 16, lum)).get
    assert(fromGif.width == 16 && fromGif.height == 16)
    // gray palette: index IS the luma
    assert(fromGif.luma.toSeq ==
      (0 until 256).map(i => lum(i % 16, i / 16)))
    // and a wide image to force the mid-stream CLEAR path (>250 pixels)
    val wide = ImageHash.decodeLuma(gif(64, 8, lum)).get
    assert(wide.luma.toSeq == (0 until 64 * 8).map(i => lum(i % 64, i / 64)))
  }

  test("GIF decode: real compression incl. the KwKwK case and width growth") {
    // minCode 2: clear=4, eoi=5, width starts at 3. Stream
    // [CLEAR, 1, 2, 6, 8, EOI] decodes to indices [1, 2, 1,2, 1,2,1]:
    // code 6 = (1,2) created by the 2nd emit; code 8 arrives while ==
    // dictN (KwKwK) -> expand(prev=6) + first(6); the width grows to 4
    // bits exactly when dict entry 7 fills the 3-bit range.
    val bw = new BitWriter
    bw.put(4, 3); bw.put(1, 3); bw.put(2, 3); bw.put(6, 3)
    bw.put(8, 4); bw.put(5, 4)
    val data = bw.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(7)); out.write(le16(1))
    out.write(0x80 | 1); out.write(0); out.write(0) // GCT 4 entries
    Seq(10, 20, 30, 40).foreach { v => out.write(v); out.write(v); out.write(v) }
    out.write(0x2c)
    out.write(le16(0)); out.write(le16(0)); out.write(le16(7)); out.write(le16(1))
    out.write(0)
    out.write(2) // LZW min code size
    out.write(data.length); out.write(data, 0, data.length); out.write(0)
    out.write(0x3b)
    val px = ImageHash.decodeLuma(out.toByteArray).get
    assert(px.luma.toSeq == Seq(20, 30, 20, 30, 20, 30, 20))
  }

  test("GIF decode: interlaced frames are rejected, truncation is safe") {
    val good = gif(8, 8, (x, y) => x + y)
    // set the interlace bit in the image descriptor's packed field:
    // descriptor starts right after the 6+7+768-byte header+GCT
    val desc = 6 + 7 + 768
    assert((good(desc) & 0xff) == 0x2c)
    val bad = good.clone(); bad(desc + 9) = 0x40.toByte
    assert(ImageHash.decodeLuma(bad).isEmpty)
    assert(ImageHash.decodeLuma(good.take(desc + 12)).isEmpty)
  }

  test("TIFF decode: gray and RGB, both byte orders, multi-strip") {
    def lum(x: Int, y: Int): Int = (x * 37 + y * 101) % 256
    for (le <- Seq(true, false)) {
      val gray = ImageHash.decodeLuma(
        tiff(16, 16, (x, y, _) => lum(x, y), le, photometric = 1,
          spp = 1, rowsPerStrip = 5)).get
      assert(gray.luma.toSeq == (0 until 256).map(i => lum(i % 16, i / 16)),
        s"gray le=$le")
      // white-is-zero inverts
      val wz = ImageHash.decodeLuma(
        tiff(4, 2, (x, y, _) => lum(x, y), le, photometric = 0,
          spp = 1, rowsPerStrip = 2)).get
      assert(wz.luma.toSeq ==
        (0 until 8).map(i => 255 - lum(i % 4, i / 4)), s"wz le=$le")
      // RGB goes through Rec.601
      def rgb(x: Int, y: Int, c: Int): Int = pattern(x, y).productIterator
        .toSeq(c).asInstanceOf[Int]
      val color = ImageHash.decodeLuma(
        tiff(16, 16, rgb, le, photometric = 2, spp = 3,
          rowsPerStrip = 16)).get
      val fromBmp = ImageHash.decodeLuma(
        bmp(16, 16, pattern, topDown = true)).get
      assert(color.luma.toSeq == fromBmp.luma.toSeq, s"rgb le=$le")
    }
    // compressed TIFFs are rejected, not mis-decoded
    val deflated = tiff(4, 4, (x, y, _) => x + y, le = true,
      photometric = 1, spp = 1, rowsPerStrip = 4)
    // compression tag value lives in entry index 3 (tag 259) at the
    // value field: header(8) + count(2) + 3*12 + 8
    val cOff = 8 + 2 + 3 * 12 + 8
    val badc = deflated.clone(); badc(cOff) = 5
    assert(ImageHash.decodeLuma(badc).isEmpty)
  }

  test("GIF/TIFF hashes are format-independent with BMP") {
    val g = ImageHash.decodeLuma(gif(16, 16,
      (x, y) => {
        val (r, gg, b) = pattern(x, y)
        (299 * r + 587 * gg + 114 * b) / 1000
      })).get
    val b = ImageHash.decodeLuma(bmp(16, 16, pattern, topDown = true)).get
    // the GIF carries the BMP's LUMA as gray — identical hash input
    assert(ImageHash.dHash(g) == ImageHash.dHash(b))
    assert(ImageHash.pHash(g) == ImageHash.pHash(b))
  }

  test("BMP decode: bottom-up and top-down agree, luma is Rec.601 floor") {
    val up = ImageHash.decodeLuma(bmp(5, 3, pattern, topDown = false)).get
    val down = ImageHash.decodeLuma(bmp(5, 3, pattern, topDown = true)).get
    assert(up.width == 5 && up.height == 3)
    assert(up.luma.toSeq == down.luma.toSeq)
    val (r, g, b) = pattern(2, 1)
    assert(up.luma(1 * 5 + 2) == (299 * r + 587 * g + 114 * b) / 1000)
  }

  test("BMP decode: stride padding respected (width not a multiple of 4)") {
    // w=5 → 15 raster bytes/row padded to 16; a decoder ignoring the pad
    // would shear every row after the first
    val px = ImageHash.decodeLuma(bmp(5, 4, pattern, topDown = true)).get
    (0 until 4).foreach { y =>
      val (r, g, b) = pattern(0, y)
      assert(px.luma(y * 5) == (299 * r + 587 * g + 114 * b) / 1000)
    }
  }

  test("PNG decode: filter-0 RGB matches BMP of the same pixels") {
    val fromPng = ImageHash.decodeLuma(pngRgb(16, 16, pattern)).get
    val fromBmp =
      ImageHash.decodeLuma(bmp(16, 16, pattern, topDown = true)).get
    assert(fromPng.luma.toSeq == fromBmp.luma.toSeq)
  }

  test("PNG decode: sub/up/average/Paeth filters reconstruct exactly") {
    // grayscale 3×4, one row per filter type 1..4; expected pixels chosen,
    // filtered by hand here, reconstructed by the decoder
    val want = Array(
      10, 20, 30,
      15, 25, 35,
      14, 27, 41,
      9, 33, 20)
    val raw = new java.io.ByteArrayOutputStream()
    // row 0: filter 1 (sub): raw = cur - left
    raw.write(1); raw.write(10); raw.write(20 - 10); raw.write(30 - 20)
    // row 1: filter 2 (up): raw = cur - up
    raw.write(2); raw.write(15 - 10); raw.write(25 - 20); raw.write(35 - 30)
    // row 2: filter 3 (average): raw = cur - (left + up) / 2
    raw.write(3)
    raw.write(14 - (0 + 15) / 2)
    raw.write((27 - (14 + 25) / 2) & 0xff)
    raw.write((41 - (27 + 35) / 2) & 0xff)
    // row 3: filter 4 (Paeth): predictor of (left, up, up-left)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    raw.write(4)
    raw.write((9 - paeth(0, 14, 0)) & 0xff)
    raw.write((33 - paeth(9, 27, 14)) & 0xff)
    raw.write((20 - paeth(33, 41, 27)) & 0xff)
    val px = ImageHash.decodeLuma(pngRaw(3, 4, 0, raw.toByteArray)).get
    assert(px.luma.toSeq == want.toSeq)
  }

  test("PNG decode: palette and RGBA color types") {
    // palette: 2×1, indices 0/1 → entries (255,0,0) and (0,255,0)
    val pal = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0)
    val praw = Array[Byte](0, 0, 1)
    val p = ImageHash.decodeLuma(pngRaw(2, 1, 3, praw, pal)).get
    assert(p.luma.toSeq == Seq(299 * 255 / 1000, 587 * 255 / 1000))
    // RGBA: alpha ignored
    val araw = Array[Byte](0, 100, 150.toByte, 200.toByte, 7)
    val a = ImageHash.decodeLuma(pngRaw(1, 1, 6, araw)).get
    assert(a.luma.toSeq == Seq((299 * 100 + 587 * 150 + 114 * 200) / 1000))
  }

  test("decode rejects garbage, truncation, and unsupported variants") {
    assert(ImageHash.decodeLuma(null).isEmpty)
    assert(ImageHash.decodeLuma(Array[Byte](1, 2, 3)).isEmpty)
    val good = bmp(5, 3, pattern, topDown = true)
    assert(ImageHash.decodeLuma(good.take(40)).isEmpty)
    // PNG with 16-bit depth rejected (depth byte lives at IHDR+8)
    val png = pngRgb(4, 4, pattern)
    val deep = png.clone(); deep(8 + 8 + 8) = 16
    assert(ImageHash.decodeLuma(deep).isEmpty)
  }

  // ---- hash semantics ----------------------------------------------

  private def px16(f: (Int, Int) => Int): ImageHash.Pixels =
    ImageHash.Pixels(16, 16,
      Array.tabulate(256)(i => f(i % 16, i / 16) & 0xff))

  test("hashes are format-independent: PNG and BMP of same pixels agree") {
    val a = ImageHash.decodeLuma(pngRgb(16, 16, pattern)).get
    val b = ImageHash.decodeLuma(bmp(16, 16, pattern, topDown = false)).get
    assert(ImageHash.dHash(a) == ImageHash.dHash(b))
    assert(ImageHash.aHash(a) == ImageHash.aHash(b))
    assert(ImageHash.pHash(a) == ImageHash.pHash(b))
  }

  test("dHash is invariant to a global brightness shift") {
    val base = px16((x, y) => (x * 13 + y * 29) % 200)
    val brighter = px16((x, y) => (x * 13 + y * 29) % 200 + 55)
    assert(ImageHash.dHash(base) == ImageHash.dHash(brighter))
    assert(ImageHash.dHash(base).isDefined)
  }

  test("dHash survives a 2x downscale (the perceptual property)") {
    val hi = ImageHash.Pixels(32, 32,
      Array.tabulate(32 * 32)(i => ((i % 32) / 2 * 13 + (i / 32) / 2 * 29) % 200))
    val lo = px16((x, y) => (x * 13 + y * 29) % 200)
    // hi is lo pixel-doubled; area averaging lands on identical grids
    assert(ImageHash.dHash(hi) == ImageHash.dHash(lo))
  }

  test("hashes reject images smaller than the grid") {
    val tiny = ImageHash.Pixels(4, 4, Array.fill(16)(7))
    assert(ImageHash.dHash(tiny).isEmpty)
    assert(ImageHash.aHash(tiny).isEmpty)
    assert(ImageHash.pHash(tiny).isEmpty)
  }

  test("one-pixel perturbation: dHash within Hamming 1, distinct far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = px16((x, y) => ((x * 7 + y * 11) * 31) % 256)
    val tweak = px16((x, y) =>
      if (x == 0 && y == 0) (((x * 7 + y * 11) * 31) % 256 + 8) % 256
      else ((x * 7 + y * 11) * 31) % 256)
    val other = px16((x, y) => ((x * 5 + y * 3) * 97 + 13) % 256)
    assert(ham(ImageHash.dHash(base).get, ImageHash.dHash(tweak).get) <= 1)
    assert(ham(ImageHash.dHash(base).get, ImageHash.dHash(other).get) > 6)
  }

  // ---- DataFrame operators -----------------------------------------

  test("imageHashes: mixed formats, undecodable rows carry NULL hashes") {
    import spark.implicits._
    val rows = Seq(
      (1L, pngRgb(16, 16, pattern)),
      (2L, bmp(16, 16, pattern, topDown = false)),
      (3L, Array[Byte](9, 9, 9)),
      (4L, null.asInstanceOf[Array[Byte]]))
    val got = ImageHash.imageHashes(spark, rows.toDF("media_id", "payload"))
      .orderBy("media_id").collect()
    assert(got(0).getString(1) == "png" && got(1).getString(1) == "bmp")
    assert(got(0).getLong(2) == got(1).getLong(2)) // same dhash
    assert(got(2).isNullAt(2) && got(3).isNullAt(2))
  }

  test("imageDupClusters: a perturbation chain collapses to one component") {
    import spark.implicits._
    def img(seed: Int, perturbAt: Int): Array[Byte] =
      bmp(16, 16, (x, y) => {
        val base = ((x * 7 + y * 11) * seed) % 256
        val v = if (perturbAt >= 0 && x == perturbAt && y == 0)
          (base + 8) % 256 else base
        (v, v, v)
      }, topDown = true)
    val rows = Seq(
      (10L, img(31, -1)), (11L, img(31, 0)), (12L, img(31, 1)), // chain
      (20L, img(97, -1)), (21L, img(97, 0)),                    // pair
      (30L, img(151, -1)))                                      // singleton
    val got = ImageHash.imageDupClusters(
        spark, rows.toDF("media_id", "payload"), maxHamming = 6, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L)) // 30 pairs with nothing -> absent
  }

  test("incrementalImageDedup: corpus wins, then batch peers, else admit") {
    import spark.implicits._
    def img(seed: Int, perturb: Boolean): Array[Byte] =
      bmp(16, 16, (x, y) => {
        val base = ((x * 7 + y * 11) * seed) % 256
        val v = if (perturb && x == 0 && y == 0) (base + 8) % 256 else base
        (v, v, v)
      }, topDown = true)
    val corpus = Seq((10L, img(31, perturb = false)),
      (20L, img(97, perturb = false))).toDF("media_id", "payload")
    val batch = Seq(
      (101L, img(31, perturb = true)), // near-dup of corpus 10
      (103L, img(151, perturb = false)), // stranger -> admits
      (105L, img(151, perturb = true)), // near-dup of batch peer 103
      (107L, Array[Byte](1, 2, 3))) // undecodable -> admits
      .toDF("media_id", "payload")
    val idx = graft.ext.ImageHash.imageBucketIndex(spark, corpus)
    val got = graft.ext.ImageHash
      .incrementalImageDedup(spark, batch, idx)
      .select("media_id", "rep_id", "is_dup")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (101L, 10L, true), (103L, 103L, false),
      (105L, 103L, true), (107L, 107L, false)))
  }

  test("incremental screen derives its banding from the index; mismatches fail loudly") {
    import spark.implicits._
    def img(seed: Int, perturb: Boolean): Array[Byte] =
      bmp(16, 16, (x, y) => {
        val base = ((x * 7 + y * 11) * seed) % 256
        val v = if (perturb && x == 0 && y == 0) (base + 8) % 256 else base
        (v, v, v)
      }, topDown = true)
    val corpus = Seq((10L, img(31, perturb = false))).toDF("media_id", "payload")
    val batch = Seq((101L, img(31, perturb = true))).toDF("media_id", "payload")
    // index at a NON-default layout (8 bands); a bare screen (bands = 0)
    // must derive 8 from the index and still surface the near-dup —
    // before advice r16 it silently banded at 4, joined nothing, and
    // ADMITTED the duplicate
    val idx8 = graft.ext.ImageHash.imageBucketIndex(spark, corpus,
      maxHamming = 3, bands = 8)
    val got = graft.ext.ImageHash.incrementalImageDedup(spark, batch, idx8)
      .select("media_id", "rep_id", "is_dup")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((101L, 10L, true)))
    // an explicit band count contradicting the index fails loudly...
    intercept[IllegalArgumentException](
      graft.ext.ImageHash.incrementalImageDedup(spark, batch, idx8,
        maxHamming = 3, bands = 4))
    // ...and so does a threshold beyond the index banding's recall bound
    intercept[IllegalArgumentException](
      graft.ext.ImageHash.incrementalImageDedup(spark, batch, idx8,
        maxHamming = 8))
  }

  test("imageNearDupPairs: planted twin surfaces, strangers do not") {
    import spark.implicits._
    def img(seed: Int, perturb: Boolean): Array[Byte] =
      bmp(16, 16, (x, y) => {
        val v =
          if (perturb && x == 0 && y == 0)
            (((x * 7 + y * 11) * seed) % 256 + 8) % 256
          else ((x * 7 + y * 11) * seed) % 256
        (v, v, v)
      }, topDown = true)
    val rows = Seq(
      (10L, img(31, perturb = false)),
      (11L, img(31, perturb = true)), // twin of 10
      (20L, img(97, perturb = false)),
      (30L, img(151, perturb = false)))
    val pairs = ImageHash.imageNearDupPairs(
        spark, rows.toDF("media_id", "payload"), maxHamming = 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L)))
    // plan shape: candidate generation must be a band-bucket join, never
    // a cartesian/all-pairs stage
    val plan = ImageHash.imageNearDupPairs(
        spark, rows.toDF("media_id", "payload"), maxHamming = 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
