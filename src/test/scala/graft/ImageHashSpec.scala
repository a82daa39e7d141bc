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

  // ---- decode correctness ------------------------------------------

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
