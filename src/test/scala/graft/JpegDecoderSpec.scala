package graft

import graft.ext.{ImageHash, JpegDecoder}

/** Baseline JPEG decoder, validated against bitstreams the spec builds
  * itself: canonical Huffman tables, differential DC, AC coefficients,
  * 4:2:0 chroma skipping, and restart markers.
  */
class JpegDecoderSpec extends SparkSpec {

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** value → (code, length) for a canonical (BITS, HUFFVAL) table. */
  private def huffCodes(
      bits: Array[Int], vals: Seq[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    (1 to 16).foreach { l =>
      (0 until bits(l)).foreach { _ =>
        out += vals(k) -> ((code, l)); code += 1; k += 1
      }
      code <<= 1
    }
    out.result()
  }

  // DC table: categories 0..8 at length 4; AC table: EOB, (0,1), (0,3),
  // ZRL at lengths 1..4 — tiny but canonical, no all-ones codes
  private val DcBits = Array(0, 0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = 0 to 8
  private val AcBits = Array(0, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals = Seq(0x00, 0x01, 0x03, 0xF0)
  private val DcCodes = huffCodes(DcBits, DcVals)
  private val AcCodes = huffCodes(AcBits, AcVals)

  /** MSB-first entropy writer with 0xFF00 stuffing and 1-padding. */
  private class JBits(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(code: Int, len: Int): Unit = (len - 1 to 0 by -1).foreach { b =>
      acc = (acc << 1) | ((code >> b) & 1); n += 1
      if (n == 8) {
        out.write(acc); if (acc == 0xff) out.write(0x00)
        acc = 0; n = 0
      }
    }
    def flush(): Unit = if (n > 0) { put((1 << (8 - n)) - 1, 8 - n) }
  }

  private def category(v: Int): Int = {
    var c = 0; var m = math.abs(v)
    while (m > 0) { c += 1; m >>= 1 }
    c
  }

  private def putDc(bw: JBits, diff: Int): Unit = {
    val c = category(diff)
    val (code, len) = DcCodes(c)
    bw.put(code, len)
    if (c > 0) bw.put(if (diff > 0) diff else diff + (1 << c) - 1, c)
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int,
      payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write(len >> 8); out.write(len & 0xff); out.write(payload)
  }

  private def tables(out: java.io.ByteArrayOutputStream): Unit = {
    // DQT 0: DC slot quantizer 8, all AC slots 1 (written in zigzag)
    val nat = Array.fill(64)(1); nat(0) = 8
    seg(out, 0xdb, (Array(0x00) ++ (0 until 64).map(k => nat(ZigZag(k))))
      .map(_.toByte))
    seg(out, 0xc4, (Array(0x00) ++ DcBits.drop(1) ++ DcVals).map(_.toByte))
    seg(out, 0xc4, (Array(0x10) ++ AcBits.drop(1) ++ AcVals).map(_.toByte))
  }

  /** Grayscale baseline JPEG with per-8×8-block flat values and an
    * optional single AC coefficient in block (0,0).
    */
  private def grayJpeg(w: Int, h: Int, dcOf: (Int, Int) => Int,
      acZig1: Int = 0, restartEvery: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    tables(out)
    if (restartEvery > 0)
      seg(out, 0xdd, Array((restartEvery >> 8).toByte, restartEvery.toByte))
    seg(out, 0xc0, Array[Byte](8,
      (h >> 8).toByte, h.toByte, (w >> 8).toByte, w.toByte,
      1, 1, 0x11, 0))
    seg(out, 0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val bw = new JBits(out)
    var pred = 0
    var mcu = 0
    (0 until (h + 7) / 8).foreach { by =>
      (0 until (w + 7) / 8).foreach { bx =>
        if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + ((mcu / restartEvery - 1) % 8))
          pred = 0
        }
        // DC coefficient = 8·(v−128) quantized by 8 → v−128
        val dc = dcOf(bx, by) - 128
        putDc(bw, dc - pred); pred = dc
        if (acZig1 != 0 && bx == 0 && by == 0) {
          val c = category(acZig1)
          val (code, len) = AcCodes(c) // run 0, size c (c must be 1 or 3)
          bw.put(code, len)
          bw.put(if (acZig1 > 0) acZig1 else acZig1 + (1 << c) - 1, c)
        }
        val (eob, eobLen) = AcCodes(0x00)
        bw.put(eob, eobLen)
        mcu += 1
      }
    }
    bw.flush()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  test("grayscale DC-only blocks reconstruct their exact flat values") {
    val vals = Map((0, 0) -> 40, (1, 0) -> 90, (0, 1) -> 140, (1, 1) -> 200)
    val px = JpegDecoder.decodeLuma(grayJpeg(16, 16, (bx, by) => vals(bx, by)))
      .get
    assert(px.width == 16 && px.height == 16)
    (0 until 16).foreach { y =>
      (0 until 16).foreach { x =>
        assert(px.luma(y * 16 + x) == vals((x / 8, y / 8)),
          s"pixel ($x,$y)")
      }
    }
    // and through the shared dispatch + hashes
    val viaDispatch = ImageHash.decodeLuma(grayJpeg(16, 16,
      (bx, by) => vals(bx, by)))
    assert(viaDispatch.get.luma.toSeq == px.luma.toSeq)
    assert(ImageHash.dHash(px).isDefined)
  }

  test("one AC coefficient: matches an independent direct 2-D IDCT") {
    val px = JpegDecoder.decodeLuma(
      grayJpeg(8, 8, (_, _) => 128, acZig1 = 5)).get
    // reference: direct 2-D IDCT (different summation order — allow ±1)
    def c(k: Int) = if (k == 0) 1.0 / math.sqrt(2.0) else 1.0
    val want = Array.tabulate(64) { i =>
      val x = i % 8; val y = i / 8
      // F(0,0)=0 (v=128), F(u=1,v=0)=5 (zigzag index 1, dequant ×1)
      val s = 0.25 * c(1) * c(0) * 5.0 *
        math.cos((2 * x + 1) * math.Pi / 16.0)
      math.round(s + 128.0).toInt
    }
    val diffs = px.luma.zip(want).map { case (a, b) => math.abs(a - b) }
    assert(diffs.max <= 1, s"got ${px.luma.toSeq} want ${want.toSeq}")
    // the AC term actually did something
    assert(px.luma.distinct.length > 1)
  }

  test("restart markers: predictors reset, stream realigns") {
    val vals = Map((0, 0) -> 30, (1, 0) -> 80, (2, 0) -> 130, (3, 0) -> 210)
    val px = JpegDecoder.decodeLuma(
      grayJpeg(32, 8, (bx, _) => vals(bx, 0), restartEvery = 2)).get
    (0 until 32).foreach { x =>
      assert(px.luma(x) == vals((x / 8, 0)), s"col $x")
    }
  }

  test("4:2:0 YCbCr: chroma blocks are skipped but keep the stream aligned") {
    // 16×16, Y 2×2 sampling + Cb + Cr 1×1: one MCU of 4 Y blocks (flat
    // quadrants) then 2 chroma blocks (DC 0, EOB)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    tables(out)
    seg(out, 0xc0, Array[Byte](8, 0, 16, 0, 16, 3,
      1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0))
    seg(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val bw = new JBits(out)
    val q = Seq(40, 90, 140, 200) // y00, y10, y01, y11
    var pred = 0
    val (eob, eobLen) = AcCodes(0x00)
    q.foreach { v =>
      putDc(bw, (v - 128) - pred); pred = v - 128
      bw.put(eob, eobLen)
    }
    (0 until 2).foreach { _ => putDc(bw, 0); bw.put(eob, eobLen) }
    bw.flush()
    out.write(0xff); out.write(0xd9)
    val px = JpegDecoder.decodeLuma(out.toByteArray).get
    assert(px.width == 16 && px.height == 16)
    assert(px.luma(0) == 40 && px.luma(15) == 90)
    assert(px.luma(8 * 16) == 140 && px.luma(8 * 16 + 15) == 200)
  }

  test("progressive and malformed streams are rejected") {
    val good = grayJpeg(8, 8, (_, _) => 128)
    assert(JpegDecoder.decodeLuma(good).isDefined)
    // flip SOF0 to SOF2 (progressive)
    val prog = good.clone()
    val sofAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegDecoder.decodeLuma(prog).isEmpty)
    assert(JpegDecoder.decodeLuma(good.take(30)).isEmpty)
    assert(JpegDecoder.decodeLuma(Array[Byte](1, 2, 3, 4)).isEmpty)
  }
}
