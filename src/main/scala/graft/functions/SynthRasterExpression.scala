package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native synthesis of the media gates' generative pixel/sample rasters
  * (optimization r20). The image/video/audio queries synthesize their
  * binary payloads from an md5-byte generative model:
  *
  *   byte(i) = digest(prefix || (i div bytesPerHash))[i mod bytesPerHash]
  *
  * optionally perturbed at ONE sample index (the planted-twin device),
  * then rendered as a hex raster. The original Column form —
  * `transform(sequence(0, n-1), p => repeat(lpad(hex(conv(substring(
  * md5(concat(...)), 1, 2), 16, 10)), 2, '0'), 3))` — is a higher-order
  * lambda, which Catalyst evaluates INTERPRETED per element (no
  * whole-stage codegen inside `transform`): ~8 expression-tree nodes per
  * pixel × 768 pixels per video × every row. Measured on q_video_scenecut
  * at sf0.1, synthesis alone was 4.7 s of the 6.6 s wall (decode+hash:
  * 0.65 s). This expression computes the identical raster in one
  * codegen'd call per row with a tight digest loop (guide §4: eliminate
  * non-codegen expressions in the hot path).
  *
  * Bit-equivalence contract (spec-pinned in SynthRasterSpec):
  *  - Spark `md5(s)` = MD5 of the UTF-8 bytes; `conv(substring(md5, 1+2k,
  *    2), 16, 10)` = digest byte k — here `digest[i % bytesPerHash]`.
  *  - `lpad(hex(b), 2, '0')` = "%02X" (uppercase) for b in 0..255.
  *  - perturbation: byte' = (byte + delta) mod 256 at i == perturbIdx
  *    (floorMod — the Column form used pmod).
  *
  * Formats:
  *  - GRAY3 (image/video BMP raster): 3 identical BGR hex pairs per pixel;
  *  - PCM8  (8-bit WAV): one hex pair, byte' as unsigned;
  *  - PCM16 (16-bit WAV LE): "00" then hex pair of (byte' + 128) mod 256 —
  *    the two's-complement high byte of the signed sample (byte' − 128)·256.
  */
object SynthRasterImpl {

  val FmtGray3 = 0
  val FmtPcm8 = 1
  val FmtPcm16 = 2

  private val Hex = "0123456789ABCDEF".toCharArray

  private val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def rasterHex(
      prefix: UTF8String, perturbIdx: Int, perturbDelta: Int,
      n: Int, bytesPerHash: Int, fmt: Int): UTF8String = {
    val pre = prefix.getBytes
    val md = mdLocal.get()
    val charsPer = fmt match {
      case FmtGray3 => 6
      case FmtPcm8 => 2
      case _ => 4
    }
    val out = new Array[Byte](n * charsPer)
    var i = 0
    var digest: Array[Byte] = null
    while (i < n) {
      val slot = i % bytesPerHash
      if (slot == 0 || digest == null) {
        md.reset()
        md.update(pre)
        md.update(String.valueOf(i / bytesPerHash)
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        digest = md.digest()
      }
      var b = digest(slot) & 0xff
      if (i == perturbIdx) b = java.lang.Math.floorMod(b + perturbDelta, 256)
      val o = i * charsPer
      fmt match {
        case FmtGray3 =>
          val h = Hex(b >> 4).toByte; val l = Hex(b & 0xf).toByte
          out(o) = h; out(o + 1) = l
          out(o + 2) = h; out(o + 3) = l
          out(o + 4) = h; out(o + 5) = l
        case FmtPcm8 =>
          out(o) = Hex(b >> 4).toByte; out(o + 1) = Hex(b & 0xf).toByte
        case _ =>
          val v = (b + 128) & 0xff
          out(o) = '0'; out(o + 1) = '0'
          out(o + 2) = Hex(v >> 4).toByte; out(o + 3) = Hex(v & 0xf).toByte
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** `synth_raster_hex(prefix, perturbIdx, perturbDelta)`: the n-sample
  * md5-model hex raster (see [[SynthRasterImpl]]). perturbIdx = −1 means
  * no perturbation. NULL prefix/idx/delta → NULL.
  */
case class SynthRasterHex(
    first: Expression, second: Expression, third: Expression,
    n: Int, bytesPerHash: Int, fmt: Int) extends TernaryExpression {
  require(n >= 1 && n <= 65536, s"n must be in [1, 65536], got $n")
  require(bytesPerHash >= 1 && bytesPerHash <= 16,
    s"bytesPerHash must be in [1, 16], got $bytesPerHash")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "synth_raster_hex"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (_: StringType, IntegerType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, int, int), got $other")
    }

  override def nullSafeEval(prefix: Any, idx: Any, delta: Any): Any =
    SynthRasterImpl.rasterHex(prefix.asInstanceOf[UTF8String],
      idx.asInstanceOf[Int], delta.asInstanceOf[Int], n, bytesPerHash, fmt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, i, d) =>
      s"${ev.value} = graft.functions.SynthRasterImpl.rasterHex(" +
        s"$p, $i, $d, $n, $bytesPerHash, $fmt);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : Expression = copy(first = newFirst, second = newSecond, third = newThird)
}

object SynthRasterFunctions {

  /** Image/video 16×16 gray BMP raster hex: 256 pixels, GRAY3. */
  def bmp_raster_hex(prefix: Column, perturbIdx: Column, perturbDelta: Column): Column =
    Bridge.column(SynthRasterHex(Bridge.expression(prefix),
      Bridge.expression(perturbIdx), Bridge.expression(perturbDelta),
      n = 256, bytesPerHash = 1, fmt = SynthRasterImpl.FmtGray3))

  /** 8-bit 512-sample WAV raster hex (16 digest bytes per md5). */
  def wav8_raster_hex(prefix: Column, perturbIdx: Column, perturbDelta: Column): Column =
    Bridge.column(SynthRasterHex(Bridge.expression(prefix),
      Bridge.expression(perturbIdx), Bridge.expression(perturbDelta),
      n = 512, bytesPerHash = 16, fmt = SynthRasterImpl.FmtPcm8))

  /** 16-bit 512-sample WAV raster hex (16 digest bytes per md5). */
  def wav16_raster_hex(prefix: Column, perturbIdx: Column, perturbDelta: Column): Column =
    Bridge.column(SynthRasterHex(Bridge.expression(prefix),
      Bridge.expression(perturbIdx), Bridge.expression(perturbDelta),
      n = 512, bytesPerHash = 16, fmt = SynthRasterImpl.FmtPcm16))
}
