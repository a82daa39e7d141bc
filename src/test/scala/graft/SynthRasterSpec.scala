package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.SynthRasterFunctions._

/** Bit-equivalence of the native media-synthesis raster expression
  * (optimization r20) against the legacy interpreted Column form it
  * replaced — the md5 generative pixel/sample models of the image,
  * video, and audio gates. A drift here would silently change every
  * media gate's payload bytes; the oracle replays the model, so the
  * gates would fail loudly — this spec localizes the fault.
  */
class SynthRasterSpec extends SparkSpec {
  import spark.implicits._

  private def ids = Seq(0L, 1L, 2L, 5L, 7L, 10L, 11L, 123456L).toDF("doc_id")

  /** The legacy image/video raster: per pixel, first md5 byte of
    * "<prefix><p>", +delta at perturbIdx (mod 256), 3 BGR hex pairs.
    */
  private def legacyGray3(
      prefix: Column, perturbIdx: Column, perturbDelta: Column): Column =
    array_join(
      transform(sequence(lit(0), lit(255)), p =>
        repeat(lpad(hex(pmod(
          conv(substring(md5(concat(prefix, p.cast("string"))), 1, 2),
            16, 10).cast("int") +
            when(p === perturbIdx, perturbDelta).otherwise(lit(0)),
          lit(256))), 2, "0"), 3)),
      "")

  /** The legacy audio byte: byte (t mod 16) of md5("<prefix><t div 16>"). */
  private def legacyByte(prefix: Column, t: Column): Column =
    conv(md5(concat(prefix,
        call_function("div", t.cast("long"), lit(16L)).cast("string")))
      .substr((t % 16) * 2 + 1, lit(2)), 16, 10).cast("long")

  private def legacyWav8(
      prefix: Column, perturbIdx: Column, perturbDelta: Column): Column =
    array_join(
      transform(sequence(lit(0), lit(511)), t =>
        lpad(hex(pmod(legacyByte(prefix, t) +
          when(t === perturbIdx, perturbDelta).otherwise(lit(0)),
          lit(256))), 2, "0")),
      "")

  private def legacyWav16(
      prefix: Column, perturbIdx: Column, perturbDelta: Column): Column =
    array_join(
      transform(sequence(lit(0), lit(511)), t => {
        val s = pmod(legacyByte(prefix, t) +
          when(t === perturbIdx, perturbDelta).otherwise(lit(0)),
          lit(256)) - 128
        concat(lit("00"), lpad(hex(pmod(s + 256, lit(256))), 2, "0"))
      }),
      "")

  private def assertAllEqual(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.where(col("legacy") =!= col("native"))
    assert(bad.isEmpty, s"native raster diverges from legacy form: " +
      bad.collect().take(2).mkString(" | "))
  }

  test("gray3 (image/video) raster matches the legacy transform form") {
    val prefix = concat(col("doc_id").cast("string"), lit("_"))
    assertAllEqual(ids.select(
      legacyGray3(prefix, lit(-1), lit(0)).as("legacy"),
      bmp_raster_hex(prefix, lit(-1), lit(0)).as("native")))
    // video-style prefix with a sample index baked in
    val vPrefix = concat(col("doc_id").cast("string"), lit("_2_"))
    assertAllEqual(ids.select(
      legacyGray3(vPrefix, lit(-1), lit(0)).as("legacy"),
      bmp_raster_hex(vPrefix, lit(-1), lit(0)).as("native")))
  }

  test("gray3 twin perturbation (+8 at pixel 0 / pixel 1) matches") {
    val prefix = concat(col("doc_id").cast("string"), lit("_"))
    val idx = when(pmod(col("doc_id"), lit(10)) === 1, lit(0))
      .when(pmod(col("doc_id"), lit(10)) === 2, lit(1))
      .otherwise(lit(-1))
    assertAllEqual(ids.select(
      legacyGray3(prefix, idx, lit(8)).as("legacy"),
      bmp_raster_hex(prefix, idx, lit(8)).as("native")))
  }

  test("wav8/wav16 rasters (16 digest bytes per md5) match, with twin +1") {
    val prefix = concat(col("doc_id").cast("string"), lit("_"))
    val idx = when(pmod(col("doc_id"), lit(10)) === 1, lit(0)).otherwise(lit(-1))
    assertAllEqual(ids.select(
      legacyWav8(prefix, idx, lit(1)).as("legacy"),
      wav8_raster_hex(prefix, idx, lit(1)).as("native")))
    assertAllEqual(ids.select(
      legacyWav16(prefix, idx, lit(1)).as("legacy"),
      wav16_raster_hex(prefix, idx, lit(1)).as("native")))
  }

  test("perturbation wraps mod 256 (byte 255 + 8 rolls over)") {
    // scan doc ids until some pixel-0 byte is >= 248, then pin wrap
    val rows = (0L until 64L).toDF("doc_id")
      .select(col("doc_id"),
        conv(substring(md5(concat(col("doc_id").cast("string"), lit("_0"))),
          1, 2), 16, 10).cast("int").as("b0"))
      .where(col("b0") >= 248).limit(1).collect()
    assert(rows.nonEmpty, "no high byte found in probe range")
    val id = rows.head.getLong(0)
    val prefix = concat(lit(id.toString), lit("_"))
    val df = Seq(Tuple1(id)).toDF("doc_id").select(
      legacyGray3(prefix, lit(0), lit(8)).as("legacy"),
      bmp_raster_hex(prefix, lit(0), lit(8)).as("native"))
    assertAllEqual(df)
  }

  test("null prefix yields null") {
    val df = Seq(Tuple1(Option.empty[String])).toDF("p")
      .select(bmp_raster_hex(col("p"), lit(-1), lit(0)).as("native"))
    assert(df.head().isNullAt(0))
  }
}
