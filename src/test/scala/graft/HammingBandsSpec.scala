package graft

import org.apache.spark.sql.functions._
import graft.ext.HammingBands

class HammingBandsSpec extends SparkSpec {
  import spark.implicits._

  test("widths distribute uneven bit counts floor/ceil") {
    assert(HammingBands.widths(64, 4) == Seq(16, 16, 16, 16))
    assert(HammingBands.widths(56, 4) == Seq(14, 14, 14, 14))
    assert(HammingBands.widths(56, 6) == Seq(10, 10, 9, 9, 9, 9))
    assert(HammingBands.widths(64, 7) == Seq(10, 9, 9, 9, 9, 9, 9))
    assert(HammingBands.widths(64, 7).sum == 64)
  }

  test("resolveBands: auto picks maxHamming + 1; explicit must guarantee recall") {
    assert(HammingBands.resolveBands(3, 0, 64) == 4)
    assert(HammingBands.resolveBands(6, 0, 64) == 7)
    assert(HammingBands.resolveBands(3, 8, 64) == 8) // over-banding allowed
    intercept[IllegalArgumentException](HammingBands.resolveBands(3, 3, 64))
    intercept[IllegalArgumentException](HammingBands.resolveBands(3, 65, 64))
    intercept[IllegalArgumentException](HammingBands.resolveBands(64, 0, 64))
  }

  test("band-bucket candidates achieve exact recall at Hamming <= bands - 1") {
    // deterministic pseudo-random 64-bit hashes plus planted near-pairs
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val base = (0L until 200L).map(i => (i, mix(i)))
    // plant twins at Hamming 1..3 of their predecessor
    val planted = base.map { case (i, h) =>
      if (i % 10 == 1) (i, base((i - 1).toInt)._2 ^ 1L)
      else if (i % 10 == 2) (i, base((i - 2).toInt)._2 ^ 0x8100000000L) // 2 bits
      else if (i % 10 == 3) (i, base((i - 3).toInt)._2 ^ 0x4000200000000001L) // 3
      else (i, h)
    }
    val df = planted.toDF("id", "h")
    val keys = HammingBands.bandKeys(col("h"), 64, 4)
    val bucketed = df.select(col("id"), col("h"),
      explode(array(keys: _*)).as("bucket"))
    val got = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("d"))
      .where(col("d") <= 3)
      .select("a.id", "b.id").distinct()
      .as[(Long, Long)].collect().toSet
    // brute-force truth
    val truth = (for {
      (i, hi) <- planted; (j, hj) <- planted
      if i < j && java.lang.Long.bitCount(hi ^ hj) <= 3
    } yield (i, j)).toSet
    assert(got == truth)
    assert(truth.size >= 60, s"expected the planted pairs, got ${truth.size}")
  }
}
