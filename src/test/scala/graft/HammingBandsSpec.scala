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

  test("bandsFromIndex reads the stamped layout without evaluating the index") {
    import org.apache.spark.sql.types.Metadata
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow")).toDF("doc_id", "text")
    // non-default layout: 8 bands over the 60-bit simhash
    val idx = graft.ext.Dedup.simhashBandIndex(docs, "doc_id", "text",
      maxHamming = 3, bands = 8)
    // poison the lineage: ANY evaluation of the index throws. The
    // metadata path must resolve the layout from the schema alone —
    // this is the r17 fix (the max-scan probe re-executed the full
    // fingerprint lineage once per admission batch).
    val poisoned = idx.where(raise_error(lit("index lineage evaluated")).isNull)
    assert(HammingBands.bandsFromIndex(poisoned, 3, 0, 60) == 8)
    // the mismatch/recall requires still fire on the metadata path
    intercept[IllegalArgumentException](
      HammingBands.bandsFromIndex(poisoned, 3, 4, 60))
    intercept[IllegalArgumentException](
      HammingBands.bandsFromIndex(poisoned, 8, 0, 60))
    // stripping the stamp forces the legacy max-scan, which evaluates
    // the lineage — proving the metadata path above really skipped it
    val stripped = poisoned.select(col("media_id"), col("sim"),
      col("bucket").as("bucket", Metadata.empty))
    intercept[Exception](HammingBands.bandsFromIndex(stripped, 3, 0, 60))
    // and on a clean lineage the legacy scan still recovers the layout
    val legacy = idx.select(col("media_id"), col("sim"),
      col("bucket").as("bucket", Metadata.empty))
    assert(HammingBands.bandsFromIndex(legacy, 3, 0, 60) == 8)
    // an EMPTY stamped index keeps the build layout (the scan path
    // could only fall back to resolveBands)
    val emptyIdx = graft.ext.Dedup.simhashBandIndex(
      docs.where(col("doc_id") < 0), "doc_id", "text",
      maxHamming = 3, bands = 8)
    assert(HammingBands.bandsFromIndex(emptyIdx, 3, 0, 60) == 8)
  }

  test("the layout stamp survives a parquet round-trip") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val idx = graft.ext.Dedup.simhashBandIndex(docs, "doc_id", "text",
      maxHamming = 3, bands = 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bandmeta_").toString
    idx.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // poison the read to prove the round-tripped stamp is used, not a scan
    val poisoned = back.where(raise_error(lit("parquet index scanned")).isNull)
    assert(HammingBands.bandsFromIndex(poisoned, 3, 0, 60) == 8)
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
