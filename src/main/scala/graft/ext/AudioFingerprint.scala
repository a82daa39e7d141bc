package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual audio fingerprinting — the audio twin of [[ImageHash]]:
  * decode WAV PCM to samples (pure JVM), fingerprint frames of
  * spectral band energies, then near-dup by Hamming-banded pairing.
  *
  * The fingerprint follows Haitsma & Kalker, "A highly robust audio
  * fingerprint system" (ISMIR 2002): split the signal into frames,
  * compute per-frame band energies E(n, m), and emit one bit per
  * adjacent band pair from the sign of the time–frequency energy
  * derivative `E(n,m) − E(n,m+1) − (E(n−1,m) − E(n−1,m+1))`. Two
  * engineering deviations keep every step an EXACT integer (the
  * engine's oracle-determinism policy; same trick as [[ImageHash]]'s
  * fixed-point DCT):
  *
  *  - band energies come from a fixed-point DFT over 64-sample frames
  *    (bins k = 1..9, cos/sin quantized to `round(··100)` — the
  *    constant tables below), not a windowed FFT with Bark bands;
  *  - samples are reduced to 8-bit signed before the transform, which
  *    bounds every energy below 2⁴¹ — overflow-free in 64-bit.
  *
  * 8 frames × 9 bins → 7×8 = 56 fingerprint bits per clip (the first
  * `FrameSamples · Frames = 512` samples; shorter clips zero-pad). At
  * 100 TB the fingerprint is one 56-bit integer per asset — pairing is
  * the same banded O(n·bands) machinery as image/SimHash dedup, never
  * all-pairs.
  */
object AudioFingerprint {

  val FrameSamples = 64
  val Frames = 8
  val Bands = 9
  val CosScale = 100L

  /** round(cos(2π t / 64) · 100) / round(sin(2π t / 64) · 100) for
    * t = 0..63 — the only transcendentals, frozen as integers once so
    * the oracle replays them as literals.
    */
  val CosT: Array[Long] = Array.tabulate(FrameSamples) { t =>
    math.round(math.cos(2.0 * math.Pi * t / FrameSamples) * CosScale)
  }
  val SinT: Array[Long] = Array.tabulate(FrameSamples) { t =>
    math.round(math.sin(2.0 * math.Pi * t / FrameSamples) * CosScale)
  }

  /** Decode a canonical WAV (RIFF/WAVE, PCM format 1) to 8-bit signed
    * samples of channel 0, truncated/zero-padded to `maxSamples`.
    * Bit depths 8 (unsigned − 128), 16 (LE, arithmetic >> 8), 24 (LE,
    * top byte). Chunk walk tolerates JUNK/LIST chunks and odd-size
    * padding; anything malformed (no fmt before data, non-PCM,
    * unsupported depth, zero channels, truncated declared sizes)
    * returns None rather than garbage samples.
    */
  def decodePcm8(bytes: Array[Byte], maxSamples: Int): Option[Array[Int]] = {
    if (bytes == null || bytes.length < 44) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long =
      (u8(i).toLong) | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def tag(i: Int, t: String): Boolean =
      (0 until 4).forall(j => u8(i + j) == t.charAt(j).toInt)
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos = 12
    var channels = 0
    var bits = 0
    var haveFmt = false
    var out: Option[Array[Int]] = None
    while (pos + 8 <= bytes.length && out.isEmpty) {
      val size = u32(pos + 4)
      val body = pos + 8
      if (size < 0 || body + size > bytes.length) return None
      if (tag(pos, "fmt ")) {
        if (size < 16) return None
        if (u16(body) != 1) return None // PCM only
        channels = u16(body + 2)
        bits = u16(body + 14)
        if (channels < 1 || !Set(8, 16, 24).contains(bits)) return None
        haveFmt = true
      } else if (tag(pos, "data")) {
        if (!haveFmt) return None
        val stride = channels * (bits / 8)
        val n = (size / stride).toInt
        val s = new Array[Int](maxSamples)
        var i = 0
        while (i < n && i < maxSamples) {
          val off = body + i * stride
          s(i) = bits match {
            case 8 => u8(off) - 128
            case 16 => ((u8(off) | (u8(off + 1) << 8)).toShort.toInt) >> 8
            case 24 => bytes(off + 2).toInt // top byte, already signed
          }
          i += 1
        }
        out = Some(s)
      }
      pos = body + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    out
  }

  /** Frame × bin DFT energies: E(n, k) = re² + im² with the quantized
    * tables; |s| ≤ 128 bounds |re| ≤ 128·100·64 < 2²⁰, so E < 2⁴¹.
    */
  private[ext] def bandEnergies(s8: Array[Int]): Array[Array[Long]] = {
    val e = Array.ofDim[Long](Frames, Bands + 1)
    var n = 0
    while (n < Frames) {
      var k = 1
      while (k <= Bands) {
        var re = 0L
        var im = 0L
        var j = 0
        while (j < FrameSamples) {
          val idx = (j * k) % FrameSamples
          val s = s8(n * FrameSamples + j)
          re += s * CosT(idx)
          im += s * SinT(idx)
          j += 1
        }
        e(n)(k) = re * re + im * im
        k += 1
      }
      n += 1
    }
    e
  }

  /** The 56-bit fingerprint: bit (n−1)·8 + (k−1) for frame n = 1..7,
    * band k = 1..8 is the sign of the H&K time–frequency derivative.
    */
  def fingerprint(s8: Array[Int]): Long = {
    require(s8.length >= FrameSamples * Frames,
      s"need ${FrameSamples * Frames} samples, got ${s8.length}")
    val e = bandEnergies(s8)
    var fp = 0L
    var n = 1
    while (n < Frames) {
      var k = 1
      while (k < Bands) {
        val d = (e(n)(k) - e(n)(k + 1)) - (e(n - 1)(k) - e(n - 1)(k + 1))
        if (d > 0) fp |= 1L << ((n - 1) * 8 + (k - 1))
        k += 1
      }
      n += 1
    }
    fp
  }

  case class AudioIn(media_id: Long, payload: Array[Byte])
  case class AudioFpRow(media_id: Long, fmt: String, fp: Option[Long])

  /** Fingerprint a frame of (media_id LONG, payload BINARY) rows: one
    * partition-local map (decode + integer DFT per row, no shuffle);
    * undecodable payloads carry a NULL fingerprint.
    */
  def audioFingerprints(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload").cast("binary"))
      .as[AudioIn]
      .mapPartitions(_.map { m =>
        val fmt = Multimodal.decodeHeader(
          if (m.payload == null) Array.emptyByteArray else m.payload).format
        AudioFpRow(m.media_id, fmt,
          decodePcm8(m.payload, FrameSamples * Frames).map(fingerprint))
      })
      .toDF()
  }

  /** Audio near-duplicate pairs by fingerprint Hamming distance — the
    * [[ImageHash.imageNearDupPairs]] recipe on the 56-bit audio
    * fingerprint: disjoint bands guarantee recall for Hamming ≤
    * bands − 1 (pigeonhole), candidates come from a band-bucket join,
    * and every candidate is verified with the exact bit_count(xor)
    * distance.
    *
    * Banding defaults to the scale-optimal count for the verify
    * threshold — `maxHamming + 1` bands, the widest that still
    * guarantee recall ([[HammingBands]]): maxHamming = 3 → 4 × 14-bit
    * bands (16 384 bucket values each), which keeps the candidate join
    * near-linear ~64× longer than the saturating 7 × 8-bit config (256
    * values/band) that a narrow banding would pick. Raise `maxHamming`
    * for looser matching — the band width (and the saturation point)
    * adapts automatically; pass `bands` explicitly only to OVER-band
    * for recall beyond the verify threshold.
    */
  def audioNearDupPairs(
      spark: SparkSession, df: DataFrame, maxHamming: Int = 3,
      bands: Int = 0): DataFrame = {
    val fpBits = (Frames - 1) * (Bands - 1) // 56
    val nBands = HammingBands.resolveBands(maxHamming, bands, fpBits)
    // Pinned: the signature table feeds BOTH sides of the band
    // self-join (the multi-consumer rule; decode is the costly stage).
    val sigs = audioFingerprints(spark, df)
      .where(col("fp").isNotNull)
      .select(col("media_id"), col("fp"))
      .localCheckpoint(true)
    val bandKeys = HammingBands.bandKeys(col("fp"), fpBits, nBands)
    val bucketed = sigs.select(col("media_id"), col("fp"),
      explode(array(bandKeys: _*)).as("bucket"))
    val a = bucketed.select(col("media_id").as("id1"),
      col("fp").as("h1"), col("bucket"))
    val b = bucketed.select(col("media_id").as("id2"),
      col("fp").as("h2"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming").distinct()
  }

  /** Persisted bucket index of an ACCEPTED audio corpus — the
    * [[ImageHash.imageBucketIndex]] role for the 56-bit fingerprint:
    * `(bucket, media_id, fp)` rows, one per band per decodable clip,
    * written once per accepted corpus and re-read by every crawl cycle
    * (Hamming dedup verifies candidates exactly, so the index carries
    * every member's fingerprint, not just a representative).
    */
  def audioBucketIndex(
      spark: SparkSession, df: DataFrame, maxHamming: Int = 3,
      bands: Int = 0): DataFrame = {
    val fpBits = (Frames - 1) * (Bands - 1)
    val nBands = HammingBands.resolveBands(maxHamming, bands, fpBits)
    audioFingerprints(spark, df)
      .where(col("fp").isNotNull)
      .select(col("media_id"), col("fp"),
        explode(array(HammingBands.bandKeys(col("fp"), fpBits, nBands): _*))
          .as("bucket"))
      // stamped AFTER the explode: the analyzer's generator extraction
      // drops alias metadata on a generator expression itself
      .select(HammingBands.withLayoutMeta(col("bucket"), nBands),
        col("media_id"), col("fp"))
  }

  /** Incremental near-dup ADMISSION for audio — the
    * [[ImageHash.incrementalImageDedup]] recurring-crawl contract on the
    * 56-bit fingerprint: screen each new clip against the accepted
    * corpus' bucket index (the corpus is never re-decoded), then against
    * its own batch peers. One row per batch clip with `rep_id` /
    * `is_dup` — the smallest corpus id within `maxHamming` (corpus is
    * authoritative), else the smallest batch id within `maxHamming`
    * (self included, Hamming 0), else the clip itself. Undecodable
    * payloads carry no fingerprint, hence no buckets, and pass through
    * admitted. The banding is DERIVED from the index (advice r16): an
    * explicit `bands` that contradicts the index fails loudly, and the
    * recall guarantee spans the two sides jointly by construction.
    */
  def incrementalAudioDedup(
      spark: SparkSession, batch: DataFrame, bucketIndex: DataFrame,
      maxHamming: Int = 3, bands: Int = 0): DataFrame = {
    // Pinned: the batch signature table feeds the corpus join, the peer
    // self-join, AND the output spine (decode is the costly stage).
    val sigs = audioFingerprints(spark, batch)
      .select(col("media_id"), col("fp"))
      .localCheckpoint(true)
    HammingBands.incrementalScreen(sigs, bucketIndex, "fp",
      (Frames - 1) * (Bands - 1), maxHamming, bands)
  }
}
