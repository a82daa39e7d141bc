package graft

import org.apache.spark.sql.functions._

import graft.ext.AudioFingerprint
import graft.ext.AudioFingerprint.{decodePcm8, fingerprint, FrameSamples, Frames}

/** WAV PCM decode + Haitsma–Kalker fingerprint + banded near-dup
  * pairing invariants. All WAV bitstreams are hand-built here.
  */
class AudioFingerprintSpec extends SparkSpec {

  private val N = FrameSamples * Frames // 512

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Canonical WAV from 8-bit signed samples at the given depth and
    * channel count (channel 0 carries the samples, others carry junk).
    */
  private def wav(s8: Seq[Int], bits: Int, channels: Int = 1,
      junkChunk: Boolean = false): Array[Byte] = {
    val stride = bits / 8
    val data = s8.flatMap { s =>
      val one = bits match {
        case 8 => Array((s + 128).toByte)
        case 16 => le16((s * 256) & 0xffff)
        case 24 => Array(0.toByte, 0.toByte, s.toByte)
      }
      one.toSeq ++ Seq.fill((channels - 1) * stride)(0x55.toByte)
    }.toArray
    val junk = if (junkChunk)
      "JUNK".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // padded to even
    else Array.emptyByteArray
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(8000) ++ le32(8000 * channels * stride) ++
      le16(channels * stride) ++ le16(bits)
    val dataCh = "data".getBytes ++ le32(data.length) ++ data
    val body = junk ++ fmt ++ dataCh
    "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
  }

  private def noise(seed: Int): Array[Int] = {
    // java.util.Random's LCG is specified — stable across JVMs. Any
    // affine-in-seed formula would make clips differ by a near-constant
    // offset, which the k >= 1 DFT bins cannot distinguish.
    val r = new java.util.Random(seed)
    Array.fill(N)(r.nextInt(256) - 128)
  }

  test("decodePcm8 recovers samples at 8/16/24-bit and pads short clips") {
    val s = noise(1)
    for (bits <- Seq(8, 16, 24)) {
      val d = decodePcm8(wav(s.toSeq, bits), N)
      assert(d.isDefined && d.get.toSeq == s.toSeq, s"bits=$bits")
    }
    val short = decodePcm8(wav(s.take(100).toSeq, 16), N).get
    assert(short.take(100).toSeq == s.take(100).toSeq)
    assert(short.drop(100).forall(_ == 0))
  }

  test("decodePcm8 takes channel 0 of stereo and skips JUNK chunks") {
    val s = noise(2)
    val st = decodePcm8(wav(s.toSeq, 16, channels = 2), N)
    assert(st.isDefined && st.get.toSeq == s.toSeq)
    val jk = decodePcm8(wav(s.toSeq, 8, junkChunk = true), N)
    assert(jk.isDefined && jk.get.toSeq == s.toSeq)
  }

  test("decodePcm8 rejects malformed payloads") {
    val s = noise(3)
    val good = wav(s.toSeq, 16)
    assert(decodePcm8(null, N).isEmpty)
    assert(decodePcm8(Array[Byte](1, 2, 3), N).isEmpty)
    // data before fmt
    val riff = good.slice(0, 12)
    val fmtAndData = good.drop(12)
    val fmtLen = 8 + 16
    val reordered = riff ++ fmtAndData.drop(fmtLen) ++ fmtAndData.take(fmtLen)
    assert(decodePcm8(reordered, N).isEmpty)
    // non-PCM format tag
    val nonPcm = good.clone(); nonPcm(20) = 3
    assert(decodePcm8(nonPcm, N).isEmpty)
    // truncated declared chunk size
    assert(decodePcm8(good.dropRight(10), N).isEmpty)
    // not a WAV at all
    val notWav = good.clone(); notWav(8) = 'A'.toByte
    assert(decodePcm8(notWav, N).isEmpty)
  }

  test("fingerprint is depth-invariant: 8/16/24-bit encodings agree") {
    val s = noise(4)
    val fps = Seq(8, 16, 24).map(b => fingerprint(decodePcm8(wav(s.toSeq, b), N).get))
    assert(fps.distinct.size == 1)
  }

  test("stationary signal fingerprints to zero; noise does not") {
    // identical frames => every H&K time-derivative is 0 => no bit set
    val frame = Array.tabulate(FrameSamples)(j => ((j * 37) % 200) - 100)
    val stationary = Array.tabulate(N)(t => frame(t % FrameSamples))
    assert(fingerprint(stationary) == 0L)
    assert(fingerprint(noise(5)) != 0L)
  }

  test("one-byte perturbation stays within Hamming 2; unrelated noise far") {
    val s = noise(6)
    val p = s.clone(); p(0) = ((p(0) + 129) % 256) - 128
    val h = java.lang.Long.bitCount(fingerprint(s) ^ fingerprint(p))
    assert(h <= 2, s"perturbed Hamming $h")
    val far = java.lang.Long.bitCount(fingerprint(s) ^ fingerprint(noise(7)))
    assert(far > 10, s"unrelated Hamming $far")
  }

  test("audioNearDupPairs surfaces planted twins and only twins") {
    import spark.implicits._
    val rows = (0 until 40).map { i =>
      val base = if (i % 10 == 1) noise(i - 1) else noise(i)
      val s = base.clone()
      if (i % 10 == 1) s(0) = ((s(0) + 129) % 256) - 128
      (i.toLong, wav(s.toSeq, if (i % 3 == 0) 16 else 8))
    }
    val df = rows.toDF("media_id", "payload")
    val pairs = AudioFingerprint.audioNearDupPairs(spark, df, maxHamming = 5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = Seq((0L, 1L), (10L, 11L), (20L, 21L), (30L, 31L))
    assert(pairs.sorted.toSeq == expected)
  }

  test("parameter guard: explicit bands below maxHamming + 1 are rejected") {
    import spark.implicits._
    val df = Seq((1L, wav(noise(1).toSeq, 8))).toDF("media_id", "payload")
    intercept[IllegalArgumentException] {
      // 7 bands only guarantee recall to Hamming 6
      AudioFingerprint.audioNearDupPairs(spark, df, maxHamming = 7, bands = 7)
    }
    intercept[IllegalArgumentException] {
      // more bands than fingerprint bits (56)
      AudioFingerprint.audioNearDupPairs(spark, df, maxHamming = 3, bands = 60)
    }
    intercept[IllegalArgumentException] {
      AudioFingerprint.audioNearDupPairs(spark, df, maxHamming = 2, bands = 2)
    }
  }

  test("4 wide bands (scale configuration) still surface the twins") {
    import spark.implicits._
    val rows = (0 until 20).map { i =>
      val base = if (i % 10 == 1) noise(i - 1) else noise(i)
      val s = base.clone()
      if (i % 10 == 1) s(0) = ((s(0) + 129) % 256) - 128
      (i.toLong, wav(s.toSeq, 8))
    }
    val pairs = AudioFingerprint.audioNearDupPairs(spark,
        rows.toDF("media_id", "payload"), maxHamming = 3, bands = 4)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.sorted.toSeq == Seq((0L, 1L), (10L, 11L)))
  }
  test("incrementalAudioDedup: corpus rep wins, batch peer second, strangers admit") {
    import spark.implicits._
    // corpus: even ids, plain waveforms; batch: odd ids — %10==1 perturbs
    // the in-corpus predecessor, %10==5 perturbs batch peer id-2,
    // everything else is a stranger
    val corpus = (0 until 40 by 2)
      .map(i => (i.toLong, wav(noise(i).toSeq, 8))).toDF("media_id", "payload")
    val batch = (1 until 40 by 2).map { i =>
      val base =
        if (i % 10 == 1) noise(i - 1)
        else if (i % 10 == 5) noise(i - 2)
        else noise(i)
      val s = base.clone()
      if (i % 10 == 1 || i % 10 == 5) s(0) = ((s(0) + 129) % 256) - 128
      (i.toLong, wav(s.toSeq, 8))
    }.toDF("media_id", "payload")
    val index = AudioFingerprint.audioBucketIndex(spark, corpus, maxHamming = 5)
    val got = AudioFingerprint
      .incrementalAudioDedup(spark, batch, index, maxHamming = 5)
      .select("media_id", "rep_id", "is_dup")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.length == 20)
    got.foreach { case (id, rep, dup) =>
      if (id % 10 == 1) assert(rep == id - 1 && dup, s"corpus twin $id -> $rep")
      else if (id % 10 == 5) assert(rep == id - 2 && dup, s"batch twin $id -> $rep")
      else assert(rep == id && !dup, s"stranger $id -> $rep")
    }
  }

  test("incrementalAudioDedup: undecodable payloads admit (no evidence)") {
    import spark.implicits._
    val corpus = Seq((0L, wav(noise(0).toSeq, 8))).toDF("media_id", "payload")
    val batch = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (3L, wav(noise(3).toSeq, 8))).toDF("media_id", "payload")
    val index = AudioFingerprint.audioBucketIndex(spark, corpus)
    val got = AudioFingerprint.incrementalAudioDedup(spark, batch, index)
      .select("media_id", "rep_id", "is_dup")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, false), (3L, 3L, false)))
  }
}
