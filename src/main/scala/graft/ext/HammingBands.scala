package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared banding for Hamming-ball candidate generation over integral
  * fingerprints (image dHash, audio fingerprints): split the fp into
  * `bands` disjoint bit ranges; a pair within Hamming ≤ bands − 1 agrees
  * exactly on ≥ 1 band (pigeonhole), so a band-bucket equi-join yields
  * every candidate without an all-pairs stage.
  *
  * Scale rule: for a verify threshold `maxHamming`, use EXACTLY
  * `maxHamming + 1` bands. Recall is already guaranteed at that count,
  * and every extra band only narrows the band width — and a band's
  * bucket space is 2^width, so the candidate join grows
  * ~n²/(bands·2^width) once n ≫ 2^width. Fewer, wider bands keep the
  * buckets sparse ~2^(width_wide−width_narrow) times longer. E.g. on a
  * 64-bit hash, 4×16-bit bands (65 536 values each) saturate at corpus
  * sizes ~256× larger than 8×8-bit bands (256 values each). The r13
  * 100× sweep measured exactly this: the 8×8-bit image config grew 9.3×
  * on 100× data.
  *
  * Widths need not be even: `fpBits` is distributed floor/ceil across
  * the bands (the first `fpBits mod bands` bands get the extra bit), so
  * any band count in [1, fpBits] is valid — no divisibility constraint.
  */
object HammingBands {

  /** The scale-optimal band count for a verify threshold: the fewest
    * bands that still guarantee recall at `maxHamming`.
    */
  def bandsFor(maxHamming: Int): Int = maxHamming + 1

  /** Per-band bit widths: as even as possible, summing to `fpBits`. */
  def widths(fpBits: Int, bands: Int): Seq[Int] = {
    require(bands >= 1 && bands <= fpBits,
      s"bands must be in [1, $fpBits], got $bands")
    val base = fpBits / bands
    val extra = fpBits % bands
    Seq.tabulate(bands)(i => base + (if (i < extra) 1 else 0))
  }

  /** Band-key struct columns (band index, band bits) over an integral
    * hash column, one per band — `explode(array(bandKeys...))` is the
    * candidate-generation bucketing.
    */
  def bandKeys(hash: Column, fpBits: Int, bands: Int): Seq[Column] = {
    val ws = widths(fpBits, bands)
    val offsets = ws.scanLeft(0)(_ + _)
    (0 until bands).map { b =>
      val mask = if (ws(b) >= 64) -1L else (1L << ws(b)) - 1L
      struct(lit(b).as("band"),
        shiftright(hash, offsets(b)).bitwiseAND(lit(mask)).as("bits"))
    }
  }

  /** Resolve the (maxHamming, bands) pair: bands = 0 selects the
    * scale-optimal count; an explicit count must still guarantee recall.
    */
  def resolveBands(maxHamming: Int, bands: Int, fpBits: Int): Int = {
    require(maxHamming >= 0 && maxHamming < fpBits,
      s"maxHamming must be in [0, $fpBits), got $maxHamming")
    val nb = if (bands == 0) bandsFor(maxHamming) else bands
    require(nb >= maxHamming + 1,
      s"$nb bands only guarantee recall for Hamming <= ${nb - 1}, " +
        s"got maxHamming=$maxHamming")
    require(nb <= fpBits, s"bands must be <= $fpBits, got $nb")
    nb
  }
}
