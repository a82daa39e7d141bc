package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

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
  /** Column-metadata key under which every `*BucketIndex` /
    * `simhashBandIndex` builder stamps its band COUNT onto the `bucket`
    * column. Schema metadata survives both plan composition (the alias'
    * attribute carries it through selects) and a parquet round-trip
    * (Spark writes the full StructType, metadata included, into the
    * footer and restores it on read), so [[bandsFromIndex]] can recover
    * the layout from `index.schema` alone — a driver-side lookup, zero
    * Spark jobs.
    */
  val BandsMetaKey = "graft.bands"

  /** Alias `bucket` with the build layout stamped as column metadata —
    * applied by every index builder so consumers never pay a scan to
    * recover the band count.
    */
  def withLayoutMeta(bucket: Column, nBands: Int): Column =
    bucket.as("bucket",
      new MetadataBuilder().putLong(BandsMetaKey, nBands.toLong).build())

  /** Resolve the screen's banding FROM the persisted index (advice r16):
    * the build layout is stamped into the `bucket` column's metadata at
    * build time ([[withLayoutMeta]], round 18), so recovery is a
    * driver-side schema lookup — NO job over the index. This matters
    * beyond hygiene: the index argument is often an unpinned lineage
    * whose dominant cost is the media decode + fingerprint, and the r17
    * max-scan probe re-executed that whole lineage once per admission
    * batch before the screen's own join ran it again (measured 1.4–1.55×
    * on the three media admission gates). For pre-r18 indexes without
    * the metadata (e.g. hand-built frames), the max-over-band-ordinal
    * scan remains as the legacy fallback — for a fixed fpBits the
    * per-band widths follow deterministically ([[widths]]).
    *
    * Deriving (instead of trusting the caller to repeat the build-time
    * parameters) makes a layout mismatch IMPOSSIBLE rather than a silent
    * empty candidate join that admits every duplicate: an explicit
    * `bands` request that contradicts the index, or a `maxHamming`
    * beyond the index banding's recall guarantee, fails loudly. An empty
    * metadata-free index falls back to [[resolveBands]] (there is
    * nothing to screen against, and a first batch must still
    * self-screen).
    */
  def bandsFromIndex(
      index: DataFrame, maxHamming: Int, bands: Int, fpBits: Int): Int = {
    def validate(ib: Int): Int = {
      require(bands == 0 || bands == ib,
        s"screen requested $bands bands but the index was built with $ib — " +
          "the screen derives its banding from the index; pass bands = 0 " +
          "(or rebuild the index at the new layout)")
      require(ib >= maxHamming + 1,
        s"index built with $ib bands only guarantees recall for Hamming <= " +
          s"${ib - 1}, got maxHamming=$maxHamming — rebuild the index with " +
          "more bands or lower the screen threshold")
      require(ib <= fpBits,
        s"index band count $ib exceeds fingerprint width $fpBits — " +
          "this index belongs to a different modality")
      ib
    }
    val stamped = index.schema.fields.find(_.name == "bucket")
      .filter(_.metadata.contains(BandsMetaKey))
      .map(_.metadata.getLong(BandsMetaKey).toInt)
    stamped match {
      case Some(ib) => validate(ib)
      case None =>
        val head = index.agg(max(col("bucket.band"))).head()
        if (head.isNullAt(0)) resolveBands(maxHamming, bands, fpBits)
        else validate(head.getInt(0) + 1)
    }
  }

  /** Shared single-fingerprint incremental-admission screen — the
    * common core of [[ImageHash.incrementalImageDedup]] and
    * [[AudioFingerprint.incrementalAudioDedup]] (review r15: the two
    * bodies were verbatim twins modulo the hash column and width, and
    * had already begun to drift). Screens a PINNED batch signature
    * frame against the persisted corpus index, then against batch
    * peers: `rep_id` = smallest corpus id within `maxHamming` (corpus
    * authoritative), else smallest batch id (self included, Hamming 0),
    * else the asset itself; NULL-hash rows ride the spine and admit
    * (no evidence). Video keeps its own screen — its census semantics
    * (distinct matched KEYFRAMES on both sides) do not reduce to a
    * single-hash min.
    *
    * @param sigs  (media_id, hashCol) — one row per batch asset,
    *              localCheckpoint'd by the caller (it feeds three
    *              consumers here)
    * @param index (bucket, media_id, hashCol) persisted corpus rows
    */
  def incrementalScreen(
      sigs: DataFrame, index: DataFrame, hashCol: String, fpBits: Int,
      maxHamming: Int, bands: Int): DataFrame = {
    val nBands = bandsFromIndex(index, maxHamming, bands, fpBits)
    val bucketed = sigs.where(col(hashCol).isNotNull)
      .select(col("media_id"), col(hashCol),
        explode(array(bandKeys(col(hashCol), fpBits, nBands): _*))
          .as("bucket"))
      .localCheckpoint(true)
    val vsCorpus = bucketed
      .join(index.select(col("bucket"),
        col("media_id").as("_cid"), col(hashCol).as("_chash")), Seq("bucket"))
      .where(bit_count(col(hashCol).bitwiseXOR(col("_chash"))) <= maxHamming)
      .groupBy("media_id").agg(min(col("_cid")).as("_crep"))
    val vsBatch = bucketed
      .join(bucketed.select(col("bucket"),
        col("media_id").as("_bid"), col(hashCol).as("_bhash")), Seq("bucket"))
      .where(bit_count(col(hashCol).bitwiseXOR(col("_bhash"))) <= maxHamming)
      .groupBy("media_id").agg(min(col("_bid")).as("_brep"))
    sigs.select("media_id")
      .join(vsCorpus, Seq("media_id"), "left")
      .join(vsBatch, Seq("media_id"), "left")
      .withColumn("rep_id",
        coalesce(col("_crep"), col("_brep"), col("media_id")))
      .withColumn("is_dup", col("rep_id") =!= col("media_id"))
      .drop("_crep", "_brep")
  }

}
