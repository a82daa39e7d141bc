package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Video content near-duplicate detection — the missing leg of the
  * multimodal triad (images: [[ImageHash]], audio: [[AudioFingerprint]]).
  *
  * Pipeline: ISO-BMFF sample-table walk ([[Multimodal.Mp4Walk]]) →
  * sync-sample (keyframe) payload slices via `stss`/`stsz`/`stsc`/
  * `stco`/`co64` → the EXISTING perceptual image-hash chain per
  * keyframe ([[ImageHash.decodeLuma]] → dHash/aHash/pHash) → banded
  * Hamming candidate join over per-keyframe dHashes
  * ([[HammingBands]]) → exact per-keyframe verify → per-video-pair
  * matched-keyframe census. Two videos are near-duplicates when enough
  * keyframes of EACH match a keyframe of the other — robust to
  * re-encoding (perceptual hash), re-muxing (content, not bytes), and
  * trims (matched-count threshold, not exact sequence equality).
  *
  * Scale shape: decode + hash is partition-local (`mapPartitions`, no
  * shuffle; payload bytes never leave the partition — only 8-byte
  * hashes travel). Candidates come from the band-bucket join — never
  * all-pairs — with the scale-optimal wide-band default
  * ([[HammingBands]]: `maxHamming + 1` bands). Keyframe fan-out is
  * bounded by `maxKeyframes`, so the signature table is ≤ n·maxKeyframes
  * rows regardless of video length.
  */
object VideoFingerprint {

  /** Input row shape (public: Catalyst's generated deserializer cannot
    * access private classes).
    */
  case class VideoIn(media_id: Long, payload: Array[Byte])

  /** One hashed keyframe: `kf` is the 0-based index within the video's
    * sync-sample list (stss order). NULL hashes = undecodable keyframe.
    */
  case class VideoKfRow(
      media_id: Long, kf: Int, sample_no: Int,
      dhash: Option[Long], ahash: Option[Long], phash: Option[Long])

  /** Sync-sample payload slices of an ISO-BMFF video, in stss order,
    * capped at `maxKeyframes`.
    *
    * Sample-table geometry (ISO 14496-12):
    *  - `stss` (§8.6.2): sync sample numbers, 1-based, ascending. A
    *    missing stss means EVERY sample is sync (intra-only stream) —
    *    then the first `maxKeyframes` samples are taken.
    *  - `stsz` (§8.7.3): uniform `sample_size` or a per-sample u32 table.
    *  - `stsc` (§8.7.4): chunk runs (first_chunk, samples_per_chunk) —
    *    run r covers chunks [first_chunk_r, first_chunk_{r+1}).
    *  - `stco`/`co64` (§8.7.5): per-chunk file offsets (u32/u64).
    *
    * A sample's offset = its chunk's offset + the sizes of the samples
    * preceding it IN that chunk. One linear pass over the sample list
    * computes every sync sample's (offset, size); slices that fall
    * outside the buffer are skipped (truncated file fails closed).
    */
  def keyframePayloads(
      bytes: Array[Byte], maxKeyframes: Int): Seq[Array[Byte]] = {
    require(maxKeyframes >= 1, s"maxKeyframes must be >= 1, got $maxKeyframes")
    val w = new Multimodal.Mp4Walk(bytes)
    if (!w.isMp4) return Nil
    val stblOpt = w.stbl
    if (stblOpt.isEmpty) return Nil
    val (stblP, stblE) = stblOpt.get

    // stsz: sizes
    val sizes: Array[Long] = w.find("stsz", stblP, stblE) match {
      case Some((p, e)) if p + 12 <= e =>
        val uniform = w.u32(p + 4)
        val n = w.u32(p + 8).toInt
        if (n < 0) return Nil
        // Bound the uniform path like the per-sample path (advice r14):
        // sample_count is an untrusted u32, and every sample needs ≥ 1
        // byte of file, so n > bytes.length is provably corrupt — fail
        // closed instead of allocating up to ~16 GB for the size table.
        if (uniform != 0) {
          if (n > bytes.length) return Nil
          Array.fill(n)(uniform)
        }
        else {
          if (p + 12 + 4L * n > e) return Nil
          Array.tabulate(n)(i => w.u32(p + 12 + 4 * i))
        }
      case _ => return Nil
    }
    val nSamples = sizes.length
    if (nSamples == 0) return Nil

    // stco / co64: chunk offsets
    val chunkOffsets: Array[Long] = w.find("stco", stblP, stblE) match {
      case Some((p, e)) if p + 8 <= e =>
        val n = w.u32(p + 4).toInt
        if (n < 0 || p + 8 + 4L * n > e) return Nil
        Array.tabulate(n)(i => w.u32(p + 8 + 4 * i))
      case _ => w.find("co64", stblP, stblE) match {
        case Some((p, e)) if p + 8 <= e =>
          val n = w.u32(p + 4).toInt
          if (n < 0 || p + 8 + 8L * n > e) return Nil
          Array.tabulate(n)(i => w.u64(p + 8 + 8 * i))
        case _ => return Nil
      }
    }
    if (chunkOffsets.isEmpty) return Nil

    // stsc: chunk runs → samples_per_chunk for each chunk index (1-based)
    val runs: Array[(Int, Int)] = w.find("stsc", stblP, stblE) match {
      case Some((p, e)) if p + 8 <= e =>
        val n = w.u32(p + 4).toInt
        if (n < 0 || p + 8 + 12L * n > e) return Nil
        Array.tabulate(n)(i =>
          (w.u32(p + 8 + 12 * i).toInt, w.u32(p + 8 + 12 * i + 4).toInt))
      case _ => return Nil
    }
    if (runs.isEmpty || runs(0)._1 != 1) return Nil

    // stss: sync sample numbers (1-based); absent → all samples sync
    val syncSet: Option[Array[Int]] = w.find("stss", stblP, stblE) match {
      case Some((p, e)) if p + 8 <= e =>
        val n = w.u32(p + 4).toInt
        if (n < 0 || p + 8 + 4L * n > e) return Nil
        Some(Array.tabulate(n)(i => w.u32(p + 8 + 4 * i).toInt))
      case _ => None
    }

    // linear pass: sample number → file offset, collecting sync slices
    val out = Seq.newBuilder[Array[Byte]]
    var taken = 0
    var sample = 1 // 1-based
    var run = 0
    var chunk = 1 // 1-based
    var syncIdx = 0
    while (sample <= nSamples && taken < maxKeyframes &&
        chunk <= chunkOffsets.length) {
      if (run + 1 < runs.length && chunk >= runs(run + 1)._1) run += 1
      val perChunk = runs(run)._2
      if (perChunk <= 0) return out.result()
      var off = chunkOffsets(chunk - 1)
      var i = 0
      while (i < perChunk && sample <= nSamples && taken < maxKeyframes) {
        val sz = sizes(sample - 1)
        val isSync = syncSet match {
          case Some(ss) =>
            while (syncIdx < ss.length && ss(syncIdx) < sample) syncIdx += 1
            syncIdx < ss.length && ss(syncIdx) == sample
          case None => true
        }
        if (isSync && off >= 0 && sz > 0 && off + sz <= w.bytes.length) {
          out += java.util.Arrays.copyOfRange(
            w.bytes, off.toInt, (off + sz).toInt)
          taken += 1
        }
        off += sz
        sample += 1
        i += 1
      }
      chunk += 1
    }
    out.result()
  }

  /** Per-keyframe perceptual hashes over video payloads — the
    * [[ImageHash.imageHashes]] shape with a keyframe fan-out: payloads
    * live only for one batch, ≤ `maxKeyframes` small fixed-size rows
    * out per video. Unparseable containers emit zero rows; a keyframe
    * whose payload is not a decodable image carries NULL hashes.
    *
    * @param df columns: media_id LONG, payload BINARY
    */
  def videoKeyframeHashes(
      spark: SparkSession, df: DataFrame,
      maxKeyframes: Int = 8): DataFrame = {
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload").cast("binary"))
      .as[VideoIn]
      .mapPartitions(_.flatMap { m =>
        keyframePayloads(m.payload, maxKeyframes).zipWithIndex.map {
          case (kfBytes, i) =>
            ImageHash.decodeLuma(kfBytes) match {
              case Some(px) => VideoKfRow(m.media_id, i, i,
                ImageHash.dHash(px), ImageHash.aHash(px), ImageHash.pHash(px))
              case None => VideoKfRow(m.media_id, i, i, None, None, None)
            }
        }
      })
      .toDF()
  }

  /** Scene-cut detection over the keyframe sequence: a cut is a
    * consecutive-keyframe pair whose perceptual distance exceeds
    * `cutHamming` — visually continuous footage moves a dHash a few
    * bits between keyframes, a hard cut re-rolls roughly half of them.
    * Emits `(media_id, cut_kf, hamming)` — the keyframe that OPENS the
    * new scene. One window over (video, kf) after the partition-local
    * decode; per-video state is the keyframe list, bounded by
    * `maxKeyframes`.
    */
  def sceneCuts(
      spark: SparkSession, df: DataFrame, cutHamming: Int = 16,
      maxKeyframes: Int = 8): DataFrame = {
    require(cutHamming >= 1 && cutHamming <= 64,
      s"cutHamming must be in [1, 64], got $cutHamming")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("media_id").orderBy("kf")
    videoKeyframeHashes(spark, df, maxKeyframes)
      .where(col("dhash").isNotNull)
      .select(col("media_id"), col("kf"), col("dhash"))
      .withColumn("_prev", lag(col("dhash"), 1).over(w))
      .where(col("_prev").isNotNull)
      .withColumn("hamming", bit_count(col("dhash").bitwiseXOR(col("_prev"))))
      .where(col("hamming") >= cutHamming)
      .select(col("media_id"), col("kf").as("cut_kf"), col("hamming"))
  }

  /** Video near-duplicate pairs: banded per-keyframe dHash candidates
    * ([[HammingBands]] wide-band default), exact `bit_count` verify per
    * keyframe pair, then a per-video-pair census — two videos pair when
    * each side has ≥ `minMatchedKeyframes` DISTINCT keyframes matched
    * (a one-shared-frame coincidence does not). Emits
    * `(id1, id2, matched1, matched2, nkf1, nkf2)`.
    *
    * @param df columns: media_id LONG, payload BINARY
    */
  def videoNearDupPairs(
      spark: SparkSession, df: DataFrame, maxHamming: Int = 3,
      minMatchedKeyframes: Int = 2, bands: Int = 0,
      maxKeyframes: Int = 8): DataFrame = {
    require(minMatchedKeyframes >= 1,
      s"minMatchedKeyframes must be >= 1, got $minMatchedKeyframes")
    val fpBits = 64
    val nBands = HammingBands.resolveBands(maxHamming, bands, fpBits)
    // Pinned: the signature table feeds the per-video census AND both
    // sides of the band self-join (multi-consumer rule; decode + hash
    // is the costly stage).
    val sigs = videoKeyframeHashes(spark, df, maxKeyframes)
      .where(col("dhash").isNotNull)
      .select(col("media_id"), col("kf"), col("dhash"))
      .localCheckpoint(true)
    val nkf = sigs.groupBy("media_id").agg(count(lit(1)).as("nkf"))
    val bandKeys = HammingBands.bandKeys(col("dhash"), fpBits, nBands)
    val bucketed = sigs.select(col("media_id"), col("kf"), col("dhash"),
      explode(array(bandKeys: _*)).as("bucket"))
    val a = bucketed.select(col("media_id").as("id1"), col("kf").as("kf1"),
      col("dhash").as("h1"), col("bucket"))
    val b = bucketed.select(col("media_id").as("id2"), col("kf").as("kf2"),
      col("dhash").as("h2"), col("bucket"))
    val kfPairs = a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      // a keyframe pair can collide in several bands — dedup across bands
      .select("id1", "kf1", "id2", "kf2").distinct()
    kfPairs
      .groupBy("id1", "id2")
      .agg(countDistinct(col("kf1")).as("matched1"),
        countDistinct(col("kf2")).as("matched2"))
      .filter(least(col("matched1"), col("matched2"))
        >= minMatchedKeyframes)
      .join(nkf.select(col("media_id").as("id1"), col("nkf").as("nkf1")), Seq("id1"))
      .join(nkf.select(col("media_id").as("id2"), col("nkf").as("nkf2")), Seq("id2"))
      .select("id1", "id2", "matched1", "matched2", "nkf1", "nkf2")
  }

  /** Persisted bucket index of an ACCEPTED video corpus — the
    * [[ImageHash.imageBucketIndex]] role for the per-keyframe
    * fingerprint: `(bucket, media_id, kf, dhash)` rows, one per band per
    * decodable keyframe, written once per accepted corpus and re-read by
    * every crawl cycle. The keyframe index rides along because video
    * admission is a matched-keyframe CENSUS, not a single-hash verify —
    * the screen must count distinct matched keyframes on BOTH sides.
    */
  def videoBucketIndex(
      spark: SparkSession, df: DataFrame, maxHamming: Int = 3,
      bands: Int = 0, maxKeyframes: Int = 8): DataFrame = {
    val nBands = HammingBands.resolveBands(maxHamming, bands, 64)
    videoKeyframeHashes(spark, df, maxKeyframes)
      .where(col("dhash").isNotNull)
      .select(col("media_id"), col("kf"), col("dhash"),
        explode(array(HammingBands.bandKeys(col("dhash"), 64, nBands): _*))
          .as("bucket"))
      // stamped AFTER the explode: the analyzer's generator extraction
      // drops alias metadata on a generator expression itself
      .select(HammingBands.withLayoutMeta(col("bucket"), nBands),
        col("media_id"), col("kf"), col("dhash"))
  }

  /** Incremental near-dup ADMISSION for video — the
    * [[ImageHash.incrementalImageDedup]] recurring-crawl contract with
    * [[videoNearDupPairs]]' census semantics: a batch video is a
    * duplicate of another video when each side has ≥
    * `minMatchedKeyframes` DISTINCT keyframes matched (exact per-pair
    * `bit_count` verify on banded candidates). Corpus is authoritative —
    * `rep_id` is the smallest qualifying corpus id (the corpus is never
    * re-decoded; its per-keyframe hashes come from the persisted
    * [[videoBucketIndex]]), else the smallest qualifying batch id (self
    * included — a video with ≥ `minMatchedKeyframes` decodable keyframes
    * matches itself at Hamming 0), else the video itself. Containers
    * yielding no decodable keyframes produce no candidates and pass
    * through admitted (the no-evidence omission contract). The banding
    * is DERIVED from the index (a contradicting explicit `bands` fails
    * loudly); `maxKeyframes` must still match the index's.
    */
  def incrementalVideoDedup(
      spark: SparkSession, batch: DataFrame, bucketIndex: DataFrame,
      maxHamming: Int = 3, minMatchedKeyframes: Int = 2, bands: Int = 0,
      maxKeyframes: Int = 8): DataFrame = {
    require(minMatchedKeyframes >= 1,
      s"minMatchedKeyframes must be >= 1, got $minMatchedKeyframes")
    // banding derives from the index itself (HammingBands.bandsFromIndex,
    // advice r16) — a layout mismatch fails loudly instead of silently
    // joining disjoint bucket structs and admitting every duplicate
    val nBands = HammingBands.bandsFromIndex(bucketIndex, maxHamming, bands, 64)
    // the spine must be the BATCH videos (a container yielding zero
    // keyframes has no signature rows but still needs an admit row);
    // payload is pruned out of this scan — only media_id is read
    val spine = batch.select(col("media_id").cast("long").as("media_id"))
      .distinct()
    // Pinned: the signature table feeds the corpus join and both sides
    // of the peer self-join (decode + hash is the costly stage).
    val bucketed = videoKeyframeHashes(spark, batch, maxKeyframes)
      .where(col("dhash").isNotNull)
      .select(col("media_id"), col("kf"), col("dhash"),
        explode(array(HammingBands.bandKeys(col("dhash"), 64, nBands): _*))
          .as("bucket"))
      .localCheckpoint(true)
    def census(other: DataFrame, idCol: String): DataFrame =
      bucketed.join(other, Seq("bucket"))
        .where(bit_count(col("dhash").bitwiseXOR(col("_ohash"))) <= maxHamming)
        .select("media_id", "kf", idCol, "_okf").distinct()
        .groupBy(col("media_id"), col(idCol))
        .agg(countDistinct(col("kf")).as("_m1"),
          countDistinct(col("_okf")).as("_m2"))
        .where(least(col("_m1"), col("_m2")) >= minMatchedKeyframes)
        .groupBy("media_id").agg(min(col(idCol)).as(s"_rep$idCol"))
    val vsCorpus = census(
      bucketIndex.select(col("bucket"), col("media_id").as("_cid"),
        col("kf").as("_okf"), col("dhash").as("_ohash")), "_cid")
    val vsBatch = census(
      bucketed.select(col("bucket"), col("media_id").as("_bid"),
        col("kf").as("_okf"), col("dhash").as("_ohash")), "_bid")
    spine
      .join(vsCorpus, Seq("media_id"), "left")
      .join(vsBatch, Seq("media_id"), "left")
      .withColumn("rep_id",
        coalesce(col("_rep_cid"), col("_rep_bid"), col("media_id")))
      .withColumn("is_dup", col("rep_id") =!= col("media_id"))
      .drop("_rep_cid", "_rep_bid")
  }
}
