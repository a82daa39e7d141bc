package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ext.{ImageHash, VideoFingerprint}

/** Video keyframe fingerprinting gate queries — the [[ImageQueries]]
  * hex-replay pattern lifted to a CONTAINER: Spark synthesizes a real
  * ISO-BMFF file per document (ftyp + moov/trak/mdia/minf/stbl with
  * stss/stsz/stsc/stco + mdat carrying five 16×16 BMP frames, hex-concat
  * → unhex) and pushes it through the REAL box walk
  * ([[graft.ext.VideoFingerprint.keyframePayloads]]) and the REAL pixel
  * decoder + perceptual hash chain, while the DuckDB oracle never sees a
  * byte: it replays the hash MATH on the generative pixel model of the
  * SYNC samples only. A walk bug (wrong sample selected, wrong offset
  * arithmetic), a decode bug, or a hash bug all break the hash compare.
  *
  * Container geometry (fixed): 5 samples of 822 bytes in one chunk;
  * samples 1, 3, 5 (1-based) are sync — their pixels follow the md5
  * generative model keyed by (video, 0-based sample index, pixel);
  * samples 2 and 4 are a CONSTANT filler BMP. The filler is decodable on
  * purpose: an implementation that hashed every sample instead of the
  * sync list would emit shifted kf indices and constant-hash rows, and
  * the gate hash breaks loudly.
  */
object VideoQueries {

  private val NumSamples = 5
  private val SyncSamples = Seq(1, 3, 5) // 1-based sample numbers
  private val FrameBytes = 822 // 54-byte BMP header + 16*16*3 raster

  private def u32hex(v: Long): String = f"$v%08X"
  private def typHex(t: String): String =
    t.getBytes("US-ASCII").map(b => f"$b%02X").mkString

  /** `size || type || payload` box hex. */
  private def boxHex(typ: String, payloadHex: String): String = {
    require(payloadHex.length % 2 == 0)
    u32hex(8L + payloadHex.length / 2) + typHex(typ) + payloadHex
  }

  /** FullBox: version 0, flags 0. */
  private def fullBoxHex(typ: String, bodyHex: String): String =
    boxHex(typ, "00000000" + bodyHex)

  /** Everything before the mdat payload — a compile-time constant: the
    * geometry is fixed, so every box size and the single chunk offset
    * are known here. Two-pass: moov's size does not depend on the stco
    * VALUE, so a dummy-offset pass fixes the layout.
    */
  private[queries] val ContainerPrefixHex: String = {
    val ftyp = boxHex("ftyp", typHex("isom") + u32hex(0))
    def moov(chunkOffset: Long): String = {
      val stss = fullBoxHex("stss",
        u32hex(SyncSamples.size.toLong) + SyncSamples.map(s => u32hex(s.toLong)).mkString)
      val stsz = fullBoxHex("stsz",
        u32hex(FrameBytes.toLong) + u32hex(NumSamples.toLong))
      val stsc = fullBoxHex("stsc",
        u32hex(1L) + u32hex(1L) + u32hex(NumSamples.toLong) + u32hex(1L))
      val stco = fullBoxHex("stco", u32hex(1L) + u32hex(chunkOffset))
      boxHex("moov", boxHex("trak", boxHex("mdia", boxHex("minf",
        boxHex("stbl", stss + stsz + stsc + stco)))))
    }
    val mdatHdr = u32hex(8L + NumSamples.toLong * FrameBytes) + typHex("mdat")
    val probeLen = (ftyp + moov(0L) + mdatHdr).length / 2
    ftyp + moov(probeLen.toLong) + mdatHdr
  }

  /** Hex of one 16×16 gray BMP frame under the md5 generative model:
    * `prefix` is the md5 input prefix (e.g. "<vid>_<sample>_"),
    * `perturbIdx`/`perturbDelta` the planted-twin single-pixel
    * perturbation (−1 = none). Native one-call codegen expression
    * ([[graft.functions.SynthRasterImpl]]) — the interpreted
    * `transform(sequence(...))` lambda this replaces was 70%+ of the
    * video gates' wall time (optimization r20; bit-equivalence pinned
    * by SynthRasterSpec).
    */
  private def frameHex(
      prefix: Column, perturbIdx: Column, perturbDelta: Column): Column =
    concat(lit(ImageQueries.BmpHeaderHex),
      graft.functions.SynthRasterFunctions.bmp_raster_hex(
        prefix, perturbIdx, perturbDelta))

  /** The constant filler frame for non-sync samples: luma = (7x + 11y)
    * mod 256 — decodable, identical across all videos, built ONCE here
    * as a hex literal (zero per-row cost).
    */
  private val FillerFrameHex: String =
    ImageQueries.BmpHeaderHex + (0 until 256).map { p =>
      val v = (7 * (p % 16) + 11 * (p / 16)) % 256
      f"$v%02X" * 3
    }.mkString

  /** Full MP4 payload column: the constant prefix + five frames, sync
    * samples (0-based indices 0/2/4) from the md5 model
    * `model(sampleIdx) = (md5 prefix, perturbIdx, perturbDelta)` —
    * pixel luma = first md5 byte of `prefix || pixel`, the model the
    * oracles replay verbatim.
    */
  private def mp4Payload(model: Int => (Column, Column, Column)): Column =
    unhex(concat(lit(ContainerPrefixHex) +:
      (0 until NumSamples).map { s =>
        if (SyncSamples.contains(s + 1)) {
          val (pre, pIdx, pDelta) = model(s)
          frameHex(pre, pIdx, pDelta)
        } else lit(FillerFrameHex)
      }: _*))

  /** md5-input prefix for (videoId, 0-based sample): luma of pixel p is
    * the first byte of md5("<vid>_<s>_<p>").
    */
  private def lumPrefix(vid: Column, s: Int): Column =
    concat(vid.cast("string"), lit(s"_${s}_"))

  // ---- oracle SQL fragments -------------------------------------------

  /** Oracle luma for the plain model, one line (generated SQL must never
    * start a line with '|'). `s` = kf.range * 2 (0-based sample index of
    * the kf-th sync sample).
    */
  private val PlainVLum =
    "CAST(('0x' || substr(md5(doc_id::VARCHAR || '_' || (kf.range * 2)::VARCHAR || '_' || r.range::VARCHAR), 1, 2)) AS BIGINT)"

  /** Twin model (q_dedup_video): doc_id ≡ 1 (mod 10) replays its
    * predecessor's sync-sample models with pixel 0 of keyframe 0
    * perturbed (+8 mod 256) — a re-encoded full near-dup; doc_id ≡ 2
    * (mod 10) copies the decade base's model for keyframe 0 ONLY — a
    * one-shared-scene coincidence that must stay below the
    * matched-keyframe threshold.
    */
  private val TwinVLum =
    "(CAST(('0x' || substr(md5((CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 WHEN doc_id % 10 = 2 AND kf.range = 0 THEN doc_id - 2 ELSE doc_id END)::VARCHAR || '_' || (kf.range * 2)::VARCHAR || '_' || r.range::VARCHAR), 1, 2)) AS BIGINT) + CASE WHEN doc_id % 10 = 1 AND kf.range = 0 AND r.range = 0 THEN 8 ELSE 0 END) % 256"

  /** Spark-side twin/partial video id per sync sample. */
  private def twinVid(id: Column, s: Int): Column = {
    val m10 = pmod(id, lit(10))
    if (s == 0)
      when(m10 === 1, id - 1).when(m10 === 2, id - 2).otherwise(id)
    else when(m10 === 1, id - 1).otherwise(id)
  }

  /** Shared oracle CTEs: sync-sample pixel model → per-(doc, kf) dHash
    * bit string — [[ImageQueries]]' dhashCtes with the keyframe column
    * threaded through.
    */
  private def vDhashCtes(pxFilter: String, lum: String): String = {
    s"""px AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(kf.range AS INTEGER) AS kf,
       |         CAST(r.range % 16 AS BIGINT) AS x,
       |         CAST(r.range // 16 AS BIGINT) AS y,
       |         $lum AS lum
       |  FROM documents, range(3) kf, range(256) r
       |  $pxFilter),
       |mapx9(mx, cx) AS (VALUES ${ImageQueries.gridMapValues(9)}),
       |g9 AS MATERIALIZED (
       |  SELECT doc_id, kf, y // 2 AS cy, cx,
       |         CAST(sum(lum) AS BIGINT) // count(*) AS g
       |  FROM px JOIN mapx9 ON px.x = mapx9.mx
       |  GROUP BY 1, 2, 3, 4),
       |dbits AS MATERIALIZED (
       |  SELECT doc_id, kf,
       |         string_agg(CASE WHEN gr > gl THEN '1' ELSE '0' END, ''
       |                    ORDER BY cy, cx) AS dhash_bits
       |  FROM (SELECT l.doc_id, l.kf, l.cy, l.cx, l.g AS gl, r.g AS gr
       |        FROM g9 l JOIN g9 r
       |          ON l.doc_id = r.doc_id AND l.kf = r.kf
       |         AND l.cy = r.cy AND r.cx = l.cx + 1
       |        WHERE l.cx < 8) cmp
       |  GROUP BY doc_id, kf)""".stripMargin
  }

  /** Per-keyframe dHash + aHash + pHash over real synthesized MP4s vs
    * the oracle's direct replay of the hash math on the sync-sample
    * pixel models. One fifth of the documents keeps the oracle's DCT
    * join bounded (the [[ImageQueries.qImagePhash]] convention).
    */
  val qVideoPhash = QueryDef(
    "q_video_phash",
    (s, d) => {
      val media = QueryDef.table(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(5)) === 0)
        .select(col("doc_id").as("media_id"),
          mp4Payload(smp =>
            (lumPrefix(col("doc_id"), smp), lit(-1), lit(0))).as("payload"))
      VideoFingerprint.videoKeyframeHashes(s, media)
        .select(col("media_id").as("doc_id"), col("kf"),
          lpad(bin(col("dhash")), 64, "0").as("dhash_bits"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"),
          lpad(bin(col("phash")), 64, "0").as("phash_bits"))
        .orderBy("doc_id", "kf")
    },
    Some(s"""WITH ${vDhashCtes("WHERE doc_id % 5 = 0", PlainVLum)},
            |g8 AS MATERIALIZED (
            |  SELECT doc_id, kf, y // 2 AS cy, x // 2 AS cx,
            |         CAST(sum(lum) AS BIGINT) // count(*) AS g
            |  FROM px GROUP BY 1, 2, 3, 4),
            |amean AS (SELECT doc_id, kf, CAST(sum(g) AS BIGINT) // 64 AS m
            |          FROM g8 GROUP BY doc_id, kf),
            |abits AS (
            |  SELECT g8.doc_id, g8.kf,
            |         string_agg(CASE WHEN g > m THEN '1' ELSE '0' END, ''
            |                    ORDER BY cy, cx) AS ahash_bits
            |  FROM g8 JOIN amean ON g8.doc_id = amean.doc_id
            |                    AND g8.kf = amean.kf
            |  GROUP BY g8.doc_id, g8.kf),
            |ct(k, n, c) AS (VALUES ${ImageQueries.cosValues}),
            |f AS MATERIALIZED (
            |  SELECT doc_id, kf, cv.k AS v, cu.k AS u,
            |         CAST(sum(lum * cu.c * cv.c) AS BIGINT) AS fv
            |  FROM px
            |  JOIN ct cu ON cu.n = px.x
            |  JOIN ct cv ON cv.n = px.y
            |  GROUP BY 1, 2, 3, 4),
            |med AS (
            |  SELECT doc_id, kf, fv AS m
            |  FROM (SELECT doc_id, kf, fv,
            |               row_number() OVER (PARTITION BY doc_id, kf
            |                                  ORDER BY fv) AS rn
            |        FROM f WHERE NOT (u = 0 AND v = 0)) ranked
            |  WHERE rn = 32),
            |pbits AS (
            |  SELECT f.doc_id, f.kf,
            |         string_agg(CASE WHEN u = 0 AND v = 0 THEN '0'
            |                         WHEN fv > m THEN '1' ELSE '0' END, ''
            |                    ORDER BY v, u) AS phash_bits
            |  FROM f JOIN med ON f.doc_id = med.doc_id AND f.kf = med.kf
            |  GROUP BY f.doc_id, f.kf)
            |SELECT doc_id, kf, dhash_bits, ahash_bits, phash_bits
            |FROM dbits
            |JOIN abits USING (doc_id, kf)
            |JOIN pbits USING (doc_id, kf)
            |ORDER BY doc_id, kf""".stripMargin))

  /** Video near-dup census over the full corpus with planted structure:
    * per decade, doc ≡ 1 (mod 10) is a full perceptual twin of doc − 1
    * (all three keyframes match, kf0 at Hamming ≤ 1) and MUST pair,
    * while doc ≡ 2 (mod 10) shares exactly ONE keyframe with the decade
    * base — below the matched-keyframe threshold, it must NOT pair.
    * Both engines band (Spark: 4 × 16-bit low-first over the long;
    * oracle: 8 × 8-bit MSB-first over the bit string — both guarantee
    * recall at Hamming ≤ 3), verify exactly, and aggregate the
    * per-video-pair matched-keyframe census.
    */
  val qDedupVideo = QueryDef(
    "q_dedup_video",
    (s, d) => {
      val id = col("doc_id")
      val media = QueryDef.table(s, d, "documents")
        .select(id.as("media_id"),
          mp4Payload(smp => (
            lumPrefix(twinVid(id, smp), smp),
            if (smp == 0)
              when(pmod(id, lit(10)) === 1, lit(0)).otherwise(lit(-1))
            else lit(-1),
            lit(8))).as("payload"))
      VideoFingerprint.videoNearDupPairs(s, media)
        .orderBy("id1", "id2")
    },
    Some(s"""WITH ${vDhashCtes("", TwinVLum)},
            |bands AS (
            |  SELECT doc_id, kf, dhash_bits,
            |         CAST(b.range AS INTEGER) AS band,
            |         substr(dhash_bits, CAST(b.range * 8 + 1 AS INTEGER), 8) AS bk
            |  FROM dbits, range(8) b),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS id1, a.kf AS kf1,
            |         b.doc_id AS id2, b.kf AS kf2,
            |         a.dhash_bits AS h1, b.dhash_bits AS h2
            |  FROM bands a
            |  JOIN bands b ON a.band = b.band AND a.bk = b.bk
            |               AND a.doc_id < b.doc_id),
            |vkf AS MATERIALIZED (
            |  SELECT id1, kf1, id2, kf2 FROM (
            |    SELECT id1, kf1, id2, kf2,
            |           sum(CASE WHEN substr(h1, CAST(j.range AS INTEGER), 1)
            |                      <> substr(h2, CAST(j.range AS INTEGER), 1)
            |               THEN 1 ELSE 0 END) AS hamming
            |    FROM cand, range(1, 65) j
            |    GROUP BY 1, 2, 3, 4) h
            |  WHERE hamming <= 3),
            |nkf AS (SELECT doc_id, count(*) AS nkf FROM dbits GROUP BY 1),
            |census AS (
            |  SELECT id1, id2,
            |         count(DISTINCT kf1) AS matched1,
            |         count(DISTINCT kf2) AS matched2
            |  FROM vkf GROUP BY 1, 2
            |  HAVING least(count(DISTINCT kf1), count(DISTINCT kf2)) >= 2)
            |SELECT c.id1, c.id2, c.matched1, c.matched2,
            |       n1.nkf AS nkf1, n2.nkf AS nkf2
            |FROM census c
            |JOIN nkf n1 ON n1.doc_id = c.id1
            |JOIN nkf n2 ON n2.doc_id = c.id2
            |ORDER BY c.id1, c.id2""".stripMargin))

  /** Scene-cut model: even doc_ids are STATIC videos (every sync sample
    * reuses the sample-0 pixel model → consecutive keyframes identical,
    * no cuts); odd doc_ids use per-sample models (independent md5
    * patterns sit near Hamming 32 → every keyframe transition is a
    * cut). One line (stripMargin rule).
    */
  private val SceneVLum =
    "CAST(('0x' || substr(md5(doc_id::VARCHAR || '_' || (CASE WHEN doc_id % 2 = 0 THEN 0 ELSE kf.range * 2 END)::VARCHAR || '_' || r.range::VARCHAR), 1, 2)) AS BIGINT)"

  /** Probe accessor (tools/Scratch): the scenecut query's media
    * synthesis frame alone, for stage-decomposition timing.
    */
  private[graft] def scenecutMediaProbe(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val id = col("doc_id")
    QueryDef.table(s, d, "documents")
      .select(id.as("media_id"),
        mp4Payload(smp => (
          when(pmod(id, lit(2)) === 0, lumPrefix(id, 0))
            .otherwise(lumPrefix(id, smp)),
          lit(-1), lit(0))).as("payload"))
  }

  /** Scene-cut detection ([[graft.ext.VideoFingerprint.sceneCuts]]):
    * the oracle replays the consecutive-keyframe Hamming distances on
    * the sync-sample pixel models and applies the same threshold.
    */
  val qVideoScenecut = QueryDef(
    "q_video_scenecut",
    (s, d) => {
      val id = col("doc_id")
      // static evens reuse sample 0's model; odds vary per sample
      val media = QueryDef.table(s, d, "documents")
        .select(id.as("media_id"),
          mp4Payload(smp => (
            when(pmod(id, lit(2)) === 0, lumPrefix(id, 0))
              .otherwise(lumPrefix(id, smp)),
            lit(-1), lit(0))).as("payload"))
      VideoFingerprint.sceneCuts(s, media, cutHamming = 16)
        .orderBy("media_id", "cut_kf")
    },
    Some(s"""WITH ${vDhashCtes("", SceneVLum)},
            |cuts AS (
            |  SELECT cur.doc_id AS media_id, cur.kf AS cut_kf,
            |         CAST(sum(CASE WHEN substr(cur.dhash_bits, CAST(j.range AS INTEGER), 1)
            |                         <> substr(prv.dhash_bits, CAST(j.range AS INTEGER), 1)
            |                  THEN 1 ELSE 0 END) AS INTEGER) AS hamming
            |  FROM dbits cur
            |  JOIN dbits prv ON prv.doc_id = cur.doc_id
            |                AND prv.kf = cur.kf - 1,
            |       range(1, 65) j
            |  GROUP BY 1, 2)
            |SELECT media_id, cut_kf, hamming
            |FROM cuts WHERE hamming >= 16
            |ORDER BY media_id, cut_kf""".stripMargin))

  /** Incremental-admission model (q_dedup_inc_video) — the
    * [[ImageQueries.qDedupIncImage]] scenario with census semantics:
    * the accepted corpus is the EVEN doc_ids (plain models); the
    * arriving batch is the ODD ones, where doc ≡ 1 (mod 10) is a full
    * perceptual twin of the in-corpus doc − 1 (dup vs the CORPUS),
    * doc ≡ 5 (mod 10) is a full twin of batch peer doc − 2 (dup vs the
    * BATCH), and doc ≡ 7 (mod 10) copies ONLY keyframe 0 of the
    * in-corpus doc − 3 — one shared scene, below the
    * matched-keyframe threshold, must ADMIT. One line (stripMargin
    * rule).
    */
  private val IncVLum =
    "(CAST(('0x' || substr(md5((CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 WHEN doc_id % 10 = 5 THEN doc_id - 2 WHEN doc_id % 10 = 7 AND kf.range = 0 THEN doc_id - 3 ELSE doc_id END)::VARCHAR || '_' || (kf.range * 2)::VARCHAR || '_' || r.range::VARCHAR), 1, 2)) AS BIGINT) + CASE WHEN doc_id % 10 IN (1, 5) AND kf.range = 0 AND r.range = 0 THEN 8 ELSE 0 END) % 256"

  /** Spark-side source-video id per sync sample for the incremental
    * model (mirrors [[IncVLum]]).
    */
  private def incVid(id: Column, s: Int): Column = {
    val m10 = pmod(id, lit(10))
    val common = when(m10 === 1, id - 1).when(m10 === 5, id - 2)
    if (s == 0) common.when(m10 === 7, id - 3).otherwise(id)
    else common.otherwise(id)
  }

  /** Incremental admission of a video batch against a persisted corpus
    * bucket index
    * ([[graft.ext.VideoFingerprint.incrementalVideoDedup]]): banded
    * per-keyframe candidates, exact verify, matched-keyframe census ≥ 2
    * on both sides, corpus representative first. The oracle replays the
    * census through its own 8 × 8-bit banding (both sides guarantee
    * recall at Hamming ≤ 3) over corpus and peer edges symmetrically.
    */
  val qDedupIncVideo = QueryDef(
    "q_dedup_inc_video",
    (s, d) => {
      val id = col("doc_id")
      val m10 = pmod(id, lit(10))
      def media(parity: Int) = QueryDef.table(s, d, "documents")
        .filter(pmod(id, lit(2)) === parity)
        .select(id.as("media_id"),
          mp4Payload(smp => (
            lumPrefix(incVid(id, smp), smp),
            if (smp == 0)
              when(m10.isin(1, 5), lit(0)).otherwise(lit(-1))
            else lit(-1),
            lit(8))).as("payload"))
      val index = VideoFingerprint.videoBucketIndex(s, media(0), maxHamming = 3)
      VideoFingerprint.incrementalVideoDedup(s, media(1), index,
          maxHamming = 3, minMatchedKeyframes = 2)
        .orderBy("media_id")
    },
    Some(s"""WITH ${vDhashCtes("", IncVLum)},
            |bands AS (
            |  SELECT doc_id, kf, dhash_bits,
            |         CAST(b.range AS INTEGER) AS band,
            |         substr(dhash_bits, CAST(b.range * 8 + 1 AS INTEGER), 8) AS bk
            |  FROM dbits, range(8) b),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS id1, a.kf AS kf1,
            |         b.doc_id AS id2, b.kf AS kf2,
            |         a.dhash_bits AS h1, b.dhash_bits AS h2
            |  FROM bands a
            |  JOIN bands b ON a.band = b.band AND a.bk = b.bk
            |               AND a.doc_id < b.doc_id),
            |vkf AS MATERIALIZED (
            |  SELECT id1, kf1, id2, kf2 FROM (
            |    SELECT id1, kf1, id2, kf2,
            |           sum(CASE WHEN substr(h1, CAST(j.range AS INTEGER), 1)
            |                      <> substr(h2, CAST(j.range AS INTEGER), 1)
            |               THEN 1 ELSE 0 END) AS hamming
            |    FROM cand, range(1, 65) j
            |    GROUP BY 1, 2, 3, 4) h
            |  WHERE hamming <= 3),
            |sym AS (
            |  SELECT id1 AS src, kf1 AS skf, id2 AS dst, kf2 AS dkf FROM vkf
            |  UNION ALL SELECT id2, kf2, id1, kf1 FROM vkf),
            |census AS MATERIALIZED (
            |  SELECT src, dst,
            |         count(DISTINCT skf) AS m1, count(DISTINCT dkf) AS m2
            |  FROM sym GROUP BY 1, 2
            |  HAVING least(count(DISTINCT skf), count(DISTINCT dkf)) >= 2),
            |crep AS (SELECT src, min(dst) AS c FROM census
            |         WHERE src % 2 = 1 AND dst % 2 = 0 GROUP BY src),
            |brep AS (SELECT src, min(dst) AS b FROM census
            |         WHERE src % 2 = 1 AND dst % 2 = 1 GROUP BY src)
            |SELECT o.doc_id AS media_id,
            |       COALESCE(c.c, least(COALESCE(b.b, o.doc_id), o.doc_id))
            |         AS rep_id,
            |       COALESCE(c.c, least(COALESCE(b.b, o.doc_id), o.doc_id))
            |         <> o.doc_id AS is_dup
            |FROM (SELECT DISTINCT doc_id FROM dbits WHERE doc_id % 2 = 1) o
            |LEFT JOIN crep c ON c.src = o.doc_id
            |LEFT JOIN brep b ON b.src = o.doc_id
            |ORDER BY media_id""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(qVideoPhash, qDedupVideo, qVideoScenecut, qDedupIncVideo)
}
