package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.ImageHash

/** Perceptual image hashing gate queries.
  *
  * The test images are 16×16 top-down 24-bit BMPs synthesized in BOTH
  * engines from the same generative pixel model — luma of pixel
  * `i = y·16 + x` is the first md5 byte of `"<doc_id>_<i>"` — but the
  * two sides exercise DIFFERENT code: Spark builds the actual BMP bytes
  * (header + raster, hex-concat → unhex) and pushes them through the
  * REAL pixel decoder and hash pipeline
  * ([[graft.ext.ImageHash.decodeLuma]] → grids → dHash/aHash/pHash),
  * while the DuckDB oracle never sees a byte: it replays the hash MATH
  * directly on the pixel model (grid floor-means, fixed-point DCT with
  * the SAME quantized cosine constants — embedded as literals from
  * [[graft.ext.ImageHash.CosQ]] — exact medians, bit strings). A decode
  * or hash bug on either path breaks the hash compare.
  *
  * Hashes travel as 64-char '0'/'1' strings (Spark `lpad(bin(h), 64,
  * '0')` renders the long's two's-complement bits; DuckDB assembles the
  * bit string positionally) — no signed-overflow gymnastics, and the
  * near-dup oracle can band by substring.
  */
object ImageQueries {

  /** 54-byte BMP header: 16×16, top-down (height = −16), 24 bpp,
    * BI_RGB, 768-byte raster, no palette.
    */
  private[queries] val BmpHeaderHex: String =
    "424D" +       // magic
      "36030000" + // file size 822 LE
      "00000000" + // reserved
      "36000000" + // raster offset 54 LE
      "28000000" + // BITMAPINFOHEADER size 40 LE
      "10000000" + // width 16 LE
      "F0FFFFFF" + // height -16 LE (top-down)
      "0100" +     // planes
      "1800" +     // 24 bpp
      "00000000" + // BI_RGB
      "00030000" + // raster size 768 LE
      "00000000" + "00000000" + // x/y pixels-per-metre
      "00000000" + "00000000"   // colors used / important

  /** The generative pixel model: luma of pixel `i` for source id `base`
    * is the first md5 byte of "<base>_<i>" — replayed verbatim in the
    * oracle — optionally perturbed (+`perturbDelta` mod 256) at ONE
    * pixel `perturbIdx` (−1 = none), the planted-twin device. Rendered
    * by the native one-call codegen raster expression
    * ([[graft.functions.SynthRasterImpl]], optimization r20 — the
    * interpreted `transform(sequence(...))` lambda it replaces
    * dominated the media gates; bit-equivalence pinned by
    * SynthRasterSpec).
    */
  private def bmpPayload(
      base: org.apache.spark.sql.Column,
      perturbIdx: org.apache.spark.sql.Column,
      perturbDelta: org.apache.spark.sql.Column) =
    unhex(concat(lit(BmpHeaderHex),
      graft.functions.SynthRasterFunctions.bmp_raster_hex(
        concat(base.cast("string"), lit("_")), perturbIdx, perturbDelta)))

  /** x → cx mapping for the 16 → `t` floor-boundary area grid, as SQL
    * VALUES rows — generated from the same formula
    * [[graft.ext.ImageHash.gridAvg]] uses, so the oracle cannot drift
    * from the implementation.
    */
  private[queries] def gridMapValues(t: Int): String =
    (0 until 16).map { x =>
      val c = (0 until t).find(c => x < (c + 1) * 16 / t).get
      s"($x, $c)"
    }.mkString(", ")

  /** The quantized DCT cosine table as SQL VALUES rows — the exact
    * longs [[graft.ext.ImageHash.CosQ]] multiplies.
    */
  private[queries] def cosValues: String =
    (for { k <- 0 until 8; n <- 0 until ImageHash.PhashN }
      yield s"($k, $n, ${ImageHash.CosQ(k)(n)})").mkString(", ")

  /** The plain pixel model: luma = first md5 byte of "<doc_id>_<i>". */
  private val PlainLum =
    "CAST(('0x' || substr(md5(doc_id::VARCHAR || '_' || r.range::VARCHAR), 1, 2)) AS BIGINT)"

  /** Twin model (q_dedup_image): doc_id ≡ 1 (mod 10) reuses its
    * predecessor's pixels perturbed at pixel 0. Single line: a
    * generated SQL line must never START with '|' (stripMargin
    * re-strips it — the round-9 lesson).
    */
  private val TwinLum =
    "(CAST(('0x' || substr(md5((CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END)::VARCHAR || '_' || r.range::VARCHAR), 1, 2)) AS BIGINT) + CASE WHEN doc_id % 10 = 1 AND r.range = 0 THEN 8 ELSE 0 END) % 256"

  /** Triple model (q_image_clusters): doc_id ≡ 1 and ≡ 2 (mod 10) both
    * reuse the base doc_id − (doc_id mod 10), perturbed at pixel 0 and
    * pixel 1 respectively — a 3-node near-dup component per decade
    * (base~t1 Hamming ≤ 1, base~t2 ≤ 2, t1~t2 ≤ 3).
    */
  private val TripleLum =
    "(CAST(('0x' || substr(md5((CASE WHEN doc_id % 10 IN (1, 2) THEN doc_id - doc_id % 10 ELSE doc_id END)::VARCHAR || '_' || r.range::VARCHAR), 1, 2)) AS BIGINT) + CASE WHEN doc_id % 10 = 1 AND r.range = 0 THEN 8 WHEN doc_id % 10 = 2 AND r.range = 1 THEN 8 ELSE 0 END) % 256"

  /** Shared oracle CTE: the pixel model (`lum` = one of the generative
    * expressions above) and the dHash bit string per document.
    */
  private def dhashCtes(pxFilter: String, lum: String): String = {
    s"""px AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(r.range AS BIGINT) AS i,
       |         CAST(r.range % 16 AS BIGINT) AS x,
       |         CAST(r.range // 16 AS BIGINT) AS y,
       |         $lum AS lum
       |  FROM documents, range(256) r
       |  $pxFilter),
       |mapx9(mx, cx) AS (VALUES ${gridMapValues(9)}),
       |g9 AS MATERIALIZED (
       |  SELECT doc_id, y // 2 AS cy, cx,
       |         CAST(sum(lum) AS BIGINT) // count(*) AS g
       |  FROM px JOIN mapx9 ON px.x = mapx9.mx
       |  GROUP BY 1, 2, 3),
       |dbits AS MATERIALIZED (
       |  SELECT doc_id,
       |         string_agg(CASE WHEN gr > gl THEN '1' ELSE '0' END, ''
       |                    ORDER BY cy, cx) AS dhash_bits
       |  FROM (SELECT l.doc_id, l.cy, l.cx, l.g AS gl, r.g AS gr
       |        FROM g9 l JOIN g9 r
       |          ON l.doc_id = r.doc_id AND l.cy = r.cy AND r.cx = l.cx + 1
       |        WHERE l.cx < 8) cmp
       |  GROUP BY doc_id)""".stripMargin
  }

  /** dHash + aHash + pHash over real decoded BMPs vs the oracle's
    * direct replay of the hash math (see the object scaladoc). One
    * fifth of the documents (doc_id % 5 = 0) keeps the oracle's DCT
    * join bounded.
    */
  val qImagePhash = QueryDef(
    "q_image_phash",
    (s, d) => {
      val media = QueryDef.table(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(5)) === 0)
        .select(col("doc_id").as("media_id"),
          bmpPayload(col("doc_id"), lit(-1), lit(0)).as("payload"))
      ImageHash.imageHashes(s, media)
        .select(col("media_id").as("doc_id"),
          lpad(bin(col("dhash")), 64, "0").as("dhash_bits"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"),
          lpad(bin(col("phash")), 64, "0").as("phash_bits"))
        .orderBy("doc_id")
    },
    Some(s"""WITH ${dhashCtes("WHERE doc_id % 5 = 0", PlainLum)},
            |g8 AS MATERIALIZED (
            |  SELECT doc_id, y // 2 AS cy, x // 2 AS cx,
            |         CAST(sum(lum) AS BIGINT) // count(*) AS g
            |  FROM px GROUP BY 1, 2, 3),
            |amean AS (SELECT doc_id, CAST(sum(g) AS BIGINT) // 64 AS m
            |          FROM g8 GROUP BY doc_id),
            |abits AS (
            |  SELECT g8.doc_id,
            |         string_agg(CASE WHEN g > m THEN '1' ELSE '0' END, ''
            |                    ORDER BY cy, cx) AS ahash_bits
            |  FROM g8 JOIN amean ON g8.doc_id = amean.doc_id
            |  GROUP BY g8.doc_id),
            |ct(k, n, c) AS (VALUES $cosValues),
            |f AS MATERIALIZED (
            |  SELECT doc_id, cv.k AS v, cu.k AS u,
            |         CAST(sum(lum * cu.c * cv.c) AS BIGINT) AS fv
            |  FROM px
            |  JOIN ct cu ON cu.n = px.x
            |  JOIN ct cv ON cv.n = px.y
            |  GROUP BY 1, 2, 3),
            |med AS (
            |  SELECT doc_id, fv AS m
            |  FROM (SELECT doc_id, fv,
            |               row_number() OVER (PARTITION BY doc_id
            |                                  ORDER BY fv) AS rn
            |        FROM f WHERE NOT (u = 0 AND v = 0)) ranked
            |  WHERE rn = 32),
            |pbits AS (
            |  SELECT f.doc_id,
            |         string_agg(CASE WHEN u = 0 AND v = 0 THEN '0'
            |                         WHEN fv > m THEN '1' ELSE '0' END, ''
            |                    ORDER BY v, u) AS phash_bits
            |  FROM f JOIN med ON f.doc_id = med.doc_id
            |  GROUP BY f.doc_id)
            |SELECT doc_id, dhash_bits, ahash_bits, phash_bits
            |FROM dbits
            |JOIN abits USING (doc_id)
            |JOIN pbits USING (doc_id)
            |ORDER BY doc_id""".stripMargin))

  /** Banded dHash near-dup pairs over the full corpus, with planted
    * twins: every doc_id ≡ 1 (mod 10) reuses its predecessor's pixel
    * model perturbed at pixel 0 (+8 mod 256) — Hamming ≤ 1 by
    * construction, so each twin pair MUST surface; unrelated md5
    * patterns sit near Hamming 32 and must not. The gate pins the
    * SCALE-SAFE default — maxHamming 3 with 4 × 16-bit auto-banding
    * ([[graft.ext.HammingBands]]) — so the benched shape is the one a
    * corpus-scale run uses. Spark bands the long hash low-bits-first
    * in 4 × 16-bit bands; the oracle bands the bit string MSB-first in
    * 8 × 8-bit bands — the layouts differ but BOTH guarantee recall at
    * Hamming ≤ 3 (pigeonhole), so after the `hamming <= 3` verify the
    * pair sets are identical.
    */
  val qDedupImage = QueryDef(
    "q_dedup_image",
    (s, d) => {
      val id = col("doc_id")
      val isTwin = pmod(id, lit(10)) === 1
      val base = when(isTwin, id - 1).otherwise(id)
      val media = QueryDef.table(s, d, "documents")
        .select(id.as("media_id"),
          bmpPayload(base,
            when(isTwin, lit(0)).otherwise(lit(-1)), lit(8)).as("payload"))
      ImageHash.imageNearDupPairs(s, media, maxHamming = 3)
        .orderBy("id1", "id2")
    },
    Some(s"""WITH ${dhashCtes("", TwinLum)},
            |bands AS (
            |  SELECT doc_id, dhash_bits,
            |         CAST(b.range AS INTEGER) AS band,
            |         substr(dhash_bits, CAST(b.range * 8 + 1 AS INTEGER), 8) AS bk
            |  FROM dbits, range(8) b),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
            |         a.dhash_bits AS h1, b.dhash_bits AS h2
            |  FROM bands a
            |  JOIN bands b ON a.band = b.band AND a.bk = b.bk
            |               AND a.doc_id < b.doc_id),
            |ham AS (
            |  SELECT id1, id2,
            |         CAST(sum(CASE WHEN substr(h1, CAST(j.range AS INTEGER), 1)
            |                         <> substr(h2, CAST(j.range AS INTEGER), 1)
            |                  THEN 1 ELSE 0 END) AS INTEGER) AS hamming
            |  FROM cand, range(1, 65) j
            |  GROUP BY 1, 2)
            |SELECT id1, id2, hamming
            |FROM ham WHERE hamming <= 3
            |ORDER BY id1, id2""".stripMargin))

  /** Transitive image near-dup components over verified pairs, with
    * planted 3-node chains: per decade, doc_id ≡ 1 and ≡ 2 (mod 10)
    * both perturb the decade base's pixels (pixels 0 and 1), so
    * {base, t1, t2} must collapse into one cluster labeled by the base
    * id. The oracle replays the pair machinery then unrolls 4
    * min-label-propagation rounds as chained CTEs (diameter here is 2;
    * the slack rounds prove stability at the fixpoint).
    */
  val qImageClusters = QueryDef(
    "q_image_clusters",
    (s, d) => {
      val id = col("doc_id")
      val m10 = pmod(id, lit(10))
      val isPerturbed = m10.isin(1, 2)
      val base = when(isPerturbed, id - m10).otherwise(id)
      val media = QueryDef.table(s, d, "documents")
        .select(id.as("media_id"),
          bmpPayload(base,
            when(m10 === 1, lit(0)).when(m10 === 2, lit(1)).otherwise(lit(-1)),
            lit(8)).as("payload"))
      ImageHash.imageDupClusters(s, media, maxHamming = 3, iters = 4)
        .orderBy("media_id")
    },
    Some {
      val labSteps = (1 to 4).map { t =>
        s"""lab$t AS MATERIALIZED (
           |  SELECT l.media_id,
           |         least(l.cluster_id, COALESCE(m.mn, l.cluster_id)) AS cluster_id
           |  FROM lab${t - 1} l
           |  LEFT JOIN (SELECT e.id1 AS media_id, min(p.cluster_id) AS mn
           |             FROM edges e JOIN lab${t - 1} p ON p.media_id = e.id2
           |             GROUP BY 1) m ON m.media_id = l.media_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${dhashCtes("", TripleLum)},
         |bands AS (
         |  SELECT doc_id, dhash_bits,
         |         CAST(b.range AS INTEGER) AS band,
         |         substr(dhash_bits, CAST(b.range * 8 + 1 AS INTEGER), 8) AS bk
         |  FROM dbits, range(8) b),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
         |         a.dhash_bits AS h1, b.dhash_bits AS h2
         |  FROM bands a
         |  JOIN bands b ON a.band = b.band AND a.bk = b.bk
         |               AND a.doc_id < b.doc_id),
         |vpairs AS MATERIALIZED (
         |  SELECT id1, id2 FROM (
         |    SELECT id1, id2,
         |           sum(CASE WHEN substr(h1, CAST(j.range AS INTEGER), 1)
         |                      <> substr(h2, CAST(j.range AS INTEGER), 1)
         |               THEN 1 ELSE 0 END) AS hamming
         |    FROM cand, range(1, 65) j
         |    GROUP BY 1, 2) h
         |  WHERE hamming <= 3),
         |edges AS MATERIALIZED (
         |  SELECT id1, id2 FROM vpairs
         |  UNION ALL SELECT id2 AS id1, id1 AS id2 FROM vpairs),
         |lab0 AS MATERIALIZED (
         |  SELECT media_id, media_id AS cluster_id FROM (
         |    SELECT DISTINCT id1 AS media_id FROM edges) ids),
         |$labSteps
         |SELECT media_id, cluster_id FROM lab4 ORDER BY media_id""".stripMargin
    })

  /** Incremental-admission model (q_dedup_inc_image): the accepted
    * corpus is the EVEN doc_ids (plain pixel models); the arriving
    * batch is the ODD ones, where doc ≡ 1 (mod 10) perturbs the
    * in-corpus predecessor (must be flagged dup vs the CORPUS) and
    * doc ≡ 5 (mod 10) perturbs its batch peer doc − 2 (must be flagged
    * dup vs the BATCH with the peer as representative); the remaining
    * odds are strangers and admit. One line (stripMargin rule).
    */
  private val IncLum =
    "(CAST(('0x' || substr(md5((CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 WHEN doc_id % 10 = 5 THEN doc_id - 2 ELSE doc_id END)::VARCHAR || '_' || r.range::VARCHAR), 1, 2)) AS BIGINT) + CASE WHEN doc_id % 10 IN (1, 5) AND r.range = 0 THEN 8 ELSE 0 END) % 256"

  /** Incremental near-dup admission of a batch against a persisted
    * corpus bucket index ([[graft.ext.ImageHash.incrementalImageDedup]]).
    * The oracle replays the verified-pair semantics through its own
    * 8 × 8-bit banding (both sides guarantee recall at Hamming ≤ 3, so
    * the verified sets — and hence the min-representative choices —
    * are identical), takes the smallest in-corpus neighbor as
    * authoritative, else the smallest batch peer (self included).
    */
  val qDedupIncImage = QueryDef(
    "q_dedup_inc_image",
    (s, d) => {
      val id = col("doc_id")
      val m10 = pmod(id, lit(10))
      val base = when(m10 === 1, id - 1).when(m10 === 5, id - 2).otherwise(id)
      def media(parity: Int) = QueryDef.table(s, d, "documents")
        .filter(pmod(id, lit(2)) === parity)
        .select(id.as("media_id"),
          bmpPayload(base,
            when(m10.isin(1, 5), lit(0)).otherwise(lit(-1)),
            lit(8)).as("payload"))
      val index = ImageHash.imageBucketIndex(s, media(0), maxHamming = 3)
      ImageHash.incrementalImageDedup(s, media(1), index, maxHamming = 3)
        .orderBy("media_id")
    },
    Some(s"""WITH ${dhashCtes("", IncLum)},
            |bands AS (
            |  SELECT doc_id, dhash_bits,
            |         CAST(b.range AS INTEGER) AS band,
            |         substr(dhash_bits, CAST(b.range * 8 + 1 AS INTEGER), 8) AS bk
            |  FROM dbits, range(8) b),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
            |         a.dhash_bits AS h1, b.dhash_bits AS h2
            |  FROM bands a
            |  JOIN bands b ON a.band = b.band AND a.bk = b.bk
            |               AND a.doc_id < b.doc_id),
            |vpairs AS MATERIALIZED (
            |  SELECT id1, id2 FROM (
            |    SELECT id1, id2,
            |           sum(CASE WHEN substr(h1, CAST(j.range AS INTEGER), 1)
            |                      <> substr(h2, CAST(j.range AS INTEGER), 1)
            |               THEN 1 ELSE 0 END) AS hamming
            |    FROM cand, range(1, 65) j
            |    GROUP BY 1, 2) h
            |  WHERE hamming <= 3),
            |sym AS (
            |  SELECT id1 AS src, id2 AS dst FROM vpairs
            |  UNION ALL SELECT id2 AS src, id1 AS dst FROM vpairs),
            |crep AS (SELECT src, min(dst) AS c FROM sym
            |         WHERE src % 2 = 1 AND dst % 2 = 0 GROUP BY src),
            |brep AS (SELECT src, min(dst) AS b FROM sym
            |         WHERE src % 2 = 1 AND dst % 2 = 1 GROUP BY src)
            |SELECT o.doc_id AS media_id,
            |       COALESCE(c.c, least(COALESCE(b.b, o.doc_id), o.doc_id))
            |         AS rep_id,
            |       COALESCE(c.c, least(COALESCE(b.b, o.doc_id), o.doc_id))
            |         <> o.doc_id AS is_dup
            |FROM (SELECT doc_id FROM dbits WHERE doc_id % 2 = 1) o
            |LEFT JOIN crep c ON c.src = o.doc_id
            |LEFT JOIN brep b ON b.src = o.doc_id
            |ORDER BY media_id""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(qImagePhash, qDedupImage, qImageClusters, qDedupIncImage)
}
