package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ext.AudioFingerprint

/** Perceptual audio fingerprint gate queries — the [[ImageQueries]]
  * recipe for sound: the test clips are 512-sample PCM WAVs synthesized
  * in BOTH engines from the same generative waveform — sample `t` is
  * byte `t mod 16` of md5("<doc>_<t div 16>") signed by − 128 (md5
  * noise; an affine-in-doc_id model would differ between docs only by
  * a constant offset, invisible to the k ≥ 1 DFT bins) — but the two
  * sides exercise DIFFERENT code. Spark builds the actual WAV bytes (RIFF +
  * fmt + data, 8-bit mono for most docs and 16-bit mono for
  * doc_id ≡ 0 (mod 3) — both decoder depth paths run at every sf) and
  * pushes them through the REAL chunk-walk decoder and integer DFT
  * ([[graft.ext.AudioFingerprint.decodePcm8]] → bandEnergies →
  * fingerprint), while the DuckDB oracle never sees a byte: it replays
  * the DFT/derivative MATH on the waveform model directly, with the
  * SAME quantized cos/sin constants embedded as literals from
  * [[graft.ext.AudioFingerprint.CosT]]/`SinT`. A decode or transform
  * bug on either path breaks the hash compare.
  *
  * Fingerprints travel as 56-char '0'/'1' strings (MSB first), so the
  * near-dup oracle can band by substring, exactly like the image
  * queries.
  */
object AudioQueries {

  private def le16(v: Int): String =
    f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
  private def le32(v: Int): String =
    le16(v & 0xffff) + le16((v >>> 16) & 0xffff)

  /** Canonical 44-byte WAV header for 512 mono samples at `bits` depth. */
  private def headerHex(bits: Int): String = {
    val dataBytes = 512 * bits / 8
    "52494646" + le32(36 + dataBytes) + "57415645" +
      "666D7420" + le32(16) + le16(1) + le16(1) +
      le32(8000) + le32(8000 * bits / 8) + le16(bits / 8) + le16(bits) +
      "64617461" + le32(dataBytes)
  }

  /** The waveform model, Spark side: sample byte `t` is byte `t mod 16`
    * of md5("<doc>_<t div 16>") (md5-byte noise — spectrally
    * decorrelated across documents, unlike any affine-in-doc_id model,
    * whose per-doc difference is a CONSTANT offset invisible to the
    * k ≥ 1 bins), signed by − 128.
    */
  /** WAV payload under the md5 waveform model: sample byte `t` of
    * source `base` is byte `t mod 16` of md5("<base>_<t div 16>"),
    * optionally perturbed (+`perturbDelta` mod 256) at ONE sample
    * `perturbIdx` (−1 = none) — the planted-twin device; docs ≡ 0
    * (mod 3) encode 16-bit PCM, the rest 8-bit. Rendered by the native
    * one-call codegen raster expression
    * ([[graft.functions.SynthRasterImpl]], optimization r20 — replaces
    * two interpreted 512-element `transform` lambdas per row;
    * bit-equivalence pinned by SynthRasterSpec).
    */
  private def wavPayload(
      base: Column, perturbIdx: Column, perturbDelta: Column): Column = {
    val prefix = concat(base.cast("string"), lit("_"))
    unhex(when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(headerHex(16)),
          graft.functions.SynthRasterFunctions.wav16_raster_hex(
            prefix, perturbIdx, perturbDelta)))
      .otherwise(concat(lit(headerHex(8)),
        graft.functions.SynthRasterFunctions.wav8_raster_hex(
          prefix, perturbIdx, perturbDelta))))
  }

  /** The quantized DFT tables as SQL VALUES rows — the exact longs the
    * implementation multiplies.
    */
  private def ctValues: String =
    (0 until AudioFingerprint.FrameSamples).map { t =>
      s"($t, ${AudioFingerprint.CosT(t)}, ${AudioFingerprint.SinT(t)})"
    }.mkString(", ")

  /** The plain waveform model, oracle side (one line — generated SQL
    * must never start a line with '|').
    */
  private val PlainS =
    "(('0x' || substr(md5(doc_id::VARCHAR || '_' || (t.range // 16)::VARCHAR), CAST((t.range % 16) * 2 + 1 AS INTEGER), 2))::BIGINT - 128)"

  /** Twin model (q_dedup_audio): doc_id ≡ 1 (mod 10) reuses its
    * predecessor's waveform perturbed at sample 0 (byte + 1 mod 256) —
    * a re-encoded near-identical clip.
    */
  private val TwinS =
    "(((('0x' || substr(md5((CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END)::VARCHAR || '_' || (t.range // 16)::VARCHAR), CAST((t.range % 16) * 2 + 1 AS INTEGER), 2))::BIGINT + CASE WHEN doc_id % 10 = 1 AND t.range = 0 THEN 1 ELSE 0 END) % 256) - 128)"

  /** Shared oracle CTEs: waveform → frame×bin integer DFT energies →
    * H&K derivative bits → the 56-char fingerprint string.
    */
  private def fpCtes(sFilter: String, s: String): String =
    s"""samples AS MATERIALIZED (
       |  SELECT doc_id, CAST(t.range AS BIGINT) AS t, $s AS s
       |  FROM documents, range(512) t
       |  $sFilter),
       |ct(t, c, si) AS (VALUES $ctValues),
       |ri AS MATERIALIZED (
       |  SELECT doc_id, samples.t // 64 AS n, k.range AS k,
       |         CAST(sum(s * ct.c) AS BIGINT) AS re,
       |         CAST(sum(s * ct.si) AS BIGINT) AS im
       |  FROM samples CROSS JOIN range(1, 10) k
       |  JOIN ct ON ct.t = ((samples.t % 64) * k.range) % 64
       |  GROUP BY 1, 2, 3),
       |en AS MATERIALIZED (
       |  SELECT doc_id, n, k, re * re + im * im AS e FROM ri),
       |fbits AS (
       |  SELECT cur.doc_id, cur.n, cur.k,
       |         CASE WHEN (cur.e - nk.e) - (pn.e - pnk.e) > 0
       |              THEN '1' ELSE '0' END AS b
       |  FROM en cur
       |  JOIN en nk ON nk.doc_id = cur.doc_id AND nk.n = cur.n
       |             AND nk.k = cur.k + 1
       |  JOIN en pn ON pn.doc_id = cur.doc_id AND pn.n = cur.n - 1
       |             AND pn.k = cur.k
       |  JOIN en pnk ON pnk.doc_id = cur.doc_id AND pnk.n = cur.n - 1
       |              AND pnk.k = cur.k + 1
       |  WHERE cur.k <= 8),
       |fps AS MATERIALIZED (
       |  SELECT doc_id, string_agg(b, '' ORDER BY n DESC, k DESC) AS fp_bits
       |  FROM fbits GROUP BY doc_id)""".stripMargin

  /** Fingerprints over real decoded WAVs (both bit depths) vs the
    * oracle's direct replay. One fifth of the documents keeps the
    * oracle's DFT join bounded.
    */
  val qAudioFingerprint = QueryDef(
    "q_audio_fingerprint",
    (s, d) => {
      val media = QueryDef.table(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(5)) === 0)
        .select(col("doc_id").as("media_id"),
          wavPayload(col("doc_id"), lit(-1), lit(0)).as("payload"))
      AudioFingerprint.audioFingerprints(s, media)
        .select(col("media_id").as("doc_id"),
          lpad(bin(col("fp")), 56, "0").as("fp_bits"))
        .orderBy("doc_id")
    },
    Some(s"""WITH ${fpCtes("WHERE doc_id % 5 = 0", PlainS)}
            |SELECT doc_id, fp_bits FROM fps ORDER BY doc_id""".stripMargin))

  /** Banded near-dup pairs over the full corpus with planted twins:
    * every doc_id ≡ 1 (mod 10) is its predecessor's clip perturbed by
    * one sample — Hamming ≈ 0–1, so each twin pair MUST surface;
    * unrelated waveforms sit near Hamming 28 and must not. Spark bands
    * the long fingerprint low-bits-first, the oracle bands the bit
    * string MSB-first — different layouts, identical verified pair
    * sets (both guarantee recall at Hamming ≤ 6 by pigeonhole over 7
    * bands).
    */
  val qDedupAudio = QueryDef(
    "q_dedup_audio",
    (s, d) => {
      val id = col("doc_id")
      val isTwin = pmod(id, lit(10)) === 1
      val base = when(isTwin, id - 1).otherwise(id)
      val media = QueryDef.table(s, d, "documents")
        .select(id.as("media_id"),
          wavPayload(base,
            when(isTwin, lit(0)).otherwise(lit(-1)), lit(1)).as("payload"))
      AudioFingerprint.audioNearDupPairs(s, media, maxHamming = 3)
        .orderBy("id1", "id2")
    },
    Some(s"""WITH ${fpCtes("", TwinS)},
            |bands AS (
            |  SELECT doc_id, fp_bits,
            |         CAST(b.range AS INTEGER) AS band,
            |         substr(fp_bits, CAST(b.range * 8 + 1 AS INTEGER), 8) AS bk
            |  FROM fps, range(7) b),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
            |         a.fp_bits AS h1, b.fp_bits AS h2
            |  FROM bands a
            |  JOIN bands b ON a.band = b.band AND a.bk = b.bk
            |               AND a.doc_id < b.doc_id),
            |ham AS (
            |  SELECT id1, id2,
            |         CAST(sum(CASE WHEN substr(h1, CAST(j.range AS INTEGER), 1)
            |                         <> substr(h2, CAST(j.range AS INTEGER), 1)
            |                  THEN 1 ELSE 0 END) AS INTEGER) AS hamming
            |  FROM cand, range(1, 57) j
            |  GROUP BY 1, 2)
            |SELECT id1, id2, hamming
            |FROM ham WHERE hamming <= 3
            |ORDER BY id1, id2""".stripMargin))

  /** Incremental-admission model (q_dedup_inc_audio) — the
    * [[ImageQueries.qDedupIncImage]] scenario for sound: the accepted
    * corpus is the EVEN doc_ids (plain waveforms); the arriving batch is
    * the ODD ones, where doc ≡ 1 (mod 10) perturbs the in-corpus
    * predecessor (must be flagged dup vs the CORPUS) and doc ≡ 5
    * (mod 10) perturbs its batch peer doc − 2 (must be flagged dup vs
    * the BATCH with the peer as representative); the remaining odds are
    * strangers and admit. One line (stripMargin rule).
    */
  private val IncS =
    "(((('0x' || substr(md5((CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 WHEN doc_id % 10 = 5 THEN doc_id - 2 ELSE doc_id END)::VARCHAR || '_' || (t.range // 16)::VARCHAR), CAST((t.range % 16) * 2 + 1 AS INTEGER), 2))::BIGINT + CASE WHEN doc_id % 10 IN (1, 5) AND t.range = 0 THEN 1 ELSE 0 END) % 256) - 128)"

  /** Incremental admission of a batch of clips against a persisted
    * corpus bucket index
    * ([[graft.ext.AudioFingerprint.incrementalAudioDedup]]). The oracle
    * replays the verified-pair semantics through its own 7 × 8-bit
    * banding (both sides guarantee recall at Hamming ≤ 3), takes the
    * smallest in-corpus neighbor as authoritative, else the smallest
    * batch peer (self included via the least() fold).
    */
  val qDedupIncAudio = QueryDef(
    "q_dedup_inc_audio",
    (s, d) => {
      val id = col("doc_id")
      val m10 = pmod(id, lit(10))
      val base = when(m10 === 1, id - 1).when(m10 === 5, id - 2).otherwise(id)
      def media(parity: Int) = QueryDef.table(s, d, "documents")
        .filter(pmod(id, lit(2)) === parity)
        .select(id.as("media_id"),
          wavPayload(base,
            when(m10.isin(1, 5), lit(0)).otherwise(lit(-1)), lit(1))
            .as("payload"))
      val index = AudioFingerprint.audioBucketIndex(s, media(0), maxHamming = 3)
      AudioFingerprint.incrementalAudioDedup(s, media(1), index, maxHamming = 3)
        .orderBy("media_id")
    },
    Some(s"""WITH ${fpCtes("", IncS)},
            |bands AS (
            |  SELECT doc_id, fp_bits,
            |         CAST(b.range AS INTEGER) AS band,
            |         substr(fp_bits, CAST(b.range * 8 + 1 AS INTEGER), 8) AS bk
            |  FROM fps, range(7) b),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
            |         a.fp_bits AS h1, b.fp_bits AS h2
            |  FROM bands a
            |  JOIN bands b ON a.band = b.band AND a.bk = b.bk
            |               AND a.doc_id < b.doc_id),
            |vpairs AS MATERIALIZED (
            |  SELECT id1, id2 FROM (
            |    SELECT id1, id2,
            |           sum(CASE WHEN substr(h1, CAST(j.range AS INTEGER), 1)
            |                      <> substr(h2, CAST(j.range AS INTEGER), 1)
            |               THEN 1 ELSE 0 END) AS hamming
            |    FROM cand, range(1, 57) j
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
            |FROM (SELECT doc_id FROM fps WHERE doc_id % 2 = 1) o
            |LEFT JOIN crep c ON c.src = o.doc_id
            |LEFT JOIN brep b ON b.src = o.doc_id
            |ORDER BY media_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qAudioFingerprint, qDedupAudio, qDedupIncAudio)
}
