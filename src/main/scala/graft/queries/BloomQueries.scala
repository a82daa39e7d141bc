package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sketches, TextAnalysis}

/** Bloom-filter membership queries ([[graft.ext.Sketches.bloomIndex]] /
  * [[graft.ext.Sketches.bloomScreen]] / [[graft.ext.Dedup.bloomDedup]]):
  * the shuffle-free corpus-membership screen that makes incremental
  * dedup viable at 100 TB (the corpus is summarized ONCE into a
  * ≤ mBits/32-row broadcastable bitset; every later ingest batch
  * screens against it without touching the corpus).
  *
  * Oracle replay: the k bit positions are disjoint 8-hex windows of one
  * salted md5 digest (the count–min idiom), so DuckDB reproduces the
  * filter bit-for-bit: `('0x' || substr(md5(fp || salt), j*8+1, 8))
  * ::BIGINT % m`, words via `bit_or(1::BIGINT << (p % 32))` grouped on
  * `p // 32`. The gate's m is deliberately SMALL (4096 bits for a
  * few-hundred-doc corpus) so false positives actually occur and the
  * two-phase dedup proves it still returns the exact anti-join answer.
  */
object BloomQueries {

  private val MBits = 4096
  private val K = 4
  private val Salt = "graft:bloom"

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    QueryDef.table(s, d, "documents")

  /** Shared oracle CTEs: corpus fingerprints (even doc_id) and the
    * packed word table.
    */
  private val wordsCtes =
    s"""cfp AS MATERIALIZED (
       |  SELECT md5(lower(trim(text))) AS fp FROM documents
       |  WHERE doc_id % 2 = 0 AND text IS NOT NULL),
       |cpos AS (
       |  SELECT ('0x' || substr(md5(fp || '$Salt'), j * 8 + 1, 8))::BIGINT % $MBits AS p
       |  FROM cfp, (VALUES (0), (1), (2), (3)) jj(j)),
       |words AS MATERIALIZED (
       |  SELECT p // 32 AS word_idx, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS word
       |  FROM cpos GROUP BY 1)""".stripMargin

  /** The filter artifact itself: every non-zero 32-bit word of the
    * corpus Bloom bitset. ≤ mBits/32 rows by construction — the thing
    * that broadcasts.
    */
  val qBloomIndex = QueryDef(
    "q_bloom_index",
    (s, d) => {
      val corpus = docs(s, d)
        .filter(col("doc_id") % 2 === 0 && col("text").isNotNull)
        .select(TextAnalysis.fingerprint(col("text")).as("fp"))
      Sketches.bloomIndex(corpus, col("fp"), MBits, K, Salt)
        .orderBy("word_idx")
    },
    Some(s"""WITH $wordsCtes
            |SELECT word_idx, word FROM words ORDER BY word_idx""".stripMargin))

  /** The screen verdicts for an ingest batch: the odd-doc_id docs PLUS
    * planted re-crawls of the first corpus docs (same text, doc_id
    * shifted by 10⁶ — re-ingested content under a new id, the recurring
    * crawl reality), so true membership flows at EVERY sf. The Bloom
    * maybe flag sits next to ground truth: no false negatives is a
    * THEOREM here (exact_seen implies maybe_seen row-by-row in the
    * checked output); false positives appear at the small-m rate.
    */
  val qBloomScreen = QueryDef(
    "q_bloom_screen",
    (s, d) => {
      val all = docs(s, d)
      val corpusFp = all
        .filter(col("doc_id") % 2 === 0 && col("text").isNotNull)
        .select(TextAnalysis.fingerprint(col("text")).as("fp"))
      val index = Sketches.bloomIndex(corpusFp, col("fp"), MBits, K, Salt)
      val batch = all
        .filter(col("doc_id") % 2 === 1 && col("text").isNotNull)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .unionByName(all
          .filter(col("doc_id") % 2 === 0 && col("doc_id") < 20 &&
            col("text").isNotNull)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            TextAnalysis.fingerprint(col("text")).as("fp")))
      Sketches.bloomScreen(index, batch, col("fp"), MBits, K, Salt)
        .join(corpusFp.distinct().withColumn("exact_seen", lit(true)),
          Seq("fp"), "left")
        .select(col("doc_id"), col("maybe_seen"),
          coalesce(col("exact_seen"), lit(false)).as("exact_seen"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $wordsCtes,
            |bfp AS MATERIALIZED (
            |  SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
            |  WHERE doc_id % 2 = 1 AND text IS NOT NULL
            |  UNION ALL
            |  SELECT doc_id + 1000000, md5(lower(trim(text))) FROM documents
            |  WHERE doc_id % 2 = 0 AND doc_id < 20 AND text IS NOT NULL),
            |bpos AS (
            |  SELECT doc_id, fp, ('0x' || substr(md5(fp || '$Salt'), j * 8 + 1, 8))::BIGINT % $MBits AS p
            |  FROM bfp, (VALUES (0), (1), (2), (3)) jj(j)),
            |scr AS (
            |  SELECT doc_id, fp,
            |         min((COALESCE(w.word, 0) >> CAST(p % 32 AS INT)) & 1) AS allb
            |  FROM bpos LEFT JOIN words w ON w.word_idx = p // 32
            |  GROUP BY 1, 2)
            |SELECT s.doc_id, s.allb = 1 AS maybe_seen,
            |       EXISTS (SELECT 1 FROM cfp c WHERE c.fp = s.fp) AS exact_seen
            |FROM scr s ORDER BY s.doc_id""".stripMargin))

  /** Two-phase bloom-screened incremental dedup over the same planted
    * batch: batch rows not present in the corpus, with the exact
    * anti-join probing ONLY the maybe fraction (the planted re-crawls
    * guarantee that stage drops real rows at every sf). The oracle is
    * the plain anti-join — equality IS the no-false-negative proof, at
    * an m small enough that false positives demonstrably flowed through
    * the verify stage.
    */
  val qDedupBloom = QueryDef(
    "q_dedup_bloom",
    (s, d) => {
      val all = docs(s, d)
      val batch = all
        .filter(col("doc_id") % 2 === 1 && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .unionByName(all
          .filter(col("doc_id") % 2 === 0 && col("doc_id") < 20 &&
            col("text").isNotNull)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.bloomDedup(
          batch,
          all.filter(col("doc_id") % 2 === 0 && col("text").isNotNull),
          "text", MBits, K)
        .select("doc_id")
        .orderBy("doc_id")
    },
    Some("""WITH batch AS (
           |  SELECT doc_id, text FROM documents
           |  WHERE doc_id % 2 = 1 AND text IS NOT NULL
           |  UNION ALL
           |  SELECT doc_id + 1000000, text FROM documents
           |  WHERE doc_id % 2 = 0 AND doc_id < 20 AND text IS NOT NULL)
           |SELECT b.doc_id FROM batch b
           |WHERE NOT EXISTS (
           |    SELECT 1 FROM documents c
           |    WHERE c.doc_id % 2 = 0 AND c.text IS NOT NULL
           |      AND md5(lower(trim(c.text))) = md5(lower(trim(b.text))))
           |ORDER BY b.doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qBloomIndex, qBloomScreen, qDedupBloom)
}
