package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Margin-based bitext mining gate query
  * ([[graft.ext.Similarity.bitextMine]]): English documents' embeddings
  * mined against German ones, k = 4 neighborhoods, ratio margin in
  * 10⁻⁶ fixed point. The oracle replays the deterministic-fold cosine
  * (the closed float-flake idiom), the floor quantization, the integer
  * neighborhood sums, and the single integer division.
  */
object BitextQueries {

  private val K = 4
  private val Scale = 1000000L
  private val MinMarginQ = 1000000L

  val qBitextMine = QueryDef(
    "q_bitext_mine",
    (s, d) => {
      val e = QueryDef.table(s, d, "embeddings").select("vec_id", "embedding")
      val langs = QueryDef.table(s, d, "documents")
        .select(col("doc_id"), col("lang"))
      val byLang = e.join(broadcast(langs), e("vec_id") === langs("doc_id"))
      val src = byLang.filter(col("lang") === "en").select("vec_id", "embedding")
      val tgt = byLang.filter(col("lang") === "de").select("vec_id", "embedding")
      Similarity.bitextMine(src, tgt, "vec_id", "embedding",
          k = K, minMarginQ = MinMarginQ, scale = Scale)
        .orderBy("src_id")
    },
    // class-collapsed since r17: each side groups to one representative
    // (min id, class size) per DISTINCT embedding before the cross join,
    // and every mined row carries n_pairs = cnt_src · cnt_tgt — the
    // simhashPairs multiplicity contract applied to mining.
    Some(s"""WITH ${ExtensionQueries.vecListCtes()},
            |srel AS MATERIALIZED (
            |  SELECT min(e.vec_id) AS vec_id, count(*) AS cnt
            |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
            |  WHERE d.lang = 'en' GROUP BY e.embedding),
            |trel AS MATERIALIZED (
            |  SELECT min(e.vec_id) AS vec_id, count(*) AS cnt
            |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
            |  WHERE d.lang = 'de' GROUP BY e.embedding),
            |sl AS MATERIALIZED (
            |  SELECT vl.vec_id, dl, nrm FROM vl
            |  JOIN vnorms ON vnorms.vec_id = vl.vec_id
            |  JOIN srel ON srel.vec_id = vl.vec_id),
            |tl AS MATERIALIZED (
            |  SELECT vl.vec_id, dl, nrm FROM vl
            |  JOIN vnorms ON vnorms.vec_id = vl.vec_id
            |  JOIN trel ON trel.vec_id = vl.vec_id),
            |pairs AS MATERIALIZED (
            |  SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
            |         CAST(floor((${ExtensionQueries.dotSql("s", "t")})
            |              / (s.nrm * t.nrm) * $Scale) AS BIGINT) AS cosq
            |  FROM sl s CROSS JOIN tl t),
            |rk AS MATERIALIZED (
            |  SELECT *,
            |         row_number() OVER (PARTITION BY src_id
            |                            ORDER BY cosq DESC, tgt_id) AS rnf,
            |         row_number() OVER (PARTITION BY tgt_id
            |                            ORDER BY cosq DESC, src_id) AS rnb
            |  FROM pairs),
            |sumf AS (SELECT src_id, CAST(sum(cosq) AS BIGINT) AS sf
            |         FROM rk WHERE rnf <= $K GROUP BY 1),
            |sumb AS (SELECT tgt_id, CAST(sum(cosq) AS BIGINT) AS sb
            |         FROM rk WHERE rnb <= $K GROUP BY 1),
            |bb AS (SELECT tgt_id, src_id AS bb_src FROM rk WHERE rnb = 1)
            |SELECT r.src_id, r.tgt_id, r.cosq AS cos_q,
            |       (r.cosq * ${2 * K} * $Scale) // (sf + sb) AS margin_q,
            |       bb.bb_src = r.src_id AS mutual,
            |       sc.cnt * tc.cnt AS n_pairs
            |FROM rk r
            |JOIN sumf ON sumf.src_id = r.src_id
            |JOIN sumb ON sumb.tgt_id = r.tgt_id
            |JOIN bb ON bb.tgt_id = r.tgt_id
            |JOIN srel sc ON sc.vec_id = r.src_id
            |JOIN trel tc ON tc.vec_id = r.tgt_id
            |WHERE r.rnf = 1 AND sf + sb > 0
            |  AND (r.cosq * ${2 * K} * $Scale) // (sf + sb) >= $MinMarginQ
            |ORDER BY r.src_id""".stripMargin))

  /** The WEB-SCALE mining form ([[Similarity.bitextMineLsh]]): candidate
    * pairs from the 12-table 6-bit hyperplane LSH family with Hamming-1
    * source-side multi-probe (the q_ann_lsh operating point) instead of
    * the |src|·|tgt| cross join — no all-pairs stage anywhere; the
    * margin/mutual tail is identical, with neighborhood sums over the
    * candidate set (the LASER/CCMatrix approximation). Fully
    * hash-checked: the oracle composes the shared xxhash64 signature
    * replay ([[ExtensionQueries.lshSigCtes]]) with the exhaustive
    * oracle's margin tail over the bucket-join candidates.
    */
  private val Bits = 6
  private val Tables = 12

  val qBitextMineLsh = QueryDef(
    "q_bitext_mine_lsh",
    (s, d) => {
      val e = QueryDef.table(s, d, "embeddings").select("vec_id", "embedding")
      val langs = QueryDef.table(s, d, "documents")
        .select(col("doc_id"), col("lang"))
      val byLang = e.join(broadcast(langs), e("vec_id") === langs("doc_id"))
      val src = byLang.filter(col("lang") === "en").select("vec_id", "embedding")
      val tgt = byLang.filter(col("lang") === "de").select("vec_id", "embedding")
      // dedupVectors is deliberately NOT passed: the gate exercises the
      // bare default path, which is the scale-safe collapsed one (r17).
      Similarity.bitextMineLsh(src, tgt, "vec_id", "embedding",
          k = K, minMarginQ = MinMarginQ, scale = Scale,
          bits = Bits, tables = Tables, probeHamming = 1)
        .orderBy("src_id")
    },
    Some {
      val flips = ("lsig" +: (0 until Bits).map(b => s"xor(lsig, ${1L << b})"))
        .mkString(", ")
      s"""WITH corpusrel AS (
         |  SELECT min(e.vec_id) AS vec_id, count(*) AS cnt, e.embedding
         |  FROM embeddings e
         |  JOIN documents d ON d.doc_id = e.vec_id
         |  WHERE d.lang IN ('en', 'de')
         |  GROUP BY d.lang, e.embedding),
         |${ExtensionQueries.lshSigCtes(Bits, Tables)},
         |ssig AS (SELECT l.vec_id, l.t, l.lsig FROM lsigs l
         |         JOIN documents d ON d.doc_id = l.vec_id
         |         WHERE d.lang = 'en'),
         |tsig AS (SELECT l.vec_id, l.t, l.lsig FROM lsigs l
         |         JOIN documents d ON d.doc_id = l.vec_id
         |         WHERE d.lang = 'de'),
         |sprobed AS (SELECT vec_id, t, u.sg FROM ssig,
         |            unnest([$flips]) AS u(sg)),
         |cand AS (SELECT DISTINCT s.vec_id AS src_id, g.vec_id AS tgt_id
         |         FROM sprobed s JOIN tsig g
         |           ON g.t = s.t AND g.lsig = s.sg),
         |bvl AS MATERIALIZED (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl
         |  FROM corpusrel),
         |bnorms AS (SELECT vec_id, sqrt(list_reduce(
         |  list_transform(dl, x -> x * x), (a, b) -> a + b)) AS nrm
         |  FROM bvl),
         |pairs AS MATERIALIZED (
         |  SELECT c.src_id, c.tgt_id,
         |         CAST(floor((${ExtensionQueries.dotSql("x", "y")})
         |              / (n1.nrm * n2.nrm) * $Scale) AS BIGINT) AS cosq
         |  FROM cand c
         |  JOIN bvl x ON x.vec_id = c.src_id
         |  JOIN bvl y ON y.vec_id = c.tgt_id
         |  JOIN bnorms n1 ON n1.vec_id = c.src_id
         |  JOIN bnorms n2 ON n2.vec_id = c.tgt_id),
         |rk AS MATERIALIZED (
         |  SELECT *,
         |         row_number() OVER (PARTITION BY src_id
         |                            ORDER BY cosq DESC, tgt_id) AS rnf,
         |         row_number() OVER (PARTITION BY tgt_id
         |                            ORDER BY cosq DESC, src_id) AS rnb
         |  FROM pairs),
         |sumf AS (SELECT src_id, CAST(sum(cosq) AS BIGINT) AS sf
         |         FROM rk WHERE rnf <= $K GROUP BY 1),
         |sumb AS (SELECT tgt_id, CAST(sum(cosq) AS BIGINT) AS sb
         |         FROM rk WHERE rnb <= $K GROUP BY 1),
         |bb AS (SELECT tgt_id, src_id AS bb_src FROM rk WHERE rnb = 1)
         |SELECT r.src_id, r.tgt_id, r.cosq AS cos_q,
         |       (r.cosq * ${2 * K} * $Scale) // (sf + sb) AS margin_q,
         |       bb.bb_src = r.src_id AS mutual,
         |       sc.cnt * tc.cnt AS n_pairs
         |FROM rk r
         |JOIN sumf ON sumf.src_id = r.src_id
         |JOIN sumb ON sumb.tgt_id = r.tgt_id
         |JOIN bb ON bb.tgt_id = r.tgt_id
         |JOIN corpusrel sc ON sc.vec_id = r.src_id
         |JOIN corpusrel tc ON tc.vec_id = r.tgt_id
         |WHERE r.rnf = 1 AND sf + sb > 0
         |  AND (r.cosq * ${2 * K} * $Scale) // (sf + sb) >= $MinMarginQ
         |ORDER BY r.src_id""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(qBitextMine, qBitextMineLsh)
}
