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
    Some(s"""WITH ${ExtensionQueries.vecListCtes()},
            |sl AS MATERIALIZED (
            |  SELECT vl.vec_id, dl, nrm FROM vl
            |  JOIN vnorms ON vnorms.vec_id = vl.vec_id
            |  JOIN documents d ON d.doc_id = vl.vec_id
            |  WHERE d.lang = 'en'),
            |tl AS MATERIALIZED (
            |  SELECT vl.vec_id, dl, nrm FROM vl
            |  JOIN vnorms ON vnorms.vec_id = vl.vec_id
            |  JOIN documents d ON d.doc_id = vl.vec_id
            |  WHERE d.lang = 'de'),
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
            |       bb.bb_src = r.src_id AS mutual
            |FROM rk r
            |JOIN sumf ON sumf.src_id = r.src_id
            |JOIN sumb ON sumb.tgt_id = r.tgt_id
            |JOIN bb ON bb.tgt_id = r.tgt_id
            |WHERE r.rnf = 1 AND sf + sb > 0
            |  AND (r.cosq * ${2 * K} * $Scale) // (sf + sb) >= $MinMarginQ
            |ORDER BY r.src_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qBitextMine)
}
