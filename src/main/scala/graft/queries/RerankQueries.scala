package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Relevance, Rerank, Similarity}

/** Hybrid-retrieval reranking gate queries ([[graft.ext.Rerank]]):
  * reciprocal-rank fusion of a dense (cosine) and a lexical (BM25)
  * ranking over the SAME id space (`vec_id` = `doc_id` in the
  * testdata), and MMR diversified selection over a dense candidate
  * list. RRF is pure integer rank arithmetic; MMR's greedy trajectory
  * is unrolled in the oracle as chained argmax CTEs over bit-identical
  * cosine doubles.
  */
object RerankQueries {

  private val Terms = Seq("spark", "vector", "stream")
  private val DenseK = 20

  private def embs(s: org.apache.spark.sql.SparkSession, d: String) =
    QueryDef.table(s, d, "embeddings")
  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    QueryDef.table(s, d, "documents")

  /** Dense leg: exact cosine top-20 per probe (vec_id < 3), ranked. */
  private def denseRanked(s: org.apache.spark.sql.SparkSession, d: String) = {
    val e = embs(s, d).select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", DenseK)
      .withColumn("rank", row_number().over(w))
  }

  /** The dense-leg oracle: per-probe cosine rank list (the
    * [[ExtensionQueries.vecListCtes]] fold recipe), `rn` ≤ 20.
    */
  private val denseCtes: String =
    s"""ddots AS (
       |  SELECT p.vec_id AS q_id, e.vec_id AS vec_id,
       |         ${ExtensionQueries.dotSql("p", "e")} AS dot
       |  FROM vl p JOIN vl e ON e.vec_id <> p.vec_id
       |  WHERE p.vec_id < 3),
       |dcos AS (
       |  SELECT q_id, d.vec_id, d.dot / (nq.nrm * ne.nrm) AS c
       |  FROM ddots d
       |  JOIN vnorms nq ON d.q_id = nq.vec_id
       |  JOIN vnorms ne ON d.vec_id = ne.vec_id),
       |dranked AS MATERIALIZED (
       |  SELECT q_id, vec_id, c, rn FROM (
       |    SELECT q_id, vec_id, c, row_number() OVER (
       |      PARTITION BY q_id ORDER BY c DESC, vec_id) AS rn
       |    FROM dcos) r
       |  WHERE rn <= $DenseK)""".stripMargin

  /** The lexical-leg oracle: the established Okapi BM25 replay
    * ([[ExtensionQueries.qBm25TopK]]'s block) ranked by the integer
    * micro-score with id tiebreak, top-25.
    */
  private val lexCtes: String =
    """toks AS (
      |  SELECT doc_id, u.term
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |        FROM documents WHERE text IS NOT NULL) s,
      |       unnest(s.t) AS u(term)
      |  WHERE u.term <> ''),
      |dl AS (SELECT doc_id,
      |         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                         x -> x <> '')) AS dl
      |       FROM documents WHERE text IS NOT NULL),
      |stats AS (SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl
      |          FROM dl),
      |qtoks AS (SELECT doc_id, term FROM toks
      |          WHERE term IN ('spark', 'vector', 'stream')),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM qtoks GROUP BY 1, 2),
      |dfr AS (SELECT term, count(DISTINCT doc_id) AS doc_freq
      |        FROM qtoks GROUP BY 1),
      |idf AS (SELECT term,
      |          ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5)) AS idf
      |        FROM dfr CROSS JOIN stats),
      |per AS (SELECT tf.doc_id,
      |          idf.idf * (tf.tf * (1.2 + 1)) /
      |            (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
      |            AS s
      |        FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
      |        CROSS JOIN stats),
      |lexscores AS (SELECT doc_id, sum(s) AS score FROM per GROUP BY doc_id),
      |lexranked AS MATERIALIZED (
      |  SELECT doc_id, rn FROM (
      |    SELECT doc_id, row_number() OVER (
      |      ORDER BY CAST(round(score * 1e6, 0) AS BIGINT) DESC, doc_id) AS rn
      |    FROM lexscores) r
      |  WHERE rn <= 25)""".stripMargin

  /** Hybrid search: RRF-fuse the dense and lexical legs per probe
    * (k0 = 60), top-10 — the lexical list is query-level, so it joins
    * every probe (broadcast of a ≤ 25-row frame).
    */
  val qHybridRrf = QueryDef(
    "q_hybrid_rrf",
    (s, d) => {
      val dense = denseRanked(s, d)
        .select(col("q_id"), col("vec_id").as("doc_id"), col("rank"))
      val lex25 = Relevance.bm25TopK(docs(s, d), "doc_id", "text", Terms, k = 25)
      val wLex = Window.orderBy(
        Relevance.microScore(col("score")).desc, col("doc_id"))
      val lexRanked = lex25.withColumn("rank", row_number().over(wLex))
        .select("doc_id", "rank")
      val lexPerQ = embs(s, d).select(col("vec_id").as("q_id"))
        .filter(col("q_id") < 3)
        .crossJoin(broadcast(lexRanked))
      Rerank.rrfFuse(dense, lexPerQ, "q_id", "doc_id", "rank",
          k0 = 60, topK = 10)
        .orderBy("q_id", "doc_id")
    },
    Some(s"""WITH ${ExtensionQueries.vecListCtes()},
            |$denseCtes,
            |$lexCtes,
            |ra AS (SELECT q_id, vec_id AS doc_id,
            |         1000000000000 // (60 + rn) AS sa FROM dranked),
            |rb AS (SELECT q.vec_id AS q_id, l.doc_id,
            |         1000000000000 // (60 + l.rn) AS sb
            |       FROM (SELECT vec_id FROM vl WHERE vec_id < 3) q, lexranked l),
            |fused AS (
            |  SELECT coalesce(a.q_id, b.q_id) AS q_id,
            |         coalesce(a.doc_id, b.doc_id) AS doc_id,
            |         coalesce(a.sa, 0) + coalesce(b.sb, 0) AS rrf_q,
            |         a.doc_id IS NOT NULL AS in_a,
            |         b.doc_id IS NOT NULL AS in_b
            |  FROM ra a FULL OUTER JOIN rb b
            |    ON a.q_id = b.q_id AND a.doc_id = b.doc_id)
            |SELECT q_id, doc_id, rrf_q, in_a, in_b,
            |       CAST(rn AS INTEGER) AS fused_rank
            |FROM (SELECT *, row_number() OVER (
            |        PARTITION BY q_id ORDER BY rrf_q DESC, doc_id) AS rn
            |      FROM fused) f
            |WHERE rn <= 10 ORDER BY q_id, doc_id""".stripMargin))

  private val MmrK = 5
  private val LamD = 700 / 1000.0
  private val InvD = 300 / 1000.0

  /** MMR diversified top-5 per probe over the dense top-20 candidates
    * (λ = 0.7): the oracle unrolls the greedy trajectory — argmax of
    * `0.7·rel − 0.3·max-sim-to-selected` per step, id tiebreak — as
    * chained CTEs over the same fold cosines.
    */
  val qMmrSelect = QueryDef(
    "q_mmr_select",
    (s, d) => {
      val e = embs(s, d).select("vec_id", "embedding")
      val cands = denseRanked(s, d)
        .select(col("q_id"), col("vec_id"), col("cosine"))
        .join(e, "vec_id")
      Rerank.mmrSelect(cands, "q_id", "vec_id", "embedding", "cosine",
          k = MmrK, lambdaPerMille = 700)
        .orderBy("q_id", "step")
    },
    Some {
      val steps = (2 to MmrK).map { t =>
        s"""cand$t AS (
           |  SELECT r.q_id, r.vec_id, $LamD * r.c - $InvD * m.mx AS sc
           |  FROM dranked r
           |  JOIN (SELECT s.q_id, s.b AS vec_id, max(s.sim) AS mx
           |        FROM msims s JOIN selu${t - 1} u
           |          ON u.q_id = s.q_id AND u.vec_id = s.a
           |        GROUP BY 1, 2) m
           |    ON m.q_id = r.q_id AND m.vec_id = r.vec_id
           |  LEFT JOIN selu${t - 1} u2
           |    ON u2.q_id = r.q_id AND u2.vec_id = r.vec_id
           |  WHERE u2.vec_id IS NULL),
           |sel$t AS MATERIALIZED (
           |  SELECT q_id, $t AS step, vec_id, sc AS mmr FROM (
           |    SELECT q_id, vec_id, sc, row_number() OVER (
           |      PARTITION BY q_id ORDER BY sc DESC, vec_id) AS rn
           |    FROM cand$t) r
           |  WHERE rn = 1),
           |selu$t AS (SELECT q_id, vec_id FROM selu${t - 1}
           |           UNION ALL SELECT q_id, vec_id FROM sel$t)""".stripMargin
      }.mkString(",\n")
      val unionAll = (1 to MmrK).map(t => s"SELECT * FROM sel$t")
        .mkString(" UNION ALL ")
      s"""WITH ${ExtensionQueries.vecListCtes()},
         |$denseCtes,
         |msims AS MATERIALIZED (
         |  SELECT a.q_id, a.vec_id AS a, b.vec_id AS b,
         |         ${ExtensionQueries.dotSql("x", "y")} / (n1.nrm * n2.nrm) AS sim
         |  FROM dranked a
         |  JOIN dranked b ON b.q_id = a.q_id AND b.vec_id <> a.vec_id
         |  JOIN vl x ON x.vec_id = a.vec_id
         |  JOIN vl y ON y.vec_id = b.vec_id
         |  JOIN vnorms n1 ON n1.vec_id = a.vec_id
         |  JOIN vnorms n2 ON n2.vec_id = b.vec_id),
         |sel1 AS MATERIALIZED (
         |  SELECT q_id, 1 AS step, vec_id, c AS mmr FROM (
         |    SELECT q_id, vec_id, c, row_number() OVER (
         |      PARTITION BY q_id ORDER BY c DESC, vec_id) AS rn
         |    FROM dranked) r
         |  WHERE rn = 1),
         |selu1 AS (SELECT q_id, vec_id FROM sel1),
         |$steps
         |SELECT q_id, CAST(step AS INTEGER) AS step, vec_id, mmr
         |FROM ($unionAll) allsel ORDER BY q_id, step""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(qHybridRrf, qMmrSelect)
}
