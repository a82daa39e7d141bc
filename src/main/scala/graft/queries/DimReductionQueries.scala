package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.DimReduction
import QueryDef.table

/** Dimensionality-reduction queries over the embeddings testdata
  * ([[graft.ext.DimReduction]]). The JL oracle embeds the SAME ±1
  * constants the operator uses (both sides generated from
  * [[DimReduction.jlSign]]) and replays the identical left-associative
  * double chain, so the gate is bit-exact with no rounding.
  */
object DimReductionQueries {

  private def embs(s: SparkSession, d: String) = table(s, d, "embeddings")

  /** Shared shape constants for the JL gate query. */
  private[graft] val JlInDims = 64
  private[graft] val JlOutDims = 16

  /** q_embed_jl: JL ±1 projection 64 → 16, bit-exact both engines. */
  val qEmbedJl = QueryDef(
    "q_embed_jl",
    (s, d) => DimReduction.jlProject(
        embs(s, d), "vec_id", "embedding", JlOutDims, JlInDims)
      .orderBy("vec_id"),
    Some {
      val comps = (0 until JlOutDims).map { j =>
        (0 until JlInDims).map { i =>
          val t = s"CAST(embedding[${i + 1}] AS DOUBLE)"
          if (DimReduction.jlSign(j, i) > 0) t else s"-$t"
        }.mkString(" + ") + s" AS p$j"
      }.mkString(",\n              ")
      s"""SELECT vec_id,
              $comps
            FROM embeddings ORDER BY vec_id"""
    })

  /** Bounded iteration count shared by the trainer call and the oracle
    * unroll (the shared-constant discipline).
    */
  private[graft] val PcaIters = 12

  private def halfUpSql(num: String, den: String): String =
    LloydOracles.halfUp(num, den)

  private def scaleElemSql(x: String): String =
    LloydOracles.scaleElem(x)

  /** q_embed_pca: per-vector score on the top principal component from
    * the fixed-point power iteration ([[DimReduction.pcaTrain]] /
    * `pcaScores`). The oracle replays the WHOLE pipeline — element
    * quantization, half-up means, integer centered Gram, 12 max-
    * normalized HUGEINT power steps, final integer projection — as a
    * chained MATERIALIZED CTE unroll (the Lloyd/BPE technique).
    */
  val qEmbedPca = QueryDef(
    "q_embed_pca",
    (s, d) => {
      val e = embs(s, d)
      val model = DimReduction.pcaTrain(e, "embedding", JlInDims, PcaIters)
      DimReduction.pcaScores(e, "vec_id", "embedding", model)
        .orderBy("vec_id")
    },
    Some {
      val dims = JlInDims
      val steps = (1 to PcaIters).map { k =>
        val p = k - 1
        s"""u$k AS MATERIALIZED (
              SELECT cov.ia AS i, sum(cov.s * v.v) AS u
              FROM cov JOIN v$p v ON cov.ib = v.i GROUP BY 1),
            m$k AS (SELECT max(abs(u)) AS m FROM u$k),
            v$k AS MATERIALIZED (
              SELECT i, ${halfUpSql("u * 1000000", s"(SELECT m FROM m$k)")} AS v
              FROM u$k)"""
      }.mkString(",\n            ")
      s"""WITH vecs AS MATERIALIZED (
              SELECT vec_id,
                list_transform(embedding, x -> ${scaleElemSql("x")}) AS xq
              FROM embeddings),
            elems AS MATERIALIZED (
              SELECT vec_id, generate_subscripts(xq, 1) - 1 AS i,
                unnest(xq) AS x
              FROM vecs),
            nn AS (SELECT count(*) AS n FROM vecs),
            mean AS MATERIALIZED (
              SELECT i, ${halfUpSql("sum(x)", "(SELECT n FROM nn)")} AS m
              FROM elems GROUP BY i),
            ce AS MATERIALIZED (
              SELECT e.vec_id, e.i, e.x - m.m AS c
              FROM elems e JOIN mean m USING (i)),
            cov AS MATERIALIZED (
              SELECT a.i AS ia, b.i AS ib, sum(a.c * b.c) AS s
              FROM ce a JOIN ce b ON a.vec_id = b.vec_id GROUP BY 1, 2),
            v0 AS MATERIALIZED (
              SELECT u.t AS i, CAST(1000000 AS HUGEINT) AS v
              FROM unnest(range($dims)) AS u(t)),
            $steps
            SELECT c.vec_id, CAST(sum(c.c * v.v) AS BIGINT) AS pc1q
            FROM ce c JOIN v$PcaIters v ON c.i = v.i
            GROUP BY 1 ORDER BY vec_id"""
    })

  val all: Seq[QueryDef] = Seq(qEmbedJl, qEmbedPca)
}
