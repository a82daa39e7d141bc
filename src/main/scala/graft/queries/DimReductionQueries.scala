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

  /** Shared oracle head: quantization, per-dim half-up means, centered
    * elements, and the integer Gram `cov` — the replay of
    * [[DimReduction]]'s gramPass.
    */
  private def pcaHeadCtes(dims: Int): String =
    s"""vecs AS MATERIALIZED (
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
              FROM ce a JOIN ce b ON a.vec_id = b.vec_id GROUP BY 1, 2)"""

  /** Max-normalized power steps `{vp}1..{vp}{iters}` on matrix CTE
    * `covName`, starting from the all-[[DimReduction.PcScale]] vector
    * `{vp}0` — the replay of powerIterate.
    */
  private def powerCtes(dims: Int, covName: String, vp: String): String = {
    val init = s"""${vp}0 AS MATERIALIZED (
              SELECT u.t AS i, CAST(1000000 AS HUGEINT) AS v
              FROM unnest(range($dims)) AS u(t))"""
    val steps = (1 to PcaIters).map { k =>
      val p = k - 1
      s"""${vp}u$k AS MATERIALIZED (
              SELECT $covName.ia AS i, sum($covName.s * v.v) AS u
              FROM $covName JOIN $vp$p v ON $covName.ib = v.i GROUP BY 1),
            ${vp}m$k AS (SELECT max(abs(u)) AS m FROM ${vp}u$k),
            $vp$k AS MATERIALIZED (
              SELECT i, ${halfUpSql("u * 1000000", s"(SELECT m FROM ${vp}m$k)")} AS v
              FROM ${vp}u$k)"""
    }.mkString(",\n            ")
    s"$init,\n            $steps"
  }

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
    Some(s"""WITH ${pcaHeadCtes(JlInDims)},
            ${powerCtes(JlInDims, "cov", "v")}
            SELECT c.vec_id, CAST(sum(c.c * v.v) AS BIGINT) AS pc1q
            FROM ce c JOIN v$PcaIters v ON c.i = v.i
            GROUP BY 1 ORDER BY vec_id"""))

  /** q_embed_pca2: top-2 components via fixed-point Hotelling deflation
    * ([[DimReduction.pcaTrainK]]) — after pc1, the oracle deflates the
    * Gram with the SAME two-step half-up rational (λ = vᵀSv/vᵀv first,
    * then the per-entry correction halfUp(λ·v_a·v_b, vᵀv) — one step
    * would overflow HUGEINT), runs 12 more power steps on the deflated
    * matrix, and projects both components per vector.
    */
  val qEmbedPca2 = QueryDef(
    "q_embed_pca2",
    (s, d) => {
      val e = embs(s, d)
      val model = DimReduction.pcaTrainK(e, "embedding", JlInDims, 2, PcaIters)
      DimReduction.pcaScoresK(e, "vec_id", "embedding", model)
        .orderBy("vec_id")
    },
    Some {
      val it = PcaIters
      s"""WITH ${pcaHeadCtes(JlInDims)},
            ${powerCtes(JlInDims, "cov", "v")},
            dden AS (SELECT sum(v * v) AS den FROM v$it),
            dsv AS MATERIALIZED (
              SELECT cov.ia AS i, sum(cov.s * v.v) AS sv
              FROM cov JOIN v$it v ON cov.ib = v.i GROUP BY 1),
            dnum AS (SELECT sum(v.v * s.sv) AS num
              FROM v$it v JOIN dsv s ON v.i = s.i),
            dlam AS (SELECT ${halfUpSql(
                "(SELECT num FROM dnum)", "(SELECT den FROM dden)")} AS lam),
            cov2 AS MATERIALIZED (
              SELECT c.ia, c.ib,
                c.s - ${halfUpSql(
                  "(SELECT lam FROM dlam) * va.v * vb.v",
                  "(SELECT den FROM dden)")} AS s
              FROM cov c
              JOIN v$it va ON c.ia = va.i
              JOIN v$it vb ON c.ib = vb.i),
            ${powerCtes(JlInDims, "cov2", "w")},
            gswv AS (SELECT sum(w.v * v.v) AS wv
              FROM w$it w JOIN v$it v ON w.i = v.i),
            gsw AS MATERIALIZED (
              SELECT w.i, w.v - ${halfUpSql(
                "(SELECT wv FROM gswv) * v.v", "(SELECT den FROM dden)")} AS v
              FROM w$it w JOIN v$it v ON w.i = v.i),
            gsm AS (SELECT max(abs(v)) AS m FROM gsw),
            wf AS MATERIALIZED (
              SELECT i, ${halfUpSql("v * 1000000", "(SELECT m FROM gsm)")} AS v
              FROM gsw),
            lam1 AS (SELECT ${halfUpSql(
                """(SELECT sum(va.v * c.s * vb.v) FROM cov c
                   JOIN v$IT va ON c.ia = va.i JOIN v$IT vb ON c.ib = vb.i)
                   * 1000000""".replace("$IT", it.toString),
                s"(SELECT den FROM dden)")} AS l),
            lam2 AS (SELECT ${halfUpSql(
                """(SELECT sum(wa.v * c.s * wb.v) FROM cov c
                   JOIN wf wa ON c.ia = wa.i JOIN wf wb ON c.ib = wb.i)
                   * 1000000""",
                "(SELECT sum(v * v) FROM wf)")} AS l),
            sw AS (SELECT (SELECT l FROM lam2) > (SELECT l FROM lam1) AS s)
            SELECT c.vec_id,
              CAST(sum(c.c * (CASE WHEN (SELECT s FROM sw) THEN w.v ELSE v.v END))
                AS BIGINT) AS pc1q,
              CAST(sum(c.c * (CASE WHEN (SELECT s FROM sw) THEN v.v ELSE w.v END))
                AS BIGINT) AS pc2q
            FROM ce c
            JOIN v$it v ON c.i = v.i
            JOIN wf w ON c.i = w.i
            GROUP BY 1 ORDER BY vec_id"""
    })

  val all: Seq[QueryDef] = Seq(qEmbedJl, qEmbedPca, qEmbedPca2)
}
