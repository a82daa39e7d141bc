package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-ensemble reranking: reciprocal-rank fusion of two rankings
  * (Cormack, Clarke & Büttcher, SIGIR 2009 — the standard hybrid-search
  * combiner for lexical + dense retrieval) and maximal-marginal-
  * relevance diversified selection (Carbonell & Goldstein, SIGIR 1998 —
  * the de-duplicating top-k that keeps a RAG context window or a
  * training-example draw from filling up with near-identical hits).
  *
  * Both are exactly replayable: RRF scores are integer
  * `floor(10¹² / (k0 + rank))` sums (rank arithmetic only — no floats
  * cross an engine boundary), and MMR's greedy trajectory runs a FIXED
  * k steps over bit-identical cosine doubles with id tiebreaks, so the
  * oracle unrolls the selection loop as chained CTEs.
  */
object Rerank {

  /** Reciprocal-rank fusion of two per-query rankings: fused score =
    * Σ over rankings of `10¹² div (k0 + rank)`, summed over the
    * rankings that contain the document (a document in only one list
    * still scores — the fusion's whole point), then the global top-k
    * by (score DESC, id ASC).
    *
    * Scale shape: one full-outer join on (query, id) — both inputs are
    * already top-N-per-query frames, so the join is k-bounded per
    * query, never corpus-sized; the final top-k is a rank-limited
    * window (WindowGroupLimit).
    *
    * @param a,b rankings carrying `qCol`, `idCol`, and a 1-based
    *            `rankCol`
    * @param k0  the RRF smoothing constant (60 in the paper)
    */
  def rrfFuse(
      a: DataFrame, b: DataFrame, qCol: String, idCol: String,
      rankCol: String, k0: Int = 60, topK: Int = 10): DataFrame = {
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    def contrib(df: DataFrame, out: String) =
      df.select(col(qCol).as("_q"), col(idCol).as("_id"),
        expr(s"1000000000000L div (${k0}L + $rankCol)").as(out))
    val fused = contrib(a, "_ra").join(contrib(b, "_rb"),
        Seq("_q", "_id"), "full_outer")
      .select(col("_q"), col("_id"),
        (coalesce(col("_ra"), lit(0L)) + coalesce(col("_rb"), lit(0L)))
          .as("rrf_q"),
        col("_ra").isNotNull.as("in_a"), col("_rb").isNotNull.as("in_b"))
    val w = Window.partitionBy("_q").orderBy(col("rrf_q").desc, col("_id"))
    fused.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topK)
      .select(col("_q").as(qCol), col("_id").as(idCol),
        col("rrf_q"), col("in_a"), col("in_b"), col("_rn").as("fused_rank"))
  }

  /** Maximal-marginal-relevance selection: greedily pick `k` items per
    * query from a BOUNDED candidate frame, each step taking the
    * argmax of `λ·rel − (1−λ)·max_{s∈selected} sim(cand, s)` (ties by
    * id). The pairwise candidate similarity matrix is computed ONCE
    * (quadratic only within each query's candidate list — the caller
    * bounds it, e.g. a dense top-20), then the k steps are k joins +
    * rank windows over that bounded frame. Both λ weights are closed
    * over as DOUBLES here (never re-derived as `1 − λ` inside an
    * engine, where the subtraction would not round-trip a decimal
    * literal).
    *
    * @param cands (qCol, idCol, vecCol, relCol) — relevance already
    *              computed (e.g. cosine to the query vector)
    * @return (qCol, step, idCol, mmr) — the selection trajectory
    */
  def mmrSelect(
      cands: DataFrame, qCol: String, idCol: String, vecCol: String,
      relCol: String, k: Int, lambdaPerMille: Int = 700): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaPerMille >= 0 && lambdaPerMille <= 1000,
      s"lambdaPerMille must be in [0, 1000], got $lambdaPerMille")
    val lam = lambdaPerMille / 1000.0
    val inv = (1000 - lambdaPerMille) / 1000.0
    val rels = cands.select(col(qCol).as("_q"), col(idCol).as("_id"),
        col(relCol).cast("double").as("_rel"))
      .localCheckpoint(true) // every step's remaining-candidate side
    val vecs = cands.select(col(qCol).as("_q"), col(idCol).as("_id"),
      col(vecCol).as("_v"))
    val sims = vecs.select(col("_q"), col("_id").as("_a"), col("_v").as("_va"))
      .join(vecs.select(col("_q"), col("_id").as("_b"), col("_v").as("_vb")),
        Seq("_q"))
      .where(col("_a") =!= col("_b"))
      .select(col("_q"), col("_a"), col("_b"),
        Similarity.cosine(col("_va"), col("_vb")).as("_sim"))
      .localCheckpoint(true) // re-read at every step
    def pick(scored: DataFrame, step: Int): DataFrame = {
      val w = Window.partitionBy("_q").orderBy(col("_mmr").desc, col("_id"))
      scored.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("_q"), lit(step).as("step"), col("_id"), col("_mmr"))
    }
    var selected = pick(rels.withColumn("_mmr", col("_rel")), 1)
      .localCheckpoint(true)
    var t = 2
    while (t <= k) {
      val maxSim = sims
        .join(selected.select(col("_q"), col("_id").as("_a")), Seq("_q", "_a"))
        .groupBy(col("_q"), col("_b").as("_id"))
        .agg(max(col("_sim")).as("_mx"))
      val remaining = rels
        .join(selected.select("_q", "_id"), Seq("_q", "_id"), "left_anti")
      val scored = remaining.join(maxSim, Seq("_q", "_id"))
        .withColumn("_mmr", lit(lam) * col("_rel") - lit(inv) * col("_mx"))
      selected = selected.union(pick(scored, t)).localCheckpoint(true)
      t += 1
    }
    selected.select(col("_q").as(qCol), col("step"), col("_id").as(idCol),
      col("_mmr").as("mmr"))
  }
}
