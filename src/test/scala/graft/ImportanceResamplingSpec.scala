package graft

import org.apache.spark.sql.functions._

import graft.ext.ImportanceResampling

/** Behavioral sanity for the DSIR scorer — the oracle gate pins
  * cross-engine exactness; these pin that the importance weights point
  * the right way on controlled vocabulary.
  */
class ImportanceResamplingSpec extends SparkSpec {
  import spark.implicits._

  private val raw = Seq(
    (1L, "alpha beta alpha beta gamma"),
    (2L, "alpha beta beta alpha alpha"),
    (3L, "delta epsilon zeta delta epsilon"),
    (4L, "zeta epsilon delta zeta zeta"),
    (5L, "alpha delta"),
    (6L, null.asInstanceOf[String]),
    (7L, "   ")).toDF("doc_id", "text")
  // target domain speaks the alpha/beta dialect
  private val target = Seq(
    (100L, "alpha beta alpha"),
    (101L, "beta alpha beta beta")).toDF("doc_id", "text")

  test("target-dialect documents outscore off-domain ones") {
    val scores = ImportanceResampling.dsirScores(
        raw, "doc_id", "text", target, dims = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no-feature docs (NULL / whitespace-only text) are absent
    assert(scores.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // pure target-vocabulary docs above the mixed doc, mixed above pure
    // off-domain
    assert(scores(1L) > scores(5L) && scores(2L) > scores(5L))
    assert(scores(5L) > scores(3L) && scores(5L) > scores(4L))
  }

  test("selection is the deterministic top-k cut of the scores") {
    val k = 3
    val sel = ImportanceResampling.dsirSelect(
        raw, "doc_id", "text", target, k = k, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = ImportanceResampling.dsirScores(
        raw, "doc_id", "text", target, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }.take(k)
    assert(sel.sortBy(_._1).toSeq == expect.sortBy(_._1).toSeq)
  }

  test("tempered sampling: T→0 recovers the hard top-k, T→∞ ignores scores") {
    val cold = ImportanceResampling.dsirSample(
        raw, "doc_id", "text", target, k = 2, temperature = 1e-6, dims = 64)
      .collect().map(_.getLong(0)).toSet
    val hard = ImportanceResampling.dsirSelect(
        raw, "doc_id", "text", target, k = 2, dims = 64)
      .collect().map(_.getLong(0)).toSet
    assert(cold == hard, s"cold draw $cold != hard top-k $hard")
    // at huge T the score term vanishes: selection is by draw alone,
    // i.e. identical for ANY target
    val hot1 = ImportanceResampling.dsirSample(
        raw, "doc_id", "text", target, k = 2, temperature = 1e9, dims = 64)
      .collect().map(_.getLong(0)).toSet
    val hot2 = ImportanceResampling.dsirSample(
        raw, "doc_id", "text",
        raw.where(col("doc_id") >= 3), k = 2, temperature = 1e9, dims = 64)
      .collect().map(_.getLong(0)).toSet
    assert(hot1 == hot2, s"hot draws differ: $hot1 vs $hot2")
  }

  test("scores are partitioning-invariant (integer sums over quantized logs)") {
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      ImportanceResampling.dsirScores(df, "doc_id", "text", target, dims = 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = run(raw)
    assert(run(raw.repartition(7)) == base)
    assert(run(raw.orderBy(col("doc_id").desc)) == base)
  }

  test("the Δ table broadcasts — the corpus is never shuffled by bucket models") {
    val plan = ImportanceResampling.dsirScores(
        raw, "doc_id", "text", target, dims = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast Δ join:\n${plan.take(2000)}")
  }
}
