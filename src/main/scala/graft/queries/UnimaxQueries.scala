package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.CorpusSampling

/** UniMax mixture gate queries ([[graft.ext.CorpusSampling.unimaxBudgets]]):
  * the exact-integer water-fill replayed as chained CTE steps — one per
  * (cap asc, lang asc) rank position, each taking
  * `min(cap, remaining div strataLeft)` — unrolled to [[MaxSteps]]
  * strata (the query wiring fails loudly if the corpus ever carries
  * more), then the selection replay shares q_sample_token_budget's
  * deterministic-order cumulative window with a per-language budget
  * join.
  */
object UnimaxQueries {

  private val MaxEpochs = 2L
  private val TotalBudget = 8000L
  private val MaxSteps = 8

  private def budgetsCtes: String = {
    val steps = (1 to MaxSteps).map { i =>
      val prevRemaining =
        if (i == 1) "(SELECT remaining FROM u0)"
        else s"(SELECT remaining FROM r${i - 1})"
      s"""u$i AS MATERIALIZED (
         |  SELECT r.lang, r.c, r.cap,
         |         LEAST(r.cap, $prevRemaining
         |               // ((SELECT l FROM nl) - ${i - 1})) AS b
         |  FROM ranked r WHERE r.rk = $i),
         |r$i AS (SELECT COALESCE(
         |          $prevRemaining - (SELECT b FROM u$i),
         |          $prevRemaining) AS remaining)""".stripMargin
    }.mkString(",\n")
    val union = (1 to MaxSteps)
      .map(i => s"SELECT lang, c, cap, b FROM u$i")
      .mkString("\n  UNION ALL ")
    s"""ltot AS MATERIALIZED (
       |  SELECT lang,
       |         CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
       |              AS BIGINT) AS c
       |  FROM documents
       |  WHERE text IS NOT NULL AND lang IS NOT NULL
       |  GROUP BY 1),
       |ranked AS MATERIALIZED (
       |  SELECT lang, c, c * $MaxEpochs AS cap,
       |         CAST(row_number() OVER (ORDER BY c * $MaxEpochs, lang)
       |              AS BIGINT) AS rk
       |  FROM ltot),
       |nl AS (SELECT CAST(count(*) AS BIGINT) AS l FROM ranked),
       |u0 AS (SELECT CAST($TotalBudget AS BIGINT) AS remaining),
       |$steps,
       |budgets AS MATERIALIZED (
       |  $union)""".stripMargin
  }

  /** The allocation artifact: per language, available tokens, the
    * epoch cap, and the water-filled budget.
    */
  val qUnimaxBudgets = QueryDef(
    "q_unimax_budgets",
    (s, d) => {
      val docs = QueryDef.table(s, d, "documents")
      val nLangs = docs.where(col("lang").isNotNull).select("lang")
        .distinct().count()
      require(nLangs <= MaxSteps,
        s"oracle unrolls $MaxSteps water-fill steps, corpus has $nLangs langs")
      import s.implicits._
      CorpusSampling.unimaxBudgets(docs, "lang", "text",
          MaxEpochs, TotalBudget)
        .toDF("lang", "available", "cap", "budget")
        .orderBy("lang")
    },
    Some(s"""WITH $budgetsCtes
            |SELECT lang, c AS available, cap, b AS budget
            |FROM budgets ORDER BY lang""".stripMargin))

  /** The selected mixture: q_sample_token_budget's deterministic
    * cumulative window, capped per language by the water-filled budget.
    */
  val qUnimaxSample = QueryDef(
    "q_unimax_sample",
    (s, d) => CorpusSampling.unimaxSample(
        QueryDef.table(s, d, "documents"), "lang", "text", "doc_id",
        MaxEpochs, TotalBudget)
      .select("doc_id", "lang", "n_tokens")
      .orderBy("doc_id"),
    Some(s"""WITH $budgetsCtes
            |SELECT doc_id, t.lang AS lang, n_tokens FROM (
            |  SELECT doc_id, lang,
            |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
            |      AS n_tokens,
            |    sum(CAST(len(regexp_split_to_array(trim(text), '\\s+'))
            |        AS BIGINT))
            |      OVER (PARTITION BY lang ORDER BY md5(text) NULLS FIRST,
            |            doc_id ROWS UNBOUNDED PRECEDING) AS cum
            |  FROM documents) t
            |JOIN budgets bg ON bg.lang = t.lang AND bg.b >= 1
            |WHERE t.cum <= bg.b
            |ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qUnimaxBudgets, qUnimaxSample)
}
