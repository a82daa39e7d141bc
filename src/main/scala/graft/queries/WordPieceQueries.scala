package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.WordPieceTrainer

/** WordPiece gate queries: the likelihood-ranked merge loop and the
  * greedy longest-match encoder ([[graft.ext.WordPieceTrainer]]),
  * replayed in DuckDB with the [[graft.ext.BpeTrainer]] oracle
  * machinery — chained MATERIALIZED CTE iterations with the chr(31)
  * `replace` merge rewrite — extended with per-step symbol counts and
  * the integer likelihood score, plus a 16-step greedy-match unroll
  * for encoding (one longest-prefix lookup per step; every word of
  * ≤ 16 chars finishes because each step consumes ≥ 1 character).
  */
object WordPieceQueries {

  private val NumMerges = 12
  private val MaxWordLen = WordPieceTrainer.DefaultMaxWordLen
  private val MinCount = WordPieceTrainer.DefaultMinCount
  private val Scale = WordPieceTrainer.ScoreScale

  /** Training CTEs: tok, d0, then per merge i: symbol counts s_i, pair
    * counts p_i, scored argmax m_i, rewrite d_i.
    */
  private def trainCtes: String = {
    val US = "chr(31)"
    val iters = (1 to NumMerges).map { i =>
      val prev = s"d${i - 1}"
      s"""s$i AS MATERIALIZED (SELECT u.s AS sym, CAST(sum(freq) AS BIGINT) AS ns
         |  FROM $prev, unnest(syms) AS u(s) GROUP BY 1),
         |p$i AS MATERIALIZED (SELECT u.pr AS pair, CAST(sum(freq) AS BIGINT) AS n
         |  FROM $prev, unnest(list_transform(range(len(syms) - 1),
         |         j -> syms[j + 1] || ' ' || syms[j + 2])) AS u(pr)
         |  GROUP BY 1),
         |m$i AS MATERIALIZED (
         |  SELECT pair, n,
         |         CAST(n * $Scale // (sa.ns * sb.ns) AS BIGINT) AS score_q
         |  FROM p$i
         |  JOIN s$i sa ON sa.sym = string_split(pair, ' ')[1]
         |  JOIN s$i sb ON sb.sym = string_split(pair, ' ')[2]
         |  WHERE n >= $MinCount
         |  ORDER BY score_q DESC, pair LIMIT 1),
         |d$i AS MATERIALIZED (SELECT w, freq,
         |  CASE WHEN (SELECT pair FROM m$i) IS NULL THEN syms
         |  ELSE string_split(trim(replace(
         |         $US || array_to_string(syms, $US || $US) || $US,
         |         $US || replace((SELECT pair FROM m$i), ' ',
         |                        $US || $US) || $US,
         |         $US || replace((SELECT pair FROM m$i), ' ', '') ||
         |         $US),
         |       chr(31)), $US || $US)
         |  END AS syms
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""tok AS MATERIALIZED (
       |  SELECT doc_id, u.term AS w
       |  FROM (SELECT doc_id,
       |               regexp_split_to_array(trim(text), '\\s+') AS t
       |        FROM documents WHERE text IS NOT NULL) s,
       |       unnest(s.t) AS u(term)
       |  WHERE u.term <> ''),
       |d0 AS MATERIALIZED (SELECT w, count(*) AS freq,
       |              string_split(w, '') AS syms
       |       FROM tok GROUP BY 1),
       |$iters""".stripMargin
  }

  /** Likelihood-ranked merge table: `(step, pair, n, score_q)`. */
  val qWordpieceTrain = QueryDef(
    "q_wordpiece_train",
    (s, d) => WordPieceTrainer.train(
        s, QueryDef.table(s, d, "documents"), "text", NumMerges)
      .orderBy("step"),
    Some {
      val steps = (1 to NumMerges)
        .map(i => s"SELECT $i AS step, pair, n, score_q FROM m$i")
        .mkString("\n  UNION ALL ")
      s"""WITH $trainCtes
         |SELECT step, pair, n, score_q FROM (
         |  $steps
         |) merged ORDER BY step""".stripMargin
    })

  /** Greedy longest-match encoding under the trained vocabulary:
    * per-document token/subword/UNK counts and fertility.
    */
  val qWordpieceEncode = QueryDef(
    "q_wordpiece_encode",
    (s, d) => {
      val docs = QueryDef.table(s, d, "documents")
      val merges = WordPieceTrainer.train(s, docs, "text", NumMerges)
        .orderBy("step").select("pair").collect().map(_.getString(0)).toSeq
      val vocab = WordPieceTrainer.vocabulary(docs, "text", merges)
      WordPieceTrainer.encode(docs, "doc_id", "text", vocab)
        .orderBy("doc_id")
    },
    Some {
      val walk = (1 to MaxWordLen).map { k =>
        val prev = s"gw${k - 1}"
        s"""t$k AS MATERIALIZED (
           |  SELECT g.w, max(length(v.piece)) AS l
           |  FROM $prev g JOIN vocab v
           |    ON v.piece = substr(g.w, CAST(g.pos + 1 AS INTEGER),
           |                        length(v.piece))
           |  WHERE g.pos < length(g.w) AND NOT g.unk
           |  GROUP BY g.w),
           |gw$k AS MATERIALIZED (
           |  SELECT w, pos, steps, unk FROM $prev
           |  WHERE pos >= length(w) OR unk
           |  UNION ALL
           |  SELECT g.w,
           |         CASE WHEN t.l IS NULL THEN CAST(length(g.w) AS BIGINT)
           |              ELSE g.pos + t.l END AS pos,
           |         CASE WHEN t.l IS NULL THEN CAST(1 AS BIGINT)
           |              ELSE g.steps + 1 END AS steps,
           |         t.l IS NULL AS unk
           |  FROM $prev g LEFT JOIN t$k t ON t.w = g.w
           |  WHERE g.pos < length(g.w) AND NOT g.unk)""".stripMargin
      }.mkString(",\n")
      val mergedPieces = (1 to NumMerges)
        .map(i => s"SELECT replace(pair, ' ', '') AS piece FROM m$i")
        .mkString("\n    UNION ALL ")
      s"""WITH $trainCtes,
         |vocab AS MATERIALIZED (
         |  SELECT DISTINCT piece FROM (
         |    SELECT unnest(string_split(w, '')) AS piece FROM d0
         |    UNION ALL $mergedPieces
         |  ) vs WHERE piece <> ''),
         |gw0 AS MATERIALIZED (
         |  SELECT w, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS steps,
         |         false AS unk
         |  FROM d0 WHERE length(w) <= $MaxWordLen),
         |$walk,
         |ens AS MATERIALIZED (
         |  SELECT w, steps AS ns, unk FROM gw$MaxWordLen)
         |SELECT t.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(sum(CASE WHEN length(t.w) > $MaxWordLen THEN 1
         |                     ELSE e.ns END) AS BIGINT) AS n_subwords,
         |       CAST(sum(CASE WHEN length(t.w) > $MaxWordLen THEN 1
         |                     WHEN e.unk THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_unk,
         |       CAST(sum(CASE WHEN length(t.w) > $MaxWordLen THEN 1
         |                     ELSE e.ns END) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE) AS fertility
         |FROM tok t LEFT JOIN ens e ON e.w = t.w
         |GROUP BY t.doc_id
         |ORDER BY doc_id""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(qWordpieceTrain, qWordpieceEncode)
}
