package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.UnigramTrainer

/** Unigram-LM tokenizer gate queries: the full hard-EM training loop
  * ([[graft.ext.UnigramTrainer]]) replayed in DuckDB as chained
  * MATERIALIZED BIGINT CTEs — the BpeTrainer treatment, but with a
  * Viterbi DP instead of a merge rewrite. Per EM round the oracle
  * unrolls the DP over word positions 1..maxWordLen (each level a
  * 4-way union over transition lengths), derives the longest-piece
  * backpointer table, walks segmentations back (≤ maxWordLen chained
  * steps), aggregates piece usage, and re-scores with floor-quantized
  * log-probs. Every value is an exact integer except the two ln()
  * calls per score, which are bit-identical JVM↔DuckDB (the
  * q_lm_score_kn precedent).
  */
object UnigramQueries {

  private val VocabSize = 300
  private val EmIters = 2
  private val MaxWordLen = UnigramTrainer.DefaultMaxWordLen
  private val MaxPieceLen = UnigramTrainer.MaxPieceLen
  private val Oov = UnigramTrainer.OovLpq

  /** Distinct-word dictionary CTE over a document slice. */
  private def dictCte(name: String, pred: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(list_filter(
       |      regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) AS w
       |    FROM documents WHERE text IS NOT NULL AND $pred) toks
       |  WHERE length(w) <= $MaxWordLen
       |  GROUP BY w)""".stripMargin

  /** The Viterbi chain for one scoring pass: DP levels, backpointers,
    * walk steps. `p` prefixes every generated CTE name; `dict` is the
    * word table, `model` the (piece, lpq) score table. Appends CTEs:
    * p_b0..p_b{maxWordLen}, p_bt, p_wk1..p_wk{maxWordLen}, and
    * p_pieces (one row per (w, piece) occurrence in the best
    * segmentation).
    */
  private def viterbiCtes(p: String, dict: String, model: String): String = {
    val levels = new StringBuilder
    levels ++=
      s"${p}_b0 AS (SELECT w, CAST(0 AS BIGINT) AS best FROM $dict),\n"
    for (j <- 1 to MaxWordLen) {
      val branches = (1 to math.min(MaxPieceLen, j)).map { l =>
        val sub = s"substr(d.w, ${j - l + 1}, $l)"
        if (l == 1)
          s"""    SELECT d.w, p.best + COALESCE(v.lpq, $Oov) AS cand
             |    FROM $dict d
             |    JOIN ${p}_b${j - 1} p ON p.w = d.w
             |    LEFT JOIN $model v ON v.piece = $sub
             |    WHERE length(d.w) >= $j""".stripMargin
        else
          s"""    SELECT d.w, p.best + v.lpq AS cand
             |    FROM $dict d
             |    JOIN ${p}_b${j - l} p ON p.w = d.w
             |    JOIN $model v ON v.piece = $sub
             |    WHERE length(d.w) >= $j""".stripMargin
      }
      levels ++=
        s"""${p}_b$j AS MATERIALIZED (
           |  SELECT w, max(cand) AS best FROM (
           |${branches.mkString("\n    UNION ALL\n")}
           |  ) cands GROUP BY w),\n""".stripMargin
    }
    val ballRows = (s"SELECT w, 0 AS j, CAST(0 AS BIGINT) AS best FROM $dict" +:
      (1 to MaxWordLen).map(j =>
        s"SELECT w, $j AS j, best FROM ${p}_b$j")).mkString("\n  UNION ALL ")
    val bt =
      s"""${p}_ball AS MATERIALIZED (
         |  $ballRows),
         |${p}_bt AS MATERIALIZED (
         |  SELECT w, j, max(l) AS lstar FROM (
         |    SELECT cur.w, cur.j, lv.l
         |    FROM ${p}_ball cur
         |    JOIN (VALUES (1), (2), (3), (4)) lv(l) ON lv.l <= cur.j
         |    JOIN ${p}_ball prv ON prv.w = cur.w AND prv.j = cur.j - lv.l
         |    LEFT JOIN $model v
         |      ON v.piece = substr(cur.w, CAST(cur.j - lv.l + 1 AS INTEGER),
         |                          CAST(lv.l AS INTEGER))
         |    WHERE cur.j >= 1
         |      AND (CASE WHEN lv.l = 1 THEN COALESCE(v.lpq, $Oov)
         |                ELSE v.lpq END) IS NOT NULL
         |      AND prv.best + (CASE WHEN lv.l = 1 THEN COALESCE(v.lpq, $Oov)
         |                           ELSE v.lpq END) = cur.best
         |  ) cand GROUP BY w, j),\n""".stripMargin
    val walks = new StringBuilder
    walks ++=
      s"${p}_wk0 AS (SELECT w, CAST(length(w) AS BIGINT) AS pos FROM $dict),\n"
    for (k <- 1 to MaxWordLen) {
      walks ++=
        s"""${p}_wk$k AS MATERIALIZED (
           |  SELECT s.w, s.pos - b.lstar AS pos,
           |         substr(s.w, CAST(s.pos - b.lstar + 1 AS INTEGER),
           |                CAST(b.lstar AS INTEGER)) AS piece
           |  FROM ${p}_wk${k - 1} s
           |  JOIN ${p}_bt b ON b.w = s.w AND b.j = s.pos
           |  WHERE s.pos > 0),\n""".stripMargin
    }
    val pieceRows = (1 to MaxWordLen)
      .map(k => s"SELECT w, piece FROM ${p}_wk$k")
      .mkString("\n  UNION ALL ")
    levels.toString + bt + walks.toString +
      s"${p}_pieces AS MATERIALIZED (\n  $pieceRows)"
  }

  /** One EM round: segment `dict` under `scores`, count usage into
    * `{p}_cnt`, re-score the (fixed) vocabulary into `{p}_sc`.
    */
  private def emRound(p: String, dict: String, scores: String): String =
    s"""${viterbiCtes(p, dict, scores)},
       |${p}_cnt AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM ${p}_pieces JOIN $dict USING (w)
       |  GROUP BY piece),
       |${p}_tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM ${p}_cnt),
       |${p}_sc AS MATERIALIZED (
       |  SELECT v.piece,
       |         CAST(floor(ln(CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE))
       |              * 1000000) AS BIGINT)
       |       - CAST(floor(ln(CAST((SELECT t FROM ${p}_tot)
       |                           + (SELECT v FROM vsz) AS DOUBLE))
       |              * 1000000) AS BIGINT) AS lpq
       |  FROM vocab0 v LEFT JOIN ${p}_cnt c ON c.piece = v.piece)""".stripMargin

  /** Seed + initial scores + all EM rounds; final model CTEs are
    * `em$EmIters
    * _sc` (scores) / `em${EmIters}_cnt` (usage).
    */
  private def trainCtes(trainPred: String): String = {
    val seed =
      s"""${dictCte("dict", trainPred)},
         |seed AS MATERIALIZED (
         |  SELECT piece, CAST(sum(freq) AS BIGINT) AS s FROM (
         |    SELECT substr(d.w, CAST(i.range AS INTEGER),
         |                  CAST(l.range AS INTEGER)) AS piece, d.freq
         |    FROM dict d, range(1, ${MaxWordLen + 1}) i,
         |         range(1, ${MaxPieceLen + 1}) l
         |    WHERE i.range + l.range - 1 <= length(d.w)) subs
         |  GROUP BY piece),
         |chars AS (SELECT piece, s FROM seed WHERE length(piece) = 1),
         |nchars AS (SELECT count(*) AS c FROM chars),
         |multi AS (
         |  SELECT piece, s FROM (
         |    SELECT piece, s, row_number() OVER (
         |      ORDER BY s * length(piece) DESC, piece) AS rn
         |    FROM seed WHERE length(piece) > 1) ranked
         |  WHERE rn <= GREATEST(0, $VocabSize - (SELECT c FROM nchars))),
         |vocab0 AS MATERIALIZED (
         |  SELECT piece, s FROM chars UNION ALL SELECT piece, s FROM multi),
         |tot0 AS (SELECT CAST(sum(s) AS BIGINT) AS t FROM vocab0),
         |vsz AS (SELECT count(*) AS v FROM vocab0),
         |em0_sc AS MATERIALIZED (
         |  SELECT piece,
         |         CAST(floor(ln(CAST(s AS DOUBLE)) * 1000000) AS BIGINT)
         |       - CAST(floor(ln(CAST((SELECT t FROM tot0) AS DOUBLE))
         |              * 1000000) AS BIGINT) AS lpq
         |  FROM vocab0)""".stripMargin
    val rounds = (1 to EmIters)
      .map(i => emRound(s"em$i", "dict", s"em${i - 1}_sc"))
      .mkString(",\n")
    seed + ",\n" + rounds
  }

  /** Hard-EM unigram training — `(piece, cnt, lpq)` after
    * [[EmIters]] rounds on the doc_id < 400 slice, zero-usage
    * multi-char pieces pruned, ordered by piece.
    */
  val qUnigramTrain = QueryDef(
    "q_unigram_train",
    (s, d) => {
      val train = QueryDef.table(s, d, "documents")
        .filter(col("doc_id") < 400)
      UnigramTrainer.train(s, train, "text", VocabSize, EmIters)
        .orderBy("piece")
    },
    Some(s"""WITH ${trainCtes("doc_id < 400")}
            |SELECT v.piece,
            |       COALESCE(c.cnt, CAST(0 AS BIGINT)) AS cnt,
            |       sc.lpq
            |FROM vocab0 v
            |LEFT JOIN em${EmIters}_cnt c ON c.piece = v.piece
            |JOIN em${EmIters}_sc sc ON sc.piece = v.piece
            |WHERE COALESCE(c.cnt, 0) > 0 OR length(v.piece) = 1
            |ORDER BY v.piece""".stripMargin))

  /** Encoding under the trained model: per-document token/subword
    * counts and fertility over the HELD-OUT slice (doc_id >= 400) —
    * Viterbi with the pruned vocabulary, OOV characters as their own
    * pieces, words beyond [[MaxWordLen]] passed through as one piece.
    */
  val qUnigramEncode = QueryDef(
    "q_unigram_encode",
    (s, d) => {
      val all = QueryDef.table(s, d, "documents")
      val model = UnigramTrainer.train(
        s, all.filter(col("doc_id") < 400), "text", VocabSize, EmIters)
      UnigramTrainer.encode(
          all.filter(col("doc_id") >= 400), "doc_id", "text", model)
        .orderBy("doc_id")
    },
    Some(s"""WITH ${trainCtes("doc_id < 400")},
            |model AS MATERIALIZED (
            |  SELECT v.piece, sc.lpq
            |  FROM vocab0 v
            |  LEFT JOIN em${EmIters}_cnt c ON c.piece = v.piece
            |  JOIN em${EmIters}_sc sc ON sc.piece = v.piece
            |  WHERE COALESCE(c.cnt, 0) > 0 OR length(v.piece) = 1),
            |etok AS MATERIALIZED (
            |  SELECT doc_id, w FROM (
            |    SELECT doc_id, unnest(list_filter(
            |      regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) AS w
            |    FROM documents WHERE text IS NOT NULL AND doc_id >= 400) t),
            |edict AS MATERIALIZED (
            |  SELECT w, CAST(1 AS BIGINT) AS freq
            |  FROM (SELECT DISTINCT w FROM etok) dw
            |  WHERE length(w) <= $MaxWordLen),
            |${viterbiCtes("enc", "edict", "model")},
            |ens AS MATERIALIZED (
            |  SELECT w, CAST(count(*) AS INTEGER) AS ns
            |  FROM enc_pieces GROUP BY w)
            |SELECT doc_id,
            |       CAST(count(*) AS BIGINT) AS n_tokens,
            |       CAST(sum(CASE WHEN length(w) > $MaxWordLen THEN 1
            |                     ELSE ns END) AS BIGINT) AS n_subwords,
            |       CAST(sum(CASE WHEN length(w) > $MaxWordLen THEN 1
            |                     ELSE ns END) AS DOUBLE)
            |         / CAST(count(*) AS DOUBLE) AS fertility
            |FROM etok LEFT JOIN ens USING (w)
            |GROUP BY doc_id
            |ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qUnigramTrain, qUnigramEncode)
}
