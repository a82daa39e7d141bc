package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (Kudo 2018, arXiv:1804.10959 —
  * the SentencePiece unigram model): seed a substring vocabulary from
  * the corpus, then iterate segment → re-estimate. This implementation
  * is the HARD-EM (Viterbi-EM) variant: the E-step assigns each word
  * its single best segmentation under the current piece scores instead
  * of expected counts over all segmentations — a standard
  * approximation, chosen here because it keeps every quantity an exact
  * integer (Viterbi DP over quantized log-prob scores), which is what
  * makes the whole training loop replayable as chained BIGINT CTEs in
  * the DuckDB oracle (the BpeTrainer / LangId treatment).
  *
  * Determinism contract (mirrored line-for-line by the oracle):
  *  - scores are floor-quantized log-probs at 10⁻⁶
  *    (`floor(ln(·)·10⁶)`; ln is bit-identical JVM↔DuckDB on this data);
  *  - the Viterbi DP maximizes the integer score sum; the backtrack
  *    picks the LONGEST piece achieving the best score at each
  *    position (a total order — ties between equal-length candidates
  *    at the same position are the same piece);
  *  - single-character transitions are always available: an
  *    out-of-vocabulary character scores [[OovLpq]], a constant below
  *    any real score, so every position is reachable and unknown
  *    characters surface as their own pieces without special-casing;
  *  - words longer than `maxWordLen` pass through as ONE piece
  *    (training skips them; encoding emits them verbatim) — the
  *    SentencePiece max-length hygiene, and what bounds the oracle's
  *    DP unroll depth.
  *
  * Scale shape (the [[BpeTrainer]] discipline): training runs on the
  * DISTINCT-WORD dictionary with frequencies — one corpus-keyed
  * exchange, everything after is vocabulary-sized. Seed selection is
  * TakeOrderedAndProject (never a global window); each EM iteration is
  * ONE distributed job (segment via a dictionary-sized UDF → explode →
  * piece-keyed aggregate → vocab-bounded collect); score re-estimation
  * is driver arithmetic over ≤ `vocabSize` rows. No corpus-sized
  * collect anywhere.
  */
object UnigramTrainer {

  /** Longest candidate piece, and the oracle's DP transition fan-in. */
  val MaxPieceLen = 4

  /** Score scale: log-probs quantized to floor(ln·10⁶). */
  val Scale = 1000000L

  /** Fixed score of an out-of-vocabulary single character — below any
    * real piece score (ln of any probability ≥ 1/(total+V) beats it on
    * this data), so OOV transitions are taken only when nothing else
    * covers the position. A shared constant, NOT derived from the data,
    * so both engines agree without replaying the derivation.
    */
  val OovLpq: Long = -30L * Scale

  /** Default word-length ceiling: bounds the oracle unroll and skips
    * pathological tokens, the SentencePiece hygiene rule.
    */
  val DefaultMaxWordLen = 16

  private[graft] def floorLnQ(x: Double): Long =
    math.floor(math.log(x) * Scale).toLong

  /** Distinct-word dictionary with frequencies over whitespace tokens —
    * the one corpus-sized exchange.
    */
  private def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Viterbi segmentation of one word under integer piece scores.
    * Exactly the oracle's DP: forward best-score pass with transitions
    * of length 1..[[MaxPieceLen]] (length-1 always available at
    * [[OovLpq]] when unknown), then a backtrack taking the LONGEST
    * piece achieving the best score at each position. Words longer
    * than `maxWordLen` return themselves as a single piece.
    */
  private[graft] def viterbi(
      w: String, lpq: collection.Map[String, Long],
      maxWordLen: Int): Seq[String] = {
    val n = w.length
    if (n == 0) return Nil
    if (n > maxWordLen) return Seq(w)
    val Unreach = Long.MinValue
    val best = new Array[Long](n + 1)
    var j = 1
    while (j <= n) {
      var b = Unreach
      var l = 1
      while (l <= math.min(MaxPieceLen, j)) {
        val piece = w.substring(j - l, j)
        val sc =
          if (l == 1) lpq.getOrElse(piece, OovLpq)
          else lpq.getOrElse(piece, Unreach)
        if (sc != Unreach) {
          val cand = best(j - l) + sc
          if (cand > b) b = cand
        }
        l += 1
      }
      best(j) = b // always reachable: the l = 1 transition exists
      j += 1
    }
    var pos = n
    var out = List.empty[String]
    while (pos > 0) {
      var chosen = 1
      var l = 1
      while (l <= math.min(MaxPieceLen, pos)) {
        val piece = w.substring(pos - l, pos)
        val sc =
          if (l == 1) lpq.getOrElse(piece, OovLpq)
          else lpq.getOrElse(piece, Unreach)
        if (sc != Unreach && best(pos - l) + sc == best(pos)) chosen = l
        l += 1
      }
      out = w.substring(pos - chosen, pos) :: out
      pos -= chosen
    }
    out
  }

  /** Train a unigram-LM vocabulary: returns `(piece, cnt, lpq)` — the
    * final hard-EM usage count and quantized log-prob score per piece.
    * Multi-character pieces the final E-step never used are pruned
    * (the simplified counterpart of SentencePiece's loss-ranked prune);
    * single characters are always kept.
    *
    * @param vocabSize seed-vocabulary budget: all single characters
    *   plus the top `(freq·len)`-ranked multi-character substrings up
    *   to that total
    * @param emIters   hard-EM rounds (segment → recount → re-score)
    */
  def train(
      spark: SparkSession, docs: DataFrame, textCol: String,
      vocabSize: Int, emIters: Int = 2,
      maxWordLen: Int = DefaultMaxWordLen): DataFrame = {
    require(vocabSize >= 2, s"vocabSize must be >= 2, got $vocabSize")
    require(emIters >= 1, s"emIters must be >= 1, got $emIters")
    val dict = wordDict(docs, textCol)
      .where(length(col("w")) <= maxWordLen)
      .coalesce(8)
      .cache()

    // Seed: every substring of length 1..MaxPieceLen of every dict word,
    // weighted by word frequency (each occurrence counts). Substring
    // enumeration is relational — explode over start positions × lengths
    // — and runs on the dictionary, not the corpus.
    val seed = dict
      .select(col("freq"), col("w"), explode(
        sequence(lit(1), length(col("w")))).as("i"))
      .select(col("freq"), col("w"), col("i"),
        explode(sequence(lit(1), lit(MaxPieceLen))).as("l"))
      .where(col("i") + col("l") - 1 <= length(col("w")))
      .select(expr("substr(w, i, l)").as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("s"))
      .cache()

    // All single characters are forced into the vocabulary; the
    // multi-char budget is filled by (s·len desc, piece asc) rank via
    // TakeOrderedAndProject — never a global window.
    val chars = seed.where(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multiBudget = math.max(0, vocabSize - chars.length)
    val multi = seed.where(length(col("piece")) > 1)
      .orderBy((col("s") * length(col("piece"))).desc, col("piece"))
      .limit(multiBudget)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    seed.unpersist()

    val seedCounts: Map[String, Long] = (chars ++ multi).toMap
    val total0 = seedCounts.values.sum
    var scores: Map[String, Long] =
      seedCounts.map { case (p, s) =>
        p -> (floorLnQ(s.toDouble) - floorLnQ(total0.toDouble))
      }
    val vocabV = scores.size.toLong

    // Hard-EM rounds: ONE distributed job each (segment the dictionary
    // with the broadcast score map, aggregate piece usage), then
    // driver-side re-scoring over the bounded vocabulary.
    var counts: Map[String, Long] = Map.empty
    val wl = maxWordLen
    var it = 0
    while (it < emIters) {
      val cur = scores
      val seg = udf((w: String) => viterbi(w, cur, wl))
      counts = dict
        .select(col("freq"), explode(seg(col("w"))).as("piece"))
        .groupBy("piece").agg(sum(col("freq")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = counts.valuesIterator.sum
      scores = scores.map { case (p, _) =>
        p -> (floorLnQ(counts.getOrElse(p, 0L) + 1.0) -
          floorLnQ(total.toDouble + vocabV))
      }
      it += 1
    }
    dict.unpersist()

    import spark.implicits._
    scores.toSeq
      .map { case (p, q) => (p, counts.getOrElse(p, 0L), q) }
      .filter { case (p, c, _) => c > 0 || p.length == 1 }
      .sortBy(_._1)
      .toDF("piece", "cnt", "lpq")
  }

  /** Tokenize a corpus with a trained model — the [[BpeTrainer.encode]]
    * contract: per-document `(id, n_tokens, n_subwords, fertility)`,
    * fertility the identical-operand long/long division (bit-exact
    * cross-engine). The Viterbi replay runs only on the distinct-word
    * dictionary; corpus-sized paths stay relational.
    *
    * @param model `(piece, cnt, lpq)` as produced by [[train]]
    */
  def encode(
      docs: DataFrame, id: String, textCol: String, model: DataFrame,
      maxWordLen: Int = DefaultMaxWordLen): DataFrame = {
    // the model is vocabulary-bounded by the train contract — a driver
    // map is the same shape as BPE's merges / WordPiece's vocab literal
    val lpq: Map[String, Long] = model.select("piece", "lpq")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wl = maxWordLen
    SubwordEncode.fertility(docs, id, textCol,
      w => (viterbi(w, lpq, wl).length, 0), emitUnk = false)
  }
}
