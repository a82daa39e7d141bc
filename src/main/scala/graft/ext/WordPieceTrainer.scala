package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training and encoding (Schuster & Nakajima,
  * ICASSP 2012 — BERT's tokenizer), completing the engine's subword
  * family triple next to [[BpeTrainer]] (count-ranked merges) and
  * [[UnigramTrainer]] (hard-EM Viterbi): WordPiece is the
  * LIKELIHOOD-ranked merge loop — each step merges the adjacent symbol
  * pair maximizing count(ab) / (count(a)·count(b)), the pair whose
  * merge most increases a unigram LM's corpus likelihood — and its
  * encoder is greedy longest-match-first, not merge replay.
  *
  * Determinism contract (mirrored by the oracle):
  *  - the score is the exact integer `count(ab)·10⁹ div
  *    (count(a)·count(b))`, argmax tie-broken (score desc, pair asc);
  *  - merging stops early when no pair reaches `minCount`;
  *  - encoding takes the LONGEST vocabulary prefix at each position;
  *    a word with no matching prefix — or longer than `maxWordLen`
  *    (BERT's max_input_chars_per_word rule) — is UNK and counts as
  *    one piece.
  *
  * Scale shape (the [[BpeTrainer]] discipline): training runs on the
  * cached distinct-word dictionary; each iteration is ONE distributed
  * job (pair + symbol aggregation joined into the scored argmax, a
  * one-row collect); the rewrite reuses [[BpeTrainer.mergePair]]'s
  * fold. Encoding keys every corpus-sized path on the dictionary
  * join-back.
  */
object WordPieceTrainer {

  /** Fixed-point scale of the likelihood-ratio score. */
  val ScoreScale = 1000000000L

  /** BERT's max_input_chars_per_word: longer words are UNK without
    * scanning (also bounds the oracle's greedy-match unroll).
    */
  val DefaultMaxWordLen = 16

  private[graft] val DefaultMinCount = 2L

  /** Run up to `numMerges` likelihood-ranked merges; returns
    * `(step, pair, n, score_q)` in merge order.
    */
  def train(
      spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int, minCount: Long = DefaultMinCount): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var dict = docs.where(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        expr("filter(split(w, ''), x -> x != '')").as("syms"))
      .coalesce(8)
      .cache()

    val merges = Seq.newBuilder[(Int, String, Long, Long)]
    var prev: DataFrame = null
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      // ONE plan: pair counts and symbol counts both aggregate the
      // current dict, join into the scored argmax, one-row collect.
      val pairs = dict
        .select(col("freq"),
          explode(BpeTrainer.adjacentPairs(col("syms"))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("n"))
      val syms = dict
        .select(col("freq"), explode(col("syms")).as("sym"))
        .groupBy("sym").agg(sum(col("freq")).as("ns"))
      val best = pairs
        .where(col("n") >= minCount)
        .withColumn("_a", split(col("pair"), " ", 2)(0))
        .withColumn("_b", split(col("pair"), " ", 2)(1))
        .join(syms.select(col("sym").as("_a"), col("ns").as("_na")), "_a")
        .join(syms.select(col("sym").as("_b"), col("ns").as("_nb")), "_b")
        .withColumn("score_q",
          call_function("div", col("n") * lit(ScoreScale),
            col("_na") * col("_nb")))
        .orderBy(col("score_q").desc, col("pair"))
        .limit(1)
        .select("pair", "n", "score_q")
        .collect()
      if (prev != null) { prev.unpersist(); prev = null }
      if (best.isEmpty) done = true
      else {
        val pair = best(0).getString(0)
        val Array(a, b) = pair.split(" ", 2)
        merges += ((step, pair, best(0).getLong(1), best(0).getLong(2)))
        val next = dict
          .select(col("freq"),
            BpeTrainer.mergePair(col("syms"), a, b).as("syms"))
          .cache()
        prev = dict
        dict = next
        step += 1
      }
    }
    if (prev != null) prev.unpersist()
    dict.unpersist()
    import spark.implicits._
    merges.result().toDF("step", "pair", "n", "score_q")
  }

  /** The encode vocabulary a merge table induces: every corpus
    * character plus each merge's output symbol.
    */
  def vocabulary(
      docs: DataFrame, textCol: String, merges: Seq[String]): Set[String] = {
    val chars = docs.where(col(textCol).isNotNull)
      .select(explode(split(concat_ws("",
        TextAnalysis.tokens(col(textCol))), "")).as("c"))
      .where(col("c") =!= "")
      .distinct().collect().map(_.getString(0)).toSet
    chars ++ merges.map(_.replace(" ", ""))
  }

  /** Greedy longest-match-first segmentation. None = UNK (no matching
    * prefix at some position, or the word exceeds `maxWordLen`).
    */
  private[graft] def encodeWord(
      w: String, vocab: Set[String], maxPieceLen: Int,
      maxWordLen: Int): Option[Seq[String]] = {
    if (w.length > maxWordLen) return None
    var pos = 0
    val out = Seq.newBuilder[String]
    while (pos < w.length) {
      var l = math.min(maxPieceLen, w.length - pos)
      var found = -1
      while (l >= 1 && found < 0) {
        if (vocab.contains(w.substring(pos, pos + l))) found = l
        l -= 1
      }
      if (found < 0) return None
      out += w.substring(pos, pos + found)
      pos += found
    }
    Some(out.result())
  }

  /** Tokenize a corpus with a trained vocabulary: per-document
    * `(id, n_tokens, n_subwords, n_unk, fertility)` — UNK words count
    * one subword each; fertility is the identical-operand long/long
    * division. The greedy replay runs only on the distinct-word
    * dictionary.
    */
  def encode(
      docs: DataFrame, id: String, textCol: String, vocab: Set[String],
      maxWordLen: Int = DefaultMaxWordLen): DataFrame = {
    require(vocab.nonEmpty, "vocabulary must not be empty")
    val maxPieceLen = vocab.iterator.map(_.length).max
    val wl = maxWordLen
    val enc = udf((w: String) =>
      encodeWord(w, vocab, maxPieceLen, wl) match {
        case Some(pieces) => Array(pieces.length, 0)
        case None => Array(1, 1) // UNK: one piece, flagged
      })
    val tok = docs.where(col(textCol).isNotNull)
      .select(col(id), explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
    val dict = tok.select("w").distinct()
      .withColumn("_e", enc(col("w")))
      .select(col("w"), col("_e")(0).as("_ns"), col("_e")(1).as("_unk"))
    tok.join(dict, "w")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("_ns").cast("long")).as("n_subwords"),
        sum(col("_unk").cast("long")).as("n_unk"))
      .withColumn("fertility",
        col("n_subwords").cast("double") / col("n_tokens").cast("double"))
  }
}
