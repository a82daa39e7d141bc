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

  /** Dictionaries at or below this row count run the merge loop at the
    * driver (one aggregation + one bounded collect, zero per-iteration
    * jobs — the round-10 bounded-sample-training lesson: numMerges
    * distributed barriers over a vocabulary-sized frame are pure
    * scheduling). Larger dictionaries fall back to the distributed
    * loop, which scales to any vocabulary.
    */
  private[graft] val DriverDictThreshold = 1 << 20

  /** Run up to `numMerges` likelihood-ranked merges; returns
    * `(step, pair, n, score_q)` in merge order.
    */
  def train(
      spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int, minCount: Long = DefaultMinCount): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val dict = docs.where(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        expr("filter(split(w, ''), x -> x != '')").as("syms"))
      .coalesce(8)
      .cache()
    // The count both sizes the dict (path choice) and fills the cache.
    val rows = dict.count()
    val merges =
      if (rows <= DriverDictThreshold)
        trainLocal(dict.collect().map(r =>
            (r.getLong(0), r.getSeq[String](1).toArray)),
          numMerges, minCount)
      else trainDistributed(dict, numMerges, minCount)
    dict.unpersist()
    import spark.implicits._
    merges.toDF("step", "pair", "n", "score_q")
  }

  /** Spark's string ordering is unsigned UTF-8 byte order — the driver
    * tie-break must match it exactly (Scala's String.compareTo is
    * UTF-16 code-unit order; they differ beyond the BMP).
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** [[BpeTrainer.mergePair]]'s fold, word-local: replace the output
    * tail when it is `a` and the incoming symbol is `b`.
    */
  private def mergePairLocal(
      syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (out.nonEmpty && out.last == a && x == b)
        out(out.length - 1) = a + b
      else out += x
      i += 1
    }
    out.toArray
  }

  /** The exact merge loop on the collected dictionary: per step, pair
    * and symbol counts in one pass, the scored integer argmax with the
    * (score desc, pair asc-by-UTF-8) tie-break, then the fold rewrite —
    * bit-identical to [[trainDistributed]] (WordPieceTrainerSpec pins
    * the equality).
    */
  private[graft] def trainLocal(
      dict0: Array[(Long, Array[String])], numMerges: Int,
      minCount: Long): Seq[(Int, String, Long, Long)] = {
    var dict = dict0
    val merges = Seq.newBuilder[(Int, String, Long, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val pairN = scala.collection.mutable.HashMap.empty[String, Long]
      val symN = scala.collection.mutable.HashMap.empty[String, Long]
      dict.foreach { case (freq, syms) =>
        var i = 0
        while (i < syms.length) {
          symN.update(syms(i), symN.getOrElse(syms(i), 0L) + freq)
          if (i + 1 < syms.length) {
            val p = syms(i) + " " + syms(i + 1)
            pairN.update(p, pairN.getOrElse(p, 0L) + freq)
          }
          i += 1
        }
      }
      var best: (String, Long, Long) = null // (pair, n, score_q)
      pairN.foreach { case (p, n) =>
        if (n >= minCount) {
          val Array(a, b) = p.split(" ", 2)
          val na = symN(a); val nb = symN(b)
          require(n <= Long.MaxValue / ScoreScale && na <= Long.MaxValue / nb,
            s"score overflow: n=$n na=$na nb=$nb")
          val score = n * ScoreScale / (na * nb)
          if (best == null || score > best._3 ||
              (score == best._3 && utf8Less(p, best._1)))
            best = (p, n, score)
        }
      }
      if (best == null) done = true
      else {
        val Array(a, b) = best._1.split(" ", 2)
        merges += ((step, best._1, best._2, best._3))
        dict = dict.map { case (freq, syms) =>
          (freq, mergePairLocal(syms, a, b)) }
        step += 1
      }
    }
    merges.result()
  }

  private[graft] def trainDistributed(
      dict0: DataFrame, numMerges: Int,
      minCount: Long): Seq[(Int, String, Long, Long)] = {
    var dict = dict0
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
    if (!(dict eq dict0)) dict.unpersist() // dict0's cache is the caller's
    merges.result()
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
    SubwordEncode.fertility(docs, id, textCol,
      w => encodeWord(w, vocab, maxPieceLen, wl) match {
        case Some(pieces) => (pieces.length, 0)
        case None => (1, 1) // UNK: one piece, flagged
      },
      emitUnk = true)
  }
}
