package graft

import graft.ext.UnigramTrainer

/** Unigram-LM (hard-EM / Viterbi-EM) tokenizer trainer. */
class UnigramTrainerSpec extends SparkSpec {

  test("viterbi: hand-worked segmentation, longest-piece tie-break") {
    // scores: 'ab' strong, 'a'/'b'/'c' weak singles
    val lpq = Map("a" -> -3000000L, "b" -> -3000000L, "c" -> -3000000L,
      "ab" -> -2000000L, "abc" -> -9500000L)
    // "abc": [ab][c] = -2e6 + -3e6 = -5e6 beats [a][b][c] = -9e6 and
    // [abc] = -9.5e6
    assert(UnigramTrainer.viterbi("abc", lpq, 16) == Seq("ab", "c"))
    // tie-break: make [abc] EQUAL to [ab][c] — the longest piece at the
    // final position wins the backtrack
    val tied = lpq + ("abc" -> -5000000L)
    assert(UnigramTrainer.viterbi("abc", tied, 16) == Seq("abc"))
  }

  test("viterbi: OOV characters surface as their own pieces") {
    val lpq = Map("a" -> -1000000L, "ab" -> -1500000L)
    // 'x' is OOV: must still segment, x as its own piece
    assert(UnigramTrainer.viterbi("axb", lpq, 16) == Seq("a", "x", "b"))
    // words over maxWordLen pass through as one piece
    assert(UnigramTrainer.viterbi("abcdefghij", lpq, 5) == Seq("abcdefghij"))
    assert(UnigramTrainer.viterbi("", lpq, 16).isEmpty)
  }

  test("train: single chars always kept, multi-char pieces earn their keep") {
    import spark.implicits._
    val docs = Seq.fill(20)("the cat sat on the mat").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = UnigramTrainer.train(spark, docs, "text",
      vocabSize = 40, emIters = 2).collect()
    val pieces = model.map(_.getString(0)).toSet
    // every corpus character survives
    "thecatsonm".foreach(c => assert(pieces.contains(c.toString)))
    // a frequent multi-char piece was learned and actually used
    val multi = model.filter(r => r.getString(0).length > 1)
    assert(multi.nonEmpty)
    assert(multi.forall(_.getLong(1) > 0)) // pruning invariant: cnt > 0
    // scores are negative log-probs (never >= 0)
    assert(model.forall(_.getLong(2) < 0))
  }

  test("train is deterministic across invocations") {
    import spark.implicits._
    val docs = (0 until 30)
      .map(i => (i.toLong, s"alpha beta gamma_$i alpha beta"))
      .toDF("doc_id", "text")
    def run() = UnigramTrainer.train(spark, docs, "text", 50, 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run() == run())
  }

  test("encode: fertility counts match a driver-side viterbi replay") {
    import spark.implicits._
    val docs = Seq.fill(10)("banana band ban").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = UnigramTrainer.train(spark, docs, "text", 30, 2)
    val lpq = model.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val expected = Seq("banana", "band", "ban")
      .map(w => UnigramTrainer.viterbi(w, lpq, 16).length).sum
    val got = UnigramTrainer.encode(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getLong(1) == 3L) // n_tokens
      assert(r.getLong(2) == expected.toLong) // n_subwords
      assert(r.getDouble(3) == expected.toDouble / 3.0)
    }
  }
}
