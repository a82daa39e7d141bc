package graft

import graft.ext.WordPieceTrainer

/** WordPiece: likelihood-ranked merges and greedy longest-match
  * encoding.
  */
class WordPieceTrainerSpec extends SparkSpec {

  test("driver-loop and distributed merge loops are bit-identical on real data") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.QueryDef
      .table(spark, "/root/testdata/sf0.001", "documents")
    val dict = docs.where(col("text").isNotNull)
      .select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        expr("filter(split(w, ''), x -> x != '')").as("syms"))
      .coalesce(8).cache()
    val viaDist = WordPieceTrainer.trainDistributed(dict, 8, 2L)
    val viaLocal = WordPieceTrainer.trainLocal(
      dict.collect().map(r => (r.getLong(0), r.getSeq[String](1).toArray)),
      8, 2L)
    dict.unpersist()
    assert(viaLocal.nonEmpty)
    assert(viaLocal == viaDist)
  }

  test("train ranks by likelihood ratio, not raw count") {
    import spark.implicits._
    // 'xy' occurs 4x but x,y are everywhere (x:8, y:8 incl. in xz/wy);
    // 'qz' occurs 3x with q,z rare (q:3, z:3+4) — WordPiece must pick
    // the rarer-symbol pair first when its ratio is higher:
    //   score(qz) = 3/(3*7) = .142 > score(xy) = 4/(8*8) = .0625
    val docs = (
      Seq.fill(4)("xy") ++ Seq.fill(4)("xz") ++ Seq.fill(4)("wy") ++
        Seq.fill(3)("qz"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = WordPieceTrainer.train(spark, docs, "text", numMerges = 1)
      .collect()
    assert(m.length == 1)
    assert(m(0).getString(1) == "q z", s"got ${m(0)}")
    // BPE on the same corpus picks by raw count (x y at 4... tie with
    // x z / w y at 4, q z only 3) — the two trainers genuinely differ
    val bpe = graft.ext.BpeTrainer.train(spark, docs, "text", numMerges = 1)
      .collect()
    assert(bpe(0).getString(1) != "q z")
  }

  test("train: exact integer scores, deterministic across runs") {
    import spark.implicits._
    val docs = Seq.fill(10)("hug pug hugs pugs un bun").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def run() = WordPieceTrainer.train(spark, docs, "text", 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val a = run()
    assert(a == run())
    assert(a.nonEmpty && a.forall(_._4 > 0))
  }

  test("greedy encode: longest match first, UNK on dead ends and long words") {
    val vocab = Set("u", "n", "h", "hug", "hugs", "p")
    def enc(w: String) =
      WordPieceTrainer.encodeWord(w, vocab, maxPieceLen = 4, maxWordLen = 16)
    assert(enc("hugs") == Some(Seq("hugs"))) // longest, not hug+s(fail)
    assert(enc("hugh") == Some(Seq("hug", "h")))
    assert(enc("nun") == Some(Seq("n", "u", "n")))
    assert(enc("hx").isEmpty) // 'x' not in vocab -> UNK
    assert(WordPieceTrainer.encodeWord("a" * 20, vocab, 4, 16).isEmpty)
    // NOTE the classic greedy failure mode is intentional semantics:
    // "hugu" takes "hug" then dead-ends on "u"? no — "u" IS here; but
    // "hugsn" takes "hugs" then "n" fine; a true dead end:
    assert(WordPieceTrainer.encodeWord("hugx", vocab, 4, 16).isEmpty)
  }

  test("encode: corpus stats match a driver-side replay incl. UNK counting") {
    import spark.implicits._
    val docs = Seq.fill(5)("hug hugs qqq").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = WordPieceTrainer.train(spark, docs, "text", 4)
      .orderBy("step").collect().map(_.getString(1)).toSeq
    val vocab = WordPieceTrainer.vocabulary(docs, "text", merges)
    val maxLen = vocab.iterator.map(_.length).max
    val expected = Seq("hug", "hugs", "qqq").map { w =>
      WordPieceTrainer.encodeWord(w, vocab, maxLen, 16)
        .map(_.length).getOrElse(1)
    }.sum
    val got = WordPieceTrainer.encode(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
    assert(got.length == 5)
    got.foreach { r =>
      assert(r.getLong(1) == 3L)
      assert(r.getLong(2) == expected.toLong)
      assert(r.getDouble(4) == expected.toDouble / 3.0)
    }
    // every corpus char is in the vocabulary, so nothing is UNK here
    assert(got.forall(_.getLong(3) == 0L))
  }
}
