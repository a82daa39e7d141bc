package graft

import graft.ext.BpeTrainer

/** Pins the BPE training loop against the hand-workable reference corpus
  * (the hug/pug/pun/bun/hugs example from the original BPE literature)
  * and the left-to-right non-overlapping merge scan.
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("learns the reference merge sequence with deterministic tiebreaks") {
    // word frequencies: hug x10, pug x5, pun x12, bun x4, hugs x5
    val text = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    val docs = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val merges = BpeTrainer.train(spark, docs, "text", numMerges = 10)
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    // worked by hand: (u,g)=20; (u,n)=16; (h,ug)=15; (p,un)=12; then the
    // 5-count tie between (hug,s) and (p,ug) breaks pair-ascending; the
    // loop stops when nothing reaches minCount=2
    assert(merges === Seq(
      (1, "u g", 20L),
      (2, "u n", 16L),
      (3, "h ug", 15L),
      (4, "p un", 12L),
      (5, "hug s", 5L),
      (6, "p ug", 5L),
      (7, "b un", 4L)))
  }

  test("overlapping runs merge left-to-right non-overlapping") {
    // 'aaaa' x3: pair (a,a) counts every adjacency (3 per word x 3 words),
    // but the REWRITE merges non-overlapping -> [aa, aa], then one more
    // step merges (aa, aa) at the word frequency
    val docs = Seq((1L, Seq.fill(3)("aaaa").mkString(" "))).toDF("doc_id", "text")
    val merges = BpeTrainer.train(spark, docs, "text", numMerges = 5)
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(merges === Seq((1, "a a", 9L), (2, "aa aa", 3L)))
  }

  test("training is deterministic across runs and respects minCount") {
    val docs = Seq(
      (1L, "spark scan merge spark scan"),
      (2L, "merge spark table scan")).toDF("doc_id", "text")
    val a = BpeTrainer.train(spark, docs, "text", numMerges = 8)
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    val b = BpeTrainer.train(spark, docs, "text", numMerges = 8)
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
    // every surviving merge met the default minCount
    assert(a.forall(_._3 >= 2L))
    // max winning count is non-increasing: a pair created by merge t has
    // count <= the count that won step t
    assert(a.map(_._3) === a.map(_._3).sortBy(-_))
  }
}
