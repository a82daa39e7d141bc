package graft

import graft.ext.BpeTrainer
import org.apache.spark.sql.functions._

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

  test("batched scanning equals the strict one-merge-per-scan algorithm") {
    // The r10 batched trainer merges several provably-independent pairs
    // per scan; this pins its output against a spec-local STRICT
    // sequential implementation (recount after every single merge) on
    // the real corpus — the parity property the batch-selection guard
    // (symbol-disjoint prefix + created-pair bound) must preserve.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val got = BpeTrainer.train(spark, docs, "text", numMerges = 15)
      .orderBy("step").as[(Int, String, Long)].collect().toSeq

    // driver-side strict sequential reference over the same dictionary
    val dict0 = docs.where(col("text").isNotNull)
      .select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect()
    var dict = dict0.map { case (w, f) =>
      (w.split("").filter(_.nonEmpty).toSeq, f) }.toSeq
    val want = Seq.newBuilder[(Int, String, Long)]
    var step = 1
    var stop = false
    while (step <= 15 && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f }
      }
      val ranked = counts.toSeq.sortBy { case ((a, b), n) => (-n, a + " " + b) }
      if (ranked.isEmpty || ranked.head._2 < 2L) stop = true
      else {
        val ((a, b), n) = ranked.head
        want += ((step, s"$a $b", n))
        dict = dict.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (out.nonEmpty && out.last == a && x == b)
              out(out.length - 1) = a + b
            else out += x
          }
          (out.toSeq, f)
        }
        step += 1
      }
    }
    assert(got === want.result())
  }

  private val refMerges = Seq("u g", "u n", "h ug", "p un", "hug s",
    "p ug", "b un").map { m => val Array(a, b) = m.split(" ", 2); (a, b) }

  test("encodeWord replays the reference merge list exactly") {
    // hand-worked against the hug/pug merge table above
    assert(BpeTrainer.encodeWord("pug", refMerges) === Seq("pug"))
    assert(BpeTrainer.encodeWord("hugs", refMerges) === Seq("hugs"))
    assert(BpeTrainer.encodeWord("bun", refMerges) === Seq("bun"))
    // unseen word: only the applicable merges fire
    assert(BpeTrainer.encodeWord("snug", refMerges) === Seq("s", "n", "ug"))
    // merge order matters: (u,g) consumed u before (u,n) in "ung"? no --
    // u g fires first on the adjacency, leaving n unattached
    assert(BpeTrainer.encodeWord("gun", refMerges) === Seq("g", "un"))
    // empty merge list degenerates to characters
    assert(BpeTrainer.encodeWord("hug", Nil) === Seq("h", "u", "g"))
  }

  test("encode: zero merges counts characters, more merges never increases subwords") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 60)
    val merges = BpeTrainer.train(spark, docs, "text", numMerges = 10)
      .orderBy("step").select("pair").as[String].collect().toSeq
    assert(merges.size === 10)
    val e0 = BpeTrainer.encode(docs, "doc_id", "text", Nil)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    // zero merges: every token splits to its characters
    val charCounts = docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.ext.TextAnalysis.tokens(col("text"))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("doc_id").agg(
        count(lit(1)).as("nt"), sum(length(col("w"))).as("nc"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(e0.map(r => (r._1, r._2, r._3)).toSeq === charCounts.toSeq)
    val e5 = BpeTrainer.encode(docs, "doc_id", "text", merges.take(5))
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    val e10 = BpeTrainer.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    // token counts identical, subword counts monotonically non-increasing
    assert(e5.map(_._2).toSeq === e0.map(_._2).toSeq)
    assert(e10.zip(e5).forall { case (ten, five) => ten._3 <= five._3 })
    assert(e5.zip(e0).forall { case (five, zero) => five._3 <= zero._3 })
    // at least one merge actually fired on the corpus it was trained on
    assert(e10.map(_._3).sum < e0.map(_._3).sum)
    // fertility is the identical-operand division
    assert(e10.forall(r => r._4 === r._3.toDouble / r._2.toDouble))
  }
}
