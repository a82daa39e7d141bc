package graft

import org.apache.spark.sql.functions._

import graft.ext.{CorpusSampling, Relevance, Similarity}

/** Unit + invariant tests for ranked-retrieval relevance scoring
  * (document frequency, TF-IDF, BM25), temperature mixture sampling, and
  * hard-negative mining.
  */
class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "spark spark fast"),
    (1L, "spark slow"),
    (2L, "other words here entirely"),
    (3L, "fast fast fast other"),
    (4L, null.asInstanceOf[String])).toDF("doc_id", "text")

  test("documentFrequency counts distinct docs per term, skips NULL text") {
    val df = Relevance.documentFrequency(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(df("spark") === 2L)
    assert(df("fast") === 2L)   // docs 0 and 3, repeats in 3 count once
    assert(df("other") === 2L)
    assert(df("slow") === 1L)
    assert(df.values.sum === 10L) // 10 distinct (doc, term) postings
    assert(df.size === 7)         // 7 distinct terms; NULL doc contributes none
  }

  test("tfidf: scores match tf * ln(N/df) and k bounds the per-doc terms") {
    val out = Relevance.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // N = 4 docs with text
    val (tf, df0, score) = out((0L, "spark"))
    assert(tf === 2L && df0 === 2L)
    assert(math.abs(score - 2 * math.log(4.0 / 2)) < 1e-4)
    // per-doc cap respected
    val perDoc = out.keys.groupBy(_._1).view.mapValues(_.size)
    assert(perDoc.values.forall(_ <= 2))
    // doc 3: 'fast' (tf 3) must outrank 'other' (tf 1, same df)
    assert(out.contains((3L, "fast")))
  }

  test("bm25 matches the hand-evaluated Okapi formula") {
    val out = Relevance.bm25(docs, "doc_id", "text", Seq("spark", "fast"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val n = 4.0
    val dls = Map(0L -> 3.0, 1L -> 2.0, 2L -> 4.0, 3L -> 4.0)
    val avgdl = dls.values.sum / n
    def idf(df: Double) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def term(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    val expected0 = term(2, 2, dls(0L)) + term(1, 2, dls(0L)) // spark + fast
    assert(math.abs(out(0L)._1 - expected0) < 1e-3)
    assert(out(0L)._2 === 2L)                   // both query terms matched
    assert(out(1L)._2 === 1L)
    assert(!out.contains(2L))                   // no query term -> absent
    assert(!out.contains(4L))                   // NULL text -> absent
  }

  test("bm25TopK agrees with full bm25 ordering and is a TakeOrdered plan") {
    val top = Relevance.bm25TopK(docs, "doc_id", "text", Seq("spark", "fast"), k = 2)
    val full = Relevance.bm25(docs, "doc_id", "text", Seq("spark", "fast"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ids = top.select("doc_id").as[Long].collect().toSet
    val kept = full.toSeq.sortBy { case (id, s) =>
      (-math.round(s * 1e6), id) }.take(2).map(_._1).toSet
    assert(ids === kept)
    assert(top.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("tfidf vocabulary join broadcasts; no sort-merge join in the plan") {
    val p = Relevance.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin"))
  }

  private lazy val mixDocs = {
    // 40 'en', 10 'es', NULL-lang stragglers
    val rows = (0 until 40).map(i => (i.toLong, "en", s"text en $i")) ++
      (40 until 50).map(i => (i.toLong, "es", s"text es $i")) ++
      Seq((50L, null.asInstanceOf[String], "orphan"))
    rows.toDF("doc_id", "lang", "text")
  }

  test("temperatureSample: alpha=1 keeps natural proportions, alpha=0 equalizes") {
    def countsAt(alpha: Double) =
      CorpusSampling.temperatureSample(mixDocs, "lang", "text", "doc_id",
          alpha, totalDocs = 25L)
        .groupBy("lang").count().as[(String, Long)].collect().toMap
    // alpha=1: targets 25*(40/50)=20, 25*(10/50)=5
    assert(countsAt(1.0) === Map("en" -> 20L, "es" -> 5L))
    // alpha=0: every stratum weighs 1 -> 12 each (floor 12.5), es capped at 10
    val eq = countsAt(0.0)
    assert(eq("en") === 12L && eq("es") === 10L)
  }

  test("temperatureSample caps at stratum size, drops NULL strata, is deterministic") {
    val out = CorpusSampling.temperatureSample(mixDocs, "lang", "text", "doc_id",
      alpha = 0.5, totalDocs = 1000L)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts === Map("en" -> 40L, "es" -> 10L)) // capped, no NULL row
    val a = out.select("doc_id").as[Long].collect().sorted
    val b = CorpusSampling.temperatureSample(mixDocs, "lang", "text", "doc_id",
      alpha = 0.5, totalDocs = 1000L).select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("temperatureSample draw is a prefix of the stratifiedQuota order") {
    // both samplers share the (md5(text), id) order, so a temperature draw
    // of m docs from a stratum must equal that stratum's m-doc quota draw
    val temp = CorpusSampling.temperatureSample(mixDocs, "lang", "text", "doc_id",
        alpha = 1.0, totalDocs = 25L)
      .filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    val quota = CorpusSampling.stratifiedQuota(mixDocs, "lang", "text", "doc_id",
        quota = 20)
      .filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    assert(temp === quota)
  }

  test("bigramLmScore matches the hand-evaluated smoothed bigram model") {
    val corpus = Seq(
      (0L, "a b a b"),
      (1L, "a c"),
      (2L, "z"),                       // one token -> no bigram -> absent
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Relevance.bigramLmScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // uni: a=3 b=2 c=1 z=1, V=4, alpha=0.5
    // bi: "a b"=2, "b a"=1, "a c"=1
    def lp(b: Double, u: Double) = math.log((b + 0.5) / (u + 0.5 * 4))
    val d0 = (lp(2, 3) + lp(1, 2) + lp(2, 3)) / 3   // a b, b a, a b
    val d1 = lp(1, 3)                               // a c
    assert(out(0L)._1 === 3L)
    assert(math.abs(out(0L)._2 - d0) < 1e-3)
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - d1) < 1e-3)
    assert(!out.contains(2L) && !out.contains(3L))
    // fluent repeated phrasing outranks the one-off bigram
    assert(out(0L)._2 > out(1L)._2)
  }

  test("knLmScore matches the hand-evaluated interpolated Kneser-Ney model") {
    val corpus = Seq(
      (0L, "a b a b"),
      (1L, "a c"),
      (2L, "z"),                       // one token -> no bigram -> absent
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Relevance.knLmScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // bigram types: "a b"(n=2) "b a"(n=1) "a c"(n=1); n_types = 3
    // w1 stats: a -> c=3, succ=2; b -> c=1, succ=1
    // w2 continuation: a,b,c each complete 1 distinct context
    val D = 0.75
    def p(nB: Double, cW1: Double, succ: Double, cont: Double) =
      (nB - D) / cW1 + (D * succ / cW1) * (cont / 3.0)
    val d0 = (math.log(p(2, 3, 2, 1)) + math.log(p(1, 1, 1, 1)) +
      math.log(p(2, 3, 2, 1))) / 3
    val d1 = math.log(p(1, 3, 2, 1))
    assert(out(0L)._1 === 3L)
    assert(math.abs(out(0L)._2 - d0) < 1e-3)
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - d1) < 1e-3)
    assert(!out.contains(2L) && !out.contains(3L))
    // the repeated fluent phrase outranks the one-off bigram, as in the
    // add-alpha model — but through discounted ML + continuation mass
    assert(out(0L)._2 > out(1L)._2)
  }

  test("balanceShards: heavy-tailed corpus lands within 10% token spread, no global sort") {
    // heavy tail: doc length ~ 10 + (id % 97)^2 / 10 tokens
    val corpus = (0 until 600).map { i =>
      val n = 10 + (i % 97) * (i % 97) / 10
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = CorpusSampling.balanceShards(corpus, "doc_id", "text",
      nShards = 8, spread = 4)
    val totals = out.groupBy("shard")
      .agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(totals.size === 8)
    val (mx, mn) = (totals.values.max.toDouble, totals.values.min.toDouble)
    assert(mx / mn < 1.10, s"token spread ${mx / mn} (totals $totals)")
    // scale guard: the window partitions by the salt, never a global sort
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("Exchange hashpartitioning(_salt"),
      s"expected a salt-partitioned window:\n${p.take(2000)}")
    // determinism
    val again = CorpusSampling.balanceShards(corpus, "doc_id", "text",
        nShards = 8, spread = 4)
      .select("doc_id", "shard").as[(Long, Int)].collect().sorted
    val first = out.select("doc_id", "shard").as[(Long, Int)].collect().sorted
    assert(first.sameElements(again))
  }

  test("contaminationReport: shared-gram counts match decontaminate's verdict") {
    val base = "one two three four five six seven eight nine ten"
    val corpus = Seq(
      (0L, base),                         // quotes bench doc 100 fully
      (1L, "totally unrelated words that never collide with anything else"),
      (2L, base + " extra")).toDF("doc_id", "text")
    val bench = Seq((100L, base)).toDF("doc_id", "text")
    val rep = graft.ext.Dedup
      .contaminationReport(corpus, bench, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 10-token doc vs itself: 3 distinct 8-grams shared; doc 2 has 11
    // tokens so 3 of its 4 grams match the benchmark's 3
    assert(rep((0L, 100L)) === 3L)
    assert(rep((2L, 100L)) === 3L)
    assert(!rep.keySet.exists(_._1 == 1L))
    // forensics agree with the anti-join verdict: flagged ids == dropped ids
    val dropped = corpus.select("doc_id").except(
      graft.ext.Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 8)
        .select("doc_id"))
      .as[Long].collect().toSet
    assert(rep.keySet.map(_._1) === dropped)
  }

  test("curate: LM gate drops junk, dedup collapses copies, splits assigned") {
    // 8 fluent docs sharing common bigrams (one exact duplicate pair) + 2
    // junk docs made of one-off bigrams
    val fluent = (0 until 8).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val junk = Seq(
      (8L, "zxq wvk pqr mno"),
      (9L, "aaa bbb ccc ddd"))
    val corpus = (fluent ++ junk).toDF("doc_id", "text")
    val out = graft.ext.CorpusPipeline
      .curate(corpus, "doc_id", "text", lmPercentile = 0.25)
      .select("doc_id", "lm_score", "split")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    // junk scored below the 25th percentile -> gone
    assert(!out.map(_._1).toSet.exists(id => id >= 8L))
    // the 8 identical fluent docs collapse to ONE survivor: the lowest id
    assert(out.map(_._1).toSeq === Seq(0L))
    assert(Set("train", "val", "test").contains(out.head._3))
    // deterministic end to end
    val again = graft.ext.CorpusPipeline
      .curate(corpus, "doc_id", "text", lmPercentile = 0.25)
      .select("doc_id", "lm_score", "split")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.toSeq === again.toSeq)
  }

  test("quality classifier: separable corpus ranks perfectly; training is bit-deterministic") {
    import graft.ext.QualityClassifier
    val pos = (0 until 30).map(i =>
      (i.toLong, s"clean fluent prose sample number $i with good signal", 1.0))
    val neg = (30 until 60).map(i =>
      (i.toLong, s"zzxq wvrk junk garbage spam blob $i", 0.0))
    val labeled = (pos ++ neg).toDF("doc_id", "text", "y")
    val model = QualityClassifier.train(
      labeled, "doc_id", "text", "y", dims = 64, iters = 40, lr = 2.0)
    // held-out docs from each distribution, plus a tokenless doc
    val heldout = Seq(
      (100L, "another clean fluent prose sample with good signal"),
      (101L, "zzxq wvrk junk garbage spam blob again"),
      (102L, "   ")).toDF("doc_id", "text")
    val scores = QualityClassifier.score(heldout, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(100L) > 0.5, s"positive scored ${scores(100L)}")
    assert(scores(101L) < 0.5, s"negative scored ${scores(101L)}")
    assert(!scores.contains(102L)) // nothing to judge
    // bit-deterministic training: decimal gradient sums, fixed iterations
    val again = QualityClassifier.train(
      labeled, "doc_id", "text", "y", dims = 64, iters = 40, lr = 2.0)
    assert(model.weights.sameElements(again.weights))
    // training data itself separates perfectly at the 0.5 boundary
    val trainScores = QualityClassifier.score(labeled, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(trainScores.forall { case (id, p) =>
      if (id < 30) p > 0.5 else p < 0.5 })
  }

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f), 0),   // same label as 0 — never its negative
    (2L, Array(0.8f, 0.2f), 1),   // nearest different-label to 0
    (3L, Array(0.0f, 1.0f), 1),
    (4L, Array(-1.0f, 0.0f), 2)).toDF("vec_id", "embedding", "label")

  test("hardNegatives returns nearest DIFFERENT-label vectors only") {
    val probes = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val out = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label",
        probes, "q_id", "q_emb", "q_label", k = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(out === Set(2L, 3L)) // 1 excluded (same label), 4 beyond k
    val p = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label",
        probes, "q_id", "q_emb", "q_label", k = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("topPGate: exact discrete threshold from the value histogram, ties kept") {
    import spark.implicits._
    // sorted scores: 10,20,30,40,50,60,70,70,70,90 — keep 300 per mille
    // of n=10 gives rank r = 10 - 3 + 1 = 8, the 8th smallest is 70, and
    // score >= 70 keeps FOUR rows: the documented deterministic over-keep
    val scored = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L),
      (6L, 60L), (7L, 70L), (8L, 70L), (9L, 70L), (10L, 90L))
      .toDF("doc_id", "score_q")
    val kept = graft.ext.QualityClassifier.topPGate(scored, "score_q", 300L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(7L, 8L, 9L, 10L))
    // keepPerMille = 1000 keeps everything
    val all = graft.ext.QualityClassifier.topPGate(scored, "score_q", 1000L).count()
    assert(all == 10L)
  }

  test("bounded-histogram guards: float score columns are rejected by name") {
    import spark.implicits._
    val floats = Seq((1L, 0.25), (2L, 0.75)).toDF("doc_id", "score_q")
    val e1 = intercept[IllegalArgumentException] {
      graft.ext.QualityClassifier.topPGate(floats, "score_q", 500L)
    }
    assert(e1.getMessage.contains("topPGate requires an integer-typed score"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ext.Relevance.perplexityBuckets(floats, "score_q")
    }
    assert(e2.getMessage.contains("perplexityBuckets requires an integer-typed score"))
  }

  test("bounded-histogram guards: distinct-value ceiling fails fast") {
    import spark.implicits._
    val scored = (1L to 40L).map(i => (i, i * 7L)).toDF("doc_id", "score_q")
    val e1 = intercept[IllegalArgumentException] {
      graft.ext.QualityClassifier.topPGate(scored, "score_q", 500L,
        maxDistinctScores = 10L)
    }
    assert(e1.getMessage.contains("exceed the bounded-histogram ceiling 10"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ext.Relevance.perplexityBuckets(scored, "score_q",
        maxDistinctScores = 10L)
    }
    assert(e2.getMessage.contains("exceed the bounded-histogram ceiling 10"))
    // and the same data passes under the default ceiling
    assert(graft.ext.QualityClassifier.topPGate(scored, "score_q", 500L).count() == 20L)
  }
}
