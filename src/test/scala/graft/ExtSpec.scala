package graft

import org.apache.spark.sql.functions._

import graft.ext.{CorpusPipeline, Dedup, Multimodal, Similarity, TextAnalysis}

/** Unit + invariant tests for the training-data extension operators. */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),        // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"),        // near dup of 0
    (3L, "completely different content about spark engines"),
    (4L, "el rapido zorro marron salta sobre el perro"),
    (5L, "a a a the the of and")).toDF("doc_id", "text")

  test("exact dedup groups duplicate texts under the smallest id") {
    val g = Dedup.exactGroups(docs, "doc_id", col("text"))
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toMap
    assert(g(0L) === 2L) // docs 0 and 1
    assert(g(2L) === 1L)
  }

  test("ngram jaccard: hand-computed overlap") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // docs 0,1 identical -> jaccard 1.0
    assert(pairs((0L, 1L)) === 1.0)
    // docs 0,2: tokens {the,quick,brown,fox,jumps,over,lazy,dog} vs {...cat}
    // shared 7, union 9
    assert(pairs((0L, 2L)) === 7.0 / 9)
    assert(!pairs.contains((0L, 3L)))
  }

  test("minhash signatures of identical docs are identical; dedup assigns shared rep") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 32).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sig(0L) === sig(1L))
    assert(sig(0L) !== sig(3L))

    val rep = Dedup.minhashDedup(docs, "doc_id", "text")
      .select("doc_id", "rep_id").as[(Long, Long)].collect().toMap
    assert(rep(1L) === 0L)     // exact dup maps to representative 0
    assert(rep(0L) === 0L)
    assert(rep.forall { case (id, r) => r <= id })
  }

  test("minhash candidate pairs surface exact and near duplicates") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    // near-dup 0-2 has jaccard 0.78; with 8 bands of 4 the expected surface
    // probability is 1-(1-0.78^4)^8 ≈ 0.97 — deterministic here, assert it
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.contains((0L, 4L)))
  }

  test("minhash clustering is transitive: chained near-dups share one cluster") {
    // x ~ y (1 word differs), y ~ z (another word differs); x and z differ
    // in 2 of 10 words. Transitive closure must place all three together
    // even if x and z never share a bucket directly.
    val chain = Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (11L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 CHANGED"),
      (12L, "ALTERED w2 w3 w4 w5 w6 w7 w8 w9 CHANGED"),
      (13L, "totally unrelated text about other things entirely"))
      .toDF("doc_id", "text")
    val clusters = graft.ext.Dedup.minhashDedupClusters(chain, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(clusters(10L) === 10L)
    assert(clusters(11L) === 10L)
    assert(clusters(12L) === 10L) // reached transitively through 11
    assert(clusters(13L) === 13L)
  }

  test("minhash clustering: durable checkpoint truncates lineage to a reliable store") {
    val chain = Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (11L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 CHANGED"),
      (12L, "ALTERED w2 w3 w4 w5 w6 w7 w8 w9 CHANGED"),
      (13L, "totally unrelated text about other things entirely"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    try {
      val durable = graft.ext.Dedup.minhashDedupClusters(
          chain, "doc_id", "text", checkpointDir = Some(dir))
      // identical labels to the localCheckpoint path
      assert(durable.as[(Long, Long)].collect().toMap ===
        Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 13L))
      // lineage actually truncated onto the RELIABLE store: the RDD is
      // reliably checkpointed and blocks landed under the checkpoint dir
      assert(durable.rdd.toDebugString.contains("ReliableCheckpointRDD"),
        s"result lineage not reliably checkpointed:\n${durable.rdd.toDebugString}")
      def filesUnder(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally s.close()
      }
      assert(filesUnder(java.nio.file.Paths.get(dir)) > 0,
        s"no checkpoint files written under $dir")
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val children = java.nio.file.Files.list(p)
          try children.forEach(rm(_)) finally children.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(java.nio.file.Paths.get(dir))
    }
  }

  test("simhash: HOF column variant and scale-path table variant agree") {
    val fromCol = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sim"))
      .as[(Long, Long)].collect().toMap
    val fromTable = Dedup.simhashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fromCol === fromTable)
    assert(fromCol(0L) === fromCol(1L)) // identical docs, identical fingerprint
  }

  test("simhash pairs: identical docs collapse to one intra-class row") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text")
      .as[(Long, Long, Int, Long)].collect()
    // docs 0 and 1 share a fingerprint: ONE row (rep, rep, 0, C(2,2)=1),
    // never an exploded (0, 1) document pair
    assert(pairs.exists { case (a, b, h, n) => a == 0L && b == 0L && h == 0 && n == 1L })
    assert(!pairs.exists { case (a, b, _, _) => a == 0L && b == 1L })
  }

  test("simhash dedup assignment: keep/drop with identical-class collapse") {
    val got = Dedup.simhashDedup(docs, "doc_id", "text")
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, rep, dup) => id -> ((rep, dup)) }.toMap
    assert(got.size === 6) // one row per document, always
    assert(got(0L) === ((0L, false))) // class rep keeps itself
    assert(got(1L) === ((0L, true))) // identical twin drops to the rep
    // the documented ONE-STEP semantics against an explicit model
    // (advice r16: "every rep is itself kept" is NOT implied by one-step
    // propagation — a rep chain A–B, B–C with no A–C edge leaves C at B
    // while B itself drops to A — so assert the actual contract instead
    // of a chain-free fixture coincidence): rep(doc) = min of its own
    // class rep and the reps of every class within Hamming <= 3
    val sigs = Dedup.simhashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect()
    val crep = sigs.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._1).min }
    val model = sigs.map { case (id, s) =>
      val nbr = crep.keys.filter(t =>
        t != s && java.lang.Long.bitCount(s ^ t) <= 3).map(crep)
      id -> (crep(s) +: nbr.toSeq).min
    }.toMap
    got.foreach { case (id, (rep, dup)) =>
      assert(rep === model.getOrElse(id, id), s"doc $id rep")
      assert(dup === (rep != id), s"doc $id is_dup")
    }
  }

  test("simhash dedup: output rows stay LINEAR when a class is replicated") {
    // 40 copies of one text + 3 distinct docs: the exploded pair list
    // would be C(40,2) = 780 rows; the collapsed pairs API emits ONE
    // intra-class row for the clones and the assignment stays 43 rows.
    val clones = (0 until 40).map(i => (i.toLong, "same boilerplate page body"))
    val rest = Seq((100L, "unique document alpha content"),
      (101L, "another very different beta body"),
      (102L, "gamma text unlike the others entirely"))
    val corpus = (clones ++ rest).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text")
      .as[(Long, Long, Int, Long)].collect()
    val intra = pairs.filter(p => p._1 == 0L && p._2 == 0L)
    assert(intra.length === 1 && intra.head._4 === 780L) // C(40,2) as ONE row
    val assign = Dedup.simhashDedup(corpus, "doc_id", "text")
      .as[(Long, Long, Boolean)].collect()
    assert(assign.length === 43)
    assert(assign.count { case (id, rep, dup) => rep == 0L && dup == (id != 0L) } >= 40)
  }

  test("simhash pairs: ALL hamming<=3 pairs found (4-band pigeonhole recall)") {
    // Long docs (300 distinct words) with one word swapped per variant:
    // large token sets push each bit's vote sum away from zero, so a
    // single-token change flips only a few fingerprint bits — producing
    // genuine pairs in the 1..3 Hamming range whose differing bits land in
    // arbitrary bands.
    val base = (1 to 300).map(i => s"w$i")
    val corpus = (0 until 24).map { i =>
      val words = if (i == 0) base else base.updated((i * 13) % 300, s"X$i")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")

    val sims = Dedup.simhashTable(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // the fixture naturally contains identical-fingerprint classes (a
    // one-word swap does not always flip a bit), so this exercises BOTH
    // the collapse and the cross-class banding
    val classes = sims.groupBy(_._2).map { case (sim, m) =>
      sim -> ((m.keys.min, m.size.toLong))
    }
    val expIntra = classes.values.collect { case (rep, cnt) if cnt >= 2 =>
      (rep, rep, 0, cnt * (cnt - 1) / 2)
    }.toSet
    val expCross = (for {
      (sa, (ra, ca)) <- classes; (sb, (rb, cb)) <- classes if sa < sb
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (math.min(ra, rb), math.max(ra, rb), h, ca * cb)).toSet
    val expected = expIntra ++ expCross
    val found = Dedup.simhashPairs(corpus, "doc_id", "text")
      .as[(Long, Long, Int, Long)].collect().toSet

    assert(expIntra.nonEmpty && expCross.nonEmpty,
      "fixture must exercise both intra-class and cross-class rows")
    assert(found === expected) // exact recall AND precision within the radius
    // pair-count conservation: sum of n_pairs equals the exploded count
    val exploded = (for {
      a <- sims.keys.toSeq; b <- sims.keys.toSeq if a < b
      if java.lang.Long.bitCount(sims(a) ^ sims(b)) <= 3
    } yield 1).sum
    assert(found.toSeq.map(_._4).sum === exploded.toLong)
    // witness that single-band (high-16-bit) bucketing was lossy: at least
    // one recovered pair disagrees on the high band, so the pre-fix code
    // would have missed it
    assert(expected.exists { case (a, b, h, _) =>
      h >= 1 && (sims(a) >>> 48) != (sims(b) >>> 48)
    })
  }

  test("simhash clusters: transitive closure over Hamming-verified class components") {
    // reuse the word-swap corpus: chains of near-identical fingerprints
    // must merge transitively even when the endpoints exceed maxHamming
    val base = (1 to 300).map(i => s"w$i")
    val corpus = (0 until 24).map { i =>
      val words = if (i == 0) base else base.updated((i * 13) % 300, s"X$i")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sims = Dedup.simhashTable(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // expected components: union-find over class pairs within hamming<=3
    // that share at least one of the 4 16-bit bands (the operator's own
    // candidate guarantee covers hamming<=3 by pigeonhole)
    val parent = scala.collection.mutable.Map(sims.values.toSeq.distinct.map(s => s -> s): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      a <- sims.values.toSeq.distinct; b <- sims.values.toSeq.distinct
      if a < b && java.lang.Long.bitCount(a ^ b) <= 3
    } { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    val expected = sims.map { case (id, sim) =>
      val root = find(sim)
      val members = sims.collect { case (i2, s2) if find(s2) == root => i2 }
      id -> members.min
    }
    val got = Dedup.simhashDedupClusters(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
    // sanity: the closure actually merged something beyond one class
    assert(got.values.toSet.size < sims.values.toSet.size)
  }

  test("cosine: identical=1, orthogonal=0; brute-force top-k ranks correctly") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
      (3L, Array(0.9f, 0.1f, 0.0f)))   // close to 0
      .toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        probes, "q_id", "q_emb", k = 3)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    assert(top(1L) === 1.0)
    assert(math.abs(top(2L)) < 1e-12)
    assert(top(3L) > 0.99 && top(3L) < 1.0)
  }

  test("hyperplane LSH: identical vectors share a signature; lshTopK finds them") {
    val vecs = Seq(
      (0L, Array.tabulate(16)(i => i.toFloat)),
      (1L, Array.tabulate(16)(i => i.toFloat)),
      (2L, Array.tabulate(16)(i => -i.toFloat)))
      .toDF("vec_id", "embedding")
    val sigs = Similarity.hyperplaneSignatures(vecs, "vec_id", "embedding", 8)
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) === sigs(1L))
    assert(sigs(0L) !== sigs(2L)) // antipodal vectors flip every bit

    val probes = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val found = Similarity.lshTopK(vecs, "vec_id", "embedding",
        probes, "q_id", "q_emb", k = 5, bits = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(found.contains(1L))
  }

  test("text analysis: tokens, stopwords, language id, fingerprint") {
    val one = docs.filter(col("doc_id") === 0)
    assert(one.select(TextAnalysis.tokenCount(col("text"))).as[Long].head() === 9L)
    assert(one.select(TextAnalysis.stopwordRatio(col("text"), Seq("the", "a")))
      .as[Double].head() === 2.0 / 9)

    val langs = docs.select(col("doc_id"), TextAnalysis.languageId(col("text")))
      .as[(Long, String)].collect().toMap
    assert(langs(0L) === "en")
    assert(langs(4L) === "es")
    assert(langs(3L) === "und") // no markers at all

    val fp = docs.filter(col("doc_id") === 0)
      .select(TextAnalysis.fingerprint(col("text"))).as[String].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("the quick brown fox jumps over the lazy dog".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp === expected)
  }

  test("subword pre-tokenization splits letter/digit/punct runs with leading space") {
    val df = Seq((1L, "don't stop, it's 2x faster!")).toDF("doc_id", "text")
    val toks = df.select(TextAnalysis.subwordTokens(col("text")))
      .as[Seq[String]].collect()(0)
    assert(toks === Seq("don", "'", "t", " stop", ",", " it", "'", "s",
      " 2", "x", " faster", "!"))
    val counts = df.select(TextAnalysis.subwordTokenCount(col("text")),
      TextAnalysis.tokenCount(col("text"))).as[(Long, Long)].collect()(0)
    assert(counts === ((12L, 5L)))
  }

  test("winnowing: docs sharing a long substring share a fingerprint, disjoint docs don't") {
    val k = 8; val w = 4
    val shared = "zyxwvutsrqponmlk" // 16 chars >= w + k - 1 = 11
    val df = Seq(
      (1L, s"aaaa bbbb $shared cccc dddd"),
      (2L, s"1111 2222 3333 $shared 44"),
      (3L, "completely unrelated words here with no overlap at all"),
      (4L, "tiny")) // shorter than k+w-1: no full window, no rows
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(df, "doc_id", "text", k, w)
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // guarantee: a shared substring of length >= w+k-1 forces a shared
    // fingerprint (some full window of gram hashes lies inside it)
    assert((fps(1L) & fps(2L)).nonEmpty, "shared substring produced no shared fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint docs share a fingerprint (hash collision or window bug)")
    assert(!fps.contains(4L), "sub-window doc should yield no fingerprints")
  }

  test("repetition signals: duplicate token/ngram fractions and top-token mass") {
    val df = Seq(
      (0L, Option("a b a")),          // 3 tokens, 2 distinct
      (1L, Option("a b a b a")),      // 3-grams: aba, bab, aba -> 3 total, 2 distinct
      (2L, Option("x y")),            // < 3 tokens: no 3-gram
      (3L, None: Option[String])      // NULL text
    ).toDF("doc_id", "text")

    val perRow = df.select(col("doc_id"),
      TextAnalysis.dupTokenFrac(col("text")).as("dt"),
      TextAnalysis.dupNgramFrac(col("text"), 3).as("dg"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
         Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(perRow(0L) == (Some(1.0 / 3), Some(0.0))) // exactly 1 3-gram, unique
    assert(perRow(1L) == (Some(3.0 / 5), Some(1.0 / 3)))
    assert(perRow(2L) == (Some(0.0), None))
    assert(perRow(3L) == (None, None))

    val top = TextAnalysis.topTokenFrac(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(top(0L) == 2.0 / 3)
    assert(top(1L) == 3.0 / 5)
    assert(!top.contains(3L)) // NULL text explodes to nothing (documented)
  }

  test("wordNgrams: NULL (not a crash) for documents shorter than n tokens") {
    val df = Seq((1L, Option("x y")), (2L, Option("a b c")),
      (3L, None: Option[String])).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysis.wordNgrams(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty) // 2 tokens < n: no gram, and no index-0 throw
    assert(got(3L).isEmpty)
    assert(got(2L).map(_.asInstanceOf[scala.collection.Seq[String]].toSeq)
      == Some(Seq("a b c")))
  }

  test("native dup-ngram fraction equals the HOF form on real docs and edge cases") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val both = real.select(col("doc_id"),
      TextAnalysis.dupNgramFrac(col("text"), 3).as("hof"),
      TextAnalysis.dupNgramFracNative(col("text"), 3).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(Option(r.get(1)) == Option(r.get(2)), s"doc ${r.getLong(0)}")
    }

    // whitespace edges: leading tab (empty first token), trailing newline
    // (empty last token), NULL text — tokenization must match split(trim())
    val edge = Seq((1L, Option("\ta b a b")), (2L, Option("a b a b\n")),
      (3L, None: Option[String])).toDF("doc_id", "text")
    val e = edge.select(col("doc_id"),
      TextAnalysis.dupNgramFrac(col("text"), 2).as("hof"),
      TextAnalysis.dupNgramFracNative(col("text"), 2).as("native")).collect()
    e.foreach { r =>
      assert(Option(r.get(1)) == Option(r.get(2)), s"doc ${r.getLong(0)}")
    }
  }

  test("native winnowing expression equals the composed window form on real docs") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val composed = TextAnalysis.winnowFingerprints(real, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = TextAnalysis.winnowFingerprintsNative(real, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native.nonEmpty)
    assert(native == composed)

    // edge cases: short doc (no full window) and NULL text yield no rows
    val edge = Seq((1L, Option("tiny")), (2L, None: Option[String]),
      (3L, Option("x" * 11))).toDF("doc_id", "text") // 11 = k + w - 1 exactly
    val e = TextAnalysis.winnowFingerprintsNative(edge, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(e == Set(3L))
  }

  test("incremental dedup: corpus hits dropped, within-batch dups collapse") {
    val corpus = Seq((1L, "existing document one"), (2L, "existing document two"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "existing document one"),   // already in corpus (exact) -> dropped
      (11L, "EXISTING document two  "), // corpus dup after normalization -> dropped
      (12L, "a brand new document"),
      (13L, "a brand new document"),    // within-batch dup of 12 -> dropped
      (14L, "another new one")
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup.incrementalDedup(batch, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(12L, 14L))
  }

  test("decontaminate: 8-gram overlap drops, short/NULL/unrelated docs pass") {
    val leaked = "one two three four five six seven eight"  // exactly 8 tokens
    val bench = Seq((100L, s"benchmark question says $leaked end"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"prefix words then $leaked and a suffix"), // shares the 8-gram -> dropped
      (2L, "one two three four five six seven"),       // 7-token sub-gram only -> kept
      (3L, "a completely unrelated training document with enough tokens"),
      (4L, null.asInstanceOf[String]),                 // no grams -> kept
      (5L, "short doc")                                // < 8 tokens -> kept
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 3L, 4L, 5L))
  }

  test("pack sequences: contiguous stream, spanning docs, zero-token placement") {
    val df = Seq(
      (1L, "a b c"),                      // 3 tokens
      (2L, "d e f g"),                    // 4
      (3L, "h i j k l m n"),              // 7 > seqTokens -> must span
      (4L, null.asInstanceOf[String]),    // 0 tokens
      (5L, "o p")                         // 2
    ).toDF("doc_id", "text")
    val got = graft.ext.CorpusSampling.packSequences(
        df, "doc_id", "text", seqTokens = 6L, shard = lit(0L))
      .select("doc_id", "n_tokens", "seq_first", "seq_last", "seq_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 5)
    // stream contiguity: global starts are exactly the prefix sums of
    // n_tokens in start order, ending at the 16-token total
    val starts = got.map(r => (r._3 * 6 + r._5, r._2)).sortBy(_._1)
    val prefix = starts.map(_._2).scanLeft(0L)(_ + _)
    assert(starts.map(_._1).sameElements(prefix.init))
    assert(prefix.last == 16L)
    val byId = got.map(r => r._1 -> r).toMap
    // every offset inside a sequence; first <= last always
    assert(got.forall(r => r._5 >= 0 && r._5 < 6 && r._3 <= r._4))
    // the 7-token doc cannot fit in one 6-token sequence
    assert(byId(3L)._4 > byId(3L)._3)
    // zero-token doc sits AT the cut position, spanning nothing
    assert(byId(4L)._2 == 0L && byId(4L)._3 == byId(4L)._4)
    // determinism: same input -> identical layout
    val again = graft.ext.CorpusSampling.packSequences(
        df, "doc_id", "text", seqTokens = 6L, shard = lit(0L))
      .select("doc_id", "n_tokens", "seq_first", "seq_last", "seq_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("mean-pool embeddings: elementwise means, NULL vectors contribute nothing") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f)),
      (0L, Array(3.0f, 6.0f)),
      (1L, Array(5.0f, 5.0f)),
      (2L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    val got = graft.ext.Similarity.meanPoolEmbeddings(df, col("vec_id"), "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    assert(got == Map(0L -> List(2.0, 4.0), 1L -> List(5.0, 5.0)))
    // group 2 had only a NULL vector -> absent, not an empty array
    assert(!got.contains(2L))
  }

  test("percentile filter: exact R-7 threshold, approx variant close on small data") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "score")
    val exact = graft.ext.CorpusSampling.percentileFilter(df, col("score"), 0.25)
      .select("id").as[Long].collect().sorted
    // R-7 p25 over 1..100 = 25.75 -> survivors are 26..100
    assert(exact.head == 26L && exact.length == 75)
    val approx = graft.ext.CorpusSampling
      .percentileFilter(df, col("score"), 0.25, approx = true)
      .select("id").as[Long].collect().sorted
    // sketch threshold lands on an observed value near the true quantile
    assert(math.abs(approx.length - 75) <= 2)
  }

  test("winnow copy-detection pairs: shared-substring docs pair, disjoint don't") {
    val shared = "a very long shared passage that both documents quote verbatim"
    val df = Seq(
      (1L, s"first document intro. $shared. first outro."),
      (2L, s"second document begins differently yet contains $shared inside."),
      (3L, "a completely unrelated text with no overlap whatsoever at all"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowCandidatePairs(df, "doc_id", "text", minShared = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // winnowing guarantee: long shared substring
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("token chunking: coverage, overlap, short tail, short-doc and NULL edges") {
    val df = Seq(
      (1L, Option("t1 t2 t3 t4 t5 t6 t7")),
      (2L, Option("a b")),                 // shorter than one chunk
      (3L, None: Option[String])           // NULL -> no rows
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(df, "doc_id", "text", chunkTokens = 3, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, "t1 t2 t3", 3L),
      (1L, 1L, "t3 t4 t5", 3L),
      (1L, 2L, "t5 t6 t7", 3L),
      (2L, 0L, "a b", 2L)))

    // reconstruction: stride == chunkTokens (no overlap) concatenates back
    val whole = TextAnalysis.chunkByTokens(df.filter(col("doc_id") === 1),
        "doc_id", "text", chunkTokens = 3, stride = 3)
      .orderBy("chunk_id").collect().map(_.getString(2)).mkString(" ")
    assert(whole == "t1 t2 t3 t4 t5 t6 t7")
  }

  test("stratified sampling: quota respected, deterministic, budget monotone") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")

    val s1 = graft.ext.CorpusSampling.stratifiedQuota(
      real, "lang", "text", "doc_id", quota = 10)
    val perLang = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.values.forall(_ <= 10))
    // determinism: a second run selects the identical sample
    val again = graft.ext.CorpusSampling.stratifiedQuota(
      real, "lang", "text", "doc_id", quota = 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == s1.select("doc_id").as[Long].collect().sorted.toSeq)
    // plan: rank-limit pushdown keeps beyond-quota rows off the exchange
    assert(s1.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))

    val b = graft.ext.CorpusSampling.tokenBudget(
      real, "lang", "text", "doc_id", budget = 500L)
    val sums = b.groupBy("lang").agg(sum("n_tokens").as("s"))
      .as[(String, Long)].collect().toMap
    assert(sums.values.forall(_ <= 500L))
    // a larger budget only ADDS documents (prefix property of the order)
    val small = b.select("doc_id").as[Long].collect().toSet
    val large = graft.ext.CorpusSampling.tokenBudget(
      real, "lang", "text", "doc_id", budget = 1500L)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(large))

    // weighted mixture: per-stratum caps hold, unlisted strata excluded,
    // and a uniform map equals the single-budget form
    val mix = graft.ext.CorpusSampling.tokenBudgetByStratum(
      real, "lang", "text", "doc_id", Map("en" -> 800L, "de" -> 300L))
    val mixSums = mix.groupBy("lang").agg(sum("n_tokens").as("s"))
      .as[(String, Long)].collect().toMap
    assert(mixSums.keySet.subsetOf(Set("en", "de")))
    assert(mixSums.getOrElse("en", 0L) <= 800L && mixSums.getOrElse("de", 0L) <= 300L)
    // precondition for the equivalence below: tokenBudget includes a NULL
    // stratum, the map variant excludes it (and rejects null map keys) —
    // make the assumption visible instead of inheriting it from testdata
    val langs = real.select("lang").distinct().as[String].collect()
    assert(!langs.contains(null), "testdata grew NULL langs; filter them here")
    val uniformMap = graft.ext.CorpusSampling.tokenBudgetByStratum(
      real, "lang", "text", "doc_id", langs.map(_ -> 500L).toMap)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(uniformMap == b.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("jsonl roundtrip preserves nulls, unicode, quotes, and newlines") {
    val df = Seq(
      (1L, Option("line1\nline2 é中文 \"quoted\" \\slash")),
      (2L, None: Option[String]),
      (3L, Option(""))).toDF("id", "text")
    val path = "/tmp/graft_test_jsonl"
    graft.sources.Sources.writeJsonl(df, path)
    val back = graft.sources.Sources.jsonLinesWithSchema(spark, path, df.schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("punctuation ratio counts punctuation characters over total length") {
    val df = Seq((1L, "a,b.c!"), (2L, "abcdef")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.punctRatio(col("text")))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) === 3.0 / 6)
    assert(out(2L) === 0.0)
  }

  test("SpaceSaving: exact when k >= cardinality, bounded error under eviction") {
    import graft.ext.Sketches
    // exact regime: 3 distinct values, k=8
    val data = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(5)("c"))
    val exact = data.toDF("v")
      .agg(Sketches.spaceSaving(8)(col("v")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select("h.value", "h.count", "h.error")
      .as[(String, Long, Long)].collect().toSeq
    assert(exact === Seq(("a", 50L, 0L), ("b", 30L, 0L), ("c", 5L, 0L)))

    // eviction regime: 40 distinct values, k=4; the two true heavy hitters
    // (frequency > N/k) must survive with count >= true count
    val skewed = Seq.fill(200)("hot1") ++ Seq.fill(150)("hot2") ++
      (1 to 38).flatMap(i => Seq.fill(3)(s"cold$i"))
    val hh = skewed.toDF("v")
      .agg(Sketches.spaceSaving(4)(col("v")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select("h.value", "h.count", "h.error")
      .as[(String, Long, Long)].collect()
      .map { case (v, c, e) => v -> ((c, e)) }.toMap
    assert(hh.size === 4)
    assert(hh.contains("hot1") && hh.contains("hot2"))
    val (c1, e1) = hh("hot1")
    assert(c1 >= 200L && c1 - e1 <= 200L) // overestimate bounded by error
  }

  test("multi-probe embedding near-dup: superset of single-probe pairs, no duplicates") {
    val d = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$d/embeddings.parquet").select("vec_id", "embedding")
    def pairsOf(hamming: Int) = Dedup.embeddingNearDupPairs(
        e, "vec_id", "embedding", threshold = 0.35, bits = 8,
        probeHamming = hamming)
      .select("id1", "id2").as[(Long, Long)].collect()
    val single = pairsOf(0)
    val multi = pairsOf(1)
    assert(multi.length === multi.toSet.size, "duplicate pairs under multi-probe")
    assert(single.toSet.subsetOf(multi.toSet),
      "multi-probe lost pairs single-probe found")
    assert(multi.length >= single.length)
  }

  test("semDeDup: drop rule exact on real embeddings, duplicates collapse to min id") {
    val d = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$d/embeddings.parquet").select("vec_id", "embedding")
    // plant exact duplicates of the first two vectors under HIGHER ids so
    // the keep-lowest-index rule is exercised deterministically (cosine of
    // an exact copy is 1.0 >= any eps, and copies share a cluster — the
    // argmax is a pure function of the vector)
    val base = e.as[(Long, Array[Float])].collect()
    val planted = (base ++ base.take(2).map { case (id, v) => (id + 100000L, v) })
      .toSeq.toDF("vec_id", "embedding")
    val eps = 0.4
    val kept = Dedup.semDeDup(planted, "vec_id", "embedding", eps, nCentroids = 8)
    val keptIds = kept.select("vec_id").as[Long].collect().toSet
    assert(!keptIds.contains(100000L) && !keptIds.contains(100001L),
      "planted exact duplicates must drop (their originals have lower ids)")
    assert(keptIds.contains(base.head._1))

    // replay the rule exactly: dropped iff exists lower-id same-cluster
    // neighbor with cosine >= eps
    val cents = Similarity.centroidsFor(planted, "vec_id", "embedding", 8, "kmeans")
    val assigned = Similarity.assignToCentroids(planted, "embedding", cents)
      .select(col("vec_id"), col("_c_id"), col("embedding"))
      .as[(Long, Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCluster = assigned.groupBy(_._2)
    val expectedKept = assigned.filter { case (id, c, v) =>
      !byCluster(c).exists { case (id2, _, v2) => id2 < id && cos(v, v2) >= eps }
    }.map(_._1).toSet
    assert(keptIds === expectedKept, "operator diverges from the paper's drop rule")
    // survivors exist and something real (beyond the planted pair) dropped
    assert(keptIds.nonEmpty && keptIds.size < planted.count())
  }

  test("incrementalSemDedup: screen rule exact vs local replay; index survives parquet") {
    val d = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val (corpusRows, batchTail) = e.partition(_._1 < 250)
    // plant: a batch clone of a corpus vector (must dup onto the corpus
    // id) and a pair of batch-only clones (must collapse onto the lower
    // batch id when no corpus neighbor wins)
    val batchRows = batchTail ++ Seq(
      (900000L, corpusRows.head._2.clone()),
      (900001L, batchTail.head._2.clone()))
    val corpus = corpusRows.toSeq.toDF("vec_id", "embedding")
    val batch = batchRows.toSeq.toDF("vec_id", "embedding")
    val eps = 0.4
    val index = Dedup.semDedupIndex(corpus, "vec_id", "embedding", nCentroids = 8)
    val out = Dedup.incrementalSemDedup(batch, index, "vec_id", "embedding", eps)
      .select("vec_id", "rep_id", "is_dup")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // local replay of the whole admission: frozen corpus quantizer,
    // argmax assignment of both halves, float-unit dot screens
    val cents = Similarity.centroidsFor(corpus, "vec_id", "embedding", 8, "kmeans")
    def unit(v: Array[Float]): Array[Float] = {
      var n2 = 0.0
      for (x <- v) n2 += x.toDouble * x.toDouble
      val n = math.sqrt(n2)
      v.map(x => (x.toDouble / n).toFloat)
    }
    def fdot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      for (i <- a.indices) s += a(i).toDouble * b(i).toDouble
      s
    }
    val assignAll = Similarity.assignToCentroids(
        (corpusRows ++ batchRows).toSeq.toDF("vec_id", "embedding"),
        "embedding", cents)
      .select(col("vec_id"), col("_c_id")).as[(Long, Long)].collect().toMap
    val corpusByC = corpusRows.groupBy(r => assignAll(r._1))
    val batchByC = batchRows.groupBy(r => assignAll(r._1))
    val expected = batchRows.map { case (bid, bv) =>
      val c = assignAll(bid)
      val bu = unit(bv)
      val crep = corpusByC.getOrElse(c, Array.empty)
        .filter(m => fdot(bu, unit(m._2)) >= eps).map(_._1)
        .minOption
      val brep = batchByC(c)
        .filter(p => fdot(bu, unit(p._2)) >= eps).map(_._1)
        .minOption
      val rep = crep.orElse(brep).getOrElse(bid)
      bid -> ((rep, rep != bid))
    }.toMap
    assert(out === expected, "operator diverges from the admission rule")
    // the planted rows behave as designed
    assert(out(900000L) === ((corpusRows.head._1, true)),
      "corpus clone must drop onto its corpus representative")
    assert(out(900001L)._1 <= batchTail.head._1 && out(900001L)._2,
      "batch clone must drop onto a batch representative")
    assert(out.exists(!_._2._2), "some batch rows must admit")

    // persistence contract: the index round-trips through parquet and
    // screens identically (the recurring-crawl shape)
    val idxPath = java.nio.file.Files.createTempDirectory("graft-semidx")
      .resolve("index.parquet").toString
    index.write.mode("overwrite").parquet(idxPath)
    val out2 = Dedup.incrementalSemDedup(
        batch, spark.read.parquet(idxPath), "vec_id", "embedding", eps)
      .select("vec_id", "rep_id", "is_dup")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out2 === out, "persisted index screens differently")

    // NULL-embedding batch rows ride the spine and admit
    val withNull = batch.unionByName(
      Seq((999999L, null.asInstanceOf[Array[Float]]))
        .toDF("vec_id", "embedding"))
    val nullRow = Dedup.incrementalSemDedup(
        withNull, index, "vec_id", "embedding", eps)
      .filter(col("vec_id") === 999999L)
      .select("rep_id", "is_dup").as[(Long, Boolean)].collect()
    assert(nullRow.toSeq === Seq((999999L, false)))

    // EMPTY-INDEX BOOTSTRAP (review r17): a first crawl batch screens
    // against an empty corpus index by self-screening through a
    // batch-local quantizer — the bandsFromIndex fallback contract for
    // the semantic modality. Clone pairs collapse onto the lower batch
    // id; an all-NULL batch admits everything.
    val emptyIdx = index.filter(col("kind") === "nothing")
    val boot = Dedup.incrementalSemDedup(
        batch, emptyIdx, "vec_id", "embedding", eps)
      .select("vec_id", "rep_id", "is_dup")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(boot(900001L)._1 <= batchTail.head._1 && boot(900001L)._2,
      "bootstrap: batch clone must still collapse onto a batch rep")
    assert(boot.exists(!_._2._2), "bootstrap: some batch rows must admit")
    assert(boot.forall { case (bid, (rep, _)) => rep <= bid },
      "bootstrap rep must be a min-id representative")
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val nullBoot = Dedup.incrementalSemDedup(
        allNull, emptyIdx, "vec_id", "embedding", eps)
      .select("vec_id", "rep_id", "is_dup").as[(Long, Long, Boolean)].collect()
    assert(nullBoot.toSeq === Seq((1L, 1L, false)))
  }

  test("corpus pipeline: each dedup stage's invariant holds on real testdata") {
    val d = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text")
    val survivors = CorpusPipeline.dedupCorpus(corpus, "doc_id", "text")

    // stage 1: survivors carry pairwise-distinct content fingerprints
    val n = survivors.count()
    val distinctFp = survivors
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .distinct().count()
    assert(n === distinctFp, s"$n survivors but $distinctFp distinct fingerprints")
    assert(n > 0 && n < corpus.count())

    // stage 2: the near-dup pass is a fixed point — re-running it (same
    // banding as dedupCorpus) over the survivor set finds nothing to drop
    val redo = Dedup.minhashDedup(survivors, "doc_id", "text",
        bands = 4, rowsPerBand = 8)
      .filter(col("is_dup")).count()
    assert(redo === 0L, s"$redo near-dups survived dedupCorpus")

    // stage 3: ANN answers stay inside the survivor set and respect k
    val embs = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding")
    val ann = CorpusPipeline.run(corpus, "doc_id", "text",
      embs, "vec_id", "embedding", k = 10, nProbes = 3)
    val out = ann.select("q_id", "vec_id").as[(Long, Long)].collect()
    val survivorIds = survivors.select("doc_id").as[Long].collect().toSet
    assert(out.nonEmpty)
    assert(out.forall { case (q, v) => survivorIds(q) && survivorIds(v) && q != v })
    assert(out.groupBy(_._1).forall(_._2.length <= 10))
  }

  test("corpus pipeline: tokenless (NULL-text) docs pass through, not silently dropped") {
    val corpus = Seq(
      (0L, Some("the quick brown fox jumps over the lazy dog")),
      (1L, Some("the quick brown fox jumps over the lazy dog")), // exact dup
      (2L, None),                                                // NULL text
      (3L, None))                                                // NULL dup of 2
      .toDF("doc_id", "text")
    val ids = CorpusPipeline.dedupCorpus(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // 1 collapses into 0 (exact); NULLs collapse to one survivor (2) which
    // has zero token rows and must still survive the MinHash stage
    assert(ids === Set(0L, 2L))
  }

  // a real 1×1 PNG header (signature + IHDR: w=1, h=1, depth 8, RGBA) and a
  // minimal JPEG (SOI, APP0, SOF0 with h=2 w=3 precision 8, EOI), built
  // byte-by-byte from the specs — NOT produced by the code under test
  private def pngBytes(w: Int, h: Int, depth: Int): Array[Byte] = {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    (Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      ++ be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h)
      ++ Array(depth.toByte, 6.toByte, 0.toByte, 0.toByte, 0.toByte)
      ++ be32(0xDEADBEEF))
  }
  private def jpegBytes(w: Int, h: Int, appPad: Int): Array[Byte] = {
    val app0 = Array(0xff, 0xe0, 0, 16 + appPad).map(_.toByte) ++
      "JFIF ".getBytes ++ Array[Byte](1, 1, 0, 0, 0x48, 0, 0x48, 0, 0) ++
      Array.fill(appPad)(0.toByte)
    val sof0 = Array(0xff, 0xc0, 0, 17, 8).map(_.toByte) ++
      Array((h >> 8).toByte, h.toByte, (w >> 8).toByte, w.toByte) ++
      Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    Array(0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0 ++
      Array(0xff.toByte, 0xd9.toByte)
  }

  // minimal canonical WAV: RIFF/WAVE, optional leading JUNK chunk, then
  // fmt (PCM, LE fields) and an empty data chunk — per the RIFF spec
  private def wavBytes(channels: Int, rate: Int, bits: Int, junk: Int): Array[Byte] = {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val junkChunk =
      if (junk == 0) Array.emptyByteArray
      else "JUNK".getBytes ++ le32(junk) ++ Array.fill(junk + (junk & 1))(0.toByte)
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * channels * bits / 8) ++
      le16(channels * bits / 8) ++ le16(bits)
    val data = "data".getBytes ++ le32(0)
    val body = "WAVE".getBytes ++ junkChunk ++ fmt ++ data
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  test("decodeHeader: WAV fmt chunk walk — LE fields, junk chunks, truncation") {
    for (junk <- Seq(0, 5, 8)) { // odd junk exercises the word-alignment pad
      val h = Multimodal.decodeHeader(wavBytes(2, 44100, 16, junk))
      assert(h === Multimodal.ImageHeader("wav", None, None, Some(16),
        Some(2), Some(44100)), s"junk=$junk")
    }
    assert(Multimodal.decodeHeader(wavBytes(1, 8000, 24, 0)) ===
      Multimodal.ImageHeader("wav", None, None, Some(24), Some(1), Some(8000)))
    // truncated mid-fmt: format detected, fields None
    assert(Multimodal.decodeHeader(wavBytes(2, 44100, 16, 0).take(20)) ===
      Multimodal.ImageHeader("wav", None, None, None))
    // RIFF but not WAVE -> unknown
    val avi = wavBytes(1, 8000, 8, 0)
    avi(8) = 'A'; avi(9) = 'V'; avi(10) = 'I'; avi(11) = ' '
    assert(Multimodal.decodeHeader(avi).format === "unknown")
  }

  test("decodeHeader: real PNG IHDR and JPEG SOF0 parsing, robust to junk") {
    val p = Multimodal.decodeHeader(pngBytes(640, 480, 8))
    assert(p === Multimodal.ImageHeader("png", Some(640), Some(480), Some(8)))
    // the JPEG walk crosses a variable-length APP0 — offsets are not fixed
    for (pad <- Seq(0, 3, 9)) {
      val j = Multimodal.decodeHeader(jpegBytes(1920, 1080, pad))
      assert(j === Multimodal.ImageHeader("jpeg", Some(1920), Some(1080), Some(8)),
        s"pad=$pad")
    }
    // truncated PNG (signature only): format detected, no dimensions
    assert(Multimodal.decodeHeader(pngBytes(1, 1, 8).take(12)) ===
      Multimodal.ImageHeader("png", None, None, None))
    // JPEG truncated before SOF: no dimensions, no crash
    assert(Multimodal.decodeHeader(jpegBytes(9, 9, 0).take(10)) ===
      Multimodal.ImageHeader("jpeg", None, None, None))
    // garbage and NULL
    assert(Multimodal.decodeHeader(Array[Byte](1, 2, 3)).format === "unknown")
    assert(Multimodal.decodeHeader(null).format === "unknown")
  }

  test("decodeHeader: GIF logical screen and BMP info header, fixed LE offsets") {
    def le16(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def gifBytes(w: Int, h: Int, colorRes: Int): Array[Byte] =
      ("GIF89a".getBytes.toSeq ++ le16(w) ++ le16(h) ++
        Seq((((colorRes - 1) & 7) << 4).toByte, 0.toByte, 0.toByte,
          0x3b.toByte)).toArray
    def bmpBytes(w: Int, h: Int, bits: Int): Array[Byte] =
      ("BM".getBytes.toSeq ++ le32(0) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(bits)).toArray

    assert(Multimodal.decodeHeader(gifBytes(800, 600, 8)) ===
      Multimodal.ImageHeader("gif", Some(800), Some(600), Some(8)))
    // GIF87a variant, minimal dims
    assert(Multimodal.decodeHeader(
        ("GIF87a".getBytes.toSeq ++ le16(1) ++ le16(1) ++
          Seq(0.toByte, 0.toByte, 0.toByte)).toArray) ===
      Multimodal.ImageHeader("gif", Some(1), Some(1), Some(1)))
    // truncated after the magic: format detected, no fields
    assert(Multimodal.decodeHeader("GIF89a".getBytes) ===
      Multimodal.ImageHeader("gif", None, None, None))
    assert(Multimodal.decodeHeader(bmpBytes(1920, 1080, 24)) ===
      Multimodal.ImageHeader("bmp", Some(1920), Some(1080), Some(24)))
    // negative height = top-down row order, reported as-is
    assert(Multimodal.decodeHeader(bmpBytes(64, -64, 32)) ===
      Multimodal.ImageHeader("bmp", Some(64), Some(-64), Some(32)))
    // 'BM' magic but header shorter than BITMAPINFOHEADER: unknown
    assert(Multimodal.decodeHeader("BM".getBytes ++
      Array.fill[Byte](10)(0)).format === "unknown")
  }

  test("decodeHeader: TIFF IFD walk in both byte orders, robust to bad offsets") {
    def n16(v: Int, le: Boolean) =
      if (le) Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def n32(v: Int, le: Boolean) =
      if (le) Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte)
      else Seq((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff).map(_.toByte)
    // SHORT (type 3) entries carry the value LEFT-JUSTIFIED: first two
    // bytes of the value field in the file's byte order; LONG (type 4)
    // uses all four
    def entry(tag: Int, typ: Int, value: Int, le: Boolean) =
      n16(tag, le) ++ n16(typ, le) ++ n32(1, le) ++
        (if (typ == 3) n16(value, le) ++ Seq(0.toByte, 0.toByte)
         else n32(value, le))
    def tiff(w: Int, h: Int, b: Int, le: Boolean): Array[Byte] = {
      val magic = if (le) Seq('I', 'I', 42, 0) else Seq('M', 'M', 0, 42)
      (magic.map(_.toByte) ++ n32(8, le) ++ n16(3, le) ++
        entry(256, if (le) 4 else 3, w, le) ++
        entry(257, if (le) 3 else 4, h, le) ++
        entry(258, 3, b, le) ++ n32(0, le)).toArray
    }
    assert(Multimodal.decodeHeader(tiff(1920, 1080, 16, le = true)) ===
      Multimodal.ImageHeader("tiff", Some(1920), Some(1080), Some(16)))
    assert(Multimodal.decodeHeader(tiff(640, 480, 8, le = false)) ===
      Multimodal.ImageHeader("tiff", Some(640), Some(480), Some(8)))
    // IFD offset beyond the payload: format detected, fields None
    val bad = tiff(1, 1, 1, le = true)
    val badOff = bad.take(4) ++ Array[Byte](-1, 0, 0, 0) ++ bad.drop(8)
    assert(Multimodal.decodeHeader(badOff) ===
      Multimodal.ImageHeader("tiff", None, None, None))
    // truncated mid-directory: parses the entries that fit, no crash
    assert(Multimodal.decodeHeader(tiff(320, 200, 8, le = true).take(10 + 12)) ===
      Multimodal.ImageHeader("tiff", Some(320), None, None))
    // magic only
    assert(Multimodal.decodeHeader(Array[Byte]('I', 'I', 42, 0)).format === "unknown")
  }

  test("mp4FrameCount: ISO-BMFF box walk — stsz, stts sum, largesize, size 0, truncation") {
    def be32(v: Long): Seq[Byte] =
      Seq((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
        .map(_.toByte)
    def be64(v: Long): Seq[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(t: String, payload: Seq[Byte]): Seq[Byte] =
      be32(payload.length + 8L) ++ t.getBytes("US-ASCII").toSeq ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII").toSeq ++ be32(0))
    def stsz(n: Long) = box("stsz", be32(0) ++ be32(0) ++ be32(n))
    def stts(cs: Seq[Long]) = box("stts",
      be32(0) ++ be32(cs.length.toLong) ++ cs.flatMap(c => be32(c) ++ be32(1000)))
    def chain(stblChildren: Seq[Byte]): Seq[Byte] = box("moov",
      box("mvhd", Seq.fill(8)(0.toByte)) ++
        box("trak", box("tkhd", Seq.fill(8)(0.toByte)) ++
          box("mdia", box("minf", box("stbl", stblChildren)))))

    def count(bs: Seq[Byte]) = Multimodal.mp4FrameCount(bs.toArray)

    assert(count(ftyp ++ chain(stsz(42))) === Some(42))
    // stts path: frame count is the SUM of the entries' sample_counts
    assert(count(ftyp ++ chain(stts(Seq(10, 20, 12)))) === Some(42))
    // stsz preferred when both are present
    assert(count(ftyp ++ chain(stsz(5) ++ stts(Seq(9)))) === Some(5))
    // top-level free box between ftyp and moov is skipped by size
    assert(count(ftyp ++ box("free", Seq.fill(6)(0.toByte)) ++ chain(stsz(7)))
      === Some(7))
    // 64-bit largesize header (size == 1): moov as a largesize box
    val moovPayload = chain(stsz(9)).drop(8)
    val largeMoov = be32(1) ++ "moov".getBytes("US-ASCII").toSeq ++
      be64(moovPayload.length + 16L) ++ moovPayload
    assert(count(ftyp ++ largeMoov) === Some(9))
    // size == 0: box runs to the end of the buffer
    val zeroMoov = be32(0) ++ "moov".getBytes("US-ASCII").toSeq ++ moovPayload
    assert(count(ftyp ++ zeroMoov) === Some(9))
    // truncated before the sample count: None, never a garbage read
    assert(count((ftyp ++ chain(stsz(42))).dropRight(4)) === None)
    // declared size larger than the buffer fails closed
    val inflated = ftyp ++ be32(4096) ++ "moov".getBytes("US-ASCII").toSeq
    assert(count(inflated) === None)
    // malformed child size (< header) aborts the walk
    assert(count(ftyp ++ box("moov", be32(3) ++ "trak".getBytes("US-ASCII").toSeq))
      === None)
    // not ISO-BMFF at all
    assert(count(pngBytes(8, 8, 8).toSeq) === None)
    assert(Multimodal.mp4FrameCount(null) === None)
    assert(Multimodal.mp4FrameCount(Array.emptyByteArray) === None)

    // end-to-end: the Dataset path reports format mp4 + the parsed count
    val media = Seq(
      (1L, "video", (ftyp ++ chain(stsz(24))).toArray),
      (2L, "video", (ftyp ++ chain(stts(Seq(3, 4)))).toArray))
      .toDF("media_id", "kind", "payload")
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).format === "mp4" && feats(1L).n_frames === 24)
    assert(feats(2L).format === "mp4" && feats(2L).n_frames === 7)
  }

  test("multimodal: feature extraction decodes real headers per partition") {
    val media = Seq(
      (1L, "image", pngBytes(320, 200, 16)),
      (2L, "video", Array[Byte](9, 8, 7)),
      (4L, "image", jpegBytes(12, 34, 2)))
      .toDF("media_id", "kind", "payload")
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).format === "png")
    assert(feats(1L).width === Some(320) && feats(1L).height === Some(200))
    assert(feats(1L).bit_depth === Some(16))
    assert(feats(1L).n_frames === 1) // images are single-frame
    assert(feats(4L).format === "jpeg")
    assert(feats(4L).width === Some(12) && feats(4L).height === Some(34))
    assert(feats(2L).format === "unknown" && feats(2L).n_bytes === 3L)
    assert(feats(2L).n_frames >= 1)

    val frames = Multimodal.sampleFrames(spark, media, everyN = 10)
    assert(frames.filter(col("media_id") === 2L).count() >= 1)
    assert(frames.columns.toSeq ===
      Seq("media_id", "kind", "frame_idx", "content_md5"))

    // NULL payload (nullable BINARY) decodes as an empty asset, not an NPE
    val withNull = Seq((3L, "image", Option.empty[Array[Byte]]))
      .toDF("media_id", "kind", "payload")
    val nf = Multimodal.extractFeatures(spark, withNull).collect()(0)
    assert(nf.n_bytes === 0L && nf.media_id === 3L && nf.format === "unknown")

    // zero step caught at the call site, not deep inside the plan
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(spark, media, everyN = 0)
    }
  }

  // --- round-5 operators --------------------------------------------------

  test("redactPii: every pattern scrubs, clean text passes, NULL stays NULL") {
    val rows = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org now"),
      (2L, "server 192.168.0.1 and version 1.2.3.4"),
      (3L, "ssn 123-45-6789 phone 555-123-4567"),
      (4L, "nothing sensitive here"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = rows
      .select($"doc_id", graft.ext.TextAnalysis.redactPii($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "mail me at <EMAIL> now")
    assert(got(2L) === "server <IP> and version <IP>")
    // 3-2-4 and 3-3-4 shapes cannot match inside each other
    assert(got(3L) === "ssn <SSN> phone <PHONE>")
    assert(got(4L) === "nothing sensitive here")
    assert(got(5L) === null)

    val counts = rows
      .select($"doc_id", graft.ext.TextAnalysis.piiCount(
        $"text", graft.ext.TextAnalysis.piiPatterns(1)._2).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(counts(2L) === 2L) // both dotted quads count, PII or not
    assert(counts(4L) === 0L)
    assert(counts(5L) === -1L) // sentinel for NULL
  }

  test("dedupSpansAcrossDocs: shared spans vanish everywhere, unique survive") {
    val corpus = Seq(
      (1L, "a b c d e unique one two three xx"),
      (2L, "a b c d e other content here now yy"),  // shares span "a b c d e"
      (3L, "totally distinct words in this doc"),
      (4L, null.asInstanceOf[String]),
      (5L, "a b c d e")                             // ONLY the shared span
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSpansAcrossDocs(corpus, "doc_id", "text", n = 5)
      .select("doc_id", "clean_text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "unique one two three xx")
    assert(got(2L) === "other content here now yy")
    assert(got(3L) === "totally distinct words in this doc")
    assert(got(4L) === null)     // NULL text passes through as NULL
    assert(got(5L) === "")       // every span removed -> empty, row kept
    // reserved-column guard
    intercept[IllegalArgumentException] {
      Dedup.dedupSpansAcrossDocs(
        corpus.withColumn("clean_text", lit("x")), "doc_id", "text")
    }
  }

  test("cdcChunks: content-defined boundaries survive a prefix insertion") {
    import scala.util.Random
    val rnd = new Random(42)
    val words = (1 to 400).map(_ => "w" + rnd.nextInt(5000)).mkString(" ")
    val docs = Seq(
      (1L, words),
      (2L, "inserted prefix tokens here " + words)).toDF("doc_id", "text")
    val chunks = graft.ext.TextAnalysis
      .cdcChunks(docs, "doc_id", "text", targetTokens = 16)
      .select("doc_id", "chunk_id", "chunk_fp", "chunk_tokens")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(r =>
        (r.getString(2), r.getLong(3))).toSeq).toMap
    // every token accounted for
    assert(chunks(1L).map(_._2).sum === 400L)
    assert(chunks(2L).map(_._2).sum === 404L)
    // THE CDC property: after the first boundary downstream of the edit,
    // both docs' chunk fingerprint STREAMS coincide — fixed windows would
    // shift every chunk. Compare the tails after dropping each doc's
    // leading chunks up to the first shared fingerprint.
    val shared = chunks(1L).map(_._1).toSet
      .intersect(chunks(2L).map(_._1).toSet)
    assert(shared.nonEmpty, "no chunk survived the prefix edit")
    val tail1 = chunks(1L).map(_._1).dropWhile(!shared.contains(_))
    val tail2 = chunks(2L).map(_._1).dropWhile(!shared.contains(_))
    assert(tail1 === tail2, "post-edit chunk streams must re-align")
    assert(tail1.length >= chunks(1L).length - 3,
      s"only ${tail1.length} of ${chunks(1L).length} chunks re-aligned — " +
        "the edit should perturb only the chunks it touches")
  }

  test("doremiWeights: hard domains gain, uniform losses stay uniform, NULLs fail") {
    val loss = Seq(("easy", 0L), ("mid", 50L), ("hard", 100L))
      .toDF("domain", "lossq")
    val w = graft.ext.CorpusSampling
      .doremiWeights(loss, "domain", "lossq", iters = 10, lrPerMille = 200)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w("hard") > w("mid") && w("mid") > w("easy"),
      s"weights must order by excess loss, got $w")
    assert(math.abs(w.values.sum - 1000000L) <= 3,
      s"weights must renormalize to ~10^6, got sum ${w.values.sum}")
    // equal losses everywhere -> exactly uniform
    val flat = graft.ext.CorpusSampling.doremiWeights(
        Seq(("a", 7L), ("b", 7L), ("c", 7L)).toDF("domain", "lossq"),
        "domain", "lossq")
      .collect().map(r => r.getLong(1)).toSet
    assert(flat === Set(333333L))
    // NULL loss fails fast
    val bad = Seq(("a", java.lang.Long.valueOf(1L)),
      ("b", null.asInstanceOf[java.lang.Long])).toDF("domain", "lossq")
    val e = intercept[IllegalArgumentException] {
      graft.ext.CorpusSampling.doremiWeights(bad, "domain", "lossq")
    }
    assert(e.getMessage.contains("NULL domain or loss"))
    // duplicate domain rows fail fast
    val dup = Seq(("a", 1L), ("a", 2L)).toDF("domain", "lossq")
    val e2 = intercept[IllegalArgumentException] {
      graft.ext.CorpusSampling.doremiWeights(dup, "domain", "lossq")
    }
    assert(e2.getMessage.contains("duplicate domain"))
  }

  test("chunkDedup: shared tail chunks are duplicated mass for the later doc only") {
    import scala.util.Random
    val rnd = new Random(7)
    val words = (1 to 300).map(_ => "w" + rnd.nextInt(4000)).mkString(" ")
    val docs = Seq(
      (1L, words),
      (2L, "an unrelated prefix before " + words)).toDF("doc_id", "text")
    val out = graft.ext.Dedup.chunkDedup(docs, "doc_id", "text", targetTokens = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (c1, d1, t1, dt1) = out(1L)
    val (c2, d2, t2, dt2) = out(2L)
    assert(t1 === 300L && t2 === 304L)
    assert(d1 === 0L, "doc 1 holds every keeper — least (id, chunk_id)")
    assert(d2 > 0L && dt2 > 200L,
      s"doc 2's shared tail must register as duplicate chunk mass, got ($d2, $dt2)")
    assert(d2 < c2, "the edited head chunk(s) must stay unique")
  }

  test("priorityDedup: trusted source wins, id breaks ties, NULL text passes through") {
    val docs = Seq(
      (1L, "shared text", "crawl"),      // dup group: curated must win
      (2L, "shared text", "curated"),
      (3L, "shared text", "other"),
      (4L, "unmapped tie", "otherA"),    // both unmapped: least id wins
      (5L, "unmapped tie", "otherB"),
      (6L, "unique", "crawl"),
      (7L, null.asInstanceOf[String], "curated"))
      .toDF("doc_id", "text", "source")
    val out = graft.ext.Dedup.priorityDedup(
        docs, "doc_id", "text", "source",
        Map("curated" -> 0, "crawl" -> 1), defaultPriority = 9)
      .select("doc_id", "source", "n_dups", "n_sources")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out === Set(
      (2L, "curated", 3L, 3L),   // priority 0 beats crawl's id-1 head start
      (4L, "otherA", 2L, 2L),    // default priorities tie -> least id
      (6L, "crawl", 1L, 1L),
      (7L, "curated", -1L, -1L)))  // NULL text: kept, NULL annotations
  }

  test("perplexityBuckets: descending thirds, tie-coherent, NULL scores dropped") {
    // 9 docs, scores 90..10: head = {90,80,70}, middle = {60,50,40}, tail rest
    val scored: Seq[(Long, java.lang.Long)] =
      (1L to 9L).map(i => (i, java.lang.Long.valueOf(100L - i * 10L))) :+
        ((10L, null.asInstanceOf[java.lang.Long]))
    val df = scored.toDF("doc_id", "scoreq")
    val out = graft.ext.Relevance.perplexityBuckets(df, "scoreq")
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "head", 2L -> "head", 3L -> "head",
      4L -> "middle", 5L -> "middle", 6L -> "middle",
      7L -> "tail", 8L -> "tail", 9L -> "tail"))
    // tie coherence: a value straddling the n/3 boundary stays in ONE bucket
    val tied = Seq((1L, 50L), (2L, 50L), (3L, 50L), (4L, 50L), (5L, 10L),
      (6L, 5L)).toDF("doc_id", "scoreq")
    val tb = graft.ext.Relevance.perplexityBuckets(tied, "scoreq")
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tb(1L) === "head" && tb(2L) === "head" &&
      tb(3L) === "head" && tb(4L) === "head")
    // the 4-way tie overfills head past 2n/3, so BOTH remaining values
    // fall to tail — deterministic boundary spill, middle can be empty
    assert(tb(5L) === "tail" && tb(6L) === "tail")
  }

  test("blocklistScreen: whole-word counts, ratio gate, C4 zero-tolerance, NULL text") {
    val docs = Seq(
      (1L, "the Slow fox and the slowest slow dog"),  // 'slow' x2 whole-word
      (2L, "clean text entirely"),
      (3L, "big big big big"),                        // 4/4 banned
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.blocklistScreen(
        docs, "text", Seq("slow", "big"), maxBannedPerMille = 300)
      .select("doc_id", "banned_count", "keep").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "null" else r.getBoolean(2).toString)).toSet
    // doc 1: 2 banned of 8 tokens = 250‰ <= 300‰ -> keep
    assert(out === Set((1L, 2L, "true"), (2L, 0L, "true"),
      (3L, 4L, "false"), (4L, -1L, "null")))
    // C4 default: any hit drops
    val strict = graft.ext.TextAnalysis.blocklistScreen(
        docs, "text", Seq("slow", "big"))
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) "null" else r.getBoolean(1).toString)).toMap
    assert(strict === Map(1L -> "false", 2L -> "true",
      3L -> "false", 4L -> "null"))
  }

  test("incrementalMinhash: corpus collisions win, batch peers second, clean admitted") {
    // corpus doc 1 and batch doc 10 share text verbatim; batch docs 11/12
    // are near-identical to each other but unlike the corpus; 13 is clean
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "red orange yellow green blue indigo violet extra"),
      (12L, "red orange yellow green blue indigo violet extra"),
      (13L, "completely different content with no relatives"),
      (14L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val idx = Dedup.minhashBucketIndex(corpus, "doc_id", "text")
    val got = Dedup.incrementalMinhash(batch, idx, "doc_id", "text")
      .select("doc_id", "rep_id", "is_dup")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(10L) === (1L, true))   // verbatim corpus dup: corpus rep wins
    assert(got(11L) === (11L, false)) // smallest of its batch peer class
    assert(got(12L) === (11L, true))  // near-dup of batch peer 11
    assert(got(13L) === (13L, false)) // clean: admitted as itself
    assert(got(14L) === (14L, false)) // tokenless: no evidence, admitted
  }

  test("row-form band buckets are bit-identical to the aggregate signature form") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma delta epsilon zeta"),  // dup of 1: same buckets
      (4L, ""),                                     // empty: the "" token, like batch
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val agg = Dedup.minhashBucketIndex(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val row = Dedup.withRowBandBuckets(
        docs.where(col("text").isNotNull), "text", "bk")
      .select(col("doc_id"), explode(col("bk")).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every row-form bucket exists in the aggregate index and vice versa
    assert(row.map(_._2).toSet === agg.keySet)
    // dup docs land in identical buckets under both forms
    val byDoc = row.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L) === byDoc(3L))
    assert(byDoc(4L).size === graft.ext.Dedup.MinhashBands) // "" token, like batch
    assert(!byDoc.contains(5L)) // NULL text filtered upstream
  }

  test("exactSubstringDedup: shifted verbatim repeats removed, one copy kept") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta tail one"),
      // doc 2 repeats doc 1's first 6 tokens SHIFTED by a 2-token prefix
      // — an alignment C4 fixed spans would miss
      (2L, "pre fix alpha beta gamma delta epsilon zeta tail two"),
      (3L, "totally unrelated words that repeat nothing at all"),
      (4L, null.asInstanceOf[String]),
      // doc 0 < doc 1: the KEEPER of the shared run is the least (id,pos)
      (0L, "alpha beta gamma delta epsilon zeta different ending here")
    ).toDF("doc_id", "text")
    val got = Dedup.exactSubstringDedup(corpus, "doc_id", "text", minTokens = 6)
      .select("doc_id", "clean_text", "n_removed")
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)),
          (if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    // doc 0 holds the globally-first occurrence: untouched
    assert(got(0L) ===
      ("alpha beta gamma delta epsilon zeta different ending here", 0L))
    // docs 1 and 2 share the 7-token run "alpha .. zeta tail": doc 1
    // keeps the windows it anchors (keeper = least (id, pos)), losing
    // only the 6 tokens doc 0 already owns; doc 2 loses the full run
    assert(got(1L) === ("tail one", 6L))
    assert(got(2L) === ("pre fix two", 7L))
    assert(got(3L) ===
      ("totally unrelated words that repeat nothing at all", 0L))
    assert(got(4L) === (null, -1L))
    // a document repeating a >=N run INTERNALLY keeps only the first copy
    val internal = Seq(
      (7L, "x1 x2 x3 x4 x5 x6 mid x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val r7 = Dedup.exactSubstringDedup(internal, "doc_id", "text", minTokens = 6)
      .select("clean_text", "n_removed").collect().head
    assert(r7.getString(0) === "x1 x2 x3 x4 x5 x6 mid")
    assert(r7.getLong(1) === 6L)
  }

  test("semanticDecontaminate: near-benchmark drops, orthogonal/NULL survive") {
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0.99f, 0.1f, 0.0f)),   // cos ~0.995 to bench 100 -> dropped
      (2L, Array(0.0f, 0.0f, 1.0f)),    // orthogonal to both -> kept
      (3L, null.asInstanceOf[Array[Float]]),    // NULL cosine -> kept
      (4L, Array(0.6f, 0.6f, 0.5f))     // cos ~0.6 to both -> dropped
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDecontaminate(
        corpus, "embedding", bench, "embedding", threshold = 0.9)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(got === Seq(2L, 3L, 4L))
    val strict = Dedup.semanticDecontaminate(
        corpus, "embedding", bench, "embedding", threshold = 0.5)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(strict === Seq(2L, 3L))
  }

  test("hashSplit: complete, deterministic, fractions near the weights") {
    // n large enough that ±3σ is a tight RELATIVE bound — the draw is one
    // fixed deterministic outcome per salt, not a re-rollable sample, so
    // small n can sit several σ out by construction (the unsalted draw
    // was within 3σ at n=2000; the salted one is not — at n=10000 it is)
    val df = spark.range(10000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s = graft.ext.CorpusSampling.hashSplit(df, col("id"), splits)
    val counts = s.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 10000L)           // every row assigned
    assert(counts("train") > 7880 && counts("train") < 8120) // 0.8 ± 3σ
    assert(counts("val") > 900 && counts("val") < 1100)
    assert(counts("test") > 900 && counts("test") < 1100)
    // same assignment on a re-run over a DIFFERENT frame shape
    val again = graft.ext.CorpusSampling
      .hashSplit(df.repartition(7), col("id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = s.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === first)
    intercept[IllegalArgumentException] {
      graft.ext.CorpusSampling.hashSplit(df, col("id"), Seq("a" -> 0.5))
    }
  }

  test("deterministicShuffle: bijective rank, partition-invariant, seed-switchable") {
    val df = spark.range(2000).toDF("id")
    val s1 = graft.ext.CorpusSampling.deterministicShuffle(df, col("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a permutation: ranks are exactly 1..n
    assert(s1.values.toSeq.sorted === (1L to 2000L))
    // pure function of (key, seed): same permutation on a reshaped frame
    val s2 = graft.ext.CorpusSampling
      .deterministicShuffle(df.repartition(7), col("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s2 === s1)
    // a different seed is an (effectively) independent permutation
    val s3 = graft.ext.CorpusSampling
      .deterministicShuffle(df, col("id"), seed = "graft:shuffle:epoch2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s3.values.toSeq.sorted === (1L to 2000L))
    assert(s3.count { case (k, v) => s1(k) == v } < 50,
      "epoch-2 permutation should share almost no fixed points with epoch 1")
    // and it is genuinely shuffled, not an identity/near-identity order
    assert(s1.count { case (k, v) => k + 1 == v } < 50)
  }

  test("upsampleByStratum: copy counts follow the weights, copy_idx dense") {
    val df = spark.range(999).toDF("doc_id")
      .withColumn("lang",
        element_at(typedlit(Seq("en", "es", "fr")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
    val up = graft.ext.CorpusSampling.upsampleByStratum(
      df, "lang", "doc_id", Map("en" -> 2.5, "es" -> 0.5))
    val perDoc = up.groupBy("doc_id", "lang").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val byLang = perDoc.groupBy(_._1._2).view.mapValues(_.values.toSeq).toMap
    assert(byLang("en").forall(c => c == 2L || c == 3L))
    assert(byLang("es").forall(_ == 1L))           // 0-copy docs are absent
    assert(byLang("fr").forall(_ == 1L))
    assert(byLang("fr").size === 333)              // default weight keeps all
    // fractional halves: ~50% of en got the 3rd copy, ~50% of es survived
    val en3 = byLang("en").count(_ == 3L)
    assert(en3 > 116 && en3 < 216, s"en extra-copy count $en3")
    assert(byLang("es").size > 116 && byLang("es").size < 216)
    // copy_idx is dense 0..copies-1
    val idx = up.filter(col("doc_id") === 0L).select("copy_idx")
      .collect().map(_.getLong(0)).sorted
    assert(idx === (0L until idx.length).toArray)
  }

  test("materializeSequences: exact lengths, stream-preserving concatenation") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val seqTokens = 128L
    val seqs = graft.ext.CorpusSampling.materializeSequences(
        df, "doc_id", "text", seqTokens, shard = pmod(col("doc_id"), lit(3L)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[String](2).toVector, r.getLong(3)))
      .groupBy(_._1)
    for ((shard, rows) <- seqs) {
      val byIdx = rows.sortBy(_._2)
      // dense sequence indexes from 0
      assert(byIdx.map(_._2).toSeq === (0L until byIdx.length).toSeq, s"shard $shard")
      // every sequence exactly seqTokens tokens except the shard's last
      for ((_, idx, toks, n) <- byIdx.init)
        assert(toks.length.toLong === seqTokens && n === seqTokens,
          s"shard $shard seq $idx has ${toks.length} tokens")
      assert(byIdx.last._3.length.toLong <= seqTokens)
      assert(byIdx.last._3.nonEmpty)
      // concatenation equals the shard's deterministic token stream
      val stream = df
        .filter(pmod(col("doc_id"), lit(3L)) === shard && col("text").isNotNull)
        .orderBy(md5(col("text")), col("doc_id"))
        .select(col("text")).collect()
        .flatMap(r => r.getString(0).trim.split("\\s+", -1)).toVector
      assert(byIdx.flatMap(_._3).toVector === stream, s"shard $shard stream")
    }
  }

  test("split then upsample composes unbiased (salted, independent draws)") {
    // The scrubStream shape: assign splits, then upsample WITHIN the train
    // split. With a shared unsalted md5 the upsample draw would select only
    // from the train hash-prefix region (weight 1.5 -> extra-copy fraction
    // 0.5/0.8 = 62.5% instead of 50%); per-operator salts keep the nominal
    // fraction. 3σ for n≈3200, p=0.5 is ±2.7%.
    val df = spark.range(4000).toDF("doc_id").withColumn("lang", lit("en"))
    val train = graft.ext.CorpusSampling
      .hashSplit(df, col("doc_id"), Seq("train" -> 0.8, "test" -> 0.2))
      .filter(col("split") === "train")
    val n = train.count().toDouble
    val up = graft.ext.CorpusSampling.upsampleByStratum(
      train, "lang", "doc_id", Map("en" -> 1.5))
    val extra = up.groupBy("doc_id").count()
      .filter(col("count") === 2L).count().toDouble
    val frac = extra / n
    assert(frac > 0.45 && frac < 0.55,
      s"composed upsample fraction $frac biased (n=$n, extra=$extra)")
  }

  test("hashSplit fails fast on NULL keys instead of concentrating them") {
    val df = Seq(Some(1L), Some(2L), None).toDF("id")
    val ex = intercept[Exception] {
      graft.ext.CorpusSampling
        .hashSplit(df, col("id"), Seq("a" -> 0.5, "b" -> 0.5))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("NULL split key")), ex.toString)
  }

  test("alphaTokenFrac and symbolToTokenRatio: hand-computed") {
    val df = Seq((1L, "ab 12 c3 ### ..."), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id",
        graft.ext.TextAnalysis.alphaTokenFrac($"text").as("af"),
        graft.ext.TextAnalysis.symbolToTokenRatio($"text").as("sr"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getDouble(1), r.getDouble(2)))).toMap
    // tokens: ab, 12, c3, ###, ... -> letter-bearing: ab, c3
    assert(got(1L) === ((2.0 / 5, (3 + 1).toDouble / 5)))
    assert(got(2L) === null)
  }

  test("SQ8 quantization: scale/2 error bound, zero and NULL vectors handled") {
    val df = Seq(
      (0L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (1L, Array(0.0f, 0.0f)),
      (2L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "embedding")
    val rows = q.select("vec_id", "q_scale", "qvec").collect()
      .map(r => r.getLong(0) -> r).toMap
    // vec 0: scale = 1/127; q = [127, -64 (63.5 rounds away from zero), 32 (31.75), 0]
    val r0 = rows(0L)
    assert(math.abs(r0.getDouble(1) - 1.0 / 127) < 1e-12)
    assert(r0.getSeq[Byte](2) === Seq[Byte](127, -64, 32, 0))
    assert(rows(1L).getDouble(1) === 0.0)
    assert(rows(1L).getSeq[Byte](2) === Seq[Byte](0, 0))
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(2))
    // reconstruction error bound: |x - q*scale| <= scale/2 for every element
    val errOk = q.where($"embedding".isNotNull && $"q_scale" > 0)
      .select(forall(
        zip_with($"embedding", Similarity.dequantizeInt8($"qvec", $"q_scale"),
          (x, d) => abs(x.cast("double") - d.cast("double")) <= $"q_scale" / 2 + lit(1e-6)),
        b => b).as("ok"))
      .as[Boolean].collect()
    assert(errOk.forall(identity))
  }

  test("SQ8 top-k recall vs float32 brute force on realistic vectors") {
    // clustered corpus: 20 well-separated centers, 10 members each with
    // small intra-cluster noise. Top-10 neighbors are the cluster-mates
    // with margins far above the SQ8 error (scale/2 per element), so
    // recall tests signal — on UNIFORM vectors the rank-10 cosine gaps
    // sit below the quantization error and membership is tie-noise.
    def mix(seed: Long): Long = {
      var x = seed * 2654435761L + 1
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      x
    }
    def unit(seed: Long): Array[Float] =
      Array.tabulate(16)(j => ((mix(seed * 16 + j) & 0xFFFF) / 32768.0f) - 1.0f)
    val vecs = (0 until 200).map { i =>
      val cluster = i / 10
      val c = unit(cluster + 1000)
      val noise = unit(i + 5000)
      (i.toLong, c.zip(noise).map { case (cv, nv) => cv + 0.05f * nv })
    }.toDF("vec_id", "embedding")
    val probes = vecs.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        probes, "q_id", "q_emb", k = 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quantized = Similarity.quantizeInt8(vecs, "embedding")
      .select("vec_id", "q_scale", "qvec")
    val sq8 = Similarity.sq8TopK(quantized, "vec_id",
        probes, "q_id", "q_emb", k = 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // keys.toSeq: a Set would dedup equal per-probe recalls before the sum
    val recall = exact.keys.toSeq.map(q =>
      (sq8(q) intersect exact(q)).size.toDouble / exact(q).size).sum / exact.size
    assert(recall >= 0.9, s"SQ8 recall@10 $recall below 0.9")
    // the quantized index is genuinely byte-typed (4x smaller than float32)
    assert(quantized.schema("qvec").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ===
      org.apache.spark.sql.types.ByteType)
  }
}
