package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.{Cleaning, Features, Normalization}
import graft.ext.{Dedup, TextAnalysis}

/** Property-based invariants (SURVEY.md §5.2.4). Collections are generated
  * by ScalaCheck (fixed seeds — the scalatestplus bridge is not in the
  * offline cache), executed through the real Spark transforms.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Run the property over `n` deterministic ScalaCheck samples. */
  private def forAll[T](gen: Gen[T], n: Int = 8)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val dirtyString =
    Gen.oneOf("OK", " failed ", "Denied", "", "  ", "weird-Value", "log in", "A--B")

  test("normalization is idempotent: normalize(normalize(x)) == normalize(x)") {
    forAll(Gen.listOfN(12, dirtyString)) { values =>
      val df = values.zipWithIndex
        .map { case (v, i) => (i.toString, v, v, v) }
        .toDF("event_id", "status", "severity", "event_type")
      val once = Normalization.normalizeCategoricals(df)
      val twice = Normalization.normalizeCategoricals(once)
      assert(once.collect().toSeq === twice.collect().toSeq)
    }
  }

  test("dedup is idempotent and never increases row multiplicity per key") {
    forAll(Gen.listOfN(20, Gen.choose(1L, 6L))) { keys =>
      val df = keys.zipWithIndex
        .map { case (k, i) => (k, s"payload$k", i.toLong) }
        .toDF("event_id", "payload", "_ingest_order")
      val once = Cleaning.removeDuplicates(df)
      assert(once.groupBy("event_id").count()
        .filter(col("count") > 1).count() === 0)
      assert(Cleaning.removeDuplicates(once).count() === once.count())
    }
  }

  test("session invariants: ids contiguous from 1, count matches rows, duration = max-min") {
    val eventsGen = Gen.listOfN(30, for {
      user <- Gen.oneOf("u1", "u2", "u3")
      offsetSec <- Gen.choose(0L, 200000L)
    } yield (user, offsetSec))

    forAll(eventsGen) { evs =>
      val base = java.sql.Timestamp.valueOf("2025-01-01 00:00:00").getTime
      val df = evs.distinct.zipWithIndex.map { case ((u, off), i) =>
        (i.toLong, new java.sql.Timestamp(base + off * 1000), u)
      }.toDF("event_id", "timestamp", "user_id")

      val out = Features.addSessionFeatures(df, gapMinutes = 30).cache()

      // session ids per user are a contiguous 1..N range
      val perUser = out.groupBy("user_id")
        .agg(min("session_id").as("lo"), max("session_id").as("hi"),
          countDistinct("session_id").as("n"))
        .as[(String, Long, Long, Long)].collect()
      perUser.foreach { case (_, lo, hi, n) =>
        assert(lo === 1L); assert(hi === n)
      }

      // per-session row count equals session_event_count; duration = max-min
      val bad = out.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("rows"),
          first("session_event_count").as("declared"),
          (max(col("timestamp").cast("double")) -
            min(col("timestamp").cast("double"))).as("span"),
          first("session_duration_seconds").as("declared_span"))
        .filter(col("rows") =!= col("declared") ||
          abs(col("span") - col("declared_span")) > 1e-6)
      assert(bad.count() === 0)
      out.unpersist()
      ()
    }
  }

  test("subword pre-tokenization is lossless on single-spaced text") {
    // every non-space character lands in exactly one token and each token
    // absorbs at most its one leading space, so for single-spaced input
    // the concatenation reconstructs the original text exactly
    val word = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('!', '.', ',', '\'', '-', '#')))
      .map(_.mkString)
    forAll(Gen.nonEmptyListOf(word).map(_.take(12))) { words =>
      val text = words.mkString(" ")
      val toks = Seq(Tuple1(text)).toDF("text")
        .select(TextAnalysis.subwordTokens(col("text")))
        .as[Seq[String]].collect()(0)
      assert(toks.mkString === text, s"lossy split of '$text': $toks")
      // and the subword count refines the whitespace count
      val (nSub, nWs) = Seq(Tuple1(text)).toDF("text")
        .select(TextAnalysis.subwordTokenCount(col("text")),
          TextAnalysis.tokenCount(col("text")))
        .as[(Long, Long)].collect()(0)
      assert(nSub >= nWs)
    }
  }

  test("cdcChunks reconstructs the token stream exactly, at any target") {
    // CDC chunk boundaries are content-derived, so two invariants must
    // hold for EVERY input and EVERY target: (a) chunk_tokens sums to the
    // doc's token count, (b) concatenating chunk_texts in chunk order
    // reproduces the whitespace-normalized token stream verbatim — a
    // violation means chunk-level dedup silently loses or duplicates text
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(6))
    val docGen = Gen.zip(
      Gen.nonEmptyListOf(word).map(_.take(120)),
      Gen.oneOf(2, 3, 8, 16, 64))
    forAll(docGen) { case (words, target) =>
      val text = words.mkString(" ")
      val out = TextAnalysis.cdcChunks(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", target)
        .orderBy("chunk_id")
        .select("chunk_text", "chunk_tokens")
        .as[(String, Long)].collect()
      assert(out.map(_._2).sum === words.length.toLong,
        s"token mass lost at target=$target")
      assert(out.map(_._1).mkString(" ") === text,
        s"reassembly diverged at target=$target")
    }
  }

  test("minhash signatures are invariant to partitioning and row order") {
    // the signature is an aggregate over a doc's token SET — how the rows
    // are partitioned or ordered on the cluster must not change it; a
    // violation here means non-deterministic dedup at scale
    val doc = Gen.nonEmptyListOf(
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
      .map(_.take(8).mkString(" "))
    forAll(Gen.listOfN(6, doc)) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val a = Dedup.minhashSignatures(
          rows.toDF("doc_id", "text"), "doc_id", "text", k = 8)
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      val b = Dedup.minhashSignatures(
          rows.reverse.toDF("doc_id", "text").repartition(7), "doc_id", "text", k = 8)
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      assert(a === b)
    }
  }

  test("handle_missing_values leaves no nulls in the filled columns") {
    val maybeStr = Gen.option(dirtyString)
    forAll(Gen.listOfN(15, Gen.zip(Gen.option(Gen.choose(1L, 50L)), maybeStr))) { rows =>
      val df = rows.map { case (id, s) => (id, s, s, s, s, s) }
        .toDF("event_id", "user_id", "event_type", "status", "severity", "source_ip")
      val out = Cleaning.handleMissingValues(df)
      val nullCounts = out.select(
        Seq("user_id", "event_type", "status", "severity", "source_ip")
          .map(c => sum(col(c).isNull.cast("long")).as(c)): _*).collect()(0)
      assert(nullCounts.toSeq.forall(_ == 0L))
      assert(out.filter(col("event_id").isNull).count() === 0)
    }
  }

  test("chunking invariants: full coverage, no empty chunks, order reconstructs") {
    val paramsGen = for {
      nTokens <- Gen.choose(1, 40)
      chunk <- Gen.choose(1, 12)
      stride <- Gen.choose(1, chunk) // stride <= chunkTokens (enforced)
    } yield (nTokens, chunk, stride)
    forAll(paramsGen, n = 12) { case (nTokens, chunk, stride) =>
      val text = (1 to nTokens).map(i => s"t$i").mkString(" ")
      val chunks = TextAnalysis.chunkByTokens(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", chunk, stride)
        .orderBy("chunk_id")
        .select("chunk_text", "chunk_tokens")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // no empty chunks; only the last may run short
      assert(chunks.forall(_._2 >= 1))
      assert(chunks.init.forall(_._2 == chunk))
      // every token covered, in order, exactly matching its chunk window
      val covered = chunks.flatMap(_._1.split(" ")).toSet
      assert(covered == (1 to nTokens).map(i => s"t$i").toSet,
        s"n=$nTokens chunk=$chunk stride=$stride")
      chunks.zipWithIndex.foreach { case ((ct, _), ci) =>
        val start = ci * stride
        val expected = (start until math.min(start + chunk, nTokens))
          .map(i => s"t${i + 1}").mkString(" ")
        assert(ct == expected, s"chunk $ci of n=$nTokens chunk=$chunk stride=$stride")
      }
    }
  }

  test("SQ8 quantization properties: codes in range, error bound, idempotent ranking") {
    val vec = Gen.listOfN(12, Gen.choose(-8.0, 8.0).map(_.toFloat))
    forAll(Gen.listOfN(10, vec), n = 4) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val q = graft.ext.Similarity.quantizeInt8(df, "embedding")
        .select("vec_id", "q_scale", "qvec")
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          r.getSeq[Byte](2).toArray)).toList
      q.foreach { case (id, scale, codes) =>
        val orig = vecs(id.toInt)
        // codes stay inside int8, reconstruction within scale/2 + eps
        assert(codes.forall(c => c >= -127 && c <= 127))
        orig.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c * scale) <= scale / 2 + 1e-9,
            s"vec $id: |$x - $c*$scale|")
        }
        // the max-magnitude element always saturates to ±127 (scale > 0)
        if (scale > 0) assert(codes.exists(c => math.abs(c.toInt) == 127))
      }
    }
  }

  test("temperatureSample properties: targets respect caps and alpha monotonicity") {
    val strata = Gen.listOfN(4, Gen.choose(5, 60))
    forAll(strata, n = 6) { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(i => (s.toLong * 1000 + i, s"s$s", s"text $s $i"))
      }
      val df = rows.toDF("doc_id", "lang", "text")
      val total = sizes.sum / 2
      def counts(alpha: Double): Map[String, Long] =
        graft.ext.CorpusSampling
          .temperatureSample(df, "lang", "text", "doc_id", alpha, total.toLong)
          .groupBy("lang").count().as[(String, Long)].collect().toMap
      val natural = counts(1.0)
      val flat = counts(0.0)
      // never exceeds the stratum, total near the budget (floor slack <= #strata)
      sizes.zipWithIndex.foreach { case (n, s) =>
        assert(natural.getOrElse(s"s$s", 0L) <= n)
        assert(flat.getOrElse(s"s$s", 0L) <= n)
      }
      assert(natural.values.sum <= total && natural.values.sum >= total - 4)
      // alpha=0 never gives a LARGE stratum more than alpha=1 does
      val biggest = s"s${sizes.indexOf(sizes.max)}"
      assert(flat.getOrElse(biggest, 0L) <= natural.getOrElse(biggest, 0L))
    }
  }

  test("balanceShards properties: exact doc partition, shard range, determinism") {
    val lens = Gen.listOfN(40, Gen.choose(1, 120))
    forAll(lens, n = 5) { ls =>
      val df = ls.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val out = graft.ext.CorpusSampling
        .balanceShards(df, "doc_id", "text", nShards = 4, spread = 2)
        .select("doc_id", "shard").as[(Long, Int)].collect()
      // every document exactly once, shards in range
      assert(out.map(_._1).sorted.sameElements(ls.indices.map(_.toLong)))
      assert(out.forall { case (_, s) => s >= 0 && s < 4 })
      // per-shard doc counts within one of even (serpentine deal property,
      // per salt cell) -- with 8 cells the global count spread stays small
      val perShard = out.groupBy(_._2).view.mapValues(_.length)
      assert(perShard.values.max - perShard.values.min <= 8)
    }
  }

  test("upsert invariants: keys union, updates win, untouched base passes through") {
    val pairs = Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(0, 99)))
    forAll(Gen.zip(pairs, pairs)) { case (baseRaw, updRaw) =>
      // key-unique sides (the operator's documented precondition)
      val base = baseRaw.toMap.toSeq.toDF("k", "v")
      val upd = updRaw.toMap.toSeq.toDF("k", "v")
      val merged = graft.operators.Upsert.upsert(base, upd, "k")
        .as[(Long, Int)].collect().toMap
      val b = baseRaw.toMap
      val u = updRaw.toMap
      assert(merged.keySet === (b.keySet ++ u.keySet))
      u.foreach { case (k, v) => assert(merged(k) === v, s"update lost for $k") }
      (b -- u.keySet).foreach { case (k, v) =>
        assert(merged(k) === v, s"untouched base row changed for $k")
      }
    }
  }

  test("zorder16 is a bijection on 16-bit pairs: deinterleave inverts it") {
    def deinterleave(z: Long): (Long, Long) = {
      var a = 0L; var b = 0L
      for (i <- 0 until 16) {
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    forAll(Gen.zip(Gen.choose(0L, (1L << 40) - 1), Gen.choose(0L, (1L << 40) - 1)), n = 64) {
      case (a, b) =>
        val z = graft.functions.ZOrderImpl.interleave16(a, b)
        assert(z >= 0L && z < (1L << 32), s"z out of 32-bit range: $z")
        assert(deinterleave(z) === (a & 0xFFFFL, b & 0xFFFFL), s"($a, $b)")
    }
  }

  test("lpmEnrich matches a plain-Scala LPM reference on random feeds and addresses") {
    val genCidr = for {
      o1 <- Gen.choose(0, 255); o2 <- Gen.choose(0, 255)
      o3 <- Gen.choose(0, 255); o4 <- Gen.choose(0, 255)
      p <- Gen.choose(1, 30)
    } yield s"$o1.$o2.$o3.$o4/$p"
    def bounds(cidr: String): (Long, Long, Int) = {
      val Array(base, p) = cidr.split("/")
      val o = base.split("\\.").map(_.toLong)
      val raw = o(0) * 16777216L + o(1) * 65536L + o(2) * 256L + o(3)
      val block = 1L << (32 - p.toInt)
      val lo = raw - raw % block
      (lo, lo + block - 1, p.toInt)
    }
    forAll(Gen.zip(
        Gen.listOfN(6, genCidr).map(_.distinct),
        Gen.listOfN(50, Gen.choose(0L, (1L << 32) - 1))), n = 6) {
      case (cidrs, ips) =>
        // drop duplicate (lo, prefix) blocks: two labels for the same
        // block would make the match ambiguous (not a well-formed feed)
        val feed = cidrs.map(c => c -> s"label-$c")
          .groupBy { case (c, _) => (bounds(c)._1, bounds(c)._3) }
          .map(_._2.head).toSeq.sortBy(_._1)
        val expected = ips.map { ip =>
          val hits = feed.filter { case (c, _) =>
            val (lo, hi, _) = bounds(c); ip >= lo && ip <= hi }
          if (hits.isEmpty) None
          else Some(hits.maxBy { case (c, _) => bounds(c)._3 }._2)
        }
        val got = graft.ext.Network.lpmEnrich(
            ips.zipWithIndex.map { case (ip, i) => (i, ip) }.toDF("i", "ip"),
            col("ip"), feed)
          .orderBy("i").select(col("_lpm.label"))
          .as[Option[String]].collect().toSeq
        assert(got === expected)
    }
  }

  /** Textbook two-row DP Levenshtein — the reference for the blocked
    * edit-distance operator.
    */
  private def lev(a: String, b: String): Int = {
    var prev = (0 to b.length).toArray
    for (i <- 1 to a.length) {
      val cur = new Array[Int](b.length + 1)
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      prev = cur
    }
    prev(b.length)
  }

  test("operator guards reject invalid inputs loudly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    intercept[IllegalArgumentException] {
      graft.ext.CorpusSampling.weightedSample(
        docs.withColumn("_priority", lit(1)), col("doc_id"), col("n_chars"), 10)
    }
    intercept[IllegalArgumentException] {
      graft.ext.CorpusSampling.weightedSample(docs, col("doc_id"), col("n_chars"), 0)
    }
    intercept[IllegalArgumentException] {
      graft.ext.Dedup.editDistancePairs(docs, "doc_id", "text",
        sigLen = 8, blockLen = 16)
    }
    intercept[IllegalArgumentException] {
      graft.ext.Sketches.countMinSketch(docs, col("doc_id"), width = 0, depth = 4)
    }
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    intercept[IllegalArgumentException] {
      graft.ext.Sketches.countMinLookup(
        graft.ext.Sketches.countMinSketch(e, col("user_id"), 8, 2),
        e.withColumn("_cms_j", lit(1)), col("user_id"), 8, 2)
    }
  }

  test("weighted sampling and count-min are partitioning-invariant") {
    // a distributed operator's result must not depend on how the input
    // is split across tasks — re-partitioning by an unrelated key must
    // reproduce the identical selection / identical sketch
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def sel(df: org.apache.spark.sql.DataFrame) =
      graft.ext.CorpusSampling.weightedSample(df, col("doc_id"), col("n_chars"), 50)
        .select("doc_id").as[Long].collect().toSeq
    assert(sel(docs) === sel(docs.repartition(7, col("lang"))))
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    def sk(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Sketches.countMinSketch(df, col("user_id"), width = 32, depth = 3)
        .as[(Int, Long, Long)].collect().toSet
    assert(sk(e) === sk(e.repartition(13)))
  }

  test("minhash and simhash signatures are partitioning-invariant") {
    // both families are min / sign-of-sum aggregates over per-token
    // hashes — commutative, so the signatures must not depend on task
    // splits (this is also what makes their DuckDB oracle replays sound)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    def mh(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Dedup.minhashSignatures(df, "doc_id", "text", 32)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(mh(docs) === mh(docs.repartition(7, col("doc_id"))))
    def sh(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Dedup.simhashTable(df, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
    assert(sh(docs) === sh(docs.repartition(11)))
  }

  test("hyperplane LSH signatures are partitioning-invariant on the live corpus") {
    // unlike minhash/simhash (exact-integer aggregates), the hyperplane
    // projections are DOUBLE sums whose partial-aggregation order Spark
    // does not specify — the advice-flagged flake source for the
    // q_ann_lsh / q_dedup_embed / q_corpus_pipeline oracles. This pins
    // the empirical contract the oracles rely on: across task splits the
    // 64-element per-(id,bit) sums land on the same signs (no projection
    // sits close enough to 0 for reassociation ulps to flip it). If this
    // ever fails, fold the projections element-wise in deterministic
    // order on both sides (the ADC-oracle list_reduce pattern) instead
    // of chasing the flake in the gate.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    def sig(df: org.apache.spark.sql.DataFrame, t: Int) =
      graft.ext.Similarity.hyperplaneSignatures(df, "vec_id", "embedding",
          bits = 6, table = t)
        .as[(Long, Long)].collect().toMap
    for (t <- 0 until 4) {
      assert(sig(e, t) === sig(e.repartition(7, col("vec_id")), t))
      assert(sig(e, t) === sig(e.repartition(13), t))
    }
  }

  test("blocked edit-distance pairs match an all-pairs plain-Scala reference") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val sigs = raw.map { case (id, t) =>
      (id, t.toLowerCase.replaceAll("\\s+", " ").take(40))
    }
    // collapsed reference: identical-signature classes, then class pairs
    val classes = sigs.groupBy(_._2).map { case (sg, m) =>
      sg -> ((m.map(_._1).min, m.size.toLong))
    }
    val expIntra = classes.values.collect { case (rep, cnt) if cnt >= 2 =>
      (rep, rep, 0L, cnt * (cnt - 1) / 2)
    }.toSet
    val expCross = (for {
      (sa, (ra, ca)) <- classes; (sb, (rb, cb)) <- classes
      if sa < sb && sa.take(8) == sb.take(8)
      d = lev(sa, sb) if d <= 5
    } yield (math.min(ra, rb), math.max(ra, rb), d.toLong, ca * cb)).toSet
    val got = graft.ext.Dedup.editDistancePairs(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text", sigLen = 40, blockLen = 8, maxDist = 5)
      .as[(Long, Long, Int, Long)].collect()
      .map { case (a, b, d, n) => (a, b, d.toLong, n) }.toSet
    assert(got === expIntra ++ expCross)
    assert(got.nonEmpty)
    // pair-count conservation vs the exploded all-pairs reference
    val exploded = (for {
      (i1, s1) <- sigs.toSeq; (i2, s2) <- sigs.toSeq
      if i1 < i2 && s1.take(8) == s2.take(8) && lev(s1, s2) <= 5
    } yield 1).sum
    assert(got.toSeq.map(_._4).sum === exploded.toLong)
    // and the assignment shape: one row per doc, reps keep themselves
    val assign = graft.ext.Dedup.editDistanceDedup(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text", sigLen = 40, blockLen = 8, maxDist = 5)
      .as[(Long, Long, Boolean)].collect()
    assert(assign.length === raw.length)
    val repOf = assign.map(a => a._1 -> a._2).toMap
    assign.foreach { case (_, rep, _) => assert(repOf(rep) === rep) }
  }

  test("hyperplaneSignatures are partitioning-invariant (exact integer sums)") {
    // The projection behind each signature bit is an exact integer sum
    // (quantized elements x scale-10^6 plane components), so the packed
    // signature may not depend on how rows/partials are partitioned —
    // the float-flake class a double sum would reintroduce. Verified by
    // re-deriving signatures under adversarial partitionings.
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    def sigs(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.ext.Similarity.hyperplaneSignatures(df, "vec_id", "embedding",
          bits = 12, table = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = sigs(embs)
    assert(base.nonEmpty)
    assert(sigs(embs.repartition(1)) === base)
    assert(sigs(embs.repartition(64, col("vec_id") % 7)) === base)
    assert(sigs(embs.orderBy(col("vec_id").desc)) === base)
  }
  test("hyperplaneSignaturesMulti equals the per-table union (r20)") {
    // the one-pass multi-table form must emit EXACTLY the union of the
    // single-table signatures over t = 0..tables-1 — the equivalence the
    // r20 LSH-path optimization (one exchange instead of `tables`)
    // depends on. Integer projection sums make this exact, not
    // approximate.
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val bits = 6
    val tables = 12
    val multi = graft.ext.Similarity.hyperplaneSignaturesMulti(
        embs, "vec_id", "embedding", bits, tables)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val single = (0 until tables).flatMap { t =>
      graft.ext.Similarity.hyperplaneSignatures(
          embs, "vec_id", "embedding", bits, t)
        .collect().map(r => (r.getLong(0), t, r.getLong(1)))
    }.toSet
    assert(multi === single)
    assert(multi.nonEmpty)
  }

  /** Messy-URL generator: random case, ports (default and not), tracking
    * and real params in random order, trailing slashes, fragments, and
    * some non-absolute garbage.
    */
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "hTTps")
    host <- Gen.oneOf("Example.COM", "a.b.co.uk", "localhost",
      "WWW.Site.com.au", "x.y.z.io", "sub.domain.ORG")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/a/B", "/a/B/", "/docs///", "/p%2Fq")
    params <- Gen.someOf(Seq("b=2", "a=1", "utm_source=x", "fbclid=9",
      "z=", "gclid=g", "utm_campaign=c", "ref=r"))
    frag <- Gen.oneOf("", "#sec", "#a#b")
    abs <- Gen.frequency(9 -> Gen.const(true), 1 -> Gen.const(false))
  } yield
    if (!abs) s"relative/$path?$frag"
    else {
      val qs = if (params.isEmpty) "" else "?" + params.mkString("&")
      s"$scheme://$host$port$path$qs$frag"
    }

  test("URL canonicalization invariants over generated messy URLs") {
    import graft.ext.UrlOps
    forAll(Gen.listOfN(40, urlGen), n = 6) { urls =>
      val rows = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("id", "url")
        .select(col("id"), col("url"),
          UrlOps.canonicalizeUrl(col("url")).as("c"))
        .select(col("id"), col("url"), col("c"),
          UrlOps.canonicalizeUrl(col("c")).as("cc"),
          UrlOps.urlHost(col("c")).as("h"))
        .collect()
      rows.foreach { r =>
        val (u, c, cc, h) = (r.getString(1), r.getString(2),
          r.getString(3), r.getString(4))
        // idempotence: a canonical form is its own canonical form
        assert(cc == c, s"not idempotent: $u -> $c -> $cc")
        if (u.contains("://")) {
          // no fragment survives; no tracking params survive
          assert(!c.contains("#"), s"fragment survived: $u -> $c")
          assert(!c.contains("utm_") && !c.contains("fbclid") &&
            !c.contains("gclid"), s"tracking param survived: $u -> $c")
          // scheme and host are lowercase
          val scheme = c.takeWhile(_ != ':')
          assert(scheme == scheme.toLowerCase, s"scheme case: $c")
          assert(h == h.toLowerCase, s"host case: $h")
          // SCHEME-default ports are gone (http:80, https:443); a
          // non-default port (http:443, any:8080) must survive
          val scheme0 = c.takeWhile(_ != ':')
          val defPort = if (scheme0 == "http") ":80" else ":443"
          assert(!c.contains(defPort + "/") && !c.endsWith(defPort) &&
            !c.contains(defPort + "?"), s"default port: $u -> $c")
          if (u.toLowerCase.startsWith("http://") && u.contains(":8080"))
            assert(c.contains(":8080"), s"real port lost: $u -> $c")
          // no trailing slash on the path
          assert(!c.split("\\?")(0).stripPrefix(scheme + "://").contains("//") ||
            u.contains("//"), s"slash runs: $u -> $c")
          assert(!c.split("\\?")(0).endsWith("/"), s"trailing slash: $u -> $c")
        } else {
          // non-absolute input passes through byte-identical
          assert(c == u, s"garbage rewritten: $u -> $c")
        }
      }
    }
  }
}
