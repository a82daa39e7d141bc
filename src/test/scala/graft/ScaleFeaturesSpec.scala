package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Skew
import graft.ext.{Dedup, GraphAnn, Similarity}
import graft.functions.GraftFunctions
import graft.sources.Sources

/** Tests for the scale-path features: skew-salted aggregation, SQL function
  * registration, source readers, IVF ANN.
  */
class ScaleFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("salted count-over matches the window formulation, including a mega-key") {
    // 1000 rows of the hot key + sparse normal keys — the fill-created
    // "unknown" shape (SURVEY.md §7.5(5))
    val rows = (1 to 1000).map(i => (i.toLong, "unknown")) ++
      (1 to 20).map(i => (1000L + i, s"user$i"))
    val df = rows.toDF("event_id", "user_id")

    val windowed = df.withColumn("n",
      count(col("event_id")).over(Window.partitionBy("user_id")))
      .select("event_id", "n").as[(Long, Long)].collect().toMap
    val salted = Skew.countOverSalted(df, "user_id", "event_id", "n")
      .select("event_id", "n").as[(Long, Long)].collect().toMap
    assert(salted === windowed)

    assert(Skew.pickCountStrategy(df, "user_id", sampleFraction = 1.0) === "salted")
    val uniform = (1 to 200).map(i => (i.toLong, s"u${i % 50}")).toDF("event_id", "user_id")
    assert(Skew.pickCountStrategy(uniform, "user_id", sampleFraction = 1.0) === "window")
  }

  test("float_vector_cosine is callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)), (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("vec_pairs")
    val out = spark.sql(
      "SELECT float_vector_cosine(a, b) AS c FROM vec_pairs ORDER BY c DESC")
      .as[Double].collect()
    assert(out.toSeq === Seq(1.0, 0.0))
  }

  test("sources: csv round-trip with ingest order, json lines") {
    val dir = Files.createTempDirectory("graft-sources").toString
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("event_id", "payload")
    Sources.writeCsv(df, s"$dir/csv")
    val back = Sources.csv(spark, s"$dir/csv")
    assert(back.columns.contains("_ingest_order"))
    assert(back.count() === 3)
    // single-file write + read preserves ingest order
    val ordered = back.orderBy("_ingest_order")
      .select("event_id").as[Long].collect()
    assert(ordered.toSeq === Seq(1L, 2L, 3L))

    val jsonPath = s"$dir/events.jsonl"
    Files.writeString(java.nio.file.Paths.get(jsonPath),
      """{"event_id": 1, "user_id": "u"}
        |{"event_id": 2, "user_id": "v"}""".stripMargin)
    val j = Sources.jsonLines(spark, jsonPath)
    assert(j.count() === 2)
    assert(j.columns.contains("_ingest_order"))
  }

  test("parquet source reader round-trips with optional ingest order") {
    val dir = Files.createTempDirectory("graft-pq").toString + "/t"
    Seq((1L, "x"), (2L, "y")).toDF("event_id", "payload")
      .write.parquet(dir)
    val plain = Sources.parquet(spark, dir)
    assert(!plain.columns.contains("_ingest_order"))
    assert(plain.count() === 2)
    val stamped = Sources.parquet(spark, dir, withIngestOrder = true)
    assert(stamped.columns.contains("_ingest_order"))
  }

  test("partitioned writes prune whole partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    val df = (1 to 300).map(i => (i.toLong, s"2025-01-${i % 3 + 1}", i * 1.0))
      .toDF("event_id", "day", "value")
    Sources.writePartitioned(df, dir, "day")
    val read = spark.read.parquet(dir).filter(col("day") === "2025-01-2")
    assert(read.count() === 100)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("isnotnull(day"),
      s"partition filter not pushed:\n${plan.take(1500)}")
  }

  test("bucketed tables join with NO exchange (co-located join)") {
    val dir = Files.createTempDirectory("graft-bucketed").toString
    val events = (1 to 500).map(i => (i.toLong, s"u${i % 40}", i * 1.5))
      .toDF("event_id", "user_id", "value")
    val users = (0 until 40).map(i => (s"u$i", s"org${i % 5}"))
      .toDF("user_id", "org")
    Sources.writeBucketed(events, "ev_bucketed", s"$dir/ev", "user_id", buckets = 8)
    Sources.writeBucketed(users, "us_bucketed", s"$dir/us", "user_id", buckets = 8)
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_bucketed")
        .join(spark.table("us_bucketed"), "user_id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(2000)}")
      assert(joined.count() === 500)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS us_bucketed")
    }
  }

  test("PQ-ADC: valid codes, compressed scan recall, exact re-rank scores") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    val cb = Similarity.pqCodebooks(e, "vec_id", "embedding", m = 8, ksub = 16)
    assert(cb.length == 8 && cb.forall(_.length == 16) && cb.head.head.length == 8)
    val codes = Similarity.pqEncode(e, "embedding", cb)
      .select("_codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))

    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
    val recall = (pq.map(r => (r._1, r._2)).toSet & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall@10 too low: $recall")

    // the emitted score is the EXACT cosine (re-ranked), not the ADC proxy
    val exactScores = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 200)
      .select("q_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    pq.foreach { case (q, v, c) =>
      exactScores.get((q, v)).foreach(ex => assert(math.abs(ex - c) < 1e-12)) }

    // NULL/mis-dimensioned embeddings must not flood the candidate slots
    // (NULL ADC scores sort LAST, not first)
    val dirty = e.unionByName(Seq((90001L, null: Array[Float]))
      .toDF("vec_id", "embedding"))
    val dirtyTop = Similarity.pqTopK(dirty, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    assert(!dirtyTop.exists(_._2 == 90001L))
    assert(dirtyTop.length == pq.length)
  }

  test("IVFADC: recall survives the composed pruning+compression; scores exact") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = Similarity.ivfPqTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10, nCentroids = 16, nProbe = 8)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    // no duplicate pairs despite spilled multi-assignment
    assert(got.length == got.distinct.length)
    val recall = (got.toSet & exact).size.toDouble / exact.size
    // composed loss: IVF-16/probe-8 alone scores ~0.9 here and PQ rerank
    // keeps most of its pool — the floor guards against wiring regressions
    assert(recall >= 0.4, s"IVFADC recall@10 too low: $recall")
  }

  test("multi-table LSH recall dominates single-table at equal bits") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // bits=4: random-data top neighbors sit near cosine 0.5 (~60 deg), so
    // per-bit collision ~0.67 -> single-table recall ~0.67^4 ~ 0.2 and
    // 4-table OR-amplification ~ 1-(1-0.2)^4 ~ 0.6
    def recallOf(tables: Int): Double = {
      val got = Similarity.lshTopKMulti(e, "vec_id", "embedding",
          probes, "q_id", "q_emb", 10, bits = 4, tables = tables)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      (got & exact).size.toDouble / exact.size
    }
    val r1 = recallOf(1)
    val r4 = recallOf(4)
    assert(r4 >= r1, s"4-table recall $r4 < 1-table $r1")
    assert(r4 >= 0.25, s"4-table recall too low: $r4")
  }

  test("multi-probe LSH (1 table + bit flips) beats 2 single-probe tables") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(tables: Int, hamming: Int): Double = {
      val got = Similarity.lshTopKMulti(e, "vec_id", "embedding",
          probes, "q_id", "q_emb", 10, bits = 4, tables = tables,
          probeHamming = hamming)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      (got & exact).size.toDouble / exact.size
    }
    // multi-probe computes ONE corpus signature family; two tables compute
    // two — equal-or-better recall at half the corpus-side signature cost
    val mp = recallOf(1, 1)
    val sp2 = recallOf(2, 0)
    assert(mp >= sp2, s"multi-probe recall $mp < 2-table single-probe $sp2")
    assert(mp >= 0.3, s"multi-probe recall too low: $mp")
  }

  test("IVF top-k finds the exact nearest neighbors of in-list probes") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10, nCentroids = 32, nProbe = 16)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet

    assert(ivf.nonEmpty)
    // approximate: with nProbe=16 of 32 lists, expect >= 40% recall of the
    // exact top-10 on random data
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall too low: $recall")
  }

  test("k-means quantizer: better list balance than lowest-id, recall not worse") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet

    // inverted-list population skew = max/mean list size after assignment
    def skewOf(quantizer: String): Double = {
      val cents = Similarity.centroidsFor(e, "vec_id", "embedding", 16, quantizer)
      val sizes = Similarity.assignToCentroids(e, "embedding", cents)
        .groupBy("_c_id").count().select("count").as[Long].collect()
      sizes.max.toDouble / (sizes.sum.toDouble / sizes.length)
    }
    def recallOf(quantizer: String): Double = {
      val got = Similarity.ivfTopK(e, "vec_id", "embedding",
          probes, "q_id", "q_emb", 10, nCentroids = 16, nProbe = 4,
          quantizer = quantizer)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      (got & exact).size.toDouble / exact.size
    }

    val (skewKm, skewLow) = (skewOf("kmeans"), skewOf("lowid"))
    assert(skewKm < skewLow,
      s"k-means list skew $skewKm not below lowest-id $skewLow")
    val (recKm, recLow) = (recallOf("kmeans"), recallOf("lowid"))
    assert(recKm >= recLow,
      s"k-means recall $recKm below lowest-id $recLow at equal nProbe")
  }

  test("IVF recall at the shipped defaults (nCentroids=64, nProbe=8)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val raw = Similarity.ivfTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    // spill never duplicates a (probe, candidate) pair in the output
    assert(raw.length === raw.toSet.size, "duplicate pairs in IVF top-k")
    val recall = (raw.toSet & exact).size.toDouble / exact.size
    // uniform-random embeddings are the worst case for a geometric
    // partition; the closure spill holds recall up even here
    assert(recall >= 0.6, s"IVF default-config recall too low: $recall")
  }

  test("persisted IVF index: search parity with ivfTopK; append derives config; corpus never retrains") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // 1. the index round-trips the quantizer EXACTLY: searching the
    //    persisted index equals the in-one-call ivfTopK, row for row
    val direct = Similarity.ivfTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10, nCentroids = 32)
      .select(col("q_id"), col("vec_id"), round(col("cosine"), 6).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    val idxAll = Similarity.ivfIndex(e, "vec_id", "embedding", nCentroids = 32)
      .localCheckpoint(true)
    val viaIndex = Similarity.ivfSearchIndex(idxAll, probes, "q_id", "q_emb",
        k = 10, nProbe = 8)
      .select(col("q_id"), col("vec_id"), round(col("cosine"), 6).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    assert(viaIndex === direct, "index search diverged from ivfTopK")
    // 2. append assigns against the FROZEN quantizer: corpus postings
    //    pass through untouched, batch postings arrive, and searching the
    //    merged index now surfaces batch vectors (vec 0's exact clone
    //    class includes batch members at these ids when present, so use
    //    recall vs brute force over the union as the semantic check)
    val corpus = e.filter(pmod(col("vec_id"), lit(7)) =!= 0)
    val batch = e.filter(pmod(col("vec_id"), lit(7)) === 0)
    val idxCorpus = Similarity.ivfIndex(corpus, "vec_id", "embedding",
      nCentroids = 32).localCheckpoint(true)
    val merged = Similarity.ivfAppend(idxCorpus, batch, "vec_id", "embedding")
      .localCheckpoint(true)
    val corpusPostings = idxCorpus.filter(col("kind") === "posting")
      .select("cid", "member_id").as[(Long, Long)].collect().toSet
    val mergedPostings = merged.filter(col("kind") === "posting")
      .select("cid", "member_id").as[(Long, Long)].collect().toSet
    assert(corpusPostings.subsetOf(mergedPostings),
      "append disturbed existing corpus postings")
    assert(mergedPostings.exists { case (_, m) => m % 7 == 0 },
      "no batch postings appended")
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val gotMerged = Similarity.ivfSearchIndex(merged, probes, "q_id", "q_emb",
        k = 10, nProbe = 8)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(gotMerged.exists { case (_, m) => m % 7 == 0 },
      "search over the appended index never returns a batch vector")
    val recall = (gotMerged & exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"appended-index recall too low: $recall")
    // 3. the build config is DERIVED from the index: a lowid index hard-
    //    assigns (exactly one posting per vector) and append must follow
    val lowIdx = Similarity.ivfIndex(corpus, "vec_id", "embedding",
      nCentroids = 32, quantizer = "lowid").localCheckpoint(true)
    val lowMerged = Similarity.ivfAppend(lowIdx, batch, "vec_id", "embedding")
    val nCorpus = corpus.count()
    val nBatch = batch.count()
    assert(lowMerged.filter(col("kind") === "posting").count()
      === nCorpus + nBatch,
      "lowid append did not hard-assign one posting per vector")
    // 4. an index without centroid rows fails loudly
    intercept[IllegalArgumentException](
      Similarity.ivfAppend(
        lowIdx.filter(col("kind") === "posting"), batch, "vec_id", "embedding"))
  }

  test("index lifecycle closes: rebuild from the artifact alone") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").where(col("embedding").isNotNull)
    val corpus = e.filter(pmod(col("vec_id"), lit(7)) =!= 0)
    val batch = e.filter(pmod(col("vec_id"), lit(7)) === 0)
    // IVF: rebuild(append(build(corpus), batch)) crosses the append path
    // and must equal ONE fresh build over the union, row for row — the
    // index artifact alone carries everything a rebuild needs
    val grown = Similarity.ivfAppend(
        Similarity.ivfIndex(corpus, "vec_id", "embedding", nCentroids = 32)
          .localCheckpoint(true),
        batch, "vec_id", "embedding")
      .localCheckpoint(true)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("kind"), col("cid"), col("member_id"),
        col("v").cast("array<double>"), col("quantizer"),
        col("spill_delta"), col("spill_cap"))
      .collect().map(_.toSeq.map {
        case s: Seq[_] => s.toList
        case x => x
      }).toSet
    val rebuilt = Similarity.ivfRebuild(grown, nCentroids = 32)
    val fresh = Similarity.ivfIndex(e, "vec_id", "embedding", nCentroids = 32)
    assert(rows(rebuilt) === rows(fresh),
      "ivfRebuild diverged from a fresh build over the member set")
    // SEMANTIC: rebuild retrains on the index's own (unit) members;
    // internal consistency — every member row sits in its argmax
    // cluster under the REBUILT centroids (the same-kernel contract)
    val semGrown = Dedup.semIndexAppend(
      Dedup.semDedupIndex(corpus, "vec_id", "embedding", nCentroids = 8)
        .localCheckpoint(true),
      batch, "vec_id", "embedding")
    val semRebuilt = Dedup.semIndexRebuild(semGrown, nCentroids = 8)
      .localCheckpoint(true)
    val semCents = Dedup.semIndexCentroids(semRebuilt)
    val reassigned = Similarity.assignToCentroids(
        Dedup.semIndexMembers(semRebuilt)
          .select(col("_mid").as("member_id"), col("_mu").as("v")),
        "v", semCents)
      .select(col("member_id"), col("_c_id"))
      .as[(Long, Long)].collect().toMap
    val stored = Dedup.semIndexMembers(semRebuilt)
      .select(col("_mid"), col("_c_id"))
      .as[(Long, Long)].collect().toMap
    assert(stored === reassigned,
      "rebuilt semantic index members not in their argmax clusters")
    assert(stored.keySet === e.select("vec_id").as[Long].collect().toSet,
      "rebuild lost members")
    // GRAPH: rebuild derives (k, iters) from the index's own config row
    val gIdx = GraphAnn.graphIndex(corpus, "vec_id", "embedding",
      k = 4, iters = 1)
    val gRebuilt = GraphAnn.graphRebuild(e, "vec_id", "embedding", gIdx)
    assert(GraphAnn.graphIndexConfig(gRebuilt) === ((4, 1)))
    assert(GraphAnn.graphIndexEdges(gRebuilt)
      .select("vec_id").distinct().count() === e.count())
  }

  test("bench config: kmeans and lowid quantizers produce DIFFERENT centroids") {
    // BENCH_r4..r6 reported bit-identical max/mean list skew (1.264) for
    // both quantizers at the bench configuration, raising the suspicion
    // that the quantizer dispatch was broken. It isn't: this pins, at the
    // exact bench config (the bench sf's embeddings, nCentroids=32), that
    // the two quantizers return different centroid SETS and different
    // full list-size DISTRIBUTIONS — the tied skew is a genuine
    // coincidence of the MAX list size on uniform-random embeddings (the
    // max is a coarse statistic; the distributions beneath it differ).
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    val km = Similarity.centroidsFor(e, "vec_id", "embedding", 32, "kmeans")
    val low = Similarity.centroidsFor(e, "vec_id", "embedding", 32, "lowid")
    val kmSet = km.map(_._2.toSeq).toSet
    val lowSet = low.map(_._2.toSeq).toSet
    assert(kmSet !== lowSet, "quantizers returned identical centroid sets")
    // lowid centroids are raw corpus vectors; kmeans centroids are
    // normalized means — on this corpus none should coincide
    assert((kmSet & lowSet).isEmpty,
      s"${(kmSet & lowSet).size} centroids shared between quantizers")
    def sizesOf(cents: Array[(Long, Array[Float])]): Seq[Long] =
      Similarity.assignToCentroids(e, "embedding", cents)
        .groupBy("_c_id").count().select("count").as[Long].collect()
        .sorted.toSeq
    assert(sizesOf(km) !== sizesOf(low),
      "identical list-size distributions — dispatch suspect after all")
  }

  test("unimax budgets: exact water-fill — caps bind, remainder redistributes") {
    import spark.implicits._
    // tokens per lang: tiny 10, small 100, big 1000 (one doc each)
    val docs = Seq(
      (1L, "tiny", Seq.fill(10)("t").mkString(" ")),
      (2L, "small", Seq.fill(100)("s").mkString(" ")),
      (3L, "big", Seq.fill(1000)("b").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    // E=1, B=600: fair=200 -> tiny capped at 10; remaining 590/2=295 ->
    // small capped at 100; remaining 490 -> big takes 490 (fair-limited)
    val got = graft.ext.CorpusSampling.unimaxBudgets(
      docs, "lang", "text", maxEpochs = 1, totalBudget = 600)
    assert(got == Seq(("big", 1000L, 1000L, 490L),
      ("small", 100L, 100L, 100L), ("tiny", 10L, 10L, 10L)))
    // maxEpochs raises the caps: E=2, B=600 -> tiny cap 20 (binds),
    // small fair 290/2=... fair after tiny: (600-20)/2=290 < cap 200?
    // no: cap 200 < 290 -> capped; big gets 380
    val e2 = graft.ext.CorpusSampling.unimaxBudgets(
      docs, "lang", "text", maxEpochs = 2, totalBudget = 600)
    assert(e2 == Seq(("big", 1000L, 2000L, 380L),
      ("small", 100L, 200L, 200L), ("tiny", 10L, 20L, 20L)))
    // huge budget: everyone capped, money left on the table by design
    val cap = graft.ext.CorpusSampling.unimaxBudgets(
      docs, "lang", "text", maxEpochs = 1, totalBudget = 100000)
    assert(cap.map(_._4) == Seq(1000L, 100L, 10L))
    // selection respects the budgets and never exceeds availability
    val sel = graft.ext.CorpusSampling.unimaxSample(
        docs, "lang", "text", "doc_id", 1, 600)
      .select("lang").as[String].collect()
    assert(sel.toSet.subsetOf(Set("tiny", "small"))
      || sel.toSet.contains("big") == false,
      s"big (cum 1000 > budget 490) must not be selected, got ${sel.toSeq}")
    assert(sel.toSet == Set("tiny", "small"))
  }

  test("k-means quantizer is deterministic and centroids are unit-norm") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val c1 = Similarity.kmeansCentroids(e, "vec_id", "embedding", 8)
    val c2 = Similarity.kmeansCentroids(e, "vec_id", "embedding", 8)
    assert(c1.map(_._2.toSeq).toSeq === c2.map(_._2.toSeq).toSeq)
    for ((_, v) <- c1) {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"centroid norm $n not ~1")
    }
  }
}
