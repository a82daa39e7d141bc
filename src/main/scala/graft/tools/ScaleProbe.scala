package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 scale sweep for the operators added this round: min-of-N
  * solo noop-write seconds for the Kneser–Ney LM, the NB language id,
  * and exact-substring dedup, runnable against any sf dir (the 50×
  * ScaleGen corpus is the scale point). exact-substring runs the RAW
  * operator on the corpus as-is rather than the gate query, whose
  * planted `doc_id + 10000` shift is only id-collision-free at gate
  * scale. On the 50× corpus every document has 50 verbatim copies, so
  * this is the operator's worst realistic shape: ~98% of windows
  * flagged — the coverage explode is linear in flagged rows (never
  * pairwise), which is exactly what this probe demonstrates.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_RUNS
  * (default 3). Prints one JSON line.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")

  /** The q_image_phash payload synth (md5-patterned gray BMPs), as a
    * probe input: every row carries a distinct 822-byte image.
    */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val header = "424D" + "36030000" + "00000000" + "36000000" +
      "28000000" + "10000000" + "F0FFFFFF" + "0100" + "1800" +
      "00000000" + "00030000" + "00000000" + "00000000" + "00000000" +
      "00000000"
    docs.select(col("doc_id").as("media_id"),
      unhex(concat(lit(header), array_join(
        transform(sequence(lit(0), lit(255)),
          p => repeat(lpad(hex(conv(substring(md5(concat(
            col("doc_id").cast("string"), lit("_"), p.cast("string"))),
            1, 2), 16, 10).cast("int")), 2, "0"), 3)),
        ""))).as("payload"))
  }

    // 512-sample 8-bit mono WAVs from the md5-byte waveform model (the
    // q_audio_fingerprint synth): 556 bytes per row, all distinct.
    def syntheticWavs(docs: DataFrame): DataFrame = {
      val header = "52494646" + "24020000" + "57415645" + "666D7420" +
        "10000000" + "0100" + "0100" + "401F0000" + "401F0000" + "0100" +
        "0800" + "64617461" + "00020000"
      docs.select(col("doc_id").as("media_id"),
        unhex(concat(lit(header), array_join(
          transform(sequence(lit(0), lit(511)),
            t => lpad(hex(conv(md5(concat(col("doc_id").cast("string"),
                lit("_"), floor(t / 16).cast("string")))
              .substr((t % 16) * 2 + 1, lit(2)), 16, 10).cast("long")),
              2, "0")),
          ""))).as("payload"))
    }

    def iocTerms(n: Int): Seq[String] =
      Seq("table", "spark", "value", "query", "batch", "customer") ++
        (0 until (n - 6)).map(i => f"indicator-$i%06d")
    def iocProbe(docs: DataFrame, n: Int): DataFrame =
      docs.select(col("doc_id"),
        graft.functions.MultiMatchFunctions
          .multi_match_count(col("text"), iocTerms(n)).as("n"))
    def iocRegexProbe(docs: DataFrame, n: Int): DataFrame =
      graft.ext.TextAnalysis.blocklistScreen(docs.select("doc_id", "text"),
        "text", iocTerms(n), maxBannedPerMille = 1000)

    val ops: Seq[(String, () => DataFrame)] = Seq(
      "kn_lm" -> (() =>
        graft.ext.Relevance.knLmScore(docs, "doc_id", "text")),
      "lang_id_nb" -> (() => {
        val m = graft.ext.LangId.train(
          docs.filter(col("doc_id") < 400), "lang", "text", dims = 256, n = 3)
        graft.ext.LangId.score(
          docs.filter(col("doc_id") >= 400), "doc_id", "text", m)
      }),
      "exact_substring" -> (() =>
        graft.ext.Dedup.exactSubstringDedup(docs, "doc_id", "text",
          minTokens = 8)),
      // late-r12 additions — on the 50x corpus (50 verbatim copies per
      // document) chunk_dedup/dedup_priority hit their worst realistic
      // shape: ~98% duplicated chunk/fingerprint mass
      "cdc_chunks" -> (() =>
        graft.ext.TextAnalysis.cdcChunks(docs, "doc_id", "text", 64)),
      "chunk_dedup" -> (() =>
        graft.ext.Dedup.chunkDedup(docs, "doc_id", "text", 64)),
      "ccnet_buckets" -> (() => {
        val scored = graft.ext.Relevance.knLmScore(docs, "doc_id", "text")
          .select(col("doc_id"),
            round(col("lm_score_kn") * 10000, 0).cast("long").as("scoreq"))
        graft.ext.Relevance.perplexityBuckets(scored, "scoreq")
      }),
      "kn_frozen" -> (() => {
        val m = graft.ext.Relevance.knLmModel(docs, "text")
        graft.ext.Relevance.knScoreFrozen(docs, "doc_id", "text", m)
      }),
      "dedup_priority" -> (() =>
        graft.ext.Dedup.priorityDedup(docs, "doc_id", "text", "source",
          Map("src3" -> 0, "src1" -> 1), defaultPriority = 99)),
      "blocklist" -> (() =>
        graft.ext.TextAnalysis.blocklistScreen(docs, "text",
          Seq("slow", "big", "merge"), maxBannedPerMille = 50)),
      "corpus_shuffle" -> (() =>
        graft.ext.CorpusSampling.deterministicShuffle(docs, col("doc_id"))),
      "inc_minhash" -> (() => {
        val idx = graft.ext.Dedup.minhashBucketIndex(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        graft.ext.Dedup.incrementalMinhash(
          docs.filter(col("doc_id") % 2 === 1), idx, "doc_id", "text")
      }),
      // round-13 additions: perceptual image hashing over synthesized
      // 16x16 BMPs (payload build + real decode + dHash/aHash/pHash per
      // row — pure projection, the probe's cost IS the per-row work),
      // banded image near-dup pairing, and the unigram tokenizer's
      // train + encode loop (bounded-driver EM over the distinct-word
      // dictionary).
      "image_hashes" -> (() =>
        graft.ext.ImageHash.imageHashes(spark, syntheticImages(docs))),
      "dedup_image" -> (() =>
        graft.ext.ImageHash.imageNearDupPairs(
          spark, syntheticImages(docs), maxHamming = 3)),
      "unigram_train" -> (() =>
        graft.ext.UnigramTrainer.train(spark, docs, "text",
          vocabSize = 300, emIters = 2)),
      "unigram_encode" -> (() => {
        val m = graft.ext.UnigramTrainer.train(spark,
          docs.filter(col("doc_id") < 400), "text", 300, 2)
        graft.ext.UnigramTrainer.encode(docs, "doc_id", "text", m)
      }),
      "wordpiece_train" -> (() =>
        graft.ext.WordPieceTrainer.train(spark, docs, "text", 12)),
      "wordpiece_encode" -> (() => {
        val merges = graft.ext.WordPieceTrainer.train(spark, docs, "text", 12)
          .orderBy("step").collect().map(_.getString(1)).toSeq
        val vocab = graft.ext.WordPieceTrainer.vocabulary(docs, "text", merges)
        graft.ext.WordPieceTrainer.encode(docs, "doc_id", "text", vocab)
      }),
      // audio fingerprint + near-dup over synthesized 8-bit mono WAVs
      // (payload build + real chunk-walk decode + integer DFT per row)
      "audio_fp" -> (() =>
        graft.ext.AudioFingerprint.audioFingerprints(spark,
          syntheticWavs(docs))),
      "dedup_audio" -> (() =>
        graft.ext.AudioFingerprint.audioNearDupPairs(spark,
          syntheticWavs(docs), maxHamming = 3)),
      // bloom-screened incremental dedup at a production-ish m (2^22
      // bits): on the 50x/100x corpora ~98% of batch rows are true
      // duplicates, so the verify anti-join carries nearly the whole
      // batch — the screen's worst shape (its win is on mostly-new
      // batches; correctness must hold on mostly-dup ones).
      "bloom_dedup" -> (() =>
        graft.ext.Dedup.bloomDedup(
          docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text"),
          docs.filter(col("doc_id") % 2 === 0), "text")),
      // round-13 security-analytics additions: events grow with the
      // ScaleGen factor (customer is a pass-through dimension, so the
      // graph ops' node set stays fixed — their scale story is the
      // O(m^1.5) orientation bound, probed here for the constant)
      "range_join_binned" -> (() =>
        graft.SparkEntry.queries("q_range_join_binned")(spark, sfDir)),
      "kmv_jaccard" -> (() =>
        graft.SparkEntry.queries("q_kmv_jaccard")(spark, sfDir)),
      "beaconing" -> (() =>
        graft.SparkEntry.queries("q_beaconing")(spark, sfDir)),
      "funnel" -> (() =>
        graft.SparkEntry.queries("q_funnel_steps")(spark, sfDir)),
      "path_surprise" -> (() =>
        graft.SparkEntry.queries("q_path_surprise")(spark, sfDir)),
      "char_entropy" -> (() =>
        graft.SparkEntry.queries("q_char_entropy")(spark, sfDir)),
      "triangle_nodes" -> (() =>
        graft.SparkEntry.queries("q_triangle_nodes")(spark, sfDir)),
      "kcore" -> (() =>
        graft.SparkEntry.queries("q_kcore")(spark, sfDir)),
      "kmv_window" -> (() =>
        graft.SparkEntry.queries("q_kmv_window")(spark, sfDir)),
      "graph_components" -> (() =>
        graft.SparkEntry.queries("q_graph_components")(spark, sfDir)),
      "k_anonymity" -> (() =>
        graft.SparkEntry.queries("q_k_anonymity")(spark, sfDir)),
      "l_diversity" -> (() =>
        graft.SparkEntry.queries("q_l_diversity")(spark, sfDir)),
      "fuzzy_multi" -> (() =>
        graft.SparkEntry.queries("q_fuzzy_multi")(spark, sfDir)),
      "fk_orphans" -> (() =>
        graft.SparkEntry.queries("q_fk_orphans")(spark, sfDir)),
      // round-14 additions: video keyframe fingerprinting (container
      // synthesis + real box walk + 3 decodes/hashes per row) and the
      // banded matched-keyframe video near-dup census at the wide-band
      // default — both through the exact gate plans
      "video_phash" -> (() =>
        graft.SparkEntry.queries("q_video_phash")(spark, sfDir)),
      "dedup_video" -> (() =>
        graft.SparkEntry.queries("q_dedup_video")(spark, sfDir)),
      // watchlist scaling: the AC automaton's one-pass scan vs the
      // regex-alternation blocklist, at growing watchlist sizes (the
      // generated indicators never match — the probe measures pure scan
      // cost per term-count; real vocab terms are mixed in so match
      // emission is exercised too)
      "ioc_ac_100" -> (() => iocProbe(docs, 100)),
      "ioc_ac_10k" -> (() => iocProbe(docs, 10000)),
      "ioc_ac_100k" -> (() => iocProbe(docs, 100000)),
      "ioc_regex_100" -> (() => iocRegexProbe(docs, 100)),
      "ioc_regex_2k" -> (() => iocRegexProbe(docs, 2000)))

    val only = sys.env.get("SPARK_GRAFT_PROBE_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = ops.filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, build) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(s"[scale] $name min=${"%.2f".format(times.min)} " +
        s"all=${times.map("%.2f".format(_)).mkString(",")}")
      s""""$name":{"min_sec":${times.min},"runs":[${times.mkString(",")}]}"""
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(s"""{"metric":"scale_probe_r12","sf_dir":"$sfDir",""" +
      s""""load_avg_end":$load,"queries":{${results.mkString(",")}}}""")
    spark.stop()
  }
}
