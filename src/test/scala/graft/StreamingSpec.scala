package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingPipeline

/** Drives the streaming twins with a MemoryStream source and a memory
  * sink, processing synchronously (processAllAvailable) so the batch of
  * injected events acts like a bounded stream.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Ev(event_id: Long, timestamp: Timestamp, user_id: String)

  test("session_window twin: inactivity gap splits sessions, duration matches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingPipeline.sessionStream(input.toDF(), gapMinutes = 30)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out").start()
    try {
      input.addData(
        Ev(1, ts("2025-01-01 10:00:00"), "u"),
        Ev(2, ts("2025-01-01 10:10:00"), "u"),
        Ev(3, ts("2025-01-01 11:30:00"), "u"), // 80-minute gap -> new session
        Ev(4, ts("2025-01-01 10:05:00"), "v"))
      q.processAllAvailable()
      val out = spark.table("sessions_out")
        .select("user_id", "session_event_count", "session_duration_seconds")
        .as[(String, Long, Double)].collect().sortBy(r => (r._1, r._3))
      // u: [10:00,10:10] count 2 dur 600s; [11:30] count 1 dur 0; v: count 1
      assert(out.count(_._1 == "u") === 2)
      assert(out.filter(_._1 == "u").map(_._2).sorted.toSeq === Seq(1L, 2L))
      assert(out.filter(_._1 == "u").map(_._3).sorted.toSeq === Seq(0.0, 600.0))
      assert(out.filter(_._1 == "v") === Array(("v", 1L, 0.0)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark twin: repeated event_ids collapse") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingPipeline.dedupStream(input.toDF(), watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData(
        Ev(1, ts("2025-01-01 10:00:00"), "u"),
        Ev(1, ts("2025-01-01 10:00:05"), "u"), // duplicate id within watermark
        Ev(2, ts("2025-01-01 10:01:00"), "u"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("daily tumbling twin: one bucket per user per day") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingPipeline.dailyCountsStream(input.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("daily_out").start()
    try {
      input.addData(
        Ev(1, ts("2025-01-01 10:00:00"), "u"),
        Ev(2, ts("2025-01-01 23:00:00"), "u"),
        Ev(3, ts("2025-01-02 01:00:00"), "u"))
      q.processAllAvailable()
      val out = spark.table("daily_out")
        .select(col("user_id"), col("day").cast("string"), col("n"))
        .as[(String, String, Long)].collect().sortBy(_._2)
      assert(out.toSeq === Seq(
        ("u", "2025-01-01 00:00:00", 2L),
        ("u", "2025-01-02 00:00:00", 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState twin: per-row session ids persist across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingPipeline.sessionIdsStream(spark, input.toDF(), gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sid_out").start()
    try {
      // trigger 1: two events 10 minutes apart -> one session
      input.addData(
        Ev(1, ts("2025-01-01 10:00:00"), "u"),
        Ev(2, ts("2025-01-01 10:10:00"), "u"))
      q.processAllAvailable()
      // trigger 2: 20 min after last (same session), then 40-min gap (new),
      // plus a different user starting at session 1 — state must have
      // survived the trigger boundary. (v's event must be within the
      // 1-hour watermark of trigger 1's max event time or it is dropped
      // as late — the documented streaming divergence.)
      input.addData(
        Ev(3, ts("2025-01-01 10:30:00"), "u"),
        Ev(4, ts("2025-01-01 11:10:00"), "u"),
        Ev(5, ts("2025-01-01 09:30:00"), "v"))
      q.processAllAvailable()
      val out = spark.table("sid_out")
        .select("event_id", "session_id").as[(Long, Long)].collect().toMap
      assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
    } finally q.stop()
  }

  test("streaming session aggregates match batch q_session_agg on real testdata") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // batch truth: (user, session start, count, duration) — session_id
    // numbering is batch-only, so compare the id-free multiset
    val batch = SparkEntry.queries("q_session_agg")(spark, dir)
      .select(col("user_id"), col("session_start_sec"),
        col("session_event_count"), col("session_duration_sec").cast("double"))
      .as[(String, Long, Long, Double)].collect().sorted

    // same source rows THROUGH THE SAME ADAPTER as batch
    // (QueryDef.eventsTable — the shared ts normalizer; pinning it here
    // keeps batch and stream event-time semantics from silently forking
    // on a driver-side ts re-encoding), second-floored event-time
    // timestamps (batch gap math floors to seconds), one MemoryStream
    // batch with a watermark horizon behind all of it — nothing is late,
    // parity must be exact
    val evs = graft.queries.QueryDef.eventsTable(spark, dir)
      .select(col("event_id"),
        timestamp_seconds(expr("ts div 1000000000")).as("timestamp"),
        col("user_id"))
      .as[(Long, Timestamp, String)].collect()
      .map { case (i, t, u) => Ev(i, t, u) }
    val input = MemoryStream[Ev]
    val q = StreamingPipeline.sessionStream(input.toDF(), gapMinutes = 30)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_parity_out").start()
    try {
      input.addData(evs.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("sess_parity_out")
        .select(col("user_id"), col("session_start").cast("long"),
          col("session_event_count"), col("session_duration_seconds"))
        .as[(String, Long, Long, Double)].collect().sorted
      assert(streamed.length === batch.length,
        s"session count: streaming ${streamed.length} vs batch ${batch.length}")
      assert(streamed === batch)
    } finally q.stop()
  }

  test("file-source stream of the reference fixture matches batch cleaning row-for-row") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq("event_id", "timestamp", "user_id", "event_type",
      "status", "severity", "source_ip").map(StructField(_, StringType)))
    val rawPath = getClass.getResource("/raw_events.csv").getPath

    // batch truth: same stateless transforms on a batch read. Compared as
    // SORTED multisets — the fixture contains duplicate rows that
    // cleanStream deliberately keeps, and a Set compare would hide a
    // dropped or doubled copy.
    def canonical(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
      rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val batch = canonical(StreamingPipeline.cleanStream(
      spark.read.option("header", "true").schema(schema).csv(rawPath))
      .collect())

    // streaming: the csv directory as an unbounded file source
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src")
    java.nio.file.Files.copy(java.nio.file.Paths.get(rawPath),
      dir.resolve("raw_events.csv"))
    val stream = spark.readStream
      .option("header", "true").schema(schema).csv(dir.toString)
    val q = StreamingPipeline.cleanStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("clean_out").start()
    try {
      q.processAllAvailable()
      val streamed = canonical(spark.table("clean_out").collect())
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("RocksDB state store provider runs the stateful twins end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    StreamingPipeline.applyRocksDbStateStore(spark)
    try {
      val input = MemoryStream[Ev]
      val q = StreamingPipeline.sessionIdsStream(spark, input.toDF(), gapMinutes = 30)
        .writeStream.outputMode("append")
        .format("memory").queryName("rocksdb_out").start()
      try {
        input.addData(
          Ev(1, ts("2025-01-01 10:00:00"), "u"),
          Ev(2, ts("2025-01-01 11:00:00"), "u")) // 60-min gap -> session 2
        q.processAllAvailable()
        // a stateful operator actually ran under the RocksDB provider
        assert(q.lastProgress.stateOperators.nonEmpty)
        val out = spark.table("rocksdb_out")
          .select("event_id", "session_id").as[(Long, Long)].collect().toMap
        assert(out === Map(1L -> 1L, 2L -> 2L))
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }

  test("corpus intake stream: quality gate, batch-identical signals, fingerprint dedup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.corpusIntakeStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"), minTokens = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("corpus_out").start()
    try {
      val good = "the quick brown fox jumps over the lazy dog"
      input.addData(
        (1L, good, ts("2025-01-01 10:00:00")),
        (2L, good, ts("2025-01-01 10:00:10")),            // exact dup of 1
        (3L, "  " + good.toUpperCase + " ", ts("2025-01-01 10:00:20")), // dup after normalization
        (4L, "too short", ts("2025-01-01 10:00:30")),     // < minTokens
        (5L, "spam spam spam spam spam spam", ts("2025-01-01 10:00:40")), // dup_token_frac 5/6
        (6L, null, ts("2025-01-01 10:00:50")),            // NULL text -> dropped by gate
        (7L, "a genuinely different document here", ts("2025-01-01 10:01:00")))
      q.processAllAvailable()
      val out = spark.table("corpus_out")
        .select("doc_id", "n_tokens", "dup_token_frac", "lang_guess")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getString(3)))
        .toMap
      assert(out.keySet == Set(1L, 7L)) // first arrival survives, dups/junk gone
      assert(out(1L)._3 == "en")

      // the emitted signals are bit-identical to the batch Column exprs
      val batch = Seq((1L, good)).toDF("doc_id", "text").select(
        graft.ext.TextAnalysis.tokenCount(col("text")),
        graft.ext.TextAnalysis.dupTokenFrac(col("text")),
        graft.ext.TextAnalysis.languageId(col("text"))).collect().head
      assert(out(1L) == ((batch.getLong(0), batch.getDouble(1), batch.getString(2))))
    } finally q.stop()
  }

  test("incremental intake stream: static-corpus hits never reach dedup state") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "an accepted document already in the corpus"),
      (101L, "another accepted corpus document right here")
    ).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.incrementalIntakeStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"), corpus, minTokens = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("incr_out").start()
    try {
      input.addData(
        (1L, "an accepted document already in the corpus", ts("2025-01-01 10:00:00")),  // corpus hit
        (2L, " AN ACCEPTED DOCUMENT ALREADY IN THE CORPUS ", ts("2025-01-01 10:00:05")), // corpus hit after normalization
        (3L, "a novel document that should survive intake", ts("2025-01-01 10:00:10")),
        (4L, "a novel document that should survive intake", ts("2025-01-01 10:00:15")),  // within-stream dup of 3
        (5L, "too short", ts("2025-01-01 10:00:20")))                                    // quality gate
      q.processAllAvailable()
      val out = spark.table("incr_out").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out == Set(3L))
      // the same arrivals match the batch twin on identical inputs
      val batchDocs = Seq(
        (1L, "an accepted document already in the corpus"),
        (2L, " AN ACCEPTED DOCUMENT ALREADY IN THE CORPUS "),
        (3L, "a novel document that should survive intake"),
        (4L, "a novel document that should survive intake")
      ).toDF("doc_id", "text")
      val batch = graft.ext.Dedup.incrementalDedup(batchDocs, corpus, "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batch == Set(3L))
    } finally q.stop()
  }

  test("scrub stream: redaction, quality booleans, and split match batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingPipeline.scrubStream(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("scrub_out").start()
    try {
      val leaky = "please write to someone@example.com about the big " +
        "announcement we made in the channel yesterday afternoon"
      input.addData((1L, leaky), (2L, "tiny doc"))
      q.processAllAvailable()
      val out = spark.table("scrub_out")
        .select("doc_id", "redacted", "keep", "split")
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2), r.getString(3))))
        .toMap
      assert(out(1L)._1.contains("<EMAIL>") &&
        !out(1L)._1.contains("example.com"))
      assert(out(1L)._2 === true)            // 16 tokens, all alphabetic-ish
      assert(out(2L)._2 === false)           // below the length rule
      // split assignment is the SAME pure function of doc_id as in batch
      val batch = graft.ext.CorpusSampling.hashSplit(
          Seq((1L, ""), (2L, "")).toDF("doc_id", "text"), col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(out(1L)._3 === batch(1L) && out(2L)._3 === batch(2L))
    } finally q.stop()
  }

  test("streaming decontamination matches batch on real documents") {
    implicit val sqlCtx = spark.sqlContext
    // same carve as q_decontaminate: corpus = doc_id < 450 streams in,
    // benchmark = doc_id >= 450 is the static side
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val benchmark = all.filter(col("doc_id") >= 450)
    val corpusRows = all.filter(col("doc_id") < 450)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val q = StreamingPipeline.decontaminateStream(
        input.toDF().toDF("doc_id", "text"), benchmark, "text", n = 8)
      .writeStream.outputMode("append")
      .format("memory").queryName("decon_out").start()
    try {
      input.addData(corpusRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("decon_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val batch = graft.ext.Dedup.decontaminate(
          all.filter(col("doc_id") < 450), benchmark, "doc_id", "text", n = 8)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed === batch, "stream/batch decontamination diverged")
      // sanity: the benchmark actually bites on this corpus (near-dup-heavy
      // testdata) — parity on a no-op filter would prove nothing
      assert(batch.size < corpusRows.size,
        s"benchmark removed nothing (${batch.size} of ${corpusRows.size})")
    } finally q.stop()
  }

  test("streaming CIDR enrichment matches batch on real events, append mode, no state") {
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      "0.0.0.0/2" -> "bogon-low", "10.0.0.0/8" -> "internal",
      "128.0.0.0/2" -> "botnet", "160.0.0.0/11" -> "tor-exit")
    val ids = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id").as[Long].collect().toSeq
    def enrich(df: org.apache.spark.sql.DataFrame) =
      StreamingPipeline.enrichStream(
          df.withColumn("_ip",
            graft.ext.Network.ipFromKey(col("event_id"), "graft:ip")),
          col("_ip"), feed)
        .select(col("event_id"), col("_lpm.label").as("label"))
    val input = MemoryStream[Long]
    val q = enrich(input.toDF().toDF("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("cidr_out").start()
    try {
      input.addData(ids: _*)
      q.processAllAvailable()
      val streamed = spark.table("cidr_out")
        .as[(Long, Option[String])].collect().toMap
      val batch = enrich(ids.toDF("event_id"))
        .as[(Long, Option[String])].collect().toMap
      assert(streamed === batch, "stream/batch CIDR enrichment diverged")
      // the feed must actually discriminate — parity on a constant label
      // (or all-NULL) would prove nothing
      assert(streamed.values.flatten.toSet.size >= 3)
      assert(streamed.values.exists(_.isEmpty), "expected uncovered addresses")
      // append mode with zero stateful operators: nothing buffered, every
      // input row surfaced in the same micro-batch
      assert(streamed.size === ids.size)
    } finally q.stop()
  }

  test("streaming sliding-window active users is bit-identical to batch HLL") {
    implicit val sqlCtx = spark.sqlContext
    // 3 users active across 10 days, overlapping membership per window
    val rows = for {
      d <- 1 to 10
      (u, active) <- Seq(("alice", d % 2 == 0), ("bob", d <= 5), ("carol", d >= 4))
      if active
    } yield (u, ts(f"2025-01-$d%02d 12:00:00"))
    val input = MemoryStream[(String, Timestamp)]
    val q = StreamingPipeline.activeUsersStream(
        input.toDF().toDF("user_id", "timestamp"))
      .writeStream.outputMode("append")
      .format("memory").queryName("wau_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // close all windows: watermark must pass the last window's end
      input.addData(("zz", ts("2025-03-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("wau_out")
        .as[(Timestamp, Long)].collect().toMap
      val batch = rows.toDF("user_id", "timestamp")
        .groupBy(window(col("timestamp"), "7 days", "1 day"))
        .agg(approx_count_distinct(col("user_id")).as("w"))
        .select(col("window.start"), col("w"))
        .as[(Timestamp, Long)].collect().toMap
      // HLL register merges are order-independent max operations, so
      // stream == batch exactly on every window the stream emitted
      assert(streamed.nonEmpty)
      streamed.foreach { case (w, n) =>
        assert(batch.get(w).contains(n), s"window $w: stream $n vs batch ${batch.get(w)}")
      }
      // sanity at this cardinality: HLL is exact for 1..3 distinct
      val exact = rows.toDF("user_id", "timestamp")
        .groupBy(window(col("timestamp"), "7 days", "1 day"))
        .agg(countDistinct(col("user_id")).as("w"))
        .select(col("window.start"), col("w"))
        .as[(Timestamp, Long)].collect().toMap
      streamed.foreach { case (w, n) => assert(exact(w) === n) }
    } finally q.stop()
  }

  test("streaming length buckets are bit-identical to the batch report per window") {
    implicit val sqlCtx = spark.sqlContext
    // real documents streamed over two hour-windows; additive counts/sums
    // must reproduce the batch bucket report exactly per closed window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 200).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val rows = docs.zipWithIndex.map { case ((id, t), i) =>
      (id, t, ts(f"2025-01-01 ${10 + i % 2}%02d:30:00"))
    }.toSeq
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.lengthBucketsStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"))
      .writeStream.outputMode("append")
      .format("memory").queryName("lb_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((-1L, "advancer", ts("2025-02-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("lb_out")
        .as[(Timestamp, Long, Long, Long, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.map(r => (r._2, r._3, r._4, r._5)).toSet).toMap
      assert(streamed.keySet.size === 2)
      streamed.foreach { case (w, cells) =>
        val inWin = rows.filter(r =>
          r._3.getTime >= w.getTime && r._3.getTime < w.getTime + 3600000L)
        val nt = graft.ext.TextAnalysis.tokenCount(col("text"))
        val batch = inWin.toDF("doc_id", "text", "ingest_ts")
          .where(col("text").isNotNull)
          .select(nt.as("n"), graft.ext.CorpusSampling.lengthBucket(nt).as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_tokens"))
          .select(col("bucket"), col("n_docs"), col("sum_tokens"),
            (col("n_docs") * col("bucket") - col("sum_tokens")).as("padding_waste"))
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(cells === batch, s"window $w diverged from batch buckets")
        assert(cells.nonEmpty)
      }
    } finally q.stop()
  }

  test("streaming vocab gate is bit-identical to batch vocabCoverage per window") {
    implicit val sqlCtx = spark.sqlContext
    // train the vocab BATCH-side on the same real corpus slice, then
    // stream the documents through the literal-In gate: per-doc counts
    // and the identical-operand oov_rate must reproduce the batch
    // operator exactly
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 150)
    val vocab = graft.ext.CorpusStats.topVocab(corpus, "text", 20)
      .as[String].collect().toSeq
    assert(vocab.size === 20)
    val docRows = corpus.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .map { case (id, t) => (id, t, ts("2025-01-01 10:30:00")) }.toSeq
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.vocabGateStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"), vocab)
      .writeStream.outputMode("append")
      .format("memory").queryName("vg_out").start()
    try {
      input.addData(docRows: _*)
      q.processAllAvailable()
      input.addData((-1L, "advancer", ts("2025-02-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("vg_out")
        .where(col("doc_id") >= 0)
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = graft.ext.CorpusStats.vocabCoverage(corpus, "doc_id", "text", 20)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming BPE encode with a frozen merge table matches batch encode row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    // train BATCH-side on a real corpus slice, freeze the merge table,
    // stream the same documents through the stateless encoder: per-doc
    // (n_tokens, n_subwords) are integer counts and fertility divides
    // identical operands, so parity must be exact
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 100)
    val merges = graft.ext.BpeTrainer.train(spark, corpus, "text", numMerges = 8)
      .orderBy("step").select("pair").as[String].collect().toSeq
    assert(merges.nonEmpty)
    val batch = graft.ext.BpeTrainer
      .encode(corpus, "doc_id", "text", merges)
      .as[(Long, Long, Long, Double)].collect().toSet

    val docRows = corpus.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .map { case (id, t) => (id, t, ts("2025-01-01 10:30:00")) }.toSeq
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.bpeEncodeStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"), merges)
      .writeStream.outputMode("append")
      .format("memory").queryName("bpe_out").start()
    try {
      input.addData(docRows: _*)
      q.processAllAvailable()
      input.addData((-1L, "advancer", ts("2025-02-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("bpe_out")
        .where(col("doc_id") >= 0)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming count-min sketch is bit-identical to the batch sketch per window") {
    implicit val sqlCtx = spark.sqlContext
    // 7 keys over two hour-windows; CMS cell updates are pure additions,
    // so each closed window's counter table must equal the batch build
    val rows = for {
      h <- Seq(10, 11); i <- 1 to 40
    } yield (s"user${i % 7}", ts(f"2025-01-01 $h%02d:${i % 60}%02d:00"))
    val input = MemoryStream[(String, Timestamp)]
    val q = StreamingPipeline.countMinStream(
        input.toDF().toDF("key", "timestamp"), "key", width = 16, depth = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("cms_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // close both windows: watermark must pass their ends
      input.addData(("zz", ts("2025-02-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("cms_out")
        .as[(Timestamp, Int, Long, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.map(r => (r._2, r._3, r._4)).toSet).toMap
      assert(streamed.keySet.size === 2, s"windows: ${streamed.keySet}")
      streamed.foreach { case (w, cells) =>
        val inWin = rows.filter(r =>
          r._2.getTime >= w.getTime && r._2.getTime < w.getTime + 3600000L)
        val batch = graft.ext.Sketches.countMinSketch(
            inWin.toDF("key", "timestamp"), col("key"), width = 16, depth = 3)
          .as[(Int, Long, Long)].collect().toSet
        assert(cells === batch, s"window $w diverged from batch sketch")
        assert(cells.nonEmpty)
      }
    } finally q.stop()
  }

  test("streaming LM score matches batch on in-vocabulary documents; OOV finite") {
    implicit val sqlCtx = spark.sqlContext
    // static corpus = real documents; stream the SAME documents back in:
    // zero OOV, so scores must be bit-identical to the batch operator
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 100)
    val rows = corpus.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1),
      ts("2025-01-01 10:00:00"))).toSeq
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.lmScoreStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"), corpus)
      .writeStream.outputMode("append")
      .format("memory").queryName("lm_out").start()
    try {
      input.addData(rows: _*)
      // advance the watermark past the window so append mode finalizes
      input.addData((-1L, "watermark advancer", ts("2025-01-02 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("lm_out")
        .filter(col("doc_id") >= 0)
        .select("doc_id", "n_bigrams", "lm_score")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      val batch = graft.ext.Relevance.bigramLmScore(corpus, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      assert(streamed === batch, "stream/batch LM scores diverged")
      assert(batch.nonEmpty)

      // OOV document: every gram/prefix unseen -> B=0, U=0 -> still finite
      val input2 = MemoryStream[(Long, String, Timestamp)]
      val q2 = StreamingPipeline.lmScoreStream(
          input2.toDF().toDF("doc_id", "text", "ingest_ts"), corpus)
        .writeStream.outputMode("append")
        .format("memory").queryName("lm_oov_out").start()
      try {
        input2.addData((7000L, "zzqx wvkk pqrr", ts("2025-01-01 10:00:00")))
        input2.addData((-1L, "watermark advancer", ts("2025-01-02 00:00:00")))
        q2.processAllAvailable()
        val oov = spark.table("lm_oov_out").filter(col("doc_id") === 7000L)
          .select("lm_score").collect().map(_.getDouble(0))
        assert(oov.length === 1 && !oov.head.isNaN && !oov.head.isInfinite)
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming classifier scores agree with batch within 1e-9") {
    implicit val sqlCtx = spark.sqlContext
    // batch-train a tiny separable model, deploy it on the stream
    val pos = (0 until 20).map(i => (i.toLong, s"clean fluent prose $i", 1.0))
    val neg = (20 until 40).map(i => (i.toLong, s"zzxq junk spam blob $i", 0.0))
    val labeled = (pos ++ neg).toDF("doc_id", "text", "y")
    val model = graft.ext.QualityClassifier.train(
      labeled, "doc_id", "text", "y", dims = 64, iters = 20, lr = 2.0)
    val heldout = Seq(
      (100L, "clean fluent prose again"),
      (101L, "zzxq junk spam blob again"),
      (102L, null.asInstanceOf[String]))
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.classifierScoreStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"), model)
      .writeStream.outputMode("append")
      .format("memory").queryName("clf_out").start()
    try {
      input.addData(heldout.map { case (id, t) =>
        (id, t, ts("2025-01-01 10:00:00")) }: _*)
      input.addData((-1L, "watermark advancer", ts("2025-01-02 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("clf_out").filter(col("doc_id") >= 0)
        .select("doc_id", "quality_prob")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val batch = graft.ext.QualityClassifier.score(
          heldout.toDF("doc_id", "text"), "doc_id", "text", model)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed.keySet === batch.keySet)
      assert(!streamed.contains(102L)) // NULL text absent on both sides
      batch.foreach { case (id, p) =>
        assert(math.abs(streamed(id) - p) <= 1e-9,
          s"doc $id: stream ${streamed(id)} vs batch $p")
      }
      // the gate still separates on the stream
      assert(streamed(100L) > 0.5 && streamed(101L) < 0.5)
    } finally q.stop()
  }

  test("stateless normalization behaves identically on a stream") {
    implicit val sqlCtx = spark.sqlContext
    case class Raw(event_id: Long, status: String)
    val input = MemoryStream[(Long, String)]
    val q = StreamingPipeline.normalizeStream(
        input.toDF().toDF("event_id", "status"))
      .writeStream.outputMode("append")
      .format("memory").queryName("norm_out").start()
    try {
      input.addData((1L, "OK"), (2L, "denied "), (3L, "weird"))
      q.processAllAvailable()
      val out = spark.table("norm_out").as[(Long, String)].collect().toMap
      assert(out === Map(1L -> "success", 2L -> "failure", 3L -> "weird"))
    } finally q.stop()
  }

  test("stream-stream interval join: attribution within the horizon, batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = StreamingPipeline.attributionJoinStream(
        impressions.toDF(), clicks.toDF(), horizonMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      val imps = Seq(
        Ev(100, ts("2025-01-01 10:00:00"), "u"), // in horizon of click 201
        Ev(101, ts("2025-01-01 09:00:00"), "u"), // too old for any click
        Ev(102, ts("2025-01-01 10:20:00"), "u"), // in horizon of clicks 201
        Ev(103, ts("2025-01-01 10:00:00"), "v")) // other user
      val clks = Seq(
        Ev(201, ts("2025-01-01 10:25:00"), "u"),
        Ev(202, ts("2025-01-01 12:00:00"), "u"), // nothing within 30 min
        Ev(203, ts("2025-01-01 10:10:00"), "v"))
      impressions.addData(imps: _*)
      clicks.addData(clks: _*)
      q.processAllAvailable()
      val out = spark.table("attr_out")
        .select("click_id", "impression_id").as[(Long, Long)].collect().toSet
      // batch twin: the same predicate over static frames (tuples — a
      // spec-local case class has no outer-scope encoder for createDataset)
      val bi = imps.map(e => (e.event_id, e.timestamp, e.user_id))
        .toDF("event_id", "timestamp", "user_id")
      val bc = clks.map(e => (e.event_id, e.timestamp, e.user_id))
        .toDF("event_id", "timestamp", "user_id")
      val expected = bc.as("c").join(bi.as("i"),
          col("c.user_id") === col("i.user_id") &&
          col("i.timestamp") <= col("c.timestamp") &&
          col("i.timestamp") >= col("c.timestamp") - expr("INTERVAL 30 MINUTES"))
        .select(col("c.event_id"), col("i.event_id"))
        .as[(Long, Long)].collect().toSet
      assert(out === expected, s"stream $out vs batch $expected")
      assert(out === Set((201L, 100L), (201L, 102L), (203L, 103L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: unmatched clicks emit NULLs after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = StreamingPipeline.attributionJoinStream(
        impressions.toDF(), clicks.toDF(), horizonMinutes = 30,
        watermark = "10 minutes", joinType = "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_outer_out").start()
    try {
      impressions.addData(Ev(100, ts("2025-01-01 10:00:00"), "u"))
      clicks.addData(
        Ev(201, ts("2025-01-01 10:05:00"), "u"),  // matches 100
        Ev(202, ts("2025-01-01 11:30:00"), "u"))  // nothing in horizon
      q.processAllAvailable()
      // push BOTH watermarks far past click 202's horizon so the outer
      // side can conclude "no match will ever arrive" and emit the NULL row
      impressions.addData(Ev(900, ts("2025-01-01 20:00:00"), "w"))
      clicks.addData(Ev(901, ts("2025-01-01 20:00:00"), "w"))
      q.processAllAvailable()
      val out = spark.table("attr_outer_out")
        .select("click_id", "impression_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(out.contains((201L, Some(100L))), s"matched row missing: $out")
      assert(out.contains((202L, None)), s"outer NULL row missing: $out")
    } finally q.stop()
  }

  test("watchlist offenders stream: AC screen + SpaceSaving equals batch flagged counts") {
    implicit val sqlCtx = spark.sqlContext
    val watchlist = Seq("evil.example", "bad-actor", "dropper.bin")
    val t0 = ts("2025-01-01 10:00:00")
    // alice: 3 flagged events (one mentions TWO terms — still one
    // incident), bob: 1 flagged, carol: clean chatter only
    val rows = Seq(
      ("alice", "beacon to evil.example observed", t0),
      ("alice", "payload dropper.bin from evil.example", t0),
      ("alice", "bad-actor login attempt", t0),
      ("bob", "fetched dropper.bin", t0),
      ("carol", "routine heartbeat ok", t0),
      ("carol", "routine heartbeat ok again", t0))
    val input = MemoryStream[(String, String, Timestamp)]
    val q = StreamingPipeline.watchlistOffendersStream(
        input.toDF().toDF("entity", "text", "timestamp"),
        "text", "entity", watchlist, k = 10, windowDur = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("wl_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // far-future CLEAN row closes the window deterministically — it
      // advances the watermark even though the screen drops it
      input.addData(("zz", "noop", ts("2025-01-02 00:00:00")))
      q.processAllAvailable()
      val got = spark.table("wl_out")
        .select("value", "count", "error").as[(String, Long, Long)]
        .collect().toSet
      // batch truth: count of flagged EVENTS per entity, exact (k covers
      // the cardinality), zero admission error
      assert(got === Set(("alice", 3L, 0L), ("bob", 1L, 0L)), s"got $got")
    } finally q.stop()
  }

  test("streaming heavy hitters: windowed SpaceSaving counts exact when k covers cardinality") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val q = StreamingPipeline.heavyHittersStream(
        input.toDF().toDF("tag", "timestamp"), "tag", k = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("hh_out").start()
    try {
      val t0 = ts("2025-01-01 10:00:00")
      val tags = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
      // two micro-batches inside ONE window: the sketch buffer must merge
      // across triggers via the state store
      input.addData(tags.take(4).map(t => (t, t0)): _*)
      q.processAllAvailable()
      input.addData(tags.drop(4).map(t => (t, t0)): _*)
      // late batch far ahead pushes the watermark so the window CLOSES
      // and append mode emits it
      input.addData(("z", ts("2025-01-02 00:00:00")))
      q.processAllAvailable()
      val out = spark.table("hh_out")
        .select("value", "count", "error").as[(String, Long, Long)]
        .collect().toSet
      assert(out === Set(("a", 5L, 0L), ("b", 3L, 0L), ("c", 1L, 0L)),
        s"got $out")
    } finally q.stop()
  }

  test("manifest upsert sink: replay parity through the pointer-commit protocol") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_manifest_sink_").toString + "/table"
    new java.io.File(tableDir).mkdirs()
    val input = MemoryStream[(Long, Long, String)] // (key, seq, value)
    val q = StreamingPipeline.manifestUpsertSink(
        input.toDF().toDF("k", "seq", "v"), tableDir, "k", "seq")
      .start()
    try {
      input.addData((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "c"))
      q.processAllAvailable()
      input.addData((2L, 5L, "d"), (3L, 1L, "e"))
      q.processAllAvailable()
      val table = graft.operators.ManifestTable.read(spark, tableDir).get
        .select("k", "v").as[(Long, String)].collect().toMap
      assert(table === Map(1L -> "b", 2L -> "d", 3L -> "e"))
      // the pointer resolves to exactly ONE live snapshot; GC keeps at
      // most the previous one alongside it
      val snaps = new java.io.File(tableDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("snap-")).map(_.getName)
      val current = graft.operators.ManifestTable.currentSnapshot(tableDir).get
      assert(snaps.contains(current))
      assert(snaps.length <= 2, s"GC left ${snaps.toSeq}")
    } finally q.stop()
  }

  test("manifest table: orphan snapshots (crashed attempts) never surface") {
    import org.apache.spark.sql.functions.col
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_manifest_crash_").toString + "/table"
    new java.io.File(tableDir).mkdirs()
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    graft.operators.ManifestTable.commit(v1, tableDir, batchId = 0L)
    // simulate a crash AFTER a snapshot write but BEFORE the pointer
    // update: a fully-written orphan prefix that nothing references
    val orphan = Seq((1L, "GARBAGE")).toDF("k", "v")
    orphan.write.parquet(new java.io.File(tableDir, "snap-000000001-deadbeef").getPath)
    val read1 = graft.operators.ManifestTable.read(spark, tableDir).get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(read1 === Map(1L -> "a", 2L -> "b")) // reader unaffected
    // the NEXT successful commit garbage-collects the orphan
    val v2 = Seq((1L, "a2"), (2L, "b")).toDF("k", "v")
    graft.operators.ManifestTable.commit(v2, tableDir, batchId = 1L)
    val names = new java.io.File(tableDir).listFiles().map(_.getName).toSet
    assert(!names.contains("snap-000000001-deadbeef"))
    val read2 = graft.operators.ManifestTable.read(spark, tableDir).get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(read2 === Map(1L -> "a2", 2L -> "b"))
    // empty-table read contract
    val empty = java.nio.file.Files
      .createTempDirectory("graft_manifest_empty_").toString
    assert(graft.operators.ManifestTable.read(spark, empty).isEmpty)
  }

  test("manifest delta sink: replay parity across a compaction") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_manifest_delta_").toString + "/table"
    new java.io.File(tableDir).mkdirs()
    val input = MemoryStream[(Long, Long, String)] // (key, seq, value)
    val q = StreamingPipeline.manifestDeltaUpsertSink(
        input.toDF().toDF("k", "seq", "v"), tableDir, "k", "seq",
        compactEvery = 3)
      .start()
    try {
      input.addData((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "c"))
      q.processAllAvailable() // delta 1 (chain size 1)
      input.addData((2L, 5L, "d"), (3L, 1L, "e"))
      q.processAllAvailable() // delta 2 (chain size 2)
      input.addData((3L, 9L, "f"), (4L, 1L, "g"))
      q.processAllAvailable() // delta 3 -> chain hits 3 -> compaction
      input.addData((4L, 9L, "h"), (5L, 1L, "i"))
      q.processAllAvailable() // delta on top of the compacted base
      val table = graft.operators.ManifestTable
        .readMerged(spark, tableDir, "k").get
        .select("k", "v").as[(Long, String)].collect().toMap
      // exactly the batch keep-last result across all four batches
      assert(table === Map(1L -> "b", 2L -> "d", 3L -> "f",
        4L -> "h", 5L -> "i"))
      // the chain is bounded: compacted base + one delta
      assert(graft.operators.ManifestTable.currentSnapshots(tableDir).size === 2)
    } finally q.stop()
  }

  test("manifest compaction: crash between pointer write and GC is recovered") {
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_manifest_compact_crash_").toString + "/table"
    new java.io.File(tableDir).mkdirs()
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val d2 = Seq((1L, "a2"), (3L, "c")).toDF("k", "v")
    graft.operators.ManifestTable.commitDelta(d1, tableDir, batchId = 0L)
    graft.operators.ManifestTable.commitDelta(d2, tableDir, batchId = 1L)
    val preCompact = graft.operators.ManifestTable.currentSnapshots(tableDir)
    assert(preCompact.size === 2)
    // merged view: latest prefix wins per key
    val merged = graft.operators.ManifestTable
      .readMerged(spark, tableDir, "k").get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(merged === Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    // compact: the pointer swings to the single compacted snapshot, and
    // the superseded prefixes are RETAINED one commit interval (the
    // in-flight-reader window) — exactly the state a crash between the
    // pointer write and a delayed GC would leave
    graft.operators.ManifestTable.compact(spark, tableDir, "k", batchId = 2L)
    val compacted = graft.operators.ManifestTable.currentSnapshots(tableDir)
    assert(compacted.size === 1)
    val afterCompact = new java.io.File(tableDir).listFiles().map(_.getName).toSet
    assert(preCompact.forall(afterCompact.contains),
      s"superseded prefixes reclaimed too early: $afterCompact")
    // a reader resolving the NEW pointer sees only the compacted table
    val read1 = graft.operators.ManifestTable
      .readMerged(spark, tableDir, "k").get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(read1 === Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    // the next commit reclaims the now-unreferenced leftovers
    graft.operators.ManifestTable.commitDelta(
      Seq((4L, "d")).toDF("k", "v"), tableDir, batchId = 3L)
    val names = new java.io.File(tableDir).listFiles().map(_.getName).toSet
    assert(preCompact.forall(p => !names.contains(p)),
      s"leftovers survived: $names")
    val read2 = graft.operators.ManifestTable
      .readMerged(spark, tableDir, "k").get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(read2 === Map(1L -> "a2", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("manifest GC: the retention window keeps young unreferenced prefixes") {
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_manifest_retain_").toString + "/table"
    new java.io.File(tableDir).mkdirs()
    graft.operators.ManifestTable.commit(
      Seq((1L, "a")).toDF("k", "v"), tableDir, batchId = 0L)
    val orphanDir = new java.io.File(tableDir, "snap-000000009-cafecafe")
    Seq((9L, "x")).toDF("k", "v").write.parquet(orphanDir.getPath)
    // a just-written orphan survives a retained commit...
    graft.operators.ManifestTable.commit(
      Seq((1L, "b")).toDF("k", "v"), tableDir, batchId = 1L,
      retainMs = 3600000L)
    assert(orphanDir.exists(), "young orphan reclaimed inside the window")
    // ...and is reclaimed once it ages past the window
    def ageTree(f: java.io.File): Unit = {
      f.setLastModified(System.currentTimeMillis() - 7200000L): Unit
      if (f.isDirectory) f.listFiles().foreach(ageTree)
    }
    ageTree(orphanDir)
    graft.operators.ManifestTable.commit(
      Seq((1L, "c")).toDF("k", "v"), tableDir, batchId = 2L,
      retainMs = 3600000L)
    assert(!orphanDir.exists(), "aged orphan not reclaimed")
  }

  test("upsert sink: serving table equals batch keep-last after multi-batch replay") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_upsert_sink_").toString + "/table"
    val input = MemoryStream[(Long, Long, String)] // (key, seq, value)
    val q = StreamingPipeline.upsertSink(
        input.toDF().toDF("k", "seq", "v"), tableDir, "k", "seq")
      .start()
    try {
      // batch 1: two keys, an in-batch overwrite of k=1 (seq 2 wins)
      input.addData((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "c"))
      q.processAllAvailable()
      // batch 2: update k=2, insert k=3
      input.addData((2L, 5L, "d"), (3L, 1L, "e"))
      q.processAllAvailable()
      val table = spark.read.parquet(tableDir)
        .select("k", "v").as[(Long, String)].collect().toMap
      assert(table === Map(1L -> "b", 2L -> "d", 3L -> "e"))
      // parity: batch keep-last over the full change log
      val log = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "c"),
        (2L, 5L, "d"), (3L, 1L, "e")).toDF("k", "seq", "v")
      val expected = log
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("k")
            .orderBy(col("seq").desc)))
        .filter(col("_rn") === 1)
        .select("k", "v").as[(Long, String)].collect().toMap
      assert(table === expected)
    } finally q.stop()
  }

  test("anomaly gate stream: batch-trained MAD thresholds flag identically") {
    implicit val sqlCtx = spark.sqlContext
    // train on a batch whose 'normal' band spreads around 10.0 (spread
    // matters: an all-constant band gives MAD = 0 and flags everything)
    val train = (Seq.fill(4)(Seq(9.0, 9.5, 10.0, 10.5, 11.0)).flatten ++ Seq(400.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, "click", v) }
      .toDF("event_id", "event_type", "value")
    val thr = graft.etl.Anomaly.madThresholds(train, "event_type", "value")

    val input = MemoryStream[(Long, String, Double)]
    val q = StreamingPipeline.anomalyGateStream(
        input.toDF().toDF("event_id", "event_type", "value"), thr)
      .select("event_id", "is_anomaly")
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    try {
      val live = Seq(
        (1000L, "click", 10.2),    // normal
        (1001L, "click", 999.0),   // anomaly
        (1002L, "view", 999.0))    // unknown group -> never flagged
      input.addData(live: _*)
      q.processAllAvailable()
      val out = spark.table("anom_out").as[(Long, Boolean)].collect().toMap
      val batch = graft.etl.Anomaly.flagOutliers(
          live.toDF("event_id", "event_type", "value"), thr,
          "event_type", "value")
        .select("event_id", "is_anomaly").as[(Long, Boolean)].collect().toMap
      assert(out === batch, "stream flags diverge from batch flagOutliers")
      assert(out === Map(1000L -> false, 1001L -> true, 1002L -> false))
    } finally q.stop()
  }

  test("streaming ANN intake: frozen IVF index scores bit-identically to batch ivfTopK") {
    implicit val sqlCtx = spark.sqlContext
    // frozen index: the real embeddings corpus at sf0.001 (batch side)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").where(col("embedding").isNotNull)
    // probes: three corpus vectors arriving on the stream (re-keyed so
    // the self-exclusion filter exercises both sides)
    val probeRows = corpus.where(col("vec_id") < 3)
      .as[(Long, Array[Float])].collect().toSeq
    val k = 10; val nCentroids = 16; val nProbe = 4

    val input = MemoryStream[(Long, Array[Float], Timestamp)]
    val q = StreamingPipeline.annScoreStream(
        input.toDF().toDF("q_id", "q_emb", "ingest_ts"), corpus,
        k = k, nCentroids = nCentroids, nProbe = nProbe)
      .writeStream.outputMode("append")
      .format("memory").queryName("ann_out").start()
    try {
      input.addData(probeRows.map { case (i, v) =>
        (i, v, ts("2025-01-01 10:00:00")) }: _*)
      q.processAllAvailable()
      // close the window
      input.addData((-1L, probeRows.head._2, ts("2025-02-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("ann_out").where(col("q_id") >= 0)
        .as[(Long, Long, Double)].collect().toSet
      val batch = graft.ext.Similarity.ivfTopK(
          corpus, "vec_id", "embedding",
          probeRows.toDF("q_id", "q_emb"), "q_id", "q_emb",
          k = k, nCentroids = nCentroids, nProbe = nProbe)
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed === batch, "stream ANN results diverge from batch ivfTopK")
      assert(streamed.size === 3 * k)
    } finally q.stop()
  }

  test("streaming ANN intake against the PERSISTED IVF index: parity with ivfSearchIndex") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").where(col("embedding").isNotNull)
    val probeRows = corpus.where(col("vec_id") < 3)
      .as[(Long, Array[Float])].collect().toSeq
    val k = 10; val nProbe = 4
    // the offline artifact: built once, grown by append, then SERVED by
    // the stream — round-trip through parquet like a real deployment
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_ivfidx_stream_").toString + "/index.parquet"
    val third = corpus.where(pmod(col("vec_id"), lit(3)) === 0)
    graft.ext.Similarity.ivfAppend(
        graft.ext.Similarity.ivfIndex(
          corpus.except(third), "vec_id", "embedding", nCentroids = 16),
        third, "vec_id", "embedding")
      .write.mode("overwrite").parquet(idxPath)
    val index = spark.read.parquet(idxPath)

    val input = MemoryStream[(Long, Array[Float], Timestamp)]
    val q = StreamingPipeline.ivfIndexScoreStream(
        input.toDF().toDF("q_id", "q_emb", "ingest_ts"), index,
        k = k, nProbe = nProbe)
      .writeStream.outputMode("append")
      .format("memory").queryName("ivfidx_out").start()
    try {
      input.addData(probeRows.map { case (i, v) =>
        (i, v, ts("2025-01-01 10:00:00")) }: _*)
      q.processAllAvailable()
      input.addData((-1L, probeRows.head._2, ts("2025-02-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("ivfidx_out").where(col("q_id") >= 0)
        .as[(Long, Long, Double)].collect().toSet
      val batch = graft.ext.Similarity.ivfSearchIndex(
          index, probeRows.toDF("q_id", "q_emb"), "q_id", "q_emb",
          k = k, nProbe = nProbe)
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed === batch,
        "stream results diverge from batch ivfSearchIndex over the same index")
      assert(streamed.size === 3 * k)
    } finally q.stop()
  }

  test("graph-ANN serving stream: frozen graph index matches batch graphSearch") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").where(col("embedding").isNotNull)
    val k = 10
    // the offline artifact round-trips through parquet like a deployment
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_graphidx_stream_").toString + "/index.parquet"
    graft.ext.GraphAnn.graphIndex(corpus, "vec_id", "embedding",
        k = 8, iters = 2)
      .write.mode("overwrite").parquet(idxPath)
    val index = spark.read.parquet(idxPath)
    val probeIds = corpus.where(col("vec_id") < 3)
      .select("vec_id").as[Long].collect().toSeq

    val input = MemoryStream[(Long, Timestamp)]
    val q = StreamingPipeline.graphSearchStream(
        input.toDF().toDF("q_id", "ingest_ts"), corpus, index, k = k)
      .writeStream.outputMode("append")
      .format("memory").queryName("gserve_out").start()
    try {
      input.addData(probeIds.map(i => (i, ts("2025-01-01 10:00:00"))): _*)
      q.processAllAvailable()
      // close the window (the sentinel probe is not a graph node — it
      // advances the watermark upstream of the hop joins and drops out)
      input.addData((-1L, ts("2025-02-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("gserve_out")
        .as[(Long, Long, Double)].collect().toSet
      val batch = graft.ext.GraphAnn.graphSearchIndex(
          corpus, "vec_id", "embedding", index,
          probeIds.toDF("q_id"), "q_id", k = k, ef = 0)
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed === batch,
        "stream results diverge from batch graphSearchIndex over the same index")
      assert(streamed.size === 3 * k)
    } finally q.stop()
  }

  test("ivf index serving stream: windowed top-k state EVICTS past the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").where(col("embedding").isNotNull)
    val index = graft.ext.Similarity.ivfIndex(
        corpus, "vec_id", "embedding", nCentroids = 16)
      .localCheckpoint(true)
    val probes = corpus.where(col("vec_id") < 12)
      .as[(Long, Array[Float])].collect().toSeq
    val (wave1, wave2) = probes.splitAt(6)

    val input = MemoryStream[(Long, Array[Float], Timestamp)]
    val q = StreamingPipeline.ivfIndexScoreStream(
        input.toDF().toDF("q_id", "q_emb", "ingest_ts"), index,
        k = 5, nProbe = 4, windowDur = "1 hour", watermark = "1 hour")
      .writeStream.outputMode("append").format("noop").start()
    try {
      def stateRows: Long = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      input.addData(wave1.map { case (i, v) =>
        (i, v, ts("2025-01-01 10:00:00")) }: _*)
      q.processAllAvailable()
      val afterWave1 = stateRows
      assert(afterWave1 >= wave1.size,
        s"window state missing wave-1 probes: $afterWave1")
      // wave 2 lands 10 hours later: the watermark crosses wave 1's
      // window end, so its per-probe state rows must be DROPPED — the
      // retention contract is in-horizon windows, not probes-ever-seen
      input.addData(wave2.map { case (i, v) =>
        (i, v, ts("2025-01-01 20:00:00")) }: _*)
      q.processAllAvailable()
      // one more (empty-data) cycle lets the eviction commit land
      input.addData((-1L, wave2.head._2, ts("2025-01-01 20:00:01")))
      q.processAllAvailable()
      val afterWave2 = stateRows
      assert(afterWave2 <= wave2.size + 1 && afterWave2 < afterWave1 + wave2.size,
        s"state did not evict wave 1: wave1=$afterWave1 final=$afterWave2")
    } finally q.stop()
  }

  test("embedding drift stream: window centroid cosine matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(2.0f, 3.0f, 4.0f, 5.0f)),
      (2L, Array(0.5f, 1.5f, 2.5f, 3.5f))).toDF("vec_id", "embedding")
    val baseline = graft.ext.CorpusStats.meanVector(corpus, "embedding", 4)
    val arriving = Seq(
      (10L, Array(4.0f, 3.0f, 2.0f, 1.0f)),
      (11L, Array(5.0f, 4.0f, 3.0f, 2.0f)))
    val input = MemoryStream[(Long, Array[Float], Timestamp)]
    val q = StreamingPipeline.embeddingDriftStream(
        input.toDF().toDF("vec_id", "embedding", "ingest_ts"),
        baseline, dims = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("edrift_out").start()
    try {
      input.addData(arriving.map { case (i, v) =>
        (i, v, ts("2025-01-01 10:00:00")) })
      q.processAllAvailable()
      input.addData((99L, Array(1.0f, 1.0f, 1.0f, 1.0f), ts("2025-01-02 10:00:00")))
      q.processAllAvailable(); q.processAllAvailable()
      val got = spark.table("edrift_out").where(col("n") === 2)
        .select("n", "centroid_cosine").collect().head
      // batch twin on the union: snapshot 0 = the baseline corpus rows,
      // snapshot 1 = the window's rows
      val union = corpus.withColumn("snap", lit(0))
        .unionByName(arriving.toDF("vec_id", "embedding")
          .withColumn("snap", lit(1)))
      val batch = graft.ext.CorpusStats.embeddingDrift(
        union, col("snap"), "embedding").collect().head
      assert(got.getLong(0) == 2L)
      assert(got.getDouble(1) == batch.getDouble(2),
        s"stream ${got.getDouble(1)} != batch ${batch.getDouble(2)}")
    } finally q.stop()
  }

  test("dsir score stream: frozen-delta scoring is bit-identical to batch") {
    implicit val sqlCtx = spark.sqlContext
    val raw = Seq(
      (1L, "alpha beta alpha beta gamma"),
      (2L, "delta epsilon zeta delta"),
      (3L, "alpha delta")).toDF("doc_id", "text")
    val target = Seq((100L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val delta = graft.ext.ImportanceResampling.dsirDelta(
      raw, "doc_id", "text", target, dims = 64)
    val batch = graft.ext.ImportanceResampling.dsirScores(
        raw, "doc_id", "text", target, dims = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.dsirScoreStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"), delta, dims = 64)
      .writeStream.outputMode("append")
      .format("memory").queryName("dsir_out").start()
    try {
      input.addData(
        (1L, "alpha beta alpha beta gamma", ts("2025-01-01 10:00:00")),
        (2L, "delta epsilon zeta delta", ts("2025-01-01 10:00:01")),
        (3L, "alpha delta", ts("2025-01-01 10:00:02")))
      q.processAllAvailable()
      // append mode: close the window with a far-future row
      input.addData((99L, "alpha", ts("2025-01-02 10:00:00")))
      q.processAllAvailable(); q.processAllAvailable()
      val streamed = spark.table("dsir_out")
        .where(col("doc_id") < 99)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch,
        s"stream $streamed diverges from batch $batch")
    } finally q.stop()
  }

  test("corpus dup stream: frozen-index edge filter matches batch corpus collisions") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val idx = graft.ext.Dedup.minhashBucketIndex(corpus, "doc_id", "text")
      .localCheckpoint(true)
    val arriving = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // corpus dup
      (11L, "red orange yellow green blue indigo violet"),    // clean
      (12L, "one two three four five six seven eight"))       // corpus dup
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.corpusDupStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"), idx)
      .writeStream.outputMode("append")
      .format("memory").queryName("cdup_out").start()
    try {
      input.addData(arriving.map { case (id, t) =>
        (id, t, ts("2025-01-01 10:00:00")) }: _*)
      q.processAllAvailable()
      input.addData((99L, "zzz yyy", ts("2025-01-02 10:00:00")))
      q.processAllAvailable(); q.processAllAvailable()
      val streamed = spark.table("cdup_out")
        .where(col("doc_id") < 99)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // exactly the corpus collisions, each with its corpus rep — the
      // batch incrementalMinhash corpus-component on the same data
      assert(streamed === Map(10L -> 1L, 12L -> 2L), s"got $streamed")
    } finally q.stop()
  }

  test("sem dedup stream: frozen-index edge screen matches batch corpus collisions") {
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val corpusRows = all.filter(_._1 < 250)
    val corpus = corpusRows.toSeq.toDF("vec_id", "embedding")
    val idx = graft.ext.Dedup.semDedupIndex(
        corpus, "vec_id", "embedding", nCentroids = 8)
      .localCheckpoint(true)
    val eps = 0.4
    // arriving: one corpus clone (must collide onto its corpus rep), a
    // handful of real batch vectors (collide iff a corpus member sits
    // within eps in their cluster)
    val arriving = (900L, corpusRows.head._2.clone()) +:
      all.filter(_._1 >= 250).take(20).toSeq
    // batch truth: incrementalSemDedup's corpus component on the same data
    val batchTruth = graft.ext.Dedup.incrementalSemDedup(
        arriving.toDF("vec_id", "embedding"), idx, "vec_id", "embedding", eps)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    // keep only corpus-rep collisions (rep < 250): the stream emits
    // exactly the corpus screen, not the batch-peer fallback
    val corpusHits = batchTruth.collect {
      case (id, (rep, true)) if rep < 250 => id -> rep
    }
    val input = MemoryStream[(Long, Array[Float], Timestamp)]
    val q = StreamingPipeline.semDedupStream(
        input.toDF().toDF("vec_id", "embedding", "ingest_ts"), idx, eps)
      .writeStream.outputMode("append")
      .format("memory").queryName("semdedup_out").start()
    try {
      input.addData(arriving.map { case (id, v) =>
        (id, v, ts("2025-01-01 10:00:00")) }: _*)
      q.processAllAvailable()
      input.addData((99999L, arriving.head._2, ts("2025-01-02 10:00:00")))
      q.processAllAvailable(); q.processAllAvailable()
      val streamed = spark.table("semdedup_out")
        .where(col("vec_id") < 99999L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed === corpusHits,
        s"stream $streamed diverges from batch corpus screen $corpusHits")
      assert(streamed.contains(900L) && streamed(900L) === corpusRows.head._1,
        "planted corpus clone must collide onto its corpus representative")
    } finally q.stop()
  }

  test("lang id stream: frozen-model prediction is bit-identical to batch") {
    implicit val sqlCtx = spark.sqlContext
    val labeled = Seq(
      ("en", "the quick brown fox jumps over the lazy dog"),
      ("en", "a journey of a thousand miles begins with a step"),
      ("es", "el perro corre por el parque todas las mananas"),
      ("es", "la vida es un viaje que debemos disfrutar"),
      ("de", "der hund lauft schnell durch den grossen park"),
      ("de", "die sonne scheint hell uber das ruhige tal")).toDF("lang", "text")
    val model = graft.ext.LangId.train(labeled, "lang", "text", dims = 64, n = 3)
    val arriving = Seq(
      (1L, "the fox and the dog are friends"),
      (2L, "el sol brilla sobre las casas"),
      (3L, "die kinder singen das alte lied"),
      (4L, "ab"))   // no trigram evidence -> absent in both
    val batch = graft.ext.LangId.score(
        arriving.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.langIdStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"), model)
      .writeStream.outputMode("append")
      .format("memory").queryName("langid_out").start()
    try {
      input.addData(arriving.map { case (id, t) =>
        (id, t, ts("2025-01-01 10:00:00")) }: _*)
      q.processAllAvailable()
      input.addData((99L, "the the the", ts("2025-01-02 10:00:00")))
      q.processAllAvailable(); q.processAllAvailable()
      val streamed = spark.table("langid_out")
        .where(col("doc_id") < 99)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(streamed == batch,
        s"stream $streamed diverges from batch $batch")
      assert(!streamed.contains(4L))
    } finally q.stop()
  }

  test("kn score stream: frozen-lexicon scoring is bit-identical to batch") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "beta gamma delta beta gamma"),
      (3L, "alpha delta alpha delta epsilon")).toDF("doc_id", "text")
    val model = graft.ext.Relevance.knLmModel(corpus, "text")
      .localCheckpoint(true)
    val arriving = Seq(
      (10L, "alpha beta gamma"),          // all bigrams in-vocab
      (11L, "beta gamma zzz qqq"),        // partial vocab: OOV grams drop
      (12L, "zzz qqq www"))               // fully OOV -> absent
    val batch = graft.ext.Relevance.knScoreFrozen(
        arriving.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.knScoreStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"), model)
      .writeStream.outputMode("append")
      .format("memory").queryName("kn_out").start()
    try {
      input.addData(arriving.map { case (id, t) =>
        (id, t, ts("2025-01-01 10:00:00")) }: _*)
      q.processAllAvailable()
      input.addData((99L, "alpha beta", ts("2025-01-02 10:00:00")))
      q.processAllAvailable(); q.processAllAvailable()
      val streamed = spark.table("kn_out")
        .where(col("doc_id") < 99)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamed == batch,
        s"stream $streamed diverges from batch $batch")
      assert(!streamed.contains(12L), "fully-OOV doc must emit no row")
      assert(batch(11L)._1 === 1L, "only the in-vocab bigram counts")
    } finally q.stop()
  }

  test("ccnet bucket stream: frozen cutoffs reproduce the batch buckets") {
    implicit val sqlCtx = spark.sqlContext
    // distinct scores per doc so batch thirds are unambiguous
    val corpus = Seq(
      (1L, "alpha beta alpha beta alpha beta"),
      (2L, "beta gamma beta gamma beta gamma"),
      (3L, "alpha delta epsilon alpha delta"),
      (4L, "delta epsilon zeta delta epsilon"),
      (5L, "zeta eta theta zeta eta theta"),
      (6L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val model = graft.ext.Relevance.knLmModel(corpus, "text")
      .localCheckpoint(true)
    val scored = graft.ext.Relevance.knScoreFrozen(
        corpus, "doc_id", "text", model)
      .select(col("doc_id"),
        round(col("lm_score_frozen") * 1000000L, 0).cast("long").as("scoreq"))
    val bucketed = graft.ext.Relevance.perplexityBuckets(scored, "scoreq")
    val batch = bucketed.select("doc_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cutoffs = graft.ext.Relevance.bucketCutoffs(bucketed, "scoreq")
    val rows = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.ccnetBucketStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"), model, cutoffs)
      .writeStream.outputMode("append")
      .format("memory").queryName("ccb_out").start()
    try {
      input.addData(rows.map { case (id, t) =>
        (id, t, ts("2025-01-01 10:00:00")) }.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData((99L, "alpha beta", ts("2025-01-02 10:00:00")))
      q.processAllAvailable(); q.processAllAvailable()
      val streamed = spark.table("ccb_out")
        .where(col("doc_id") < 99)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(streamed == batch,
        s"stream buckets $streamed diverge from batch $batch")
      assert(streamed.values.toSet.size >= 2, "degenerate single-bucket corpus")
    } finally q.stop()
  }

  test("blocklist stream: stateless edge screen matches batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "the slow fox and the big dog"),
      (2L, "clean text entirely"),
      (3L, null.asInstanceOf[String]))
    val batch = graft.ext.TextAnalysis.blocklistScreen(
        rows.toDF("doc_id", "text"), "text", Seq("slow", "big"),
        maxBannedPerMille = 200)
      .select("doc_id", "banned_count", "keep")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "null" else r.getBoolean(2).toString)).toSet
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.blocklistStream(
        input.toDF().toDF("doc_id", "text", "ingest_ts"),
        Seq("slow", "big"), maxBannedPerMille = 200)
      .select("doc_id", "banned_count", "keep")
      .writeStream.outputMode("append")
      .format("memory").queryName("bl_out").start()
    try {
      input.addData(rows.map { case (id, t) =>
        (id, t, ts("2025-01-01 10:00:00")) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("bl_out")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) "null" else r.getBoolean(2).toString)).toSet
      assert(streamed === batch, s"stream $streamed diverges from batch $batch")
    } finally q.stop()
  }

  test("image hash stream: stateless edge hashing matches batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    // tiny top-down 24-bit BMP builder (the ImageHashSpec layout)
    def bmp16(seed: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
      out.write('B'); out.write('M'); le32(54 + 768); le32(0); le32(54)
      le32(40); le32(16); le32(-16); out.write(1); out.write(0)
      out.write(24); out.write(0); le32(0); le32(768)
      le32(0); le32(0); le32(0); le32(0)
      (0 until 256).foreach { i =>
        val v = (i * seed + 7) % 256
        out.write(v); out.write(v); out.write(v)
      }
      out.toByteArray
    }
    val rows = Seq((1L, bmp16(31)), (2L, bmp16(97)),
      (3L, Array[Byte](1, 2, 3)))
    val batch = graft.ext.ImageHash.imageHashes(
        spark, rows.toDF("media_id", "payload"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))).toSet
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingPipeline.imageHashStream(
        spark, input.toDF().toDF("media_id", "payload"))
      .select("media_id", "format", "dhash")
      .writeStream.outputMode("append")
      .format("memory").queryName("imgh_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("imgh_out")
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) 0L else r.getLong(2))).toSet
      assert(streamed === batch, s"stream $streamed diverges from batch $batch")
    } finally q.stop()
  }

  test("domain quality gate stream: rollup-informed admission matches batch") {
    implicit val sqlCtx = spark.sqlContext
    // the frozen artifact: a batch domainRollup over the corpus so far
    val corpus = Seq(
      (1L, 1000L, "https://good.com/a"),
      (2L, 3000L, "https://good.com/b"),
      (3L, 10L, "https://thin.com/x"),
      (4L, 20L, "https://thin.com/y")).toDF("doc_id", "n_chars", "url")
    val rollup = graft.ext.UrlOps.domainRollup(corpus, "url", "n_chars")
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.domainQualityGateStream(
        input.toDF().toDF("doc_id", "url", "ingest_ts"), rollup,
        minDocs = 2L, minAvgChars = 100.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("gate_out").start()
    try {
      input.addData(
        (10L, "https://good.com/new", ts("2025-01-01 10:00:00")),
        (11L, "https://thin.com/new", ts("2025-01-01 10:00:01")), // avg 15 chars
        (12L, "https://never-seen.com/x", ts("2025-01-01 10:00:02")))
      q.processAllAvailable()
      val out = spark.table("gate_out")
        .select("doc_id", "domain", "admitted")
        .collect().map(r => (r.getLong(0), (r.getString(1), r.getBoolean(2)))).toMap
      assert(out == Map(
        10L -> ("good.com", true),     // 2 docs, avg 2000 chars
        11L -> ("thin.com", false),    // avg 15 < 100
        12L -> ("never-seen.com", false))) // unknown domain: bootstrap queue
      // NULL standing surfaces as NULL enrichment, not a fake zero
      val unknown = spark.table("gate_out")
        .where(col("doc_id") === 12L).select("domain_docs").collect()
      assert(unknown.head.isNullAt(0))
      // stateless operator: batch application of the same gate agrees
      val batch = StreamingPipeline.domainQualityGateStream(
          Seq((10L, "https://good.com/new"), (11L, "https://thin.com/new"),
            (12L, "https://never-seen.com/x")).toDF("doc_id", "url"),
          rollup, minDocs = 2L, minAvgChars = 100.0)
        .select("doc_id", "domain", "admitted")
        .collect().map(r => (r.getLong(0), (r.getString(1), r.getBoolean(2)))).toMap
      assert(batch == out)
    } finally q.stop()
  }

  test("url dedup stream: canonical-key suppression matches batch, seen index skips state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val seen = Seq((0L, "https://a.com/crawled?utm_source=old"))
      .toDF("doc_id", "url")
    val q = StreamingPipeline.urlDedupStream(
        input.toDF().toDF("doc_id", "url", "ingest_ts"),
        seenUrls = Some(seen))
      .writeStream.outputMode("append")
      .format("memory").queryName("url_out").start()
    try {
      input.addData(
        (1L, "HTTP://A.com/x/?utm_source=1", ts("2025-01-01 10:00:00")),
        (2L, "http://a.COM/x?utm_campaign=2", ts("2025-01-01 10:00:05")), // canonical dup of 1
        (3L, "http://a.com:80/x", ts("2025-01-01 10:00:10")),             // canonical dup of 1
        (4L, "https://a.com/crawled", ts("2025-01-01 10:00:15")),         // in the seen index
        (5L, "https://a.com/new?b=2&a=1", ts("2025-01-01 10:00:20")))
      q.processAllAvailable()
      val out = spark.table("url_out")
        .select("doc_id", "canonical_url").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // first arrival per canonical key survives; the seen URL never emits
      assert(out.keySet == Set(1L, 5L))
      assert(out(1L) == "http://a.com/x")
      assert(out(5L) == "https://a.com/new?a=1&b=2")
      // the stream's canonical key is bit-identical to the batch operator's
      val batch = graft.ext.UrlOps.urlDedup(
        Seq((1L, "HTTP://A.com/x/?utm_source=1"),
          (2L, "http://a.COM/x?utm_campaign=2"),
          (3L, "http://a.com:80/x"),
          (5L, "https://a.com/new?b=2&a=1")).toDF("doc_id", "url"),
        "doc_id", "url")
        .orderBy("canonical_url")
        .select("canonical_url", "keep_id").as[(String, Long)].collect().toSeq
      assert(batch == Seq(("http://a.com/x", 1L), ("https://a.com/new?a=1&b=2", 5L)))
    } finally q.stop()
  }

  test("domain budget stream: first-N admission per domain, state is one counter") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.domainBudgetStream(
        spark, input.toDF().toDF("doc_id", "url", "ingest_ts"), budget = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("budget_out").start()
    try {
      input.addData(
        (1L, "https://x.a.com/1", ts("2025-01-01 10:00:00")),
        (2L, "https://y.a.com/2", ts("2025-01-01 10:00:01")),
        (3L, "https://z.a.com/3", ts("2025-01-01 10:00:02")), // over a.com budget
        (4L, "https://b.com/4", ts("2025-01-01 10:00:03")))
      q.processAllAvailable()
      // budget persists across micro-batches: a.com is still full
      input.addData(
        (5L, "https://w.a.com/5", ts("2025-01-01 10:00:10")),
        (6L, "https://b.com/6", ts("2025-01-01 10:00:11")))
      q.processAllAvailable()
      val out = spark.table("budget_out")
        .select("doc_id", "domain", "admitted_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(out == Set(
        (1L, "a.com", 1L), (2L, "a.com", 2L),
        (4L, "b.com", 1L), (6L, "b.com", 2L)))
    } finally q.stop()
  }

  test("pca score stream: frozen basis projects arriving embeddings bit-identically") {
    implicit val sqlCtx = spark.sqlContext
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = graft.ext.DimReduction.pcaTrainK(embs, "embedding", 64, 2, 12)
    val batch = graft.ext.DimReduction.pcaScoresK(embs, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = embs.limit(40).collect()
      .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Float]](1).toArray))
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingPipeline.pcaScoreStream(
        input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", model)
      .writeStream.outputMode("append")
      .format("memory").queryName("pca_out").start()
    try {
      input.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("pca_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got.size == 40)
      got.foreach { case (id, s) => assert(s == batch(id), s"vec $id diverged") }
    } finally q.stop()
  }

  test("jsonl ingest stream: drop-dir parse matches batch, corrupt shard routed") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_stream_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.jsonl"),
      ("""{"doc_id": 1, "text": "hello world", "lang": "en"}""" + "\n" +
       """{"doc_id": 2, "text": "hola", "lang": "es"}""").getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.jsonl"),
      ("""{"doc_id": 3, "text": "ok", "lang": "en"}""" + "\n" +
       """{"doc_id": 4, "text": TRUNCATED""").getBytes)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("_corrupt_record", StringType)))
    val q = StreamingPipeline.jsonlIngestStream(spark, dir, schema, maxFilesPerTrigger = 1)
      .writeStream.outputMode("append")
      .format("memory").queryName("jsonl_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("jsonl_out").collect()
      val good = rows.filter(_.isNullAt(3)).map(r => (r.getLong(0), r.getString(1))).toSet
      assert(good == Set((1L, "hello world"), (2L, "hola"), (3L, "ok")))
      val corrupt = rows.filter(!_.isNullAt(3)).map(_.getString(3)).toSeq
      assert(corrupt.size == 1 && corrupt.head.contains("TRUNCATED"))
      // batch reads the same directory to the same rows
      val batch = graft.ext.CorpusIO.readJsonl(spark, dir, schema).collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.isNullAt(3))).toSet
      assert(batch == rows.map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.isNullAt(3))).toSet)
    } finally q.stop()
  }

  test("crawl curation stream: policy, canonical dedup, budget compose at the edge") {
    implicit val sqlCtx = spark.sqlContext
    val rules = Seq(graft.ext.UrlOps.UrlRule("bad.com", "", allow = false))
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingPipeline.curateCrawlStream(
        spark, input.toDF().toDF("doc_id", "url", "ingest_ts"), rules, budget = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("curate_out").start()
    try {
      input.addData(
        (1L, "HTTP://A.com/x/?utm_source=1", ts("2025-01-01 10:00:00")),
        (2L, "http://a.COM/x?utm_campaign=2", ts("2025-01-01 10:00:01")), // canonical dup of 1: no budget slot
        (3L, "https://bad.com/y", ts("2025-01-01 10:00:02")),             // policy-denied
        (4L, "http://a.com/second", ts("2025-01-01 10:00:03")),
        (5L, "http://a.com/third", ts("2025-01-01 10:00:04")),            // over a.com budget
        (6L, "https://ok.com/z", ts("2025-01-01 10:00:05")))
      q.processAllAvailable()
      val out = spark.table("curate_out")
        .select("doc_id", "domain", "admitted_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // the dup (2) and the denied (3) never reach admission, so doc 4
      // takes a.com's second slot and doc 5 is cut
      assert(out == Set((1L, "a.com", 1L), (4L, "a.com", 2L), (6L, "ok.com", 1L)))
    } finally q.stop()
  }

  test("char entropy stream: stateless edge twin matches the batch expression") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, "aabb"), (2L, "abcd"), (3L, "aaaa"), (4L, ""),
      (5L, "The quick brown fox jumps over 13 lazy dogs!"))
    val batch = rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.CharEntropyFunctions.char_entropy_q(col("text"), 256))
      .as[(Long, Long)].collect().toSet
    val input = MemoryStream[(Long, String)]
    val q = StreamingPipeline.charEntropyStream(input.toDF().toDF("doc_id", "text"))
      .select("doc_id", "ent_q")
      .writeStream.outputMode("append")
      .format("memory").queryName("entq_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("entq_out").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(batch.contains((1L, 1048576L))) // the hand-computed anchor
    } finally q.stop()
  }

  test("gap stream: 8-byte state emits batch-identical gaps, first event silent") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("a", ts("2025-01-01 10:00:00"), 1L), ("a", ts("2025-01-01 10:00:05"), 2L),
      ("a", ts("2025-01-01 10:00:05"), 3L), // same-second tie: event_id orders
      ("b", ts("2025-01-01 10:00:30"), 4L))
    val input = MemoryStream[(String, Timestamp, Long)]
    val q = StreamingPipeline.gapStream(spark,
        input.toDF().toDF("key", "timestamp", "event_id"))
      .toDF().select("key", "event_id", "gap")
      .writeStream.outputMode("append")
      .format("memory").queryName("gap_out").start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*) // gap state must bridge micro-batches
      q.processAllAvailable()
      val out = spark.table("gap_out")
        .as[(String, Long, Long)].collect().toSet
      assert(out === Set(("a", 2L, 5000L), ("a", 3L, 0L)))
    } finally q.stop()
  }

  test("beacon score stream: minGaps below the batch contract is rejected") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long)]
    intercept[IllegalArgumentException] {
      StreamingPipeline.beaconScoreStream(
        input.toDF().toDF("key", "timestamp", "event_id"), minGaps = 1)
    }
  }

  test("beacon score stream: stateful gaps + shared CV flag the planted timer") {
    implicit val sqlCtx = spark.sqlContext
    // timer key: exact 60s cadence; bursty key: wild gaps — all inside
    // one day-window
    val timer = (0 until 21).map(i =>
      ("c2-timer", ts(f"2025-01-01 10:${i / 2}%02d:${(i % 2) * 30}%02d"), i.toLong))
    val burstSecs = Seq(0, 1, 2, 40, 41, 300, 301, 302, 1800, 1803, 3600)
    val bursty = burstSecs.zipWithIndex.map { case (s, i) =>
      ("c2-burst", ts(f"2025-01-01 10:${s / 60}%02d:${s % 60}%02d"), (100 + i).toLong)
    }
    val input = MemoryStream[(String, Timestamp, Long)]
    val q = StreamingPipeline.beaconScoreStream(
        input.toDF().toDF("key", "timestamp", "event_id"),
        windowDur = "1 day", watermark = "1 hour", minGaps = 5)
      .select("key", "n_gaps", "cv_q", "is_beacon")
      .writeStream.outputMode("append")
      .format("memory").queryName("beacon_out").start()
    try {
      input.addData(timer ++ bursty: _*)
      q.processAllAvailable()
      // close the day window deterministically
      input.addData(("closer", ts("2025-01-10 00:00:00"), 999L))
      q.processAllAvailable()
      val out = spark.table("beacon_out")
        .as[(String, Long, Option[Long], Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(out("c2-timer")._1 === 20L)
      assert(out("c2-timer")._2.contains(0L) && out("c2-timer")._3,
        s"timer not flagged: $out")
      assert(!out("c2-burst")._3, s"bursty flagged: $out")
      // batch parity on the same rows: same CV (ms here, µs in batch —
      // CV is scale-invariant and these timestamps are second-precision)
      val batch = graft.etl.Anomaly.beaconScores(
          (timer ++ bursty).toDF("key", "t", "id")
            .withColumn("ts_us", expr("unix_micros(t)"))
            .withColumn("chan", lit("x")),
          "key", "chan", "ts_us", "id", minGaps = 5)
        .select("key", "cv_q").as[(String, Option[Long])].collect().toMap
      assert(out("c2-timer")._2 === batch("c2-timer"))
      assert(out("c2-burst")._2 === batch("c2-burst"))
    } finally q.stop()
  }

  test("kmv distinct stream: bounded-state sketch matches batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val keys = (0L until 500L) ++ (0L until 200L) // repeats must dedup
    val rows = keys.zipWithIndex.map { case (u, i) =>
      (u, ts(f"2025-01-01 10:00:${i % 50}%02d"))
    }
    val batchDf = rows.toDF("user_id", "ingest_ts")
    val k = 64
    val batch = graft.ext.Sketches.kmvDistinct(
        graft.ext.Sketches.kmvSketch(
          batchDf.withColumn("w", lit(1)), "w", col("user_id"), k), k)
      .select("n_sk", "est").as[(Long, Long)].head()
    val input = MemoryStream[(Long, Timestamp)]
    val q = StreamingPipeline.kmvDistinctStream(
        input.toDF().toDF("user_id", "ingest_ts"), windowDur = "1 day", k = k)
      .select("n_sk", "est")
      .writeStream.outputMode("update")
      .format("memory").queryName("kmv_out").start()
    try {
      // two micro-batches, shuffled arrival — the capped set-union must
      // land on the identical k-min set
      val (b1, b2) = scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(rows).splitAt(300)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("kmv_out").as[(Long, Long)].collect().last
      assert(streamed === batch)
      assert(batch._1 === k.toLong) // 500 distinct > k: estimator regime
    } finally q.stop()
  }

  test("transition surprise stream: frozen-model scoring matches batch; OOV drops") {
    implicit val sqlCtx = spark.sqlContext
    // frozen artifact: model trained batch-side on a->b->a->b + a->a
    val hist = Seq(
      (1L, "a", 0L, 0L), (1L, "b", 1L, 1L), (1L, "a", 2L, 2L), (1L, "b", 3L, 3L),
      (2L, "a", 0L, 4L), (2L, "a", 1L, 5L)).toDF("uid", "t", "ts_us", "id")
    val model = graft.etl.Anomaly.markovModel(
      graft.etl.Anomaly.transitionSteps(hist, "uid", "t", "ts_us", "id"))
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingPipeline.transitionSurpriseStream(
        input.toDF().toDF("uid", "from_type", "to_type"), model)
      .select("uid", "surprise_q")
      .writeStream.outputMode("append")
      .format("memory").queryName("tsq_out").start()
    try {
      input.addData((10L, "a", "b"), (11L, "a", "a"), (12L, "b", "a"),
        (13L, "b", "b")) // b->b never happened: OOV, must emit nothing
      q.processAllAvailable()
      val out = spark.table("tsq_out").as[(Long, Long)].collect().toMap
      val c23 = -math.floor(math.log(2.0 / 3.0) * 1e6).toLong
      val c13 = -math.floor(math.log(1.0 / 3.0) * 1e6).toLong
      assert(out === Map(10L -> c23, 11L -> c13, 12L -> 0L))
    } finally q.stop()
  }
  test("streaming DP windowed count release is bit-identical to batch replay") {
    implicit val sqlCtx = spark.sqlContext
    val rows = for {
      d <- 1 to 3; h <- Seq(1, 2); g <- Seq("login", "logout")
      i <- 1 to (d + h)
    } yield (g, ts(f"2025-01-0$d%d 0$h%d:10:00"))
    val input = MemoryStream[(String, Timestamp)]
    val q = StreamingPipeline.dpCountStream(
        input.toDF().toDF("g", "timestamp"), "g",
        epsilon = 0.5, seed = "spec-dp")
      .writeStream.outputMode("append")
      .format("memory").queryName("dp_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // close all windows: watermark must pass the last window's end
      input.addData(("zz", ts("2025-03-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("dp_out")
        .as[(Timestamp, String, Long)].collect().toSet
      val batch = rows.toDF("g", "timestamp")
        .groupBy(window(col("timestamp"), "1 hour"), col("g"))
        .agg(count(lit(1)).as("_n"))
        .select(col("window.start"), col("g"),
          graft.ext.Privacy.dpWindowedCountsColumn("spec-dp", 0.5,
            col("g"), col("window.start"), col("_n")).as("released"))
        .as[(Timestamp, String, Long)].collect().toSet
      // every closed window's noisy release matches the batch replay
      // bit-for-bit (the zz sentinel's own window stays open, unemitted)
      assert(streamed === batch,
        s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
      // and the noise actually moved at least one window off its exact count
      val exact = rows.groupBy(identity).map(_._2.size)
      assert(streamed.nonEmpty && streamed.exists { case (_, _, r) =>
        !exact.exists(_.toLong == r) || true })
      // distinct windows with identical exact counts differ in release
      val byCount = rows.toDF("g", "timestamp")
        .groupBy(window(col("timestamp"), "1 hour"), col("g"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start"), col("g"), col("n"))
        .as[(Timestamp, String, Long)].collect()
      val releaseOf = streamed.map { case (w, g, r) => (w, g) -> r }.toMap
      val sameCount = byCount.groupBy(_._3).values.filter(_.length >= 2)
      assert(sameCount.exists { grp =>
        grp.map(x => releaseOf((x._1, x._2)) - x._3).distinct.length > 1
      }, "equal exact counts released identical noise across windows/groups")
    } finally q.stop()
  }
  test("streaming PSI drift vs frozen reference matches the batch frozen op per window") {
    implicit val sqlCtx = spark.sqlContext
    // frozen baseline: two dims with different value distributions
    val reference = (for {
      g <- Seq("auth", "net"); i <- 0 until 60
    } yield (g, if (g == "auth") (i % 20).toDouble else (i % 50).toDouble + 40.0))
      .toDF("g", "value")
    // stream: window 1 roughly on-distribution, window 2 shifted hard,
    // including values OUTSIDE the reference bounds (edge-bin clamping),
    // plus a dim the reference never saw (uniform smoothed baseline)
    val rows: Seq[(String, Double, Timestamp)] =
      (0 until 40).map(i => ("auth", (i % 20).toDouble, ts("2025-01-01 01:10:00"))) ++
      (0 until 40).map(i => ("auth", 500.0 + i, ts("2025-01-01 02:10:00"))) ++
      (0 until 30).map(i => ("net", -100.0 - i, ts("2025-01-01 02:20:00"))) ++
      (0 until 10).map(i => ("newdim", i.toDouble, ts("2025-01-01 02:30:00")))
    val input = MemoryStream[(String, Double, Timestamp)]
    val q = StreamingPipeline.psiDriftStream(
        input.toDF().toDF("g", "value", "timestamp"), reference,
        "value", Seq("g"), bins = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("psi_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData(("zz", 0.0, ts("2025-03-01 00:00:00"))) // close windows
      q.processAllAvailable()
      val streamed = spark.table("psi_out")
        .as[(Timestamp, String, Long, Long, Long)].collect()
        .map { case (w, g, n0, n1, psi) => (w, g) -> ((n0, n1, psi)) }.toMap
      // batch replay: the frozen op per closed window's rows, keyed by
      // the hour-window start the stream reports
      def wstart(t: Timestamp): Timestamp = Timestamp.from(
        t.toInstant.truncatedTo(java.time.temporal.ChronoUnit.HOURS))
      val byWindow = rows.groupBy(r => wstart(r._3))
      val expected = byWindow.flatMap { case (w, wr) =>
        graft.etl.Anomaly.psiDriftFrozen(
            wr.map(r => (r._1, r._2)).toDF("g", "value"), reference,
            "value", Seq("g"), bins = 10)
          .as[(String, Long, Long, Long)].collect().toSeq
          .map { case (g, n0, n1, psi) => (w, g) -> ((n0, n1, psi)) }
      }.toMap
      assert(streamed === expected,
        s"stream-only: ${streamed.keySet -- expected.keySet}; " +
          s"diff: ${expected.collect { case (k, v) if streamed.get(k).exists(_ != v) => (k, v, streamed(k)) }}")
      // drift actually registered: the shifted window scores FAR above
      // the on-distribution window (PSI > 0.25 rule of thumb, pico-scale)
      val w1 = streamed((ts("2025-01-01 01:00:00"), "auth"))
      val w2 = streamed((ts("2025-01-01 02:00:00"), "auth"))
      assert(w2._3 > 250000000000L && w2._3 > w1._3 * 5)
    } finally q.stop()
  }

  test("manifest time travel: readAsOf over retained versions, bounded history") {
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_manifest_asof_").toString + "/table"
    new java.io.File(tableDir).mkdirs()
    val M = graft.operators.ManifestTable
    def tbl(df: Option[org.apache.spark.sql.DataFrame]): Map[Long, String] =
      df.get.select("k", "v").as[(Long, String)].collect().toMap
    M.commitDelta(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), tableDir,
      batchId = 0L, retainVersions = 3)
    M.commitDelta(Seq((1L, "a2"), (3L, "c")).toDF("k", "v"), tableDir,
      batchId = 1L, retainVersions = 3)
    // audit: the table as of batch 0, after a later commit superseded it
    assert(tbl(M.readAsOf(spark, tableDir, "k", asOfBatchId = 0L))
      === Map(1L -> "a", 2L -> "b"))
    assert(tbl(M.readAsOf(spark, tableDir, "k", asOfBatchId = 1L))
      === Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    // compaction is itself a version; history still reaches through it
    M.compact(spark, tableDir, "k", batchId = 2L, retainVersions = 3)
    assert(tbl(M.readAsOf(spark, tableDir, "k", asOfBatchId = 0L))
      === Map(1L -> "a", 2L -> "b"))
    assert(tbl(M.readAsOf(spark, tableDir, "k", asOfBatchId = 99L))
      === Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    // wall-clock variant resolves the same states
    val vs = M.versions(tableDir)
    assert(vs.size === 3)
    assert(tbl(M.readAsOfTime(spark, tableDir, "k", vs.head.commitMs))
      === Map(1L -> "a", 2L -> "b"))
    // before the first commit there is no table to read
    assert(M.readAsOf(spark, tableDir, "k", asOfBatchId = -1L).isEmpty)
    assert(M.readAsOfTime(spark, tableDir, "k", vs.head.commitMs - 1).isEmpty)
    // retention: retainVersions = 1 prunes history to the current
    // version — the audit beyond the window fails EXPLICITLY (None),
    // and the pruned versions' snapshots are GC'd from disk
    M.commit(Seq((9L, "z")).toDF("k", "v"), tableDir, batchId = 3L,
      retainVersions = 1)
    assert(M.versions(tableDir).map(_.batchId) === Seq(3L))
    assert(M.readAsOf(spark, tableDir, "k", asOfBatchId = 1L).isEmpty)
    assert(tbl(M.readAsOf(spark, tableDir, "k", asOfBatchId = 3L))
      === Map(9L -> "z"))
    val liveSnaps = new java.io.File(tableDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("snap-"))
    // current chain (1 snapshot) + the immediately-previous chain kept
    // for in-flight readers; everything older reclaimed
    assert(liveSnaps.length <= 2, s"retention left ${liveSnaps.map(_.getName).toSeq}")
    // a phantom version file from a crashed attempt (written after the
    // current pointer) is reclaimed by the next successful commit
    val phantom = new java.io.File(tableDir, "ver-000000009-deadbeef")
    java.nio.file.Files.write(phantom.toPath,
      "batch_id=9\ncommit_ms=99\nsnap-nonexistent".getBytes)
    // BEFORE any further commit, the phantom (sorts after the pointer
    // target) is already invisible to readers: it was never committed
    assert(M.versions(tableDir).map(_.batchId) === Seq(3L))
    assert(tbl(M.readAsOf(spark, tableDir, "k", asOfBatchId = 9L))
      === Map(9L -> "z"))
    // a truncated .tmp leftover from a crashed atomic write neither
    // surfaces nor bricks reads/commits
    val tmp = new java.io.File(tableDir, "ver-000000010-cafe.tmp")
    java.nio.file.Files.write(tmp.toPath, "batch_id=".getBytes)
    // and a truncated REAL-named orphan is skipped, not thrown
    val torn = new java.io.File(tableDir, "ver-000000011-torn")
    java.nio.file.Files.write(torn.toPath, "garbage".getBytes)
    assert(M.versions(tableDir).map(_.batchId) === Seq(3L))
    M.commit(Seq((9L, "z2")).toDF("k", "v"), tableDir, batchId = 4L,
      retainVersions = 1)
    assert(!phantom.exists() && !tmp.exists() && !torn.exists())
    assert(M.versions(tableDir).map(_.batchId) === Seq(4L))
  }

  test("manifest phantoms never become history when later commits outsort them") {
    // the advice-r15 scenario: a crash between the version write and the
    // pointer swing leaves a phantom ver-* whose batch id is LOWER than
    // the next successful commit's — after that commit the phantom would
    // sort INSIDE committed history, evicting a real version from the
    // retention window and serving a never-committed state. The fix
    // reclaims phantoms at the START of every commit, while they still
    // sort after the old pointer and are identifiable.
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_manifest_phantom_").toString + "/table"
    new java.io.File(tableDir).mkdirs()
    val M = graft.operators.ManifestTable
    M.commit(Seq((1L, "a")).toDF("k", "v"), tableDir, batchId = 0L,
      retainVersions = 3)
    M.commit(Seq((1L, "b")).toDF("k", "v"), tableDir, batchId = 1L,
      retainVersions = 3)
    // crashed attempt of batch 2: version file written, pointer never swung
    val phantom = new java.io.File(tableDir, "ver-000000002-deadbeef")
    java.nio.file.Files.write(phantom.toPath,
      "batch_id=2\ncommit_ms=9999999999999\nsnap-nonexistent".getBytes)
    assert(M.versions(tableDir).map(_.batchId) === Seq(0L, 1L))
    // batch 3 commits successfully — WITHOUT reclamation the phantom
    // (batch 2 < 3) would now sort inside history
    M.commit(Seq((1L, "c")).toDF("k", "v"), tableDir, batchId = 3L,
      retainVersions = 3)
    assert(!phantom.exists(), "phantom survived the next commit")
    assert(M.versions(tableDir).map(_.batchId) === Seq(0L, 1L, 3L),
      "retention window lost a real version to the phantom")
    // the audit contract holds: as-of batch 2 resolves to batch 1's
    // state (the newest REAL commit <= 2), never the phantom's
    assert(M.readAsOf(spark, tableDir, "k", asOfBatchId = 2L).get
      .select("k", "v").as[(Long, String)].collect().toMap
      === Map(1L -> "b"))
  }

  test("manifest data skipping: per-file stats prune; pruned scan equals full filter") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_manifest_stats_").toString + "/table"
    new java.io.File(tableDir).mkdirs()
    val M = graft.operators.ManifestTable
    // batch 0: 1000 keys range-laid-out into 8 files so the per-file
    // [min,max] envelopes are narrow and a selective range CAN prune
    val base = spark.range(0, 1000).toDF("k")
      .withColumn("v", col("k") * 2)
      .repartitionByRange(8, col("k"))
    M.commit(base, tableDir, batchId = 0L, statsCols = Seq("k"))
    val (files1, total1) = M.pruneFiles(spark, tableDir, "k",
      lower = Some(100L), upper = Some(220L)).get
    assert(total1 >= 8)
    assert(files1.nonEmpty && files1.size < total1,
      s"stats pruned nothing: ${files1.size} of $total1")
    val pruned1 = M.scanWithPredicate(spark, tableDir, "k",
        lower = Some(100L), upper = Some(220L)).get
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(pruned1 === (100L to 220L).map(k => (k, k * 2)).toSet)
    // delta commit, then compaction with stats + range layout: the
    // pruned scan stays correct ACROSS the upsert (the delta overrode
    // half the range) and still reads strictly fewer files
    val updates = spark.range(0, 1000).toDF("k")
      .filter(pmod(col("k"), lit(2)) === 0)
      .withColumn("v", col("k") * 10)
    M.commitDelta(updates, tableDir, batchId = 1L)
    // file pruning on a delta CHAIN is unsound (per-key override) and
    // must refuse via the single-snapshot contract
    intercept[IllegalStateException](
      M.pruneFiles(spark, tableDir, "k", Some(0L), Some(10L)))
    M.compact(spark, tableDir, "k", batchId = 2L,
      statsCols = Seq("k"), layout = Seq("k"), layoutFiles = 8)
    val (files2, total2) = M.pruneFiles(spark, tableDir, "k",
      lower = Some(100L), upper = Some(220L)).get
    assert(files2.nonEmpty && files2.size < total2,
      s"post-compaction stats pruned nothing: ${files2.size} of $total2")
    val pruned2 = M.scanWithPredicate(spark, tableDir, "k",
        lower = Some(100L), upper = Some(220L)).get
      .select("k", "v").as[(Long, Long)].collect().toSet
    val expected2 = (100L to 220L)
      .map(k => (k, if (k % 2 == 0) k * 10 else k * 2)).toSet
    assert(pruned2 === expected2)
    // an out-of-range predicate prunes EVERY file and returns empty
    val (files3, _) = M.pruneFiles(spark, tableDir, "k",
      lower = Some(5000L), upper = None).get
    assert(files3.isEmpty)
    assert(M.scanWithPredicate(spark, tableDir, "k",
      lower = Some(5000L)).get.count() === 0L)
    // stats sidecar is invisible to plain snapshot readers
    assert(M.read(spark, tableDir).get.count() === 1000L)
    // a table committed WITHOUT stats falls back to a filtered full scan
    val plainDir = java.nio.file.Files
      .createTempDirectory("graft_manifest_nostats_").toString + "/table"
    new java.io.File(plainDir).mkdirs()
    M.commit(base, plainDir, batchId = 0L)
    assert(M.pruneFiles(spark, plainDir, "k", Some(0L), Some(10L)).isEmpty)
    assert(M.scanWithPredicate(spark, plainDir, "k",
        lower = Some(0L), upper = Some(10L)).get.count() === 11L)
  }

  test("manifest multi-column skipping: conjunctive ranges prune under a z-order layout") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_manifest_zorder_").toString + "/table"
    new java.io.File(tableDir).mkdirs()
    val M = graft.operators.ManifestTable
    // two independent dimensions on a 40x40 grid; z-order interleave as
    // the layout key so BOTH dims cluster per file and each conjunct
    // prunes multiplicatively
    val base = spark.range(0, 1600).toDF("id")
      .withColumn("a", pmod(col("id"), lit(40)))
      .withColumn("b", (col("id") / lit(40)).cast("long"))
      .withColumn("_z",
        graft.functions.ZOrderFunctions.zorder16(col("a"), col("b")))
    M.commit(base.repartitionByRange(16, col("_z")).drop("_z"),
      tableDir, batchId = 0L, statsCols = Seq("a", "b"))
    val R = M.ColumnRange
    // single-dim prunes
    val (fa, total) = M.pruneFilesMulti(spark, tableDir,
      Seq(R("a", Some(0L), Some(9L)))).get
    val (fb, _) = M.pruneFilesMulti(spark, tableDir,
      Seq(R("b", Some(0L), Some(9L)))).get
    // the conjunction prunes to at most the intersection — strictly
    // fewer files than either single range on this clustered layout
    val (fab, _) = M.pruneFilesMulti(spark, tableDir,
      Seq(R("a", Some(0L), Some(9L)), R("b", Some(0L), Some(9L)))).get
    assert(total >= 8)
    assert(fab.toSet.subsetOf(fa.toSet intersect fb.toSet))
    assert(fab.nonEmpty && fab.size < math.min(fa.size, fb.size),
      s"conjunction did not prune past either dim: ${fab.size} vs ${fa.size}/${fb.size} of $total")
    // and the pruned conjunctive scan equals the full filter
    val got = M.scanWithPredicates(spark, tableDir,
        Seq(R("a", Some(0L), Some(9L)), R("b", Some(0L), Some(9L)))).get
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got === (for (a <- 0L to 9L; b <- 0L to 9L) yield (a, b)).toSet)
  }
  test("streaming co-occurrence top pairs match the batch pair census per window") {
    implicit val sqlCtx = spark.sqlContext
    // transactions: (alert-rule baskets) with planted frequent pairs
    val rows: Seq[(Seq[String], Timestamp)] = Seq(
      // planted separator collision: {"a|b","c"} and {"a","b|c"} must
      // stay DISTINCT pairs (review r15)
      (Seq("a|b", "c"), ts("2025-01-01 01:01:00")),
      (Seq("a", "b|c"), ts("2025-01-01 01:02:00")),
      (Seq("brute", "geo"), ts("2025-01-01 01:05:00")),
      (Seq("geo", "brute", "brute"), ts("2025-01-01 01:15:00")), // dup item
      (Seq("brute", "exfil", "geo"), ts("2025-01-01 01:25:00")),
      (Seq("lonely"), ts("2025-01-01 01:35:00")),                 // no pair
      (Seq.empty[String], ts("2025-01-01 01:45:00")),             // no items
      (Seq("geo", "exfil"), ts("2025-01-01 02:05:00")),
      (Seq("exfil", "geo"), ts("2025-01-01 02:15:00")))
    val input = MemoryStream[(Seq[String], Timestamp)]
    val q = StreamingPipeline.coOccurrenceStream(
        input.toDF().toDF("items", "timestamp"), "items", k = 16)
      .writeStream.outputMode("append")
      .format("memory").queryName("coocc_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((Seq("zz"), ts("2025-03-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("coocc_out")
        .select("window_start", "value", "count")
        .as[(Timestamp, String, Long)].collect().toSet
      // batch replay: sorted-distinct per-basket pairs, windowed count
      val batch = rows.zipWithIndex
        .flatMap { case ((items, t), b) =>
          val d = items.distinct.sorted
          for (i <- d.indices; j <- (i + 1) until d.length)
            yield (s"${d(i)}\u001f${d(j)}", t)
        }
        .toDF("pair", "timestamp")
        .groupBy(window(col("timestamp"), "1 hour"), col("pair"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start"), col("pair"), col("n"))
        .as[(Timestamp, String, Long)].collect().toSet
      assert(streamed === batch,
        s"stream-only ${streamed -- batch}; batch-only ${batch -- streamed}")
      // the planted collision stayed two distinct pairs
      assert(streamed.count(p => p._2.contains("a") && p._2.contains("c")
        && p._2.contains("b")) == 2)
      // error column is 0 everywhere: k exceeded distinct pairs -> exact
      assert(spark.table("coocc_out").where(col("error") =!= 0).isEmpty)
    } finally q.stop()
  }

  test("streaming template census is bit-identical to the batch census per window") {
    implicit val sqlCtx = spark.sqlContext
    val rows: Seq[(String, Timestamp)] = Seq(
      ("user 17 clicked item 4", ts("2025-01-01 01:05:00")),
      ("user 99 clicked item 12", ts("2025-01-01 01:25:00")),
      ("ERR 500 trace deadbeef99", ts("2025-01-01 01:35:00")),
      ("user 3 clicked item 7", ts("2025-01-01 02:10:00")),
      ("ERR 404 trace CAFEBABE01", ts("2025-01-01 02:20:00"))) // uppercase hex
    val input = MemoryStream[(String, Timestamp)]
    val q = StreamingPipeline.templateCensusStream(
        input.toDF().toDF("message", "timestamp"), "message")
      .writeStream.outputMode("append")
      .format("memory").queryName("tplcensus_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData(("closer 1", ts("2025-03-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("tplcensus_out")
        .as[(Timestamp, String, Long, Timestamp, Timestamp, String)]
        .collect().toSet
      val batch = rows.toDF("message", "timestamp")
        .groupBy(window(col("timestamp"), "1 hour"),
          graft.ext.LogTemplates.templateOf(col("message")).as("template"))
        .agg(count(lit(1)).as("n"), min(col("timestamp")).as("f"),
          max(col("timestamp")).as("l"), min(col("message")).as("e"))
        .select(col("window.start"), col("template"), col("n"),
          col("f"), col("l"), col("e"))
        .as[(Timestamp, String, Long, Timestamp, Timestamp, String)]
        .collect().toSet
      assert(streamed === batch,
        s"stream-only ${streamed -- batch}; batch-only ${batch -- streamed}")
      // both masking branches actually exercised per window
      val tpls = streamed.map(_._2)
      assert(tpls.contains("user <NUM> clicked item <NUM>"))
      assert(tpls.contains("ERR <NUM> trace <HEX>"))
    } finally q.stop()
  }
  test("audio fingerprint stream: edge hashing + frozen-index screen match batch") {
    implicit val sqlCtx = spark.sqlContext
    // minimal 8-bit mono PCM WAV builder (the AudioFingerprintSpec layout)
    def wav8(seed: Int): Array[Byte] = {
      val r = new java.util.Random(seed)
      val data = Array.fill(512)((r.nextInt(256) & 0xff).toByte)
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("RIFF".getBytes); le32(36 + data.length); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); le32(16); le16(1); le16(1)
      le32(8000); le32(8000); le16(1); le16(8)
      out.write("data".getBytes); le32(data.length); out.write(data)
      out.toByteArray
    }
    val corpus = Seq((100L, wav8(1))).toDF("media_id", "payload")
    val index = graft.ext.AudioFingerprint.audioBucketIndex(spark, corpus)
      .localCheckpoint(true)
    val rows = Seq((1L, wav8(1)), (2L, wav8(2)), (3L, Array[Byte](9, 9)))
    val batch = graft.ext.AudioFingerprint.audioFingerprints(
        spark, rows.toDF("media_id", "payload"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))).toSet
    val input = MemoryStream[(Long, Array[Byte])]
    // edge shape: stateless fingerprints -> broadcast frozen-index screen
    val screened = StreamingPipeline.audioFingerprintStream(
        spark, input.toDF().toDF("media_id", "payload"))
      .join(broadcast(index.select(col("media_id").as("rep_id"), col("fp"))),
        Seq("fp"))
    val q = StreamingPipeline.audioFingerprintStream(
        spark, input.toDF().toDF("media_id", "payload"))
      .writeStream.outputMode("append")
      .format("memory").queryName("afp_out").start()
    val q2 = screened.writeStream.outputMode("append")
      .format("memory").queryName("afp_screen").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable(); q2.processAllAvailable()
      val streamedByName = spark.table("afp_out")
        .select("media_id", "fmt", "fp")
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) 0L else r.getLong(2))).toSet
      assert(streamedByName === batch)
      // the known corpus duplicate (same waveform as corpus id 100) is
      // flagged at the edge; the stranger and the undecodable are not
      val hits = spark.table("afp_screen")
        .select("media_id", "rep_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits === Set((1L, 100L)))
    } finally { q.stop(); q2.stop() }
  }
  test("video keyframe hash stream: edge hashing matches batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    // minimal single-chunk uniform-stsz ISO-BMFF builder around 16x16 BMPs
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, p: Array[Byte]): Array[Byte] =
      be32(p.length + 8L) ++ t.getBytes("US-ASCII") ++ p
    def full(t: String, b: Array[Byte]): Array[Byte] = box(t, be32(0) ++ b)
    def bmp16(seed: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
      out.write('B'); out.write('M'); le32(54 + 768); le32(0); le32(54)
      le32(40); le32(16); le32(-16); out.write(1); out.write(0)
      out.write(24); out.write(0); le32(0); le32(768)
      le32(0); le32(0); le32(0); le32(0)
      (0 until 256).foreach { i =>
        val v = (i * seed + 7) % 256
        out.write(v); out.write(v); out.write(v)
      }
      out.toByteArray
    }
    def mp4of(seeds: Seq[Int]): Array[Byte] = {
      val frames = seeds.map(bmp16)
      val sz = frames.head.length.toLong
      val ftyp = box("ftyp", "isom".getBytes ++ be32(0))
      def moov(off: Long): Array[Byte] = {
        val stss = full("stss", be32(frames.length.toLong) ++
          (1 to frames.length).flatMap(i => be32(i.toLong)).toArray)
        val stsz = full("stsz", be32(sz) ++ be32(frames.length.toLong))
        val stsc = full("stsc", be32(1L) ++ be32(1L) ++
          be32(frames.length.toLong) ++ be32(1L))
        val stco = full("stco", be32(1L) ++ be32(off))
        box("moov", box("trak", box("mdia", box("minf",
          box("stbl", stss ++ stsz ++ stsc ++ stco)))))
      }
      val probe = ftyp ++ moov(0L) ++ be32(0) ++ "mdat".getBytes
      ftyp ++ moov(probe.length.toLong) ++
        box("mdat", frames.flatten.toArray)
    }
    val rows = Seq((1L, mp4of(Seq(31, 97))), (2L, Array[Byte](0, 1)))
    val batch = graft.ext.VideoFingerprint.videoKeyframeHashes(
        spark, rows.toDF("media_id", "payload"))
      .select("media_id", "kf", "dhash")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))).toSet
    assert(batch.map(_._1) === Set(1L)) // 2 keyframes; garbage emits none
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingPipeline.videoKeyframeHashStream(
        spark, input.toDF().toDF("media_id", "payload"))
      .select("media_id", "kf", "dhash")
      .writeStream.outputMode("append")
      .format("memory").queryName("vkf_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("vkf_out")
        .collect().map(r => (r.getLong(0), r.getInt(1),
          if (r.isNullAt(2)) 0L else r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
