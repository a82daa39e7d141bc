package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.etl.Normalization
import graft.schema.EventSchema

/** Structured Streaming twins of the reference's three stateful operators
  * (SURVEY.md §2.12, §7.4). Batch is authoritative; these run the SAME
  * DataFrame transforms on an unbounded source, with watermarks bounding
  * state.
  *
  * Documented divergence from batch: rows later than the watermark are
  * DROPPED in streaming, while batch re-sorts them into place (it sees
  * everything). The reference has no late-data story at all — it is a
  * single-shot batch program.
  */
object StreamingPipeline {

  /** Production state-store configuration: RocksDB provider with changelog
    * checkpointing. The default in-memory HDFS-backed provider keeps every
    * key in executor heap — fine for tests, fatal at 100 TB event streams
    * where session/dedup state exceeds memory. RocksDB spills to local SSD,
    * bounds heap via block-cache settings, and changelog checkpointing
    * ships per-batch deltas instead of full snapshots. Apply BEFORE
    * starting queries; provider changes don't take effect on a running
    * checkpoint.
    */
  def applyRocksDbStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  }

  /** Streaming twin of D2 (key dedup): at-most-once per event_id within the
    * watermark horizon. Batch keep-LAST cannot be expressed incrementally
    * (the "last" row may always still arrive), so streaming keeps the
    * FIRST and the divergence is documented — the reference's dedup is
    * pre-parse ingest-order anyway (SURVEY.md §1.5).
    */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("timestamp", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Streaming twin of the cleaning+normalization stages: stateless, so
    * identical semantics to batch — the same Column expressions applied to
    * a streaming DataFrame.
    */
  def normalizeStream(events: DataFrame): DataFrame =
    events.transform(Normalization.normalizeCategoricals)

  /** The full STATELESS prefix of the batch pipeline on a stream: missing-
    * value handling, timestamp standardization, categorical normalization
    * — the exact `DataFrame => DataFrame` transforms batch runs, applied
    * to an unbounded source. Only the order-dependent dedup (needs
    * [[dedupStream]] + watermark) and the global sort are excluded; batch
    * output and streaming output agree row-for-row on the overlap
    * (verified in StreamingSpec against the reference fixture).
    */
  def cleanStream(raw: DataFrame): DataFrame =
    raw.transform(graft.etl.Cleaning.handleMissingValues)
      .transform(Normalization.standardizeTimestamps(_))
      .transform(Normalization.normalizeCategoricals)

  /** Streaming twin of W4 (sessionization aggregates): Spark's native
    * `session_window` with the same inactivity gap. Emits one row per
    * closed session with count and duration — the per-session half of the
    * batch operator (per-ROW session ids need flatMapGroupsWithState and
    * arbitrary state; the aggregate form covers the analytics use).
    */
  def sessionStream(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("timestamp", watermark)
      .groupBy(col("user_id"), session_window(col("timestamp"), s"$gapMinutes minutes"))
      .agg(count(col("event_id")).as("session_event_count"),
        min("timestamp").as("session_start"),
        max("timestamp").as("session_end"))
      .withColumn("session_duration_seconds",
        col("session_end").cast("double") - col("session_start").cast("double"))
      .select("user_id", "session_start", "session_end",
        "session_event_count", "session_duration_seconds")

  /** Row shape for [[sessionIdsStream]] (public for the Catalyst encoder). */
  case class SessionEvent(event_id: Long, timestamp: java.sql.Timestamp, user_id: String)

  /** Per-user session-assignment state: last seen event time + running id. */
  case class SessionState(lastTsMillis: Long, sessionId: Long)

  case class SessionAssignment(event_id: Long, user_id: String, session_id: Long)

  /** Streaming twin of W3 — PER-ROW session ids, the reference's exact
    * output shape (session_id starting at 1 per user, new session on
    * strict gap > threshold), which `session_window` cannot produce.
    * Custom state per user via `flatMapGroupsWithState`: the state is 16
    * bytes per user (last event time + running session counter).
    *
    * Divergence from batch (documented, inherent to incremental
    * processing): within one trigger the group's rows are sorted by event
    * time, but a row arriving in a LATER trigger with an earlier
    * timestamp is assigned against the state as-is (batch would re-sort
    * globally). Bound disorder with an upstream watermark + a
    * trigger-interval larger than typical disorder.
    */
  def sessionIdsStream(
      spark: SparkSession,
      events: DataFrame,
      gapMinutes: Int = 30,
      stateTtlMinutes: Int = 120,
      watermark: String = "1 hour"): Dataset[SessionAssignment] = {
    import spark.implicits._
    val gapMillis = gapMinutes * 60000L
    val ttlMillis = stateTtlMinutes * 60000L
    events
      .withWatermark("timestamp", watermark)
      .selectExpr("event_id", "timestamp", "user_id")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      // EventTimeTimeout bounds the state store: an idle user's 16-byte
      // entry is evicted `stateTtlMinutes` past their last event (relative
      // to the watermark) instead of living for the life of the query —
      // unbounded user cardinality would otherwise grow state forever. A
      // returning user restarts at session 1, the same as a fresh key.
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: String, rows: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
            val out = rows.toSeq.sortBy(e => (e.timestamp.getTime, e.event_id)).map { e =>
              val t = e.timestamp.getTime
              val newSession = st.sessionId == 0L || (t - st.lastTsMillis) > gapMillis
              st = SessionState(t, if (newSession) st.sessionId + 1 else st.sessionId)
              SessionAssignment(e.event_id, user, st.sessionId)
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastTsMillis + ttlMillis,
                state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
        })
  }

  /** Streaming twin of A2's daily buckets: tumbling 1-day event-time
    * windows per user.
    */
  def dailyCountsStream(
      events: DataFrame,
      watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("timestamp", watermark)
      .groupBy(col("user_id"), window(col("timestamp"), "1 day"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("window.start").as("day"), col("n"))

  /** Streaming corpus intake — the LLM-pipeline extension operators on an
    * unbounded document feed: per-document quality signals (token count,
    * duplicate-token fraction, language id — the SAME stateless Column
    * expressions batch uses, so signals cannot diverge between modes) →
    * quality filter → exact-dup suppression by content fingerprint within
    * the watermark horizon.
    *
    * State: `dropDuplicatesWithinWatermark` keyed on the 16-byte md5 — the
    * minimal dedup state shape; the watermark bounds it to the horizon.
    * Keeps the FIRST arrival (streaming cannot keep "last" — it may always
    * still arrive). Documents failing the quality gate — including NULL
    * text, which a corpus filter rightly drops, unlike the dedup operators
    * where pass-through matters — never enter the dedup state at all: the
    * filter runs first, so junk can't evict budget from real state.
    */
  def corpusIntakeStream(
      docs: DataFrame, textCol: String = "text", tsCol: String = "ingest_ts",
      minTokens: Long = 5, maxDupTokenFrac: Double = 0.6,
      watermark: String = "1 hour"): DataFrame =
    dedupWithinWatermark(
      qualityGated(docs, textCol, minTokens, maxDupTokenFrac), tsCol, watermark)

  // shared intake stages: signals + quality filter, then the stateful
  // fingerprint dedup — ONE definition so the plain and incremental intake
  // paths cannot diverge
  private def qualityGated(
      docs: DataFrame, textCol: String, minTokens: Long,
      maxDupTokenFrac: Double): DataFrame =
    docs
      .withColumn("n_tokens", graft.ext.TextAnalysis.tokenCount(col(textCol)))
      .withColumn("dup_token_frac", graft.ext.TextAnalysis.dupTokenFrac(col(textCol)))
      .withColumn("lang_guess", graft.ext.TextAnalysis.languageId(col(textCol)))
      .withColumn("fingerprint", graft.ext.TextAnalysis.fingerprint(col(textCol)))
      .filter(col("n_tokens") >= minTokens &&
        col("dup_token_frac") <= maxDupTokenFrac)

  private def dedupWithinWatermark(
      docs: DataFrame, tsCol: String, watermark: String): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("fingerprint"))

  /** Streaming twin of [[graft.ext.Dedup.incrementalDedup]]: the intake
    * stream anti-joins a STATIC accepted-corpus fingerprint index before
    * the stateful within-stream dedup, so documents already in the corpus
    * never enter the dedup state at all — state stays proportional to the
    * NOVEL arrivals inside one watermark, not to corpus size. Stream-static
    * left-anti joins are stateless in Structured Streaming (the static
    * side is re-broadcast per micro-batch; at scale the corpus index is a
    * compact fingerprint-only table, not the corpus itself).
    */
  def incrementalIntakeStream(
      docs: DataFrame, corpus: DataFrame, textCol: String = "text",
      tsCol: String = "ingest_ts", minTokens: Long = 5,
      maxDupTokenFrac: Double = 0.6, watermark: String = "1 hour"): DataFrame = {
    val corpusFp = corpus
      .select(graft.ext.TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .distinct()
    dedupWithinWatermark(
      qualityGated(docs, textCol, minTokens, maxDupTokenFrac)
        .join(corpusFp, Seq("fingerprint"), "left_anti"),
      tsCol, watermark)
  }

  /** Streaming scrub-and-route: PII redaction, Gopher-style quality
    * booleans, and the deterministic train/val/test assignment on an
    * unbounded document stream. Every stage is a STATELESS column
    * expression ([[graft.ext.TextAnalysis.redactPii]],
    * [[graft.ext.CorpusSampling.hashSplit]] semantics inlined as the same
    * md5-boundary compare), so the stream needs no watermark, no state
    * store, and produces batch-identical rows — asserted in StreamingSpec.
    * Chain BEFORE the stateful intake dedup: scrubbing changes no
    * fingerprint inputs used downstream and the quality booleans let a
    * router fan rejected docs to a quarantine sink.
    */
  def scrubStream(
      docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    val t = col(textCol)
    graft.ext.CorpusSampling.hashSplit(
      docs
        .withColumn("redacted", graft.ext.TextAnalysis.redactPii(t))
        .withColumn("n_tokens", graft.ext.TextAnalysis.tokenCount(t))
        .withColumn("alpha_frac", graft.ext.TextAnalysis.alphaTokenFrac(t))
        .withColumn("keep",
          col("n_tokens") >= 10 && col("alpha_frac") >= 0.8),
      col(idCol), splits)
  }

  /** Streaming twin of [[graft.ext.Dedup.decontaminate]]: drop stream
    * documents sharing ANY word n-gram with a STATIC benchmark/eval set —
    * live decontamination at the ingest edge, so contaminated documents
    * never even land in the corpus.
    *
    * The batch shape (explode grams → semi-join → distinct contaminated
    * ids → anti-join) needs a stateful stream-side distinct; this twin is
    * STATELESS instead: the benchmark's distinct gram set is a static
    * broadcast side, each streaming document carries its gram ARRAY into
    * one broadcast LEFT ANTI join on `array_contains`, and no state store
    * is touched (stream-static joins re-use the static side per
    * micro-batch). Per-row cost is O(|bench grams|) worst case with
    * short-circuit on the first hit — bounded by the same "a benchmark is
    * small by definition" invariant the batch operator's broadcast relies
    * on. Documents with fewer than `n` tokens (or NULL text) have a NULL
    * gram array; `array_contains(NULL, g)` is NULL, never true, so they
    * survive the anti-join — identical to batch semantics (asserted
    * row-for-row in StreamingSpec on real documents).
    */
  def decontaminateStream(
      docs: DataFrame, benchmark: DataFrame, textCol: String = "text",
      n: Int = 8): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(!docs.columns.contains("_grams"),
      "decontaminateStream reserves column _grams")
    val benchGrams = benchmark
      .select(explode(
        graft.ext.TextAnalysis.wordNgrams(col(textCol), n)).as("_gram"))
      .distinct()
    docs
      .withColumn("_grams", graft.ext.TextAnalysis.wordNgrams(col(textCol), n))
      .join(broadcast(benchGrams),
        array_contains(col("_grams"), col("_gram")), "left_anti")
      .drop("_grams")
  }

  /** Streaming twin of [[graft.ext.Relevance.bigramLmScore]]: score
    * INCOMING documents against a STATIC corpus-trained bigram LM — the
    * quality gate applied live at the ingest edge instead of in a batch
    * sweep.
    *
    * Training/serving split: the LM (bigram counts, unigram counts,
    * vocabulary size) trains ONCE on the static corpus at stream-build
    * time; the vocabulary size is a driver-side scalar pulled before the
    * stream starts (one bounded action over the vocabulary table — NOT
    * per-batch work). Each micro-batch then explodes its documents to
    * (id, ts, gram) rows, stream-static LEFT joins the broadcast LM
    * tables, and finalizes one per-document aggregate keyed on
    * `(id, window(ts))` — the window key lets append mode emit exactly
    * once when the watermark passes; state is bounded by documents inside
    * one watermark horizon.
    *
    * Out-of-vocabulary semantics (the one place a stream NEEDS a
    * definition the batch operator does not): novel grams score with
    * B = 0 and novel prefix words with U = 0 — the add-alpha smoothing is
    * exactly the machinery that makes those finite. On documents the LM
    * HAS seen, scores are bit-identical to batch (asserted in
    * StreamingSpec).
    */
  def lmScoreStream(
      docs: DataFrame, staticCorpus: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", tsCol: String = "ingest_ts",
      alpha: Double = 0.5, watermark: String = "1 hour"): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val reserved = Seq("_gram", "_w1", "_n_w", "_n_b", "_v", "_lp")
    require(!reserved.exists(docs.columns.contains),
      s"lmScoreStream reserves columns ${reserved.mkString(", ")}")
    val uni = graft.ext.Relevance
      .termPostings(staticCorpus, idCol, textCol)
      .groupBy(col("term").as("_w1")).agg(count(lit(1)).as("_n_w"))
    val bi = staticCorpus.where(col(textCol).isNotNull)
      .select(explode(
        graft.ext.TextAnalysis.wordNgrams(col(textCol), 2)).as("_gram"))
      .groupBy("_gram").agg(count(lit(1)).as("_n_b"))
    // one bounded driver action at stream-BUILD time (static side only)
    val vocabSize = uni.count()
    docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol),
        explode(graft.ext.TextAnalysis.wordNgrams(col(textCol), 2))
          .as("_gram"))
      .withColumn("_w1", split(col("_gram"), " ").getItem(0))
      .join(broadcast(bi), Seq("_gram"), "left")
      .join(broadcast(uni), Seq("_w1"), "left")
      .withColumn("_lp",
        log((coalesce(col("_n_b"), lit(0L)) + lit(alpha)) /
          (coalesce(col("_n_w"), lit(0L)) + lit(alpha * vocabSize))))
      .groupBy(col(idCol), window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("_lp")), 4).as("lm_score"))
      .drop("window")
  }

  /** STREAM-STREAM interval join — click attribution: each click pairs
    * with every impression the same user saw in the preceding
    * `horizonMinutes`. Both sides are unbounded, so BOTH carry watermarks
    * and the join predicate carries the event-time interval — together
    * those two constraints are what let Structured Streaming bound the
    * buffered state: an impression ages out of the join buffer once the
    * click-side watermark passes `i_ts + horizon`, a click once the
    * impression-side watermark passes `c_ts`. Without the interval the
    * state would grow forever (Spark rejects unbounded stream-stream
    * inner joins in append mode for exactly that reason).
    *
    * `joinType` "inner" (default): a click with no impression in the
    * horizon produces nothing. "left_outer": every click eventually
    * emits — unmatched ones with NULL impression fields, but only once
    * the impression-side WATERMARK has passed the click's horizon (the
    * stream cannot know "no match" earlier; a batch outer join knows
    * immediately — the documented, inherent divergence in emission TIME,
    * not in the eventual row set). Semantics over the emitted rows are
    * IDENTICAL to the same predicate over static frames — asserted in
    * StreamingSpec for both join types.
    */
  def attributionJoinStream(
      impressions: DataFrame, clicks: DataFrame,
      horizonMinutes: Int = 30,
      watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    require(horizonMinutes > 0,
      s"horizonMinutes must be positive, got $horizonMinutes")
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner|left_outer, got $joinType")
    val i = impressions
      .withWatermark("timestamp", watermark)
      .select(col("user_id").as("i_user"),
        col("event_id").as("impression_id"), col("timestamp").as("i_ts"))
    val c = clicks
      .withWatermark("timestamp", watermark)
      .select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("timestamp").as("c_ts"))
    c.join(i,
        col("c_user") === col("i_user") &&
        col("i_ts") <= col("c_ts") &&
        col("i_ts") >= col("c_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"),
        joinType)
      .select(col("c_user").as("user_id"), col("click_id"),
        col("impression_id"), col("i_ts"), col("c_ts"))
  }

  /** Streaming heavy hitters: the SpaceSaving sketch
    * ([[graft.ext.Sketches]], Metwally et al. 2005) as a WINDOWED
    * streaming aggregation — "trending values per event-time window" with
    * O(k) state per window regardless of value cardinality (an exact
    * groupBy-count stream would grow state with the key set; the sketch
    * buffer is the whole point at 100 TB). The Aggregator's mergeable
    * buffer is exactly what the state store checkpoints between
    * micro-batches; the watermark closes windows and bounds the number of
    * live buffers. With k >= the window's distinct values the counts are
    * EXACT — the batch-parity hook StreamingSpec asserts.
    */
  def heavyHittersStream(
      events: DataFrame, valueCol: String, tsCol: String = "timestamp",
      k: Int = 10, windowDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    heavyHittersCore(events.withWatermark(tsCol, watermark),
      valueCol, tsCol, k, windowDur)
  }

  /** The windowed SpaceSaving aggregation over an ALREADY-watermarked
    * stream — split out so composers that filter AFTER the watermark
    * (e.g. [[watchlistOffendersStream]]) keep event time advancing on
    * the rows their screen drops.
    */
  private def heavyHittersCore(
      watermarked: DataFrame, valueCol: String, tsCol: String,
      k: Int, windowDur: String): DataFrame = {
    watermarked
      .groupBy(window(col(tsCol), windowDur))
      .agg(graft.ext.Sketches.spaceSaving(k)(col(valueCol)).as("hitters"))
      .select(col("window.start").as("window_start"),
        explode(col("hitters")).as("h"))
      .select(col("window_start"), col("h.value").as("value"),
        col("h.count").as("count"), col("h.error").as("error"))
  }

  /** Windowed watchlist top-offender stream — the natural SOC deploy of
    * the Aho–Corasick IOC screen: every event's text is scanned ONCE by
    * the native automaton ([[graft.functions.MultiMatchCount]],
    * O(len + matches) per row regardless of watchlist size, map-side,
    * zero shuffles), and the entities behind matching events feed the
    * windowed SpaceSaving sketch ([[heavyHittersStream]]) — "who
    * triggered the watchlist most, per window" with O(k) state per
    * window no matter how many distinct entities the feed carries. With
    * k ≥ the window's distinct flagged entities the counts are EXACT
    * (batch-parity hook in StreamingSpec); `count` is the number of
    * FLAGGED EVENTS per entity (not total term occurrences — an event
    * mentioning ten IOCs is one incident, which is the triage
    * semantics).
    *
    * Shape note: clean events are NOT filtered out before the
    * aggregation — they carry a NULL offender entity that the sketch
    * skips. A pre-aggregation filter looks equivalent but is not: the
    * optimizer pushes a deterministic text predicate BELOW the
    * watermark node, so a watchlist-quiet stream would never advance
    * event time and its windows would never close (measured: the
    * watermark froze at the first batch). Clean rows must reach the
    * event-time tracker; only the sketch ignores them.
    */
  def watchlistOffendersStream(
      events: DataFrame, textCol: String, entityCol: String,
      patterns: Seq[String], tsCol: String = "timestamp",
      k: Int = 10, windowDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    require(patterns.nonEmpty, "watchlistOffendersStream needs patterns")
    require(k >= 1, s"k must be >= 1, got $k")
    val scored = events
      .withColumn("_wl_offender",
        when(graft.functions.MultiMatchFunctions
          .multi_match_count(col(textCol), patterns) > 0, col(entityCol)))
      .withWatermark(tsCol, watermark)
    heavyHittersCore(scored, "_wl_offender", tsCol, k, windowDur)
  }

  /** Windowed co-occurrence top pairs — the streaming edge twin of
    * [[graft.ext.AssocRules.pairRules]]' discovery layer: each arriving
    * event IS a transaction carrying its item array (the natural edge
    * shape — a purchase with its line items, an alert with its rule
    * hits), so pair generation is a stateless map-side projection
    * (sorted-distinct items, all i < j pairs — quadratic in the EVENT's
    * own basket, never across events) feeding the windowed SpaceSaving
    * sketch ([[heavyHittersCore]]): "which item pairs co-fired most,
    * per window", O(k) state per window regardless of item-space size.
    * With k ≥ the window's distinct pairs the counts are EXACT
    * (batch-parity spec). Full Apriori metrics (confidence/lift against
    * item marginals) stay batch's job at rest — two chained stateful
    * aggregates would leave append mode (the documented budget-twin
    * divergence class).
    *
    * Shape note ([[watchlistOffendersStream]]'s lesson): sub-2-item
    * events are NOT filtered out — they carry a NULL pair (explode_outer
    * of an empty array) that the sketch skips, so a pair-quiet stream
    * still advances event time and closes its windows.
    */
  def coOccurrenceStream(
      events: DataFrame, itemsCol: String, tsCol: String = "timestamp",
      k: Int = 10, windowDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val its = array_sort(array_distinct(
      filter(col(itemsCol), x => x.isNotNull)))
    // pair key separator is the ASCII unit separator, not '|': free-form
    // items routinely CONTAIN '|' (["a|b","c"] and ["a","b|c"] must not
    // collide into one "a|b|c" pair key — review r15); \u001F appearing
    // inside an item remains the documented residual caveat
    val pairs = flatten(transform(its, (x, i) =>
      transform(
        slice(its, i + lit(2), greatest(size(its) - i - lit(1), lit(0))),
        y => concat(x, lit("\u001f"), y))))
    val exploded = events
      .withColumn("_pairs", pairs)
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), explode_outer(col("_pairs")).as("_pair"))
    heavyHittersCore(exploded, "_pair", tsCol, k, windowDur)
  }

  /** Windowed log-template census — the streaming twin of
    * [[graft.ext.LogTemplates.mine]]: mask each raw message map-side
    * (the codegen'd regexp_replace chain, stateless) and aggregate one
    * census row per (window, template) — count, first/last sighting,
    * lexicographically-smallest example — "what is this system saying,
    * per hour". State per window is bounded by the TEMPLATE set
    * (format strings, 10²–10⁴), not event volume, exactly like the
    * batch census's aggregate key domain. Liveness contract: rows with
    * a NULL message do not advance event time (the masking filter sits
    * below the watermark after pushdown) — a feed whose message column
    * can be sparse should coalesce upstream.
    */
  def templateCensusStream(
      events: DataFrame, msgCol: String, tsCol: String = "timestamp",
      windowDur: String = "1 hour", watermark: String = "1 hour"): DataFrame =
    events
      .where(col(msgCol).isNotNull)
      .withColumn("_template", graft.ext.LogTemplates.templateOf(col(msgCol)))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col("_template"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts"),
        min(col(msgCol)).as("example"))
      .select(col("window.start").as("window_start"),
        col("_template").as("template"),
        col("n_events"), col("first_ts"), col("last_ts"), col("example"))

  /** Windowed ε-DP count release at the stream edge — the streaming twin
    * of [[graft.ext.Privacy.dpCounts]]: one watermark-bounded windowed
    * aggregate per (window, group), then the map-side seeded Laplace
    * noise with the WINDOW START folded into the noise key
    * ([[graft.ext.Privacy.dpWindowedCountsColumn]]), so every window's
    * publication draws fresh, domain-separated noise while staying
    * bit-reproducible against a batch replay (StreamingSpec parity).
    * The exact count never leaves the plan; `suppressBelow` thresholds
    * on the NOISY value (DP-safe post-processing). Composition caveat
    * carried from the batch contract: every published window spends ε —
    * charge an [[graft.ext.Privacy.EpsilonLedger]] per window, and keep
    * the seed secret.
    */
  def dpCountStream(
      events: DataFrame, groupCol: String, epsilon: Double, seed: String,
      tsCol: String = "timestamp", windowDur: String = "1 hour",
      watermark: String = "1 hour",
      suppressBelow: Long = Long.MinValue): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(groupCol))
      .agg(count(lit(1)).as("_n"))
      .select(col("window.start").as("window_start"), col(groupCol),
        graft.ext.Privacy.dpWindowedCountsColumn(seed, epsilon,
          col(groupCol), col("window.start"), col("_n")).as("released"))
      .where(col("released") >= suppressBelow)

  /** Windowed PSI drift against a FROZEN reference baseline — the
    * streaming twin of [[graft.etl.Anomaly.psiDriftFrozen]]: the
    * reference's bounds and per-dim dense bin counts are computed ONCE
    * batch-side (a bounded dims × (bins+1) frame, pinned and
    * broadcast), the stream bins each value map-side against the frozen
    * bounds (stateless, values outside clamp to the edge bins), and ONE
    * watermark-bounded windowed aggregate emits the bins+1 conditional
    * sums per (window, dims) — so streaming state is bounded by
    * windows × dims × (bins+1) longs, independent of event volume. The
    * PSI itself is the shared pico-quantized expression
    * ([[graft.etl.Anomaly.psiQColumn]]) over the stream-static join,
    * bit-reproducible against the batch frozen op per closed window
    * (StreamingSpec parity). Dims with no current rows in a window emit
    * nothing (no data, no release — the batch frozen op's documented
    * contract).
    */
  def psiDriftStream(
      events: DataFrame, reference: DataFrame, valueCol: String,
      dims: Seq[String], bins: Int = 10, tsCol: String = "timestamp",
      windowDur: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(dims.nonEmpty, "psiDriftStream needs at least one dimension column")
    val A = graft.etl.Anomaly
    val (lo, hi) = A.referenceBounds(reference, valueCol)
    // bounded (dims x bins+1) baseline, pinned so micro-batches never
    // replay the reference aggregation
    val ref = A.denseBinCounts(reference, valueCol, dims, bins, lo, hi, "c0_")
      .localCheckpoint(true)
    val sums = (0 until bins).map(i =>
      sum(when(col("_bin") === i, 1L).otherwise(0L)).as(s"_c1_$i"))
    events
      .where(col(valueCol).isNotNull)
      .withColumn("_bin", A.clampedBin(col(valueCol), lo, hi, bins))
      .withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), windowDur) +: dims.map(col)): _*)
      .agg(sums.head, sums.tail: _*)
      .withColumn("_nc1_",
        (0 until bins).map(i => col(s"_c1_$i")).reduce(_ + _))
      .join(broadcast(ref), dims, "left")
      .select((col("window.start").as("window_start") +: dims.map(col)
        :+ coalesce(col("_nc0_"), lit(0L)).as("n0")
        :+ col("_nc1_").as("n1")
        :+ A.psiQColumn(bins,
          i => coalesce(col(s"_c0_$i"), lit(0L)),
          coalesce(col("_nc0_"), lit(0L)),
          i => col(s"_c1_$i"), col("_nc1_")).as("psi_q")): _*)
  }

  /** Continuous keyed merge: maintain a SERVING TABLE from a change
    * stream — each micro-batch upserts into the table via
    * [[graft.operators.Upsert]] inside `foreachBatch` (the standard
    * Structured Streaming pattern for sinks with merge semantics that
    * the declarative writers can't express). Within one batch, keep-LAST
    * per key in `orderCol` order resolves multiple changes to the same
    * key BEFORE the merge (Upsert requires key-unique updates).
    *
    * The table lives as parquet at `tablePath`, rewritten per batch via
    * write-to-staging then rename-aside swap (dest → `.old`, staging →
    * dest, delete `.old`): a crash mid-swap leaves either the old table
    * in place or recoverable at `<path>.old`, never a window with no
    * table at all. `java.io.File` renames limit this sink to LOCAL
    * filesystems; on an object store, target a transactional table
    * format instead. A per-batch rewrite is the
    * honest cost of parquet-as-a-table — at 100 TB the same foreachBatch
    * body targets a table FORMAT with transactional MERGE instead; the
    * stream-side contract (dedup, then [[graft.operators.Upsert.upsert]])
    * is identical, which is the point of factoring the merge as a plain
    * DataFrame operator.
    *
    * Returns the DataStreamWriter — caller starts/stops it. Batch-parity:
    * replaying any change log through this sink leaves the table equal to
    * batch keep-last dedup of (seed ∪ log) — asserted in StreamingSpec.
    */
  def upsertSink(
      changes: DataFrame, tablePath: String, key: String, orderCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.expressions.Window
    changes.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // orderCol must order a key's changes totally (a change-log
        // sequence number or event time) — ties would make keep-last
        // nondeterministic, exactly as in batch keep-last dedup
        val w = Window.partitionBy(key).orderBy(col(orderCol).desc)
        // Pinned: see manifestUpsertSink — the merge consumes updates
        // twice, and unpinned each consumption re-reads the micro-batch.
        val updates = batch
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
          .localCheckpoint(true)
        val fs = new java.io.File(tablePath)
        val merged =
          if (fs.exists()) {
            val base = spark.read.parquet(tablePath)
            graft.operators.Upsert.upsert(
              base.select(updates.columns.map(col): _*), updates, key)
          } else updates
        val staging = tablePath + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        // re-materialize from staging THEN swap: the merged plan lazily
        // reads the current table, so writing over it in place would read
        // and clobber the same files
        val dir = new java.io.File(staging)
        val dest = new java.io.File(tablePath)
        def rmTree(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rmTree)
          f.delete(): Unit
        }
        // Rename-aside swap: never a moment with no serving table. A
        // crash after step 1 still has the full table at `.old`; a crash
        // after step 2 has the new table live and `.old` as garbage that
        // the next batch clears.
        val old = new java.io.File(tablePath + ".old")
        if (old.exists()) rmTree(old)
        if (dest.exists() && !dest.renameTo(old))
          throw new java.io.IOException(s"rename-aside failed for $tablePath")
        if (!dir.renameTo(dest)) {
          // Restore the previous table before failing so the sink never
          // leaves the serving path empty.
          if (old.exists()) old.renameTo(dest): Unit
          throw new java.io.IOException(s"staging swap failed for $tablePath")
        }
        if (old.exists()) rmTree(old)
        ()
    }
  }

  /** [[upsertSink]] with the OBJECT-STORE-SAFE commit protocol: the
    * serving table lives as immutable snapshot prefixes plus a single
    * manifest pointer ([[graft.operators.ManifestTable]] — the
    * Iceberg-style commit reduced to a single-writer pointer), so the
    * per-batch swap is one atomic small-object write instead of a
    * directory rename. Same stream-side contract as [[upsertSink]]
    * (within-batch keep-last dedup, then
    * [[graft.operators.Upsert.upsert]] against the committed base), so
    * the batch-parity property carries over verbatim — StreamingSpec
    * asserts replay parity through the manifest protocol and the
    * orphan-snapshot crash window.
    */
  def manifestUpsertSink(
      changes: DataFrame, tablePath: String, key: String, orderCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.expressions.Window
    changes.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val w = Window.partitionBy(key).orderBy(col(orderCol).desc)
        // Pinned: Upsert.upsert consumes updates TWICE (anti-join keys +
        // the union branch) — unpinned, each consumption re-reads the
        // source micro-batch (measured 2x numInputRows in StreamBench's
        // manifest_upsert profile).
        val updates = batch
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
          .localCheckpoint(true)
        val merged =
          graft.operators.ManifestTable.read(spark, tablePath) match {
            case Some(base) =>
              graft.operators.Upsert.upsert(
                base.select(updates.columns.map(col): _*), updates, key)
            case None => updates
          }
        // No staging re-materialization dance needed here: the snapshot
        // write targets a FRESH prefix, so the lazy merged plan reads
        // the old snapshot while writing the new one.
        graft.operators.ManifestTable.commit(merged, tablePath, batchId)
        ()
    }
  }

  /** The composed-ingest admission cycle as a STREAM (the
    * [[graft.ext.Ingest.ingestBatch]] twin, verdict r18 #4): each
    * micro-batch of crawl rows runs the full sequential admission —
    * URL policy → blocklist → quality → exact/MinHash/semantic screens —
    * and the admitted set delta-commits to the serving
    * [[graft.operators.ManifestTable]] (O(admitted) I/O per trigger).
    *
    * The four index artifacts THREAD across triggers (round 20, advice
    * r19): each trigger screens against the state every earlier trigger
    * grew, so the stream is exactly a sequential chain of
    * [[graft.ext.Ingest.ingestBatch]] cycles — a duplicate pair SPLIT
    * across micro-batches is caught (the earlier row is in the grown
    * fp/MinHash/semantic indexes by the time the later one arrives),
    * where screening only the pre-stream frozen state would admit both.
    * The corpus-side build is never recomputed — each GROWTH is
    * O(batch) appended rows — but the per-trigger re-pin of the grown
    * frames (localCheckpoint, so lineage never chains across triggers —
    * the r16 iterative-loop lesson) re-materializes the WHOLE index,
    * O(index) per trigger: an in-memory-twin simplification. A
    * deployment appends just the delta rows to the persisted bucketed
    * serving tables ([[graft.sources.Sources.writeBucketed]]) and
    * re-reads them, keeping per-trigger I/O O(batch).
    *
    * The threaded frames live in DRIVER closure state: they do NOT
    * survive a streaming-query restart from a checkpoint — a restarted
    * query screens against the constructor's indexes again until its
    * own triggers re-grow them. A restart-safe deployment passes the
    * PERSISTED index tables (the durable artifacts the appends target)
    * as the frozen state at (re)start; a re-processed trigger that
    * re-commits the same admitted set adds a prefix whose rows the
    * reader's latest-prefix-wins merge already carries — a no-op for
    * readers.
    *
    * `rebuildCheckEvery` closes the LAST lifecycle loop (verdict r19
    * #2): every Nth trigger the cycle gauges the grown vector indexes
    * against their pre-append base and retrains the ones whose
    * [[graft.ext.Similarity.indexRebuildDecision]] trips — a drifting
    * intake stream rebuilds mid-stream instead of growing a degrading
    * index forever. 0 (the default) never checks; gauging is O(index),
    * so pick N to taste the amortization.
    *
    * foreachBatch holds no state store — the manifest row count is the
    * numeric state bound StreamBench reports (the manifest-twin
    * convention); the threaded frames live in the closure, sequenced by
    * the micro-batch execution order foreachBatch guarantees. `onCycle`
    * observes each trigger's [[graft.ext.Ingest.IngestResult]] (with
    * the pinned grown artifacts substituted in) — the metrics surface
    * for admission counts and rebuild flags.
    */
  def ingestStream(
      crawl: DataFrame, batchVecs: DataFrame,
      fpIndex: DataFrame, mhIndex: DataFrame,
      semIndex: DataFrame, ivfIndex: DataFrame,
      rules: Seq[graft.ext.UrlOps.UrlRule],
      blockTerms: Seq[String], maxBannedPerMille: Long,
      minTokens: Long, eps: Double, manifestDir: String,
      rebuildCheckEvery: Int = 0,
      rebuildMaxListLoad: Double = 3.0, rebuildDriftFloor: Double = -0.05,
      onCycle: graft.ext.Ingest.IngestResult => Unit = _ => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var fpIdx = fpIndex
    var mhIdx = mhIndex
    var semIdx = semIndex
    var ivfIdx = ivfIndex
    crawl.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val check = rebuildCheckEvery > 0 &&
            batchId % rebuildCheckEvery == (rebuildCheckEvery - 1).toLong
          val r = graft.ext.Ingest.ingestBatch(
            batch.localCheckpoint(true), // every stage fans out of it
            "doc_id", "text", "url", batchVecs, "embedding",
            fpIdx, mhIdx, semIdx, ivfIdx,
            rules, blockTerms, maxBannedPerMille, minTokens, eps,
            manifestDir, batchId, deltaCommit = true,
            checkRebuild = check, maxListLoad = rebuildMaxListLoad,
            driftFloor = rebuildDriftFloor)
          // the commit already ran inside ingestBatch; materializing the
          // fate frame is the per-trigger observable work
          r.fates.write.format("noop").mode("overwrite").save()
          // thread the grown state into the next trigger's screens
          fpIdx = r.fpIndex.localCheckpoint(true)
          mhIdx = r.mhIndex.localCheckpoint(true)
          semIdx = r.semIndex.localCheckpoint(true)
          ivfIdx = r.ivfIndex.localCheckpoint(true)
          // per-cycle observer (metrics surface: admission counts,
          // rebuild flags) — called after the state is pinned
          onCycle(r.copy(
            fpIndex = fpIdx, mhIndex = mhIdx,
            semIndex = semIdx, ivfIndex = ivfIdx))
          // bound the delta-prefix chain (review r19): without periodic
          // compaction the per-trigger merged read-back grows linearly
          // with trigger count — quadratic total over a long stream
          if (batchId > 0 && batchId % 8 == 0)
            graft.operators.ManifestTable.compact(
              batch.sparkSession, manifestDir, "doc_id", batchId): Unit
        }
        ()
    }
  }

  /** [[manifestUpsertSink]] with DELTA commits: each micro-batch writes
    * only its own (within-batch keep-last deduped) rows as a new
    * snapshot prefix — O(batch) I/O per commit where the full-snapshot
    * sink rewrites the whole table every batch — and every
    * `compactEvery` commits the prefix chain is rewritten into one
    * snapshot ([[graft.operators.ManifestTable.compact]]), bounding
    * read fan-in at `compactEvery` prefixes. Readers use
    * `ManifestTable.readMerged(key)`: per key, the latest prefix wins,
    * which IS the upsert contract, so replay parity with the
    * full-snapshot sink holds across compactions (spec-asserted). This
    * is the 100 TB serving shape: per-batch write cost scales with the
    * CHANGE rate, not the table size; only the periodic compaction pays
    * a table-sized job.
    */
  def manifestDeltaUpsertSink(
      changes: DataFrame, tablePath: String, key: String, orderCol: String,
      compactEvery: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")
    import org.apache.spark.sql.expressions.Window
    changes.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val w = Window.partitionBy(key).orderBy(col(orderCol).desc)
        // within-batch keep-last: delta prefixes must be key-unique so
        // the reader's latest-prefix-wins merge is deterministic
        val updates = batch
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
        graft.operators.ManifestTable.commitDelta(updates, tablePath, batchId)
        if (graft.operators.ManifestTable
            .currentSnapshots(tablePath).size >= compactEvery) {
          graft.operators.ManifestTable.compact(
            spark, tablePath, key, batchId): Unit
        }
        ()
    }
  }

  /** Streaming twin of the MAD anomaly gate
    * ([[graft.etl.Anomaly]], `q_anomaly_mad`): per-group robust
    * thresholds computed BATCH-side flag the live event stream — the
    * deploy shape of robust outlier detection (train offline on the
    * curated window, score online). The apply side is
    * [[graft.etl.Anomaly.flagOutliers]] VERBATIM — a stateless broadcast
    * join plus one comparison, so stream and batch flags cannot diverge
    * (asserted row-for-row in StreamingSpec); no watermark and no state
    * store are needed.
    */
  def anomalyGateStream(
      events: DataFrame, thresholds: DataFrame,
      group: String = "event_type", value: String = "value",
      k: Double = graft.etl.Anomaly.DefaultK): DataFrame =
    graft.etl.Anomaly.flagOutliers(events, thresholds, group, value, k)

  /** Streaming twin of [[graft.ext.QualityClassifier.score]]: a model
    * trained BATCH-side gates the ingest stream — the deploy shape of the
    * classifier-filter recipe (train on curated labels offline, score
    * every arriving document online). The integer weights ride the plan
    * as literals exactly as in batch, so there is no model-serving join
    * at all; the only state is the per-document windowed aggregate that
    * collects the bucket multiset, bounded by the watermark horizon.
    *
    * The stream collects buckets in ONE stateful aggregate (chaining the
    * batch side's two hash aggregations would cost append-mode
    * simplicity), then replays the batch quantization — per-bucket
    * `xq = halfUp(cnt·10^6 / n)`, integer z, hard sigmoid — as a
    * per-row higher-order fold over the collected list. Because every
    * step is the SAME exact integer arithmetic as batch, stream scores
    * are BIT-IDENTICAL to [[graft.ext.QualityClassifier.score]]
    * (asserted row-for-row in StreamingSpec).
    */
  def classifierScoreStream(
      docs: DataFrame, model: graft.ext.QualityClassifier.Model,
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ingest_ts", watermark: String = "1 hour"): DataFrame = {
    import graft.ext.QualityClassifier.{Scale, bucketOf, hardSigmoidQ}
    val reserved = Seq("_tok", "_cnt", "_n", "bucket", "x", "_z", "_bkts")
    require(!reserved.exists(docs.columns.contains),
      s"classifierScoreStream reserves columns ${reserved.mkString(", ")}")
    val wMap = typedlit(
      model.weightsQ.zipWithIndex.map { case (v, i) => i -> v }.toMap)
    docs
      .withWatermark(tsCol, watermark)
      .where(col(textCol).isNotNull)
      .select(col(idCol), col(tsCol),
        explode(graft.ext.TextAnalysis.tokens(col(textCol))).as("_tok"))
      .where(col("_tok") =!= "")
      .withColumn("bucket", bucketOf(col("_tok"), model.dims))
      .groupBy(col(idCol), window(col(tsCol), "1 hour"))
      .agg(collect_list(col("bucket")).as("_bkts"))
      // batch-exact integer replay over the collected bucket multiset:
      // n = |tokens|, per-distinct-bucket cnt → xq = halfUp(cnt·S / n)
      // (non-negative operands, so truncating div == halfUp form), then
      // zq = Σ xq·wq plus the always-on intercept feature
      .withColumn("_z",
        aggregate(array_distinct(col("_bkts")), lit(0L), (acc, b) => {
          val cnt = size(filter(col("_bkts"), x => x === b)).cast("long")
          val n = size(col("_bkts")).cast("long")
          val xq = call_function("div", cnt * Scale * 2 + n, n * 2)
          acc + xq * element_at(wMap, b)
        }) + lit(Scale) * element_at(wMap, lit(model.dims)))
      .select(col(idCol),
        (hardSigmoidQ(col("_z")).cast("double") / Scale).as("quality_prob"))
  }

  /** Train-batch / score-stream twin of
    * [[graft.ext.CorpusStats.vocabCoverage]]: a BATCH-trained top-V vocab
    * (CorpusStats.topVocab — the trained artifact) gates streaming
    * documents by OOV rate per tumbling window. The vocab folds into a
    * literal In-list (codegen'd membership test — no join, no broadcast,
    * no state beyond the windowed aggregation groups), so closed windows
    * are BIT-IDENTICAL to the batch operator over the same rows: counts
    * are pure additions and oov_rate is the same identical-operand
    * division (asserted in StreamingSpec). The batch-only part — training
    * the vocab itself — CANNOT stream (a global token-frequency top-V has
    * no monotone incremental form); this split is the honest contract.
    */
  def vocabGateStream(
      docs: DataFrame, vocab: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    require(vocab.nonEmpty, "vocab must be non-empty (train it batch-side)")
    docs
      .withWatermark(tsCol, watermark)
      .where(col(textCol).isNotNull)
      .select(col(idCol), col(tsCol),
        explode(graft.ext.TextAnalysis.tokens(col(textCol))).as("_tok"))
      .groupBy(col(idCol), window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(!col("_tok").isInCollection(vocab), 1L).otherwise(0L))
          .as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }

  /** Streaming twin of [[graft.ext.Network.lpmEnrich]]: threat-intel CIDR
    * longest-prefix classification at the ingest edge — every event is
    * labeled against the feed BEFORE landing. The batch operator is
    * already stream-safe: the feed constant-folds into a literal struct
    * array and the match is a pure per-row projection — no join, no state
    * store, no watermark, valid in append mode at any scale. This alias
    * pins that contract with a StreamingSpec batch-parity test, so a
    * refactor that turned the lookup into a stateful join (which would
    * break edge enrichment) fails a test instead of a deployment.
    */
  def enrichStream(
      events: DataFrame, ip: Column, cidrs: Seq[(String, String)]): DataFrame =
    graft.ext.Network.lpmEnrich(events, ip, cidrs)

  /** Streaming twin of the trailing-N-day active-users metric
    * (q_active_users_7d): approximate distinct users per sliding
    * event-time window. Exact sliding DISTINCT would need the full user
    * set per open window in the state store (unbounded per-window
    * state); the HLL sketch is the documented at-scale trade — O(HLL)
    * bytes per open window, and because HLL register merges are MAX
    * operations (order- and partitioning-independent), the streaming
    * estimate over a window is BIT-IDENTICAL to a batch
    * approx_count_distinct over the same rows — asserted window-by-
    * window in StreamingSpec, not just approximately close.
    */
  def activeUsersStream(
      events: DataFrame, tsCol: String = "timestamp",
      userCol: String = "user_id", days: Int = 7,
      watermark: String = "1 day"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .where(col(userCol).isNotNull)
      .groupBy(window(col(tsCol), s"$days days", "1 day"))
      .agg(approx_count_distinct(col(userCol)).as("wau_approx"))
      .select(col("window.start").as("win_start"), col("wau_approx"))

  /** Streaming twin of the length-bucket batching report
    * (q_length_buckets): per tumbling event-time window, documents per
    * power-of-two token bucket with token mass and integer padding waste
    * — the live view of "how efficiently would this intake batch pack".
    * Bucket boundaries come from the SHARED
    * [[graft.ext.CorpusSampling.lengthBucket]] chain; state per open
    * window is one row per bucket (≤16), and the counts/sums are pure
    * additions, so each closed window is BIT-IDENTICAL to the batch
    * report over the same rows (asserted in StreamingSpec).
    */
  def lengthBucketsStream(
      docs: DataFrame, textCol: String = "text", tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    val nt = graft.ext.TextAnalysis.tokenCount(col(textCol))
    docs
      .withWatermark(tsCol, watermark)
      .where(col(textCol).isNotNull)
      .select(col(tsCol), nt.as("_lb_n"),
        graft.ext.CorpusSampling.lengthBucket(nt).as("bucket"))
      .groupBy(window(col(tsCol), windowDur), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_lb_n")).as("sum_tokens"))
      .select(col("window.start").as("win_start"), col("bucket"),
        col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("bucket") - col("sum_tokens")).as("padding_waste"))
  }

  /** Streaming twin of the count–min sketch (q_countmin): per tumbling
    * event-time window, the depth×width counter table as rows
    * (win_start, j, bucket, c). The state per open window is just the
    * aggregation groups — at most depth·width rows regardless of stream
    * volume, the same constant-size contract as the batch build — and
    * because CMS cell updates are pure ADDITIONS (commutative,
    * associative), the streamed sketch of a closed window is
    * BIT-IDENTICAL to [[graft.ext.Sketches.countMinSketch]] over the
    * same rows, asserted cell-by-cell in StreamingSpec.
    */
  def countMinStream(
      events: DataFrame, keyCol: String, tsCol: String = "timestamp",
      width: Int = 64, depth: Int = 4, windowDur: String = "1 hour",
      watermark: String = "1 hour", salt: String = "graft:cms"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .where(col(keyCol).isNotNull)
      .select(col(tsCol),
        posexplode(graft.ext.Sketches.cmsBuckets(col(keyCol), depth, width, salt))
          .as(Seq("_cms_j", "_cms_b")))
      .groupBy(window(col(tsCol), windowDur), col("_cms_j"), col("_cms_b"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("win_start"),
        col("_cms_j").as("j"), col("_cms_b").as("bucket"), col("c"))

  /** Batch-train → stream-tokenize: apply a FROZEN BPE merge table
    * ([[graft.ext.BpeTrainer.train]], run batch-side) to a document
    * stream, reporting the same per-document
    * `(n_tokens, n_subwords, fertility)` as the batch encoder — the
    * frozen-tokenizer intake shape (tokenize arriving documents with the
    * production tokenizer; a fertility spike flags domain drift against
    * the training corpus).
    *
    * Contract vs batch [[graft.ext.BpeTrainer.encode]]: identical
    * per-document RESULTS (same [[graft.ext.BpeTrainer.encodeWord]]
    * replay, asserted row-for-row in StreamingSpec), different cost
    * shape — batch encodes each DISTINCT word once via the dictionary
    * join, which needs a corpus-wide distinct that a stream cannot have
    * (and a second chained streaming aggregation to pre-distinct within
    * the window would leave append mode's supported-plan set). The
    * stream instead MEMOIZES the merge replay per executor (advice r10):
    * a bounded concurrent cache keyed by word means each distinct word
    * is replayed once per JVM, not once per occurrence — the same
    * repetition-factor saving as the batch dictionary, without a second
    * stateful operator. Like the vocab gate, TRAINING cannot stream
    * (each merge step's argmax is a global corpus statistic with no
    * monotone incremental form) — only frozen inference does. Stateless
    * but windowed: the per-document aggregate rides the standard
    * watermark+window so append mode emits exactly once per closed
    * window.
    */
  def bpeEncodeStream(
      docs: DataFrame, merges: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    require(merges.nonEmpty, "merge table must be non-empty (train it batch-side)")
    val pairs = merges.map { m =>
      val Array(a, b) = m.split(" ", 2); (a, b)
    }
    // The memo key carries an MD5 of the full merge sequence so two
    // streams with different frozen tokenizers sharing the JVM cannot
    // cross-read — a 32-bit structural hash could collide (advice r12).
    val mergesKey = java.security.MessageDigest.getInstance("MD5")
      .digest(merges.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val nSubwords = udf { (w: String) =>
      BpeEncodeMemo.subwordCount(mergesKey, w, pairs)
    }
    docs
      .withWatermark(tsCol, watermark)
      .where(col(textCol).isNotNull)
      .select(col(idCol), col(tsCol),
        explode(graft.ext.TextAnalysis.tokens(col(textCol))).as("_w"))
      .where(length(col("_w")) > 0)
      .groupBy(col(idCol), window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n_tokens"),
        sum(nSubwords(col("_w")).cast("long")).as("n_subwords"))
      .select(col(idCol), col("n_tokens"), col("n_subwords"),
        (col("n_subwords").cast("double") / col("n_tokens").cast("double"))
          .as("fertility"))
  }

  /** Streaming ANN intake twin of [[graft.ext.Similarity.ivfTopK]]: a
    * batch-trained IVF index scores a stream of arriving embeddings —
    * the deploy shape of similarity search at the ingest edge (dedup
    * candidates / nearest-neighbor lookups for every new document,
    * against a FROZEN corpus index). The last batch-only family gets the
    * frozen-artifact streaming contract the tokenizer and vocab gate
    * already have: TRAINING cannot stream (centroids are a global corpus
    * statistic), frozen inference can.
    *
    * Mechanics, all stateless except the one windowed top-k aggregate:
    * the trained centroids ride the plan as literals (the same
    * [[graft.ext.Similarity.rankedSims]] kernel as batch, so probe-side
    * list ranking cannot diverge); the spilled inverted lists are a
    * STATIC frame joined per micro-batch (a stream-static equi-join on
    * the list id — no stream state); candidate cosines use the batch
    * expression verbatim; and the per-probe top-k that batch does with a
    * rank window becomes `slice(array_sort(collect_set(...)))` under the
    * watermark+window aggregate — `(-cosine, id)` sort order replays the
    * batch `(cosine DESC, id)` tiebreak, and set semantics replay its
    * adjacent-duplicate drop (a pair surfacing from several spilled
    * lists has the SAME deterministic cosine, hence the same struct).
    * Stream results are therefore BIT-IDENTICAL to batch ivfTopK over
    * the same probes (asserted row-for-row in StreamingSpec).
    *
    * At 100 TB: the index side is the corpus-sized frame — it stays
    * partitioned by list id and never moves; each micro-batch ships only
    * the arriving probes' nProbe list keys through the join.
    */
  def annScoreStream(
      probes: DataFrame, corpus: DataFrame,
      id: String = "vec_id", vec: String = "embedding",
      qId: String = "q_id", qVec: String = "q_emb",
      tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour",
      k: Int = 10, nCentroids: Int = 64, nProbe: Int = 8,
      quantizer: String = "kmeans",
      spillDelta: Double = 0.4, spillCap: Int = 6): DataFrame = {
    import graft.ext.Similarity
    require(k >= 1, s"k must be >= 1, got $k")
    val centroids = Similarity.centroidsFor(corpus, id, vec, nCentroids, quantizer)
    val assigned = (if (quantizer == "kmeans")
        Similarity.assignSpilled(corpus, vec, centroids, spillDelta, spillCap)
      else Similarity.assignToCentroids(corpus, vec, centroids))
      // materialize the index ONCE — without this every micro-batch
      // would re-run the assignment kernel over the whole corpus
      .select(col("_c_id"), col(id), col(vec)).localCheckpoint(true)
    val probeLists = probes
      .withWatermark(tsCol, watermark)
      .where(col(qVec).isNotNull)
      .withColumn("_cands", slice(Similarity.rankedSims(col(qVec), centroids),
        1, nProbe))
      .withColumn("_cand", explode(col("_cands")))
      .withColumn("_c_id", -col("_cand.negid"))
      .select(col(qId), col(qVec), col(tsCol), col("_c_id"))
    probeLists.join(assigned, Seq("_c_id"))
      .filter(col(id) =!= col(qId))
      .withColumn("_negc", -Similarity.cosine(col(qVec), col(vec)))
      .groupBy(col(qId), window(col(tsCol), windowDur))
      .agg(slice(array_sort(collect_set(struct(col("_negc"), col(id).as("_nid")))),
        1, k).as("_top"))
      .select(col(qId), explode(col("_top")).as("_t"))
      .select(col(qId), col("_t._nid").as(id), (-col("_t._negc")).as("cosine"))
  }

  /** [[annScoreStream]] against a PERSISTED
    * [[graft.ext.Similarity.ivfIndex]] instead of an in-stream corpus
    * build — the recurring-crawl serving shape for the IVF family
    * (round 17): the index artifact is built and [[graft.ext.Similarity
    * .ivfAppend]]-grown OFFLINE, the stream reads its centroid rows
    * back as plan literals and pins its posting lists once, and per
    * micro-batch the only work is the probe-side nProbe list selection
    * plus the stream-static posting join + windowed top-k. The corpus
    * is never re-scanned, re-assigned, or re-trained by the stream —
    * the same frozen-artifact contract as the semantic, DSIR, KN, and
    * lang-id intake twins.
    */
  def ivfIndexScoreStream(
      probes: DataFrame, index: DataFrame,
      qId: String = "q_id", qVec: String = "q_emb",
      tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour",
      k: Int = 10, nProbe: Int = 8): DataFrame = {
    import graft.ext.Similarity
    require(k >= 1, s"k must be >= 1, got $k")
    val cents = Similarity.ivfIndexCentroids(index)._1
    val postings = index.filter(col("kind") === "posting")
      .select(col("cid").as("_c_id"), col("member_id"), col("v"))
      .localCheckpoint(true) // pin once; every micro-batch joins it
    val probeLists = probes
      .withWatermark(tsCol, watermark)
      .where(col(qVec).isNotNull)
      .withColumn("_cands", slice(Similarity.rankedSims(col(qVec), cents),
        1, nProbe))
      .withColumn("_cand", explode(col("_cands")))
      .withColumn("_c_id", -col("_cand.negid"))
      .select(col(qId), col(qVec), col(tsCol), col("_c_id"))
    probeLists.join(postings, Seq("_c_id"))
      .filter(col("member_id") =!= col(qId))
      .withColumn("_negc", -Similarity.cosine(col(qVec), col("v")))
      .groupBy(col(qId), window(col(tsCol), windowDur))
      .agg(slice(array_sort(collect_set(
          struct(col("_negc"), col("member_id").as("_nid")))), 1, k).as("_top"))
      .select(col(qId), explode(col("_top")).as("_t"))
      .select(col(qId), col("_t._nid").as("vec_id"),
        (-col("_t._negc")).as("cosine"))
  }

  /** Graph-ANN serving from a PERSISTED [[graft.ext.GraphAnn.graphIndex]]
    * — the round-18 symmetry to [[ivfIndexScoreStream]]: the k-NN graph
    * is built (and [[graft.ext.GraphAnn.graphInsertIndex]]-grown)
    * OFFLINE; the stream pins the frozen UNDIRECTED edge list and the
    * corpus vector table once, and per micro-batch each arriving probe
    * id expands its one- and two-hop neighborhood through two
    * stream-static joins, exact-cosine reranks, and keeps the windowed
    * top-k. With graph degree g the candidate set is ≤ g + g² per probe
    * — per-probe serving cost is independent of corpus size, and the
    * corpus is never re-scanned or re-built by the stream.
    *
    * Results are BIT-IDENTICAL to batch [[graft.ext.GraphAnn
    * .graphSearch]] at `ef = 0` over the same probes (asserted in
    * StreamingSpec): candidates duplicated across the two hops collapse
    * inside `collect_set` (same pair ⇒ same deterministic cosine ⇒ one
    * struct), and the (−cosine, id) sort is the batch window's
    * (cosine DESC, id ASC) order exactly. State is the one windowed
    * per-probe top-k aggregate, watermark-bounded.
    */
  def graphSearchStream(
      probes: DataFrame, corpus: DataFrame, index: DataFrame,
      id: String = "vec_id", vec: String = "embedding",
      qId: String = "q_id", tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour",
      k: Int = 10): DataFrame = {
    import graft.ext.{GraphAnn, Similarity}
    require(k >= 1, s"k must be >= 1, got $k")
    val edges = GraphAnn.graphIndexEdges(index)
    val und = edges.select(col("vec_id").as("_node"), col("nb_id").as("_nb"))
      .union(edges.select(col("nb_id").as("_node"), col("vec_id").as("_nb")))
      .distinct()
      .localCheckpoint(true) // pinned once; both hops join it per batch
    val vecs = corpus.select(col(id).cast("long").as("_id"), col(vec).as("_v"))
      .localCheckpoint(true) // probe-vec AND candidate-vec joins
    val q = probes.withWatermark(tsCol, watermark)
      .select(col(qId).cast("long").as("_q"), col(tsCol))
    val hop1 = q.join(und.select(col("_node").as("_q"), col("_nb")), Seq("_q"))
    val hop2 = hop1.select(col("_q"), col(tsCol), col("_nb").as("_mid"))
      .join(und.select(col("_node").as("_mid"), col("_nb")), Seq("_mid"))
      .select(col("_q"), col(tsCol), col("_nb"))
    val cand = hop1.select(col("_q"), col(tsCol), col("_nb"))
      .union(hop2)
      .where(col("_nb") =!= col("_q"))
    cand
      .join(vecs.select(col("_id").as("_q"), col("_v").as("_qv")), Seq("_q"))
      .join(vecs.select(col("_id").as("_nb"), col("_v").as("_nv")), Seq("_nb"))
      .withColumn("_negc", -Similarity.cosine(col("_qv"), col("_nv")))
      .groupBy(col("_q"), window(col(tsCol), windowDur))
      .agg(slice(array_sort(collect_set(
          struct(col("_negc"), col("_nb").as("_nid")))), 1, k).as("_top"))
      .select(col("_q").as(qId), explode(col("_top")).as("_t"))
      .select(col(qId), col("_t._nid").as("vec_id"),
        (-col("_t._negc")).as("sim"))
  }

  /** Streaming twin of [[graft.ext.UrlOps.urlDedup]]: canonicalize the
    * URL at the ingest edge — the SAME stateless
    * [[graft.ext.UrlOps.canonicalizeUrl]] Column expression batch uses,
    * so a crawl variant (tracking params, case, default ports, trailing
    * slashes) can never dodge the dedup key in one mode and not the
    * other — then suppress repeats of the canonical key within the
    * watermark horizon. Keeps the FIRST arrival (batch keeps min-id;
    * streaming cannot keep "last"). An optional static seen-URL index
    * anti-joins BEFORE the stateful dedup (the
    * [[incrementalIntakeStream]] contract): already-crawled URLs never
    * enter the state, which stays proportional to novel URLs inside one
    * horizon — the recrawl-suppression shape for a continuous fetcher.
    */
  def urlDedupStream(
      docs: DataFrame, urlCol: String = "url", tsCol: String = "ingest_ts",
      watermark: String = "1 hour",
      seenUrls: Option[DataFrame] = None): DataFrame = {
    val canon = docs.withColumn("canonical_url",
      graft.ext.UrlOps.canonicalizeUrl(col(urlCol)))
    val novel = seenUrls.fold(canon) { seen =>
      canon.join(
        seen.select(graft.ext.UrlOps.canonicalizeUrl(col(urlCol))
          .as("canonical_url")).distinct(),
        Seq("canonical_url"), "left_anti")
    }
    novel
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("canonical_url"))
  }

  /** Streaming twin of [[graft.ext.CorpusIO.readJsonl]]: watch a corpus
    * directory for new JSONL shards (the drop-dir ingest every crawl
    * delivery lands in). Same contract as batch — EXPLICIT schema
    * (inference would re-scan history on every trigger, and a streaming
    * read REQUIRES a schema anyway, which is the batch rule made
    * mandatory), corrupt lines routed to `_corrupt_record` instead of
    * failing the stream, `maxFilesPerTrigger` bounding each micro-batch
    * so one bulk delivery cannot starve the trigger loop. Batch and
    * stream parse the SAME lines to the SAME rows (StreamingSpec pins
    * it on a shared directory, corrupt shard included).
    */
  def jsonlIngestStream(
      spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Streaming twin of [[graft.ext.DimReduction.pcaScoresK]]: a
    * batch-trained PCA basis scores arriving embeddings at the ingest
    * edge. The frozen-artifact contract of the tokenizer / vocab-gate /
    * classifier / ANN-index twins applied to the projection basis: mean
    * and components ride the plan as integer literals, the projection is
    * STATELESS exact integer arithmetic — stream scores are
    * BIT-IDENTICAL to batch by construction (StreamingSpec pins it).
    */
  def pcaScoreStream(
      embs: DataFrame, id: String, vec: String,
      model: graft.ext.DimReduction.PcaKModel): DataFrame =
    graft.ext.DimReduction.pcaScoresK(embs, id, vec, model)

  /** Rollup-informed quality gate at the ingest edge (r10 verdict task
    * 9): a batch-computed [[graft.ext.UrlOps.domainRollup]] frame —
    * per-domain doc counts / distinct URLs / total characters over the
    * corpus so far — is a STATIC broadcast side enriching every arriving
    * document with its domain's standing, and the gate flags documents
    * from unknown or thin domains. The frozen-artifact contract the
    * tokenizer / classifier / ANN-index twins follow, applied to the
    * crawl-health rollup: the ROLLUP cannot stream (it is a corpus
    * aggregate), frozen enrichment can. Stateless (a stream-static
    * broadcast join, no watermark needed); re-deploy with a fresh rollup
    * on whatever cadence the corpus refreshes.
    *
    * Emits the input columns plus `domain`, `domain_docs` (NULL for a
    * domain the rollup has never seen), `domain_avg_chars`, and
    * `admitted` — true when the domain has at least `minDocs` documents
    * averaging at least `minAvgChars` characters. Unknown domains are
    * NOT admitted (a brand-new domain has no quality record; route it
    * to a bootstrap queue instead of the main corpus).
    */
  def domainQualityGateStream(
      docs: DataFrame, rollup: DataFrame,
      minDocs: Long = 1L, minAvgChars: Double = 0.0,
      urlCol: String = "url"): DataFrame = {
    require(minDocs >= 0 && minAvgChars >= 0, "thresholds must be >= 0")
    val avg = col("_rt").cast("double") / col("domain_docs").cast("double")
    docs
      .withColumn("domain", graft.ext.UrlOps.registeredDomain(
        graft.ext.UrlOps.urlHost(col(urlCol))))
      .join(broadcast(rollup.select(col("domain"),
        col("n_docs").as("domain_docs"), col("total_chars").as("_rt"))),
        Seq("domain"), "left")
      .withColumn("domain_avg_chars", avg)
      .withColumn("admitted",
        coalesce(col("domain_docs") >= minDocs, lit(false)) &&
          coalesce(avg >= minAvgChars, lit(false)))
      .drop("_rt")
  }

  /** Streaming twin of [[graft.ext.ImportanceResampling.dsirScores]]: a
    * batch-trained Δ table (the frozen DSIR artifact — per-bucket
    * quantized log-likelihood ratios, ≤ dims rows) scores arriving
    * documents at the ingest edge. The frozen-artifact contract again:
    * the MODELS cannot stream (bucket counts are corpus statistics),
    * frozen scoring can. Features explode per document, join the
    * BROADCAST Δ (stream-static, stateless), and the per-document score
    * is one windowed integer sum — exactly Σ_b c_b·Δq_b, so stream
    * scores are BIT-IDENTICAL to batch for the same document
    * (Σ over occurrences of Δq = Σ over buckets of c·Δq; exact longs
    * commute). Documents with no Δ-covered features emit no row (the
    * batch scorer's no-feature treatment).
    */
  def dsirScoreStream(
      docs: DataFrame, delta: DataFrame, dims: Int,
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .where(col(textCol).isNotNull)
      .select(col(idCol), col(tsCol),
        explode(graft.ext.ImportanceResampling.featureArray(col(textCol)))
          .as("_f"))
      .where(col("_f") =!= "")
      .withColumn("bucket",
        graft.ext.QualityClassifier.bucketOf(col("_f"), dims))
      .join(broadcast(delta), "bucket")
      .groupBy(col(idCol), window(col(tsCol), windowDur))
      .agg(sum(col("_dq")).as("dsir_scoreq"))
      .select(col(idCol), col("dsir_scoreq"))

  /** Streaming edge filter against a FROZEN corpus LSH index
    * ([[graft.ext.Dedup.minhashBucketIndex]], built batch-side): an
    * arriving document that shares any MinHash band bucket with the
    * accepted corpus is flagged with its corpus representative — the
    * "known near-dup, drop before paying storage" gate of
    * [[graft.ext.Dedup.incrementalMinhash]]'s corpus-collision
    * component. Batch-peer screening (first-arrival-wins within the
    * stream) is batch's job at admission time — two chained stateful
    * aggregations would leave append mode's plan set (documented
    * divergence, same class as the budget twins).
    *
    * Plan: per-row band buckets (the streaming-safe signature form,
    * bit-identical to batch — see [[graft.ext.Dedup.withRowBandBuckets]]),
    * explode over `bands` buckets, INNER join the broadcast index
    * (stream-static, stateless — clean documents simply emit nothing),
    * one windowed min aggregate. State: one row per COLLIDING document
    * per open window, watermark-bounded.
    */
  def corpusDupStream(
      docs: DataFrame, bucketIndex: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour",
      bands: Int = graft.ext.Dedup.MinhashBands,
      rowsPerBand: Int = graft.ext.Dedup.MinhashRowsPerBand): DataFrame =
    // bands/rowsPerBand MUST match the parameters the index was built
    // with ([[graft.ext.Dedup.minhashBucketIndex]]) — mismatched banding
    // silently produces no collisions (near-dups admitted), so they are
    // surfaced here rather than hardcoded to the defaults.
    graft.ext.Dedup.withRowBandBuckets(
        docs.withWatermark(tsCol, watermark)
          .where(col(textCol).isNotNull)
          .select(col(idCol), col(tsCol), col(textCol)),
        textCol, "_buckets", bands, rowsPerBand)
      .select(col(idCol), col(tsCol), explode(col("_buckets")).as("bucket"))
      .join(broadcast(bucketIndex), "bucket")
      .groupBy(col(idCol), window(col(tsCol), windowDur))
      .agg(min(col("rep_id")).as("rep_id"))
      .select(col(idCol), col("rep_id"))

  /** Streaming twin of [[graft.ext.Dedup.incrementalSemDedup]]'s
    * corpus screen: semantic near-dup detection at the embedding-ingest
    * edge against a FROZEN [[graft.ext.Dedup.semDedupIndex]]. The frozen
    * quantizer is read once at plan-build time (bounded ≤64-row collect
    * on the BATCH index frame — never the stream), each arriving vector
    * assigns via the native argmax kernel (stateless projection),
    * unit-normalizes, and broadcast-joins its cluster's corpus members
    * with the float-dot ≥ eps verify; the windowed min collapses
    * multi-member hits to the smallest corpus rep. Emits one row per
    * arriving vector that collides with the corpus (the admission
    * filter's drop list); batch-peer screening stays a batch concern —
    * in a streaming admission the corpus index is re-frozen per
    * accepted batch, exactly like [[corpusDupStream]].
    */
  def semDedupStream(
      vecs: DataFrame, index: DataFrame, eps: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    val cents = graft.ext.Dedup.semIndexCentroids(index)
    require(cents.nonEmpty, "index has no centroid rows")
    val members = graft.ext.Dedup.semIndexMembers(index)
    val assigned = graft.ext.Similarity.assignToCentroids(
        vecs.withWatermark(tsCol, watermark)
          .where(col(vecCol).isNotNull)
          .select(col(idCol), col(tsCol), col(vecCol)),
        vecCol, cents)
      .withColumn("_n", graft.ext.Similarity.l2Norm(col(vecCol)))
      .select(col(idCol), col(tsCol), col("_c_id"),
        transform(col(vecCol), x => x.cast("double") / col("_n"))
          .cast("array<float>").as("_bu"))
    assigned.join(broadcast(members), Seq("_c_id"))
      .filter(graft.functions.VectorFunctions.float_vector_dot(
        col("_bu"), col("_mu")) >= eps)
      .groupBy(col(idCol), window(col(tsCol), windowDur))
      .agg(min(col("_mid")).as("rep_id"))
      .select(col(idCol), col("rep_id"))
  }

  /** Streaming twin of [[graft.ext.TextAnalysis.blocklistScreen]]: the
    * C4/UT1 banned-word gate at the ingest edge. The batch operator is
    * already stream-safe — the blocklist compiles to one codegen'd
    * regex, pure per-row projection, no join/state/watermark, valid in
    * append mode — so, like [[enrichStream]], this alias PINS that
    * contract with a batch-parity test: a refactor that turned the
    * screen into a stateful join would fail a test, not a deployment.
    */
  /** Streaming twin of [[graft.ext.ImageHash.imageHashes]]: perceptual
    * hashing at the media-ingest edge — decode + dHash/aHash/pHash as a
    * stateless per-row `mapPartitions` projection (no join, no state,
    * no watermark, valid in append mode), so an arriving image can be
    * screened against a frozen corpus dHash index with
    * [[corpusDupStream]]'s broadcast-join shape before paying storage.
    * Like [[enrichStream]]/[[blocklistStream]], the alias PINS the
    * stateless contract with a StreamingSpec batch-parity test.
    */
  def imageHashStream(
      spark: org.apache.spark.sql.SparkSession, media: DataFrame): DataFrame =
    graft.ext.ImageHash.imageHashes(spark, media)

  /** Streaming twin of [[graft.ext.AudioFingerprint.audioFingerprints]]:
    * the 56-bit perceptual fingerprint at the media-ingest edge — decode
    * + integer DFT as a stateless per-row `mapPartitions` projection
    * (no join, no state, no watermark, valid in append mode), so an
    * arriving clip can be screened against a frozen corpus bucket index
    * ([[graft.ext.AudioFingerprint.audioBucketIndex]]) with the
    * broadcast-join shape before paying storage (spec: parity AND the
    * index screen).
    */
  def audioFingerprintStream(
      spark: org.apache.spark.sql.SparkSession, media: DataFrame): DataFrame =
    graft.ext.AudioFingerprint.audioFingerprints(spark, media)

  /** Streaming twin of
    * [[graft.ext.VideoFingerprint.videoKeyframeHashes]]: per-keyframe
    * perceptual hashing at the media-ingest edge — container walk +
    * decode + hash as a stateless per-row flatMap projection (≤
    * maxKeyframes small rows out per video, append-mode valid), the
    * front half of an edge screen against a frozen
    * [[graft.ext.VideoFingerprint.videoBucketIndex]].
    */
  def videoKeyframeHashStream(
      spark: org.apache.spark.sql.SparkSession, media: DataFrame,
      maxKeyframes: Int = 8): DataFrame =
    graft.ext.VideoFingerprint.videoKeyframeHashes(spark, media, maxKeyframes)

  def blocklistStream(
      docs: DataFrame, blocklist: Seq[String],
      maxBannedPerMille: Long = 0, textCol: String = "text"): DataFrame =
    graft.ext.TextAnalysis.blocklistScreen(
      docs, textCol, blocklist, maxBannedPerMille)

  /** Streaming twin of [[graft.functions.CharEntropyQ]]: the
    * DGA/gibberish entropy screen at the ingest edge — a stateless
    * per-row native-expression projection (no join, no state, no
    * watermark, valid in append mode), bit-identical to batch because
    * the expression is pure integer math against the frozen log2 table.
    */
  def charEntropyStream(
      docs: DataFrame, maxChars: Int = 256,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      least(length(col(textCol)), lit(maxChars)).cast("long").as("n_chars"),
      graft.functions.CharEntropyFunctions
        .char_entropy_q(col(textCol), maxChars).as("ent_q"))

  case class GapEvent(key: String, timestamp: java.sql.Timestamp, event_id: Long)
  case class GapState(lastTsMillis: Long)

  case class TemplateEvent(
      template: String, timestamp: java.sql.Timestamp, event_id: Long,
      message: String)

  /** Live novel-template alerting — the streaming twin of
    * [[graft.ext.LogTemplates.novelTemplates]]: every template emits
    * EXACTLY ONE alert row, at its first arrival, carrying the raw
    * message that introduced it (the "this system just started saying
    * something new" page). Input rows must carry a pre-masked
    * `template` column ([[graft.ext.LogTemplates.templateOf]] — a
    * stateless map-side projection on the way in), plus `timestamp`,
    * `event_id`, `message`.
    *
    * State is one boolean per DISTINCT TEMPLATE — bounded by the
    * emitting software's format-string count (10²–10⁴), NOT the event
    * volume, so it never needs a TTL: dropping a template's state
    * would re-alert on a pattern that isn't new. Batch parity: the
    * emitted template SET equals the batch distinct-template set
    * (spec-asserted); the representative row is the first ARRIVAL,
    * which over an event-time-ordered replay is the batch min-ts row.
    */
  def novelTemplateStream(events: DataFrame): Dataset[TemplateEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("template", "timestamp", "event_id", "message")
      .as[TemplateEvent]
      .groupByKey(_.template)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (template: String, rows: Iterator[TemplateEvent],
            state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // first arrival in (event-time, id) order within the batch
            Iterator.single(rows.minBy(e => (e.timestamp.getTime, e.event_id)))
          }
        })
  }
  case class GapRow(key: String, timestamp: java.sql.Timestamp,
      event_id: Long, gap: Long)

  /** Per-key inter-arrival gap extraction at the edge: 8-byte state per
    * key (the last event time), evicted `stateTtlMinutes` past the last
    * event — the stateful half of the streaming beacon detector. Each
    * event emits its gap (ms) to the key's previous event; a key's first
    * event emits nothing. Within a micro-batch rows sort by
    * (time, event_id) like the batch window; across micro-batches gaps
    * follow arrival order bounded by the watermark — the standard
    * streaming-sequence caveat, parity-tested on in-order arrival.
    */
  def gapStream(
      spark: SparkSession, events: DataFrame,
      stateTtlMinutes: Int = 1440, watermark: String = "1 hour"): Dataset[GapRow] = {
    import spark.implicits._
    val ttlMillis = stateTtlMinutes * 60000L
    events
      .withWatermark("timestamp", watermark)
      .selectExpr("key", "timestamp", "event_id")
      .as[GapEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[GapEvent], state: GroupState[GapState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var last = state.getOption.map(_.lastTsMillis).getOrElse(Long.MinValue)
            val out = rows.toSeq
              .sortBy(e => (e.timestamp.getTime, e.event_id))
              .flatMap { e =>
                val t = e.timestamp.getTime
                val gap = if (last == Long.MinValue) None else Some(t - last)
                last = t
                gap.map(g => GapRow(key, e.timestamp, e.event_id, g))
              }
            state.update(GapState(last))
            state.setTimeoutTimestamp(
              math.max(last + ttlMillis, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
        })
  }

  /** The windowed streaming beacon detector as ONE stateful operator
    * (chaining [[gapStream]] into an aggregate trips Spark's
    * global-watermark correctness check — two stateful ops in sequence
    * can silently drop late rows; this shape has no second operator to
    * drop them): per (key, event-time window), collect the sorted event
    * times and derive the gap moments IN the aggregated row — Σg
    * telescopes to t_last − t_first, Σg² is a DECIMAL(38) fold over
    * adjacent differences — then apply the SAME
    * [[graft.etl.Anomaly.withCvColumns]] expression tree batch uses, so
    * a window's cv_q is bit-identical to batch over the same gaps. CV
    * is scale-invariant, so ms gaps here and µs gaps in batch flag the
    * same timers. State per (key, window) is the event-time list —
    * bounded by the key's window volume; for hyperactive keys prefer
    * [[gapStream]] (8-byte state) into a sink and aggregate the gaps
    * downstream.
    */
  def beaconScoreStream(
      events: DataFrame,
      windowDur: String = "1 day", watermark: String = "1 hour",
      minGaps: Int = 5, cvThresholdQ: Long = 300000L): DataFrame = {
    // match the batch contract (graft.etl.Anomaly.beaconScores): with
    // minGaps <= 1 the size filter would admit single-event windows,
    // making n_gaps 0 and mean_gap a 0/0 NaN
    require(minGaps >= 2, s"minGaps must be >= 2, got $minGaps")
    val agged = events
      .withWatermark("timestamp", watermark)
      .select(col("key"), col("timestamp"),
        unix_millis(col("timestamp")).as("_ms"), col("event_id"))
      .groupBy(col("key"), window(col("timestamp"), windowDur))
      .agg(sort_array(collect_list(struct(col("_ms"), col("event_id"))))
        .as("_evs"))
      .withColumn("_ts", expr("transform(_evs, e -> e._ms)"))
      .where(size(col("_ts")) >= minGaps + 1)
      .withColumn("n_gaps", (size(col("_ts")) - 1).cast("long"))
      .withColumn("gsum",
        element_at(col("_ts"), -1) - element_at(col("_ts"), 1))
      .withColumn("gsumsq", expr(
        """aggregate(sequence(2, size(_ts)), CAST(0 AS DECIMAL(38,0)),
           (acc, i) -> acc + CAST((_ts[i-1] - _ts[i-2]) AS DECIMAL(19,0))
                             * (_ts[i-1] - _ts[i-2]))"""))
      .drop("_evs", "_ts")
    graft.etl.Anomaly.withCvColumns(agged, cvThresholdQ)
  }

  /** Streaming KMV distinct estimation per event-time window
    * ([[graft.ext.Sketches.KmvAgg]]): the k smallest distinct key hashes
    * accumulate in O(k) bounded state per window, and because the
    * reduce/merge is an order-insensitive capped set-union, the emitted
    * sketch — and therefore the exact-integer estimate — is
    * BIT-IDENTICAL to the batch [[graft.ext.Sketches.kmvSketch]] over
    * the same rows, no matter how micro-batches sliced the stream
    * (StreamingSpec proves it against a shuffled two-batch arrival).
    * This is the cardinality dashboard at the ingest edge without a
    * distinct-shuffle of raw keys.
    */
  def kmvDistinctStream(
      events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ingest_ts", windowDur: String = "1 hour",
      watermark: String = "1 hour", k: Int = 64,
      salt: String = "graft:kmv"): DataFrame = {
    val mins = graft.ext.Sketches.kmvMins(k)
    val withEst = events
      .withWatermark(tsCol, watermark)
      .where(col(keyCol).isNotNull)
      .select(col(tsCol), graft.ext.Sketches.kmvHash(col(keyCol), salt).as("_h"))
      .groupBy(window(col(tsCol), windowDur))
      .agg(mins(col("_h")).as("_mins"))
    val (nSk, est) = graft.ext.Sketches.kmvEstFromMins(col("_mins"), k)
    withEst.select(col("window"), nSk.as("n_sk"), est.as("est"))
  }

  /** Streaming twin of [[graft.etl.Anomaly.markovPathScores]]' scoring
    * half: per-transition surprise against a FROZEN transition model
    * ([[graft.etl.Anomaly.markovModel]], trained batch-side — transition
    * MLE is a corpus-global statistic, the frozen-artifact contract
    * every trained operator's twin follows). The (from, to) pair is
    * expected on the row (produced upstream by whatever session state
    * tracks the previous event); scoring itself is a stateless broadcast
    * join emitting the SAME floor(ln(p)·10⁶) integer batch computes.
    * Transitions absent from the model emit no row (OOV drops at the
    * join, exactly as in batch).
    */
  def transitionSurpriseStream(
      steps: DataFrame, model: DataFrame,
      fromCol: String = "from_type", toCol: String = "to_type"): DataFrame =
    steps
      .withColumnRenamed(fromCol, "_a")
      .withColumnRenamed(toCol, "_b")
      .join(broadcast(model), Seq("_a", "_b"))
      .withColumn("surprise_q", graft.etl.Anomaly.stepSurpriseQ)
      .withColumnRenamed("_a", fromCol)
      .withColumnRenamed("_b", toCol)
      .drop("n_ab", "n_a")

  /** Streaming twin of [[graft.ext.Relevance.knScoreFrozen]]: CCNet-style
    * LM quality scoring at the ingest edge against a FROZEN
    * [[graft.ext.Relevance.knLmModel]] bigram lexicon (trained
    * batch-side — KN statistics are corpus-global and cannot stream).
    * Bigrams explode per document, join the BROADCAST lexicon
    * (stream-static, stateless), and the quantized log-probs are one
    * windowed integer-sum aggregate — so a document's score is
    * BIT-IDENTICAL to the batch frozen scorer's (exact long sums
    * commute; the final division is the same two-long expression).
    * OOV bigrams drop at the join exactly as in batch; documents with
    * no in-vocab bigram emit no row.
    */
  def knScoreStream(
      docs: DataFrame, model: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .where(col(textCol).isNotNull)
      .select(col(idCol), col(tsCol),
        explode(graft.ext.TextAnalysis.wordNgrams(col(textCol), 2))
          .as("_gram"))
      .join(broadcast(model), Seq("_gram"))
      .groupBy(col(idCol), window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_lpq")).as("_sq"))
      .select(col(idCol), col("n_bigrams"),
        (col("_sq").cast("double") /
          (col("n_bigrams") * lit(1000000L)).cast("double"))
          .as("lm_score_frozen"))

  /** CCNet bucket gate at the ingest edge: [[knScoreStream]]'s frozen-
    * lexicon scoring plus a FROZEN when-chain of per-bucket score
    * cutoffs ([[graft.ext.Relevance.bucketCutoffs]], computed batch-side
    * over the corpus' bucket assignment). The micro-quantized score is
    * the same `round(score · 10⁶)` expression both sides evaluate on a
    * bit-identical double, so an arriving document lands in EXACTLY the
    * bucket batch would give it for every score value the corpus
    * contained (parity spec-asserted); genuinely novel scores
    * interpolate deterministically — first bucket whose cutoff they
    * meet, else the fallback (worst) label.
    */
  def ccnetBucketStream(
      docs: DataFrame, model: DataFrame,
      cutoffs: Seq[(String, Long)], fallback: String = "tail",
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    val scoreQ = round(col("lm_score_frozen") * 1000000L, 0).cast("long")
    knScoreStream(docs, model, idCol, textCol, tsCol, windowDur, watermark)
      .withColumn("scoreq", scoreQ)
      .withColumn("bucket",
        graft.ext.Relevance.bucketExpr(col("scoreq"), cutoffs, fallback))
      .select(col(idCol), col("scoreq"), col("bucket"))
  }

  /** Streaming twin of [[graft.ext.LangId.score]]: language-id at the
    * ingest edge against a FROZEN [[graft.ext.LangId.LangIdModel]]
    * (trained batch-side — the frozen-artifact contract every trained
    * operator's twin follows; NB training is a corpus-global statistic
    * and cannot stream). Char-trigram buckets explode per document,
    * join the BROADCAST dims-row model grid (stream-static, stateless),
    * and the per-language scores are one windowed integer-sum
    * aggregate; the integer argmax select is the SAME expression as
    * batch, so a document's prediction is BIT-IDENTICAL to the batch
    * scorer's (exact long sums commute). Documents with no grams emit
    * no row (the batch no-evidence treatment).
    */
  def langIdStream(
      docs: DataFrame, model: graft.ext.LangId.LangIdModel,
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    val spark = docs.sparkSession
    val grams = graft.ext.LangId.bucketedGrams(
      docs.withWatermark(tsCol, watermark), Seq(idCol, tsCol), textCol, model)
    val sums = grams
      .join(broadcast(graft.ext.LangId.modelFrame(spark, model)), Seq("_b"))
      .groupBy(col(idCol), window(col(tsCol), windowDur))
      .agg(graft.ext.LangId.sumCols(model).head,
        graft.ext.LangId.sumCols(model).tail: _*)
    val (lang, score, margin) = graft.ext.LangId.argmaxExpr(model)
    sums.select(col(idCol), lang, score, margin)
  }

  /** Streaming twin of [[graft.ext.CorpusStats.embeddingDrift]]: each
    * event-time window's mean-pooled centroid scored by cosine against a
    * FROZEN baseline centroid ([[graft.ext.CorpusStats.meanVector]],
    * trained batch-side) — the representation-drift alarm at the ingest
    * edge ("this hour's documents no longer embed like the corpus").
    *
    * ONE windowed aggregation (append mode's supported-plan set): the
    * per-dim decimal sums ride as `dims` columns of the same aggregate
    * (exact, order-independent — the batch treatment), and the cosine
    * against the baseline literal is a fixed left-to-right expression
    * over them, so a window's drift equals the batch operator run on
    * that window's rows. `dims` stays bounded (64 here); past ~100
    * columns the wide-aggregate codegen lesson applies — reduce first.
    *
    * Shape contract (advice r12): under ANSI mode a vector shorter than
    * `dims` would throw INVALID_ARRAY_INDEX inside the aggregate and
    * kill the query, and a NULL element would be skipped by `sum` while
    * `_n` still counts the row — silently diverging from the batch
    * twin. [[graft.ext.DimReduction.vecShapeGuard]] runs before the
    * windowed aggregate, so a malformed vector fails the batch FAST
    * with a named error instead of either failure mode.
    */
  def embeddingDriftStream(
      embs: DataFrame, baseline: Array[Double], dims: Int,
      vecCol: String = "embedding", tsCol: String = "ingest_ts",
      windowDur: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    require(dims >= 1 && baseline.length == dims,
      s"baseline must carry $dims dims, got ${baseline.length}")
    val sums = (0 until dims).map { i =>
      sum(element_at(col(vecCol), i + 1).cast("double")
        .cast("decimal(20,10)")).as(s"_s$i")
    }
    val agg = embs
      .withWatermark(tsCol, watermark)
      .where(col(vecCol).isNotNull)
      .where(graft.ext.DimReduction.vecShapeGuard(
        "embeddingDriftStream", vecCol, dims))
      .groupBy(window(col(tsCol), windowDur))
      .agg(sums.head, (sums.tail :+ count(lit(1)).as("_n")): _*)
    val mean = (i: Int) => col(s"_s$i").cast("double") / col("_n").cast("double")
    val dot = (0 until dims).map(i => mean(i) * lit(baseline(i)))
      .reduceLeft(_ + _)
    val nm = sqrt((0 until dims).map(i => mean(i) * mean(i)).reduceLeft(_ + _))
    val nb = math.sqrt(baseline.map(x => x * x).sum)
    agg.select(col("window.start").as("window_start"),
      col("_n").as("n"),
      round(dot / (nm * lit(nb)), 4).as("centroid_cosine"))
  }

  case class BudgetDoc(doc_id: Long, url: String, ingest_ts: java.sql.Timestamp)
  case class BudgetAdmission(doc_id: Long, domain: String, admitted_rank: Long)

  /** Streaming admission control for [[graft.ext.UrlOps.domainBudget]]'s
    * contract: admit at most `budget` documents per registered domain.
    * Batch ranks the finished corpus best-first; an unbounded stream
    * cannot rank what hasn't arrived, so the streaming contract is
    * FIRST-`budget`-arrivals-win (documented divergence, same as the
    * keep-first dedup twins) with arrival order made deterministic
    * within a micro-batch by (ingest_ts, doc_id).
    *
    * State per domain is ONE long (the admitted count) — bounded by
    * domain cardinality, not corpus size, and evicted
    * `stateTtlMinutes` past the domain's last arrival so dormant
    * domains don't pin store space (a returning domain's budget
    * resets with its eviction — the per-horizon recrawl allowance).
    */
  def domainBudgetStream(
      spark: SparkSession, docs: DataFrame, budget: Int,
      stateTtlMinutes: Int = 120, watermark: String = "1 hour"): Dataset[BudgetAdmission] =
    budgetAdmit(spark,
      docs.withColumn("_domain", graft.ext.UrlOps.registeredDomain(
          graft.ext.UrlOps.urlHost(col("url"))))
        .withWatermark("ingest_ts", watermark),
      budget, stateTtlMinutes)

  /** The admission core shared by [[domainBudgetStream]] and
    * [[curateCrawlStream]]: expects `_domain`, `doc_id`, `url`, and a
    * WATERMARKED `ingest_ts`.
    */
  private def budgetAdmit(
      spark: SparkSession, docs: DataFrame, budget: Int,
      stateTtlMinutes: Int): Dataset[BudgetAdmission] = {
    import spark.implicits._
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val ttlMillis = stateTtlMinutes * 60000L
    docs
      // the watermarked attribute must stay TOP-LEVEL for the streaming
      // checker — packing it into a struct hides it from the timeout
      // validation
      .select(col("_domain").as("_1"), col("doc_id").as("_2"),
        col("url").as("_3"), col("ingest_ts").as("_4"))
      .as[(String, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (domain: String, rows: Iterator[(String, Long, String, java.sql.Timestamp)],
            state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var admitted = state.getOption.getOrElse(0L)
            var lastTs = 0L
            val out = rows.map(r => BudgetDoc(r._2, r._3, r._4)).toSeq
              .sortBy(d => (d.ingest_ts.getTime, d.doc_id))
              .flatMap { d =>
                lastTs = math.max(lastTs, d.ingest_ts.getTime)
                if (admitted < budget) {
                  admitted += 1
                  Some(BudgetAdmission(d.doc_id, domain, admitted))
                } else None
              }
            state.update(admitted)
            state.setTimeoutTimestamp(
              math.max(lastTs + ttlMillis, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
        })
  }

  /** Streaming twin of [[graft.ext.CorpusPipeline.curateCrawl]]: the
    * crawl-curation pass at the ingest edge, staged exactly like batch —
    * parse ONCE (canonical/domain/path in one stateless projection),
    * policy when-chain filter (stateless, rides the scan), canonical-key
    * dedup within the watermark (so a variant of an admitted URL never
    * consumes budget), then per-domain first-N admission. Batch keeps
    * best-by-score; the stream admits first arrivals — the documented
    * divergence every budget/dedup twin shares. State: md5-keyed dedup
    * entries + one counter per domain, both horizon-bounded.
    */
  def curateCrawlStream(
      spark: SparkSession, docs: DataFrame,
      rules: Seq[graft.ext.UrlOps.UrlRule], budget: Int,
      stateTtlMinutes: Int = 120, watermark: String = "1 hour"): Dataset[BudgetAdmission] = {
    val parsed = docs
      .withColumn("canonical_url",
        graft.ext.UrlOps.canonicalizeUrl(col("url")))
      .withColumn("_domain", graft.ext.UrlOps.registeredDomain(
        graft.ext.UrlOps.urlHost(col("url"))))
      .withColumn("_path", graft.ext.UrlOps.urlPath(col("url")))
    val allowed = graft.ext.UrlOps.applyUrlPolicyOn(
        parsed, col("_domain"), col("_path"), rules)
      .filter(col("allowed")).drop("allowed", "matched_rule", "_path")
    val deduped = allowed
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("canonical_url"))
    budgetAdmit(spark, deduped, budget, stateTtlMinutes)
  }
}

/** JVM-wide memo for the streaming BPE merge replay: each distinct word
  * is replayed ONCE per executor JVM (across tasks AND micro-batches),
  * not once per token occurrence — the same repetition-factor saving the
  * batch encoder gets from its distinct-word dictionary join, without a
  * second streaming aggregation (advice r10). Natural-language word
  * frequency is Zipfian, so a bounded cache absorbs nearly every lookup;
  * on overflow (an adversarial unique-token flood) it clears —
  * correctness never depends on a hit. Values are boxed so a missing key
  * is a NULL, never confusable with a real count.
  */
private[streaming] object BpeEncodeMemo {
  private val MaxEntries = 1 << 20
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Integer]()

  def subwordCount(mergesKey: String, w: String, pairs: Seq[(String, String)]): Int = {
    val k = (mergesKey, w)
    val hit = memo.get(k)
    if (hit ne null) hit.intValue()
    else {
      val n = graft.ext.BpeTrainer.encodeWord(w, pairs).length
      if (memo.size >= MaxEntries) memo.clear()
      memo.put(k, Integer.valueOf(n))
      n
    }
  }
}
