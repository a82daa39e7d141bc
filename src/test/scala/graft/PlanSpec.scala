package graft

/** Physical-plan audits: the properties that matter at 100 TB, asserted on
  * the actual Catalyst output (SURVEY.md §4). These run `.explain` only —
  * no jobs execute.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("filters are pushed into the parquet scan") {
    val p = planOf("q_filter_notnull")
    assert(p.contains("PushedFilters: [IsNotNull(props)]"), p.take(2000))

    val p2 = planOf("q_filter_neq")
    assert(p2.contains("IsNotNull(event_type)") &&
      p2.contains("Not(EqualTo(event_type,error))"), p2.take(2000))
  }

  test("column pruning reaches the scan: projection reads only needed columns") {
    val p = planOf("q_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("event_id") && readSchema.contains("value"))
    assert(!readSchema.contains("props") && !readSchema.contains("user_id"),
      s"scan reads more than projected: $readSchema")
  }

  test("star-schema join broadcasts the dimension tables, never shuffles the fact table") {
    val p = planOf("q_join_inner")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to sort-merge")
  }

  test("top-k compiles to TakeOrderedAndProject (distributed top-k, no global sort)") {
    val p = planOf("q_topk_values")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("flagship aggregate runs partial+final hash aggregation inside codegen") {
    val p = planOf("q1_agg")
    // partial (before the exchange) + final (after) hash aggregation
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(3000))
    // AQE finalizes the plan at runtime — execute, then audit the final
    // adaptive plan for whole-stage-codegen spans.
    val df = SparkEntry.queries("q1_agg")(spark, dir)
    df.collect() // a direct action finalizes THIS df's adaptive plan
    val finalPlan = df.queryExecution.executedPlan.toString
    // codegen'd stages print as "*(n) Operator" in the final adaptive plan
    assert(finalPlan.contains("isFinalPlan=true") && finalPlan.contains("*("),
      finalPlan.take(3000))
  }

  test("sessionization reuses ONE per-user exchange for lag + running sum") {
    // The session-id assignment needs exactly one hash partitioning by
    // user_id — lag and the running sum share it. More exchanges would mean
    // redundant shuffles of the full event stream at scale.
    val df = SparkEntry.queries("q_session_id")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 user_id exchange, found $exchanges:\n${p.take(3000)}")
  }

  test("pipeline dedup is ONE event_id-keyed window, not a wide-key pass") {
    // Keep-last dedup must compile to a single row_number window keyed on
    // event_id. A second window partitioned by every data column (the
    // reference's literal two-pass structure) would shuffle+sort ~600k-row
    // batches on the widest possible key — the dominant e2e cost at scale.
    // tree-form plan prints each Window node once; "row_number" alone
    // would also count the WindowGroupLimit partial/final pair Spark
    // pushes below the exchange (top-1-per-key before the shuffle — keep)
    val p = SparkEntry.queries("q_e2e_throughput")(spark, dir)
      .queryExecution.executedPlan.toString
    val dedupWindows = "Window \\[row_number".r.findAllIn(p).length
    assert(dedupWindows == 1,
      s"expected 1 dedup window, found $dedupWindows:\n${p.take(3000)}")
    assert(p.contains("WindowGroupLimit"),
      "rank-limit pushdown missing: dedup shuffles full duplicate groups")
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions at runtime") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString + "/fact"
    val fact = (1 to 3000).map(i => (i.toLong, s"2025-01-${i % 30 + 1}", i * 1.0))
      .toDF("event_id", "day", "value")
    graft.sources.Sources.writePartitioned(fact, dir, "day")
    // the dim must be a real source scan: a literal LocalRelation folds
    // the filter away and leaves no selective predicate for DPP to use
    val dimDir = dir.stripSuffix("/fact") + "/dim"
    (1 to 30).map(i => (s"2025-01-$i", if (i == 5) "keep" else "drop"))
      .toDF("day", "tag").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = spark.read.parquet(dir)
      .join(dim.filter(col("tag") === "keep"), "day")
    // a direct action finalizes THIS df's adaptive plan (a .count() or
    // .write builds its own QueryExecution and would leave this one cold)
    assert(joined.collect().length === 100)
    val p = joined.queryExecution.executedPlan.toString
    // the fact scan's partition filter must reference a runtime subquery
    // fed by the dim side — at 100 TB this is the difference between
    // reading one day and reading the decade
    assert(p.contains("dynamicpruning"), s"no DPP filter in plan:\n${p.take(3000)}")
  }

  test("runtime bloom filter prunes shuffle-join probe rows at the scan") {
    import org.apache.spark.sql.functions._
    // DPP's complement for NON-partition join keys: a bloom filter built
    // from the selective dim side is pushed into the fact scan as
    // might_contain, dropping non-joining rows before the shuffle. At
    // 100 TB this cuts the dominant shuffle by the dim's selectivity.
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // thresholds sized so the rule fires at test scale: creation side
      // must be under the max, and the min-scan-size gate is disabled
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val base = java.nio.file.Files.createTempDirectory("graft-bloom").toString
      spark.range(0, 200000).withColumn("payload", concat(lit("x"), col("id")))
        .write.parquet(s"$base/fact")
      spark.range(0, 5000)
        .withColumn("tag", when(col("id") % 100 === 0, "keep").otherwise("drop"))
        .write.parquet(s"$base/dim")
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim").filter(col("tag") === "keep")
      val joined = fact.join(dim, "id")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter in plan:\n${p.take(3000)}")
      assert(joined.count() === 50)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed shuffle join at runtime") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one mega-key (90% of rows) + a long tail, broadcast disabled so the
    // join must shuffle, AQE thresholds lowered to fire at test scale
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = (1 to 60000)
        .map(i => (if (i % 10 != 0) "hot" else s"u$i", s"payload-$i-${"x" * 40}"))
        .toDF("user_id", "payload")
      // exactly ONE hot build row: the probe side is skewed but the join
      // output stays linear (hot x hot would explode multiplicatively)
      val right = (1 to 2000).map(i => (if (i == 1) "hot" else s"u$i", i))
        .toDF("user_id", "score")
      val joined = left.join(right, "user_id")
      // collect() is the one action bound to THIS df's QueryExecution
      // (foreach/count/write each build their own); output is ~60k small
      // rows since only one build row is hot
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"))
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed join:\n${p.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("per-user analytics in the full pipeline share the user partitioning") {
    val df = SparkEntry.queries("q_sessionize")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // window(lag+sum) over user + session stats agg + join back: the plan
    // must not shuffle the events more than these stages require.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 4, s"too many exchanges ($exchanges):\n${p.take(3000)}")
  }

  test("native winnowing plan: explode of the expression, no window, one exchange") {
    val p = planOfText("q_doc_winnow")
    assert(p.contains("winnow_fingerprints"), p.take(2000))
    assert(!p.contains("Window"), "winnowing regressed to the per-gram window form")
    // only the groupBy(doc_id) exchange — gram rows never shuffle
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(3000))
  }

  test("PQ-ADC plan: corpus streams through a broadcast cross join, no sort-merge") {
    val p = planOfText("q_ann_pq")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), "PQ scan degraded to a shuffle join")
    // rank-limit pushdown trims ADC candidates BEFORE the qId exchange:
    // a WindowGroupLimit node in Partial mode must exist (the Final-mode
    // one alone means every candidate row crossed the shuffle unpruned)
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"no partial WindowGroupLimit before the shuffle:\n${p.take(3000)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"both re-rank windows must share one qId exchange:\n${p.take(3000)}")
  }

  test("domain budget plan: partial WindowGroupLimit prunes before the domain exchange") {
    val p = planOfText("q_domain_budget")
    assert(!p.toLowerCase.contains("join"),
      s"policy/budget must be join-free:\n${p.take(3000)}")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"budget rows crossed the shuffle unpruned:\n${p.take(3000)}")
  }

  test("weighted domain budget keeps the constant-cap WindowGroupLimit") {
    // variable per-domain budgets must NOT cost the pushdown: the rank
    // window is capped at the TABLE MAX (constant), the per-domain cut
    // is a broadcast filter on the survivors
    val p = planOfText("q_domain_budget_weighted")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"constant cap lost — rows crossed the shuffle unpruned:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"the budget table must broadcast:\n${p.take(3000)}")
  }

  test("decontamination plan: corpus never shuffles, gram joins broadcast") {
    val p = planOfText("q_decontaminate")
    assert(!p.contains("SortMergeJoin"),
      s"gram join degraded to a shuffle join:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // only the two SMALL sides may shuffle (benchmark-gram distinct and
    // contaminated-id distinct); the exploded corpus grams must not
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2,
      s"corpus gram rows crossed a shuffle:\n${p.take(3000)}")
  }

  test("sequence packing plan: one shard exchange feeding one window") {
    val p = planOfText("q_pack_sequences")
    assert(p.contains("Window"), p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"packing must shuffle exactly once, on the shard key:\n${p.take(3000)}")
  }

  test("chunking plan: one generate, zero hash exchanges") {
    val p = planOfText("q_doc_chunks")
    assert(p.contains("Generate inline"), p.take(2000))
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle:\n${p.take(3000)}")
  }

  test("hash split and upsampling are shuffle-free row-local transforms") {
    val p = planOfText("q_split_assign")
    assert(!p.contains("Exchange hashpartitioning"),
      s"split assignment must not shuffle:\n${p.take(2000)}")
    assert(!p.contains("Join"), s"split assignment must not join:\n${p.take(2000)}")
    val p2 = planOfText("q_sample_upsample")
    assert(!p2.contains("Exchange hashpartitioning"),
      s"upsampling must not shuffle:\n${p2.take(2000)}")
    assert(!p2.contains("Join"),
      s"upsampling weights must stay literal maps, not joins:\n${p2.take(2000)}")
  }

  test("PII redaction pipelines inside one codegen stage over the scan") {
    val p = planOfText("q_pii_redact")
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    // chained regexp_replace must not break whole-stage codegen
    assert(p.contains("*("), s"redaction fell out of codegen:\n${p.take(2000)}")
  }

  test("semantic decontamination: corpus anti-joins a broadcast, no shuffle") {
    val p = planOfText("q_decontaminate_semantic")
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("LeftAnti"),
      p.take(3000))
    assert(!p.contains("Exchange hashpartitioning"),
      s"the corpus side must never shuffle:\n${p.take(3000)}")
  }

  test("span dedup: span-keyed work bounded, no span crosses a shuffle twice") {
    val p = planOfText("q_dedup_spans")
    // exchanges: span-agg (partial/final), semi-join side reuse, id regroup,
    // and the final left join back to the corpus — but never more than 4
    // hash exchanges of span- or id-sized data, and the semi join must not
    // degenerate to a broadcast nested loop
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 4,
      s"span dedup shuffles more than its design:\n${p.take(3000)}")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the span-frequency aggregation does a map-side partial distinct
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(3000))
  }

  test("bigram LM score: ONE gram-sized exchange (window count, not agg+join)") {
    val p = planOfText("q_lm_score")
    // The full gram table must cross the wire EXACTLY once (the window
    // count). The aggregate+self-join form exchanged it twice — the
    // reshape this test pins (13.1s -> 8.7s at 10x sf0.1). The remaining
    // exchanges are vocab-sized (unigram agg, vocab scalar) or doc-sized
    // (final agg) — all map-side partial-aggregated first.
    assert("Exchange hashpartitioning\\(_gram".r.findAllIn(p).length == 1,
      s"gram table shuffles more than once:\n${p.take(3000)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 4,
      s"LM score shuffles more than its design:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"),
      "unigram join degraded to sort-merge (vocab should broadcast)")
  }

  test("tfidf: vocab joins broadcast; exchanges bounded by tf/df aggs + rank window") {
    val p = planOfText("q_tfidf_topterms")
    // tf agg on (id, term), df partial-distinct on term, the per-doc rank
    // window, and the N-docs scalar — every exchange is aggregate-reduced
    // before the wire; raw postings never shuffle unaggregated
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 4,
      s"tfidf shuffles more than its design:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("bm25: query-term filter cuts postings before any aggregation") {
    val p = planOfText("q_bm25")
    // the isin predicate must sit UNDER the first aggregate, so only
    // query-term postings ever shuffle
    assert(p.contains("spark") && p.contains("vector"),
      "query-term literals missing from the plan")
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 6,
      s"bm25 shuffles more than its design:\n${p.take(3000)}")
  }

  // FINAL adaptive plan only — the rendered string appends the initial
  // plan too, which would double-count every node in the assertions
  test("pivot with explicit values: map-side partial count reduces before the pivot") {
    // Without explicit pivot values Spark runs collect(distinct event_type)
    // at PLAN time — an extra full corpus scan at 100 TB. With them the
    // plan is a (day, event_type) count WITH map-side partial aggregation
    // feeding a day-keyed pivotfirst: the corpus reduces to ~|days×types|
    // rows before the second (trivial) exchange.
    val df = SparkEntry.queries("q_pivot")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count"), p.take(2000))
    assert(p.contains("pivotfirst"), p.take(2000))
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex == 2, s"expected (day,event_type) + (day) exchanges, found $ex:\n${p.take(3000)}")
  }

  test("rank family, ffill, and scd2 share ONE user exchange each") {
    // Two differently-ordered windows over the same user partitioning
    // (q_rank_family) still need only one hashpartitioning(user_id) —
    // Catalyst inserts two sorts, not two shuffles.
    for (q <- Seq("q_rank_family", "q_ffill", "q_scd2")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      val userExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
      assert(userExchanges == 1,
        s"$q: expected 1 user_id exchange, found $userExchanges:\n${p.take(3000)}")
    }
  }

  test("semDeDup: cluster assignment is a shuffle-free argmax; only the cluster join shuffles") {
    val df = SparkEntry.queries("q_dedup_semdedup")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // no window over the corpus, no broadcast of the corpus itself
    assert(!p.contains("Window"), s"unexpected window:\n${p.take(3000)}")
    // the within-cluster self-join keys on _c_id (plus the id anti-join)
    assert(p.contains("_c_id"), p.take(2000))
  }

  test("per-group top-k: WindowGroupLimit cuts each map task's rows before the exchange") {
    val df = SparkEntry.queries("q_topk_per_group")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank filter not pushed below the window:\n${p.take(3000)}")
  }

  test("upsert: update keys broadcast into the anti join — the base never shuffles") {
    val df = SparkEntry.queries("q_upsert")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast anti join:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"), s"base side shuffled:\n${p.take(3000)}")
  }

  test("rfm: quintiles via range-partitioned ranks — no single-task ntile sort") {
    val p = planOf("q_rfm")
    // the round-9 scale finding: three unpartitioned ntile(5) windows
    // single-task-sorted all customers; the closed-form rewrite must not
    // reintroduce any ntile window function
    assert(!p.contains("ntile("), s"ntile window is back:\n${p.take(3000)}")
    // ranks come from range repartitioning (parallel local windows)
    assert(p.toLowerCase.contains("rangepartitioning"),
      s"expected range-partitioned rank exchanges:\n${p.take(3000)}")
  }

  test("gini: rank-sum folds over the count histogram, never ranks users") {
    val p = planOf("q_gini")
    // the old shape row_number()'d every user in one task; the histogram
    // form has NO row_number at all — only the bounded cumulative sum
    assert(!p.contains("row_number"),
      s"per-user global rank is back:\n${p.take(3000)}")
  }

  test("classifier score: weights ride the plan — one aggregate pair, no model join") {
    // scoring must stay a pure scan→aggregate shape: the trained weights
    // are plan literals (map lookup), so there is NO join anywhere and
    // the only exchanges are the feature aggregation's
    val model = graft.ext.QualityClassifier.Model(8, Array.fill(9)(1000L))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val df = graft.ext.QualityClassifier.score(docs, "doc_id", "text", model)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // hashedFeatures unions the intercept branch (its own tiny agg), so
    // a join would only come from a model-serving table — assert none
    assert(!p.toLowerCase.contains("join"),
      s"model join appeared in score plan:\n${p.take(3000)}")
  }

  test("blocklist screen is a pure projection: no exchange, no join") {
    // the C4 gate must stay a codegen'd per-row regex — any Exchange or
    // join here means the screen silently became a distributed operator
    val df = graft.ext.TextAnalysis.blocklistScreen(
      spark.read.parquet(s"$dir/documents.parquet"), "text",
      Seq("slow", "big"), maxBannedPerMille = 50)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.toLowerCase.contains("join"),
      s"blocklist screen grew a shuffle/join:\n${p.take(3000)}")
  }

  test("priority dedup: literal priority map, one fingerprint exchange") {
    // the priority lookup is a plan literal — a BroadcastExchange means
    // it degraded to a join; all three windows share ONE hash exchange
    val df = graft.ext.Dedup.priorityDedup(
      spark.read.parquet(s"$dir/documents.parquet"),
      "doc_id", "text", "source", Map("src3" -> 0, "src1" -> 1),
      defaultPriority = 99)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("BroadcastExchange"),
      s"priority map degraded to a join:\n${p.take(3000)}")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1,
      s"keeper + annotation windows must share ONE exchange, got $hashEx:\n${p.take(3000)}")
  }

  test("cdc chunking: window and regroup share the id exchange") {
    // groupBy (id, chunk_id) must reuse the id-hash partitioning the
    // cumulative-sum window established (superset-key clustering)
    val df = graft.ext.TextAnalysis.cdcChunks(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 64)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1,
      s"chunk regroup re-shuffled instead of reusing the id exchange, got $hashEx:\n${p.take(3000)}")
  }

  private def planOfText(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // finalize the adaptive plan
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }
}
