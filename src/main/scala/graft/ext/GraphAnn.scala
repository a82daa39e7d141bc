package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based approximate nearest neighbors: NN-Descent k-NN-graph
  * construction (Dong, Moses & Li, WWW 2011 — the build phase behind
  * HNSW-class graph indexes) plus neighborhood-expansion search over
  * the built graph.
  *
  * Why NN-Descent and not literal HNSW: HNSW's insert loop is
  * inherently SEQUENTIAL (each insertion greedy-searches the graph
  * built so far), which shards badly; NN-Descent is the
  * batch-parallel formulation of the same "a neighbor of my neighbor
  * is probably my neighbor" principle — every round is two joins and
  * a rank-limited window, embarrassingly data-parallel, and converges
  * in a handful of rounds. The engine runs a FIXED round count (the
  * k-core/pointer-jump loop-contract discipline), so the result is
  * deterministic and engine-replayable.
  *
  * Determinism contract (everything the oracle replays):
  *  - init: nodes hash into ~n/(k+1)-sized buckets under TWO
  *    independent salted md5 assignments (first 48 bits of
  *    md5("a|id") and md5("b|id")), and each node's round-0 neighbors
  *    are its top-k peers across BOTH buckets. One salted partition
  *    alone would be fatal: every init edge would be bucket-local, so
  *    the neighbor-of-neighbor expansion could never cross buckets and
  *    the graph would stay partitioned into ~n/(k+1) islands forever
  *    (measured: search recall 0.015). The union of two independent
  *    random partitions is a bridged expander — the deterministic
  *    stand-in for classic NN-Descent's random init — and the rounds
  *    then mix globally. Still one shuffle per salt, no global sort;
  *  - each round: candidates = current undirected neighbors ∪ their
  *    undirected neighbors (two-hop, self excluded), dedup, exact
  *    cosine score, keep top-k per node by (cosine DESC, id ASC);
  *  - cosine is the native sequential-fold primitive
  *    ([[Similarity.cosine]]) — bit-identical to the oracle's ordered
  *    `list_reduce` fold, so ranks can never flip cross-engine.
  *
  * Scale shape: per round the candidate multiset is ≤ n·(2k)² rows of
  * (id, id) pairs — linear in n for fixed k, never all-pairs; scoring
  * joins the vector table twice (hash shuffles on 8-byte ids); the
  * top-k window compiles to WindowGroupLimit, so each exchange carries
  * at most k rows per node per map partition. The md5-bucket init
  * needs one `count()` (a bounded scalar action) and no global window.
  */
object GraphAnn {

  /** Build the k-NN graph: one row per (vec_id, nb_rank, nb_id, sim),
    * `nb_rank` 1-based by descending cosine (id tiebreak), at most `k`
    * rows per node.
    *
    * @param iters NN-Descent refinement rounds AFTER the bucket init
    *              (fixed-count contract; 2–3 suffices at these k)
    */
  def nnDescentGraph(
      df: DataFrame, id: String, vec: String, k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val vecs = df.select(col(id).cast("long").as("_id"), col(vec).as("_v"))
      .where(col("_id").isNotNull && col("_v").isNotNull)
      .localCheckpoint(true) // feeds every round's two scoring joins
    // bounded scalar action: the bucket count for the init hash
    val n = vecs.count()
    val buckets = math.max(n / (k + 1), 1L)
    def bucketOf(salt: String) =
      conv(substring(md5(concat(lit(s"$salt|"), col("_id").cast("string"))),
        1, 12), 16, 10).cast("long") % buckets
    def topK(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy("_node").orderBy(col("_c").desc, col("_nb"))
      scored.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= k)
        .select("_node", "_nb", "_c", "_rn")
    }
    /** Join candidate (node, nb) pairs to both vectors and cosine them. */
    def score(cand: DataFrame): DataFrame =
      cand
        .join(vecs.select(col("_id").as("_node"), col("_v").as("_va")), "_node")
        .join(vecs.select(col("_id").as("_nb"), col("_v").as("_vb")), "_nb")
        .select(col("_node"), col("_nb"),
          Similarity.cosine(col("_va"), col("_vb")).as("_c"))
    val init = {
      def pairsFor(salt: String) = {
        val b = vecs.select(col("_id"), bucketOf(salt).as("_bk"))
        b.select(col("_bk"), col("_id").as("_node"))
          .join(b.select(col("_bk"), col("_id").as("_nb")), Seq("_bk"))
          .where(col("_node") =!= col("_nb"))
          .select("_node", "_nb")
      }
      val pairs = pairsFor("a").union(pairsFor("b")).distinct()
      topK(score(pairs)).localCheckpoint(true)
    }
    var nbrs = init
    var r = 0
    while (r < iters) {
      val und = nbrs.select(col("_node"), col("_nb"))
        .union(nbrs.select(col("_nb").as("_node"), col("_node").as("_nb")))
        .distinct()
        .localCheckpoint(true) // one-hop side AND both two-hop sides
      val twoHop = und.select(col("_node"), col("_nb").as("_mid"))
        .join(und.select(col("_node").as("_mid"), col("_nb")), Seq("_mid"))
        .where(col("_nb") =!= col("_node"))
        .select("_node", "_nb")
      val cand = und.union(twoHop).distinct()
      nbrs = topK(score(cand)).localCheckpoint(true)
      r += 1
    }
    nbrs.select(col("_node").as("vec_id"), col("_rn").as("nb_rank"),
      col("_nb").as("nb_id"), col("_c").as("sim"))
  }

  /** The UNDIRECTED edge view of a built graph — both edge directions,
    * deduped. NOT pinned here: [[graphSearch]] pins it per call; a
    * serving harness that reuses one graph across many query batches
    * should derive + pin it ONCE and call [[searchOverUnd]] (the
    * union+distinct is O(n·k) — per-batch it would dominate a
    * candidate-bounded search).
    */
  private[graft] def undirected(graph: DataFrame): DataFrame =
    graph.select(col("vec_id").as("_node"), col("nb_id").as("_nb"))
      .union(graph.select(col("nb_id").as("_node"), col("vec_id").as("_nb")))
      .distinct()

  /** ANN search over a built graph without re-touching the corpus scan:
    * for each probe node, expand its one- and two-hop UNDIRECTED
    * neighborhood in `graph`, exact-rerank by cosine, keep top-k
    * (probe itself excluded). With an NN-Descent graph of degree g the
    * candidate set is ≤ g + g² per probe — constant per query
    * regardless of corpus size, which is the entire point of a graph
    * index at 100 TB.
    *
    * `ef` is the SEARCH-TIME quality knob (the HNSW ef_search idea in
    * batch form): when `ef > k`, the top-`ef` scored candidates per
    * probe become a beam whose undirected neighbors are expanded one
    * more hop, scored, and merged before the final top-k — recall
    * rises without touching the built graph or paying more build
    * rounds. Cost is ≤ ef·g NEW candidates per probe per beam round
    * (already-scored candidates are anti-joined out, never rescored);
    * `ef <= k` (the default 0) keeps the plain two-hop search.
    *
    * @param graph  [[nnDescentGraph]] output (vec_id, nb_rank, nb_id, sim)
    * @param probes (qId) one column of probe node ids
    * @param ef     beam width for one extra expansion round; <= k disables
    */
  def graphSearch(
      df: DataFrame, id: String, vec: String, graph: DataFrame,
      probes: DataFrame, qId: String, k: Int, ef: Int = 0,
      probeCount: Long = -1L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k") // before touching the graph
    searchOverUnd(df, id, vec,
      undirected(graph)
        .localCheckpoint(true), // one-hop frontier AND the two-hop expansion
      probes, qId, k, ef, probeCount)
  }

  /** [[graphSearch]] over a PRE-DERIVED (and caller-pinned) undirected
    * edge list. `probeCount` lets a caller that already knows |probes|
    * (a serving harness driving fixed-size query batches) skip the
    * bounded counting job the broadcast gate otherwise runs per call
    * (advice r19 — the job re-executes the probes lineage on the hot
    * search path); negative means unknown, fall back to the job.
    */
  private[graft] def searchOverUnd(
      df: DataFrame, id: String, vec: String, und: DataFrame,
      probes: DataFrame, qId: String, k: Int, ef: Int,
      probeCount: Long = -1L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vecs = df.select(col(id).cast("long").as("_id"), col(vec).as("_v"))
    val q = probes.select(col(qId).cast("long").as("_q"))
    def score(cand: DataFrame): DataFrame = cand
      .join(vecs.select(col("_id").as("_q"), col("_v").as("_qv")), "_q")
      .join(vecs.select(col("_id").as("_nb"), col("_v").as("_nv")), "_nb")
      .select(col("_q"), col("_nb"),
        Similarity.cosine(col("_qv"), col("_nv")).as("_c"))
    val w = Window.partitionBy("_q").orderBy(col("_c").desc, col("_nb"))
    // The probe frontier is the QUERY BATCH side — small by the serving
    // contract (the corpus-sized frame is `und`). Broadcasting it pins
    // the scale-right plan: every hop is a broadcast hash join that
    // SCANS the big edge list and never shuffles it. Left to stats, a
    // checkpointed 100×-corpus und was planned into the exchange, and
    // the measured search-only wall tripled (SCALE_GRAPHSERVE_r18).
    // The hint is CONDITIONAL on the frontier actually being bounded
    // (advice r18): the broadcast frames scale with |probes|·degree.
    // AVERAGE undirected degree is ≤ 2k by construction (the graph has
    // n·k edges total), but hub IN-degree is unbounded, so the gate
    // bounds the EXPECTED frontier |probes|·max(ef, 2k) against 2M rows
    // — 4× headroom under the ~8M-row/8 GB-cap line for hub skew
    // (review r19). The probe count is caller-supplied when known;
    // otherwise it comes from an output-BOUNDED job (limit cap+1, not a
    // full count — review r19): past the cap the exact count is
    // irrelevant, the planner is left free either way.
    val cap = 2000000L / math.max(ef.toLong, 2L * k)
    val nProbes =
      if (probeCount >= 0L) probeCount
      else q.limit(math.min(cap + 1, Int.MaxValue.toLong).toInt).count()
    val hintFrontier = nProbes <= cap
    def hinted(f: DataFrame): DataFrame = if (hintFrontier) broadcast(f) else f
    val hop1 = hinted(q)
      .join(und.select(col("_node").as("_q"), col("_nb")), Seq("_q"))
    val hop2 = hinted(hop1.select(col("_q"), col("_nb").as("_mid")))
      .join(und.select(col("_node").as("_mid"), col("_nb")), Seq("_mid"))
      .select("_q", "_nb")
    val cand = hop1.union(hop2).where(col("_nb") =!= col("_q")).distinct()
    val scored = score(cand)
    val merged =
      if (ef <= k) scored
      else {
        // beam round: the top-ef already-scored candidates seed one more
        // undirected hop; only candidates never seen before are scored
        // (the anti-join both avoids rescoring and keeps the final
        // window duplicate-free). scored feeds three consumers — pin it.
        val pinned = scored.localCheckpoint(true)
        val seeds = pinned.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= ef)
          .select("_q", "_nb")
        val hop3 = hinted(seeds.select(col("_q"), col("_nb").as("_mid")))
          .join(und.select(col("_node").as("_mid"), col("_nb")), Seq("_mid"))
          .where(col("_nb") =!= col("_q"))
          .select("_q", "_nb")
          .distinct()
        val fresh = hop3.join(cand, Seq("_q", "_nb"), "left_anti")
        pinned.union(score(fresh))
      }
    merged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("_q").as("q_id"), col("_nb").as("vec_id"), col("_c").as("sim"))
  }

  /** Incremental insertion: admit a `batch` of NEW vectors into a built
    * k-NN graph WITHOUT rebuilding it — the search-then-link shape every
    * graph index uses for growth (HNSW insert, DiskANN streaming merge),
    * in batch-parallel form. [[nnDescentGraph]] from scratch is O(corpus)
    * per admitted crawl batch; at 100 TB the corpus side must never
    * recompute, so insertion touches only (a) the batch, (b) the frozen
    * graph's edge list, and (c) the corpus rows the batch actually links
    * to.
    *
    * Three fixed, deterministic phases (everything the oracle replays):
    *  1. SEARCH — each batch vector seeds from its two-salt md5
    *     bucket-mates (same init contract as the builder, buckets sized
    *     over corpus+batch so seed cost per new node is ~2(k+1) scored
    *     pairs), then runs `hops` beam rounds over the UNDIRECTED frozen
    *     graph: the top-`ef` scored candidates per node expand one hop,
    *     never-seen pairs are anti-joined in and scored, nothing is ever
    *     rescored. Top-k of all scored pairs = the provisional new edges.
    *  2. BACK-LINK (the repair round, touched nodes ONLY) — every
    *     provisional edge (b → x) contributes the reverse candidate
    *     (x → b) at the same cosine (the fold is symmetric, so the score
    *     is reused bit-exactly); each TOUCHED corpus node re-ranks its
    *     existing edges against the reverse candidates and keeps top-k.
    *     Untouched corpus rows pass through byte-identical — the
    *     sublinearity contract.
    *  3. BATCH-PEER REPAIR — one NN-Descent-style round restricted to
    *     the batch: nodes sharing a provisional neighbor become
    *     candidates of each other (plus the reversed batch→batch
    *     provisional edges), fresh pairs are scored, and the batch lists
    *     re-rank. Candidate count is Σ_x deg_batch(x)² over shared
    *     neighbors — bounded by batch mass, independent of corpus size.
    *
    * @param graph frozen [[nnDescentGraph]] output over `corpus`
    * @param batch new (id, vec) rows, ids disjoint from the corpus
    * @param ef    beam width of the search phase (≥ k)
    * @param hops  fixed beam rounds over the frozen graph
    * @return the merged graph (vec_id, nb_rank, nb_id, sim) over
    *         corpus ∪ batch
    */
  def graphInsert(
      corpus: DataFrame, id: String, vec: String, graph: DataFrame,
      batch: DataFrame, k: Int, ef: Int, hops: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(ef >= k, s"ef must be >= k, got ef=$ef k=$k")
    require(hops >= 1, s"hops must be >= 1, got $hops")
    val cv = corpus.select(col(id).cast("long").as("_id"), col(vec).as("_v"))
      .where(col("_id").isNotNull && col("_v").isNotNull)
    val bv = batch.select(col(id).cast("long").as("_id"), col(vec).as("_v"))
      .where(col("_id").isNotNull && col("_v").isNotNull)
    val all = cv.union(bv).localCheckpoint(true) // feeds every scoring join
    // the frozen edge list feeds four consumers (both und directions,
    // the touched re-rank, the untouched pass-through) — pin it
    val g = graph.localCheckpoint(true)
    val n = all.count() // bounded scalar action: the bucket count
    val buckets = math.max(n / (k + 1), 1L)
    def bucketOf(salt: String) =
      conv(substring(md5(concat(lit(s"$salt|"), col("_id").cast("string"))),
        1, 12), 16, 10).cast("long") % buckets
    def score(cand: DataFrame): DataFrame = cand
      .join(all.select(col("_id").as("_node"), col("_v").as("_va")), "_node")
      .join(all.select(col("_id").as("_nb"), col("_v").as("_vb")), "_nb")
      .select(col("_node"), col("_nb"),
        Similarity.cosine(col("_va"), col("_vb")).as("_c"))
    val w = Window.partitionBy("_node").orderBy(col("_c").desc, col("_nb"))
    def topK(scored: DataFrame, limit: Int): DataFrame =
      scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= limit)

    // 1. SEARCH: bucket seeds, then `hops` beam rounds over the frozen graph
    def seedsFor(salt: String) = {
      val b = all.select(col("_id"), bucketOf(salt).as("_bk"))
      bv.select(col("_id").as("_node"))
        .join(b.withColumnRenamed("_id", "_node"), Seq("_node"))
        .join(b.select(col("_id").as("_nb"), col("_bk")), Seq("_bk"))
        .where(col("_node") =!= col("_nb"))
        .select("_node", "_nb")
    }
    val und = g.select(col("vec_id").as("_node"), col("nb_id").as("_nb"))
      .union(g.select(col("nb_id").as("_node"), col("vec_id").as("_nb")))
      .distinct()
      .localCheckpoint(true) // one consumer per hop round
    var scored = score(seedsFor("a").union(seedsFor("b")).distinct())
      .localCheckpoint(true)
    var h = 0
    while (h < hops) {
      val beam = topK(scored, ef).select("_node", "_nb")
      val expand = beam.select(col("_node"), col("_nb").as("_mid"))
        .join(und.select(col("_node").as("_mid"), col("_nb")), Seq("_mid"))
        .where(col("_nb") =!= col("_node"))
        .select("_node", "_nb").distinct()
      val fresh =
        expand.join(scored.select("_node", "_nb"), Seq("_node", "_nb"), "left_anti")
      scored = scored.union(score(fresh)).localCheckpoint(true)
      h += 1
    }
    // provisional new edges feed four consumers (rev, touched, peers, anti)
    val prov = topK(scored, k).select("_node", "_nb", "_c").localCheckpoint(true)

    // 2. BACK-LINK touched corpus nodes only (reverse scores reused:
    //    the cosine fold is symmetric, bit-exactly). Membership tables
    //    derive from the PINNED union (id column only) rather than
    //    re-scanning the corpus input — at 100 TB the corpus parquet is
    //    scanned exactly once, by the checkpoint above.
    val batchIds = bv.select(col("_id").as("_node"))
      .localCheckpoint(true) // batch is small; two semi-join consumers
    val corpusIds = all.select(col("_id").as("_node"))
      .join(batchIds, Seq("_node"), "left_anti")
    val rev = prov.select(col("_nb").as("_node"), col("_node").as("_nb"), col("_c"))
    val revCorpus = rev.join(corpusIds, Seq("_node"), "left_semi")
      .localCheckpoint(true) // touched set AND the re-rank union
    val touched = revCorpus.select("_node").distinct()
      .localCheckpoint(true) // semi-join AND final anti-join
    val existingTouched = g
      .select(col("vec_id").as("_node"), col("nb_id").as("_nb"), col("sim").as("_c"))
      .join(touched, Seq("_node"), "left_semi")
    val touchedRows = topK(existingTouched.union(revCorpus), k)

    // 3. BATCH-PEER REPAIR: shared provisional neighbors + reversed
    //    batch→batch edges, fresh pairs only
    val shared = prov.select(col("_node"), col("_nb").as("_mid"))
      .join(prov.select(col("_node").as("_peer"), col("_nb").as("_mid")), Seq("_mid"))
      .where(col("_node") =!= col("_peer"))
      .select(col("_node"), col("_peer").as("_nb"))
    val revBatch = rev.select("_node", "_nb")
      .join(batchIds, Seq("_node"), "left_semi")
    val peerCand = shared.union(revBatch).distinct()
      .join(scored.select("_node", "_nb"), Seq("_node", "_nb"), "left_anti")
    val batchRows = topK(scored.union(score(peerCand)), k)

    val untouched = g
      .join(touched.withColumnRenamed("_node", "vec_id"), Seq("vec_id"), "left_anti")
      .select("vec_id", "nb_rank", "nb_id", "sim")
    def shape(df: DataFrame) = df.select(col("_node").as("vec_id"),
      col("_rn").as("nb_rank"), col("_nb").as("nb_id"), col("_c").as("sim"))
    untouched.union(shape(touchedRows)).union(shape(batchRows))
  }

  // --- persisted graph index + search-only serving (round 18) -----------

  private val GraphIndexSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("vec_id", LongType, nullable = true),
      StructField("nb_rank", IntegerType, nullable = true),
      StructField("nb_id", LongType, nullable = true),
      StructField("sim", DoubleType, nullable = true),
      StructField("k", IntegerType, nullable = true),
      StructField("iters", IntegerType, nullable = true)))
  }

  private def configRow(spark: org.apache.spark.sql.SparkSession,
      k: Int, iters: Int): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("config", null, null, null, null, k, iters)), 1),
      GraphIndexSchema)

  private def tagEdges(graph: DataFrame): DataFrame =
    graph.select(lit("edge").as("kind"),
      col("vec_id").cast("long").as("vec_id"),
      col("nb_rank").cast("int").as("nb_rank"),
      col("nb_id").cast("long").as("nb_id"),
      col("sim").cast("double").as("sim"),
      lit(null).cast("int").as("k"),
      lit(null).cast("int").as("iters"))

  /** Persisted k-NN-graph index of an ACCEPTED corpus, as one DataFrame
    * — the [[Similarity.ivfIndex]] shape for the graph family:
    * `kind='config'` carries the build parameters (k, iters) and
    * `kind='edge'` rows are the [[nnDescentGraph]] edge list itself.
    * Built once per corpus state and written like any table;
    * [[graphSearchIndex]] queries and [[graphInsertIndex]] admissions
    * serve from the artifact without re-running a single build round —
    * before this, both graph gates rebuilt the base graph in-query,
    * which is why they flagged ~25× at 100× data (the BUILD is
    * linear-by-design; the search is candidate-bounded per probe). The
    * build config rides IN the index so growth derives it instead of
    * trusting the caller to repeat it (the band-layout rule).
    */
  def graphIndex(
      corpus: DataFrame, id: String, vec: String, k: Int, iters: Int): DataFrame =
    configRow(corpus.sparkSession, k, iters)
      .unionByName(tagEdges(nnDescentGraph(corpus, id, vec, k, iters)))

  /** The frozen build config read back from an index — bounded collect
    * (exactly one config row).
    */
  private[graft] def graphIndexConfig(index: DataFrame): (Int, Int) = {
    val rows = index.filter(col("kind") === "config")
      .select("k", "iters").collect()
    require(rows.length == 1,
      s"graph index must carry exactly one config row, found ${rows.length}")
    (rows.head.getInt(0), rows.head.getInt(1))
  }

  /** The edge list view of a persisted index — the exact
    * [[nnDescentGraph]] output shape every existing consumer takes.
    */
  def graphIndexEdges(index: DataFrame): DataFrame =
    index.filter(col("kind") === "edge")
      .select("vec_id", "nb_rank", "nb_id", "sim")

  /** [[graphSearch]] over a PERSISTED index: the frozen edge list is
    * read back from the artifact; nothing rebuilds. Per probe the
    * candidate set stays ≤ g + g² (+ ef·g with a beam) regardless of
    * corpus size — search cost is decoupled from build cost, which is
    * the entire point of persisting the graph.
    */
  def graphSearchIndex(
      df: DataFrame, id: String, vec: String, index: DataFrame,
      probes: DataFrame, qId: String, k: Int, ef: Int = 0,
      probeCount: Long = -1L): DataFrame =
    graphSearch(df, id, vec, graphIndexEdges(index), probes, qId, k, ef,
      probeCount)

  /** [[graphInsert]] against a PERSISTED index: `k` derives from the
    * index's own config row (no parameter to get wrong — the
    * [[Similarity.ivfAppend]] contract), and the result is a NEW index
    * carrying the same config and the merged edge list, ready to be
    * written back. Untouched corpus edges pass through byte-identical.
    */
  def graphInsertIndex(
      corpus: DataFrame, id: String, vec: String, index: DataFrame,
      batch: DataFrame, ef: Int, hops: Int = 2): DataFrame = {
    val (k, iters) = graphIndexConfig(index)
    configRow(corpus.sparkSession, k, iters).unionByName(tagEdges(
      graphInsert(corpus, id, vec, graphIndexEdges(index), batch,
        k = k, ef = ef, hops = hops)))
  }

  /** Execute the rebuild [[graphIndexHealth]] calls for: a fresh
    * [[graphIndex]] under the OLD index's own build config (k and iters
    * derive from the config row — nothing to repeat wrong). Unlike the
    * IVF/semantic rebuilds the graph index carries no vectors, so the
    * corpus table is a parameter: pass the current member set
    * (original corpus plus every admitted batch).
    */
  def graphRebuild(
      corpus: DataFrame, id: String, vec: String, index: DataFrame): DataFrame = {
    val (k, iters) = graphIndexConfig(index)
    graphIndex(corpus, id, vec, k, iters)
  }

  /** Rebuild-trigger gauge for a GROWN graph index — the graph-family
    * member of the health trio (IVF [[Similarity.ivfIndexHealth]],
    * semantic [[Dedup.semIndexHealth]]). [[graphInsertIndex]]
    * deliberately never re-runs build rounds, so sustained growth
    * degrades in the graph's own two ways: inserted nodes' neighbor
    * QUALITY (the beam search finds worse neighbors than a full
    * rebuild's global rounds would — watch `mean_sim` of the inserted
    * origin fall below the build origin's) and back-link COVERAGE (an
    * inserted node nobody links back to is unreachable by graph search
    * from the corpus side — watch `n_backlinked / n_nodes` of the
    * inserted row fall ≪ 1). One row per origin (build / inserted):
    * node count, edge count, quantized edge-sim mass
    * `Σ floor(sim·10⁶)`, its mean, and (on the inserted row) how many
    * inserted nodes some BUILD node lists as a neighbor. Exact-integer
    * masses keep the gauge engine-replayable.
    *
    * @param batch the inserted ids (the caller knows what it admitted)
    */
  def graphIndexHealth(
      index: DataFrame, batch: DataFrame, id: String): DataFrame = {
    val bIds = batch.select(col(id).cast("long").as("_bid")).distinct()
      .localCheckpoint(true) // origin tag AND the back-link semi-join
    val tagged = graphIndexEdges(index)
      .join(bIds.select(col("_bid").as("vec_id"), lit(true).as("_isb")),
        Seq("vec_id"), "left")
      .withColumn("origin",
        when(col("_isb"), lit("inserted")).otherwise(lit("build")))
      .localCheckpoint(true) // per-origin agg AND the back-link census
    val agg = tagged.groupBy("origin").agg(
      countDistinct(col("vec_id")).as("n_nodes"),
      count(lit(1)).as("n_edges"),
      sum(floor(col("sim") * lit(1000000.0)).cast("long")).as("simsum6"))
    val backlinked = tagged.where(col("origin") === "build")
      .join(bIds, col("nb_id") === col("_bid"), "left_semi")
      .agg(countDistinct(col("nb_id")).as("_nbl"))
    agg.crossJoin(broadcast(backlinked))
      .select(col("origin"), col("n_nodes"), col("n_edges"), col("simsum6"),
        (col("simsum6").cast("double") /
          (col("n_edges") * lit(1000000L)).cast("double")).as("mean_sim"),
        when(col("origin") === "inserted", col("_nbl")).as("n_backlinked"))
  }

  /** One-row REBUILD-DUE decision from a [[graphIndexHealth]] gauge —
    * the graph member of the gauge-to-action wiring (verdict r18 #5).
    * Applies the documented thresholds:
    *
    *  - `sim_drift <= driftFloor` (default −0.05): inserted nodes'
    *    mean edge cosine fell that far below the build origin's — the
    *    beam insert is finding systematically worse neighbors than a
    *    full rebuild's global rounds would;
    *  - `backlink_cov < minBacklink` (default 0.2): the fraction of
    *    inserted nodes some BUILD node links back to — coverage ≪ 1
    *    means inserted rows are unreachable by graph search from the
    *    corpus side.
    *
    * Means re-derive from the gauge's exact integer masses (one double
    * division each), so the decision row is engine-replayable
    * (q_index_rebuild_due_graph). A gauge with no inserted row decides
    * false (nothing grew — nothing to rebuild for).
    */
  def graphRebuildDecision(
      health: DataFrame, driftFloor: Double = -0.05,
      minBacklink: Double = 0.2): DataFrame = {
    def originSum(c: String, o: String) =
      sum(when(col("origin") === o, col(c)))
    health.agg(
        originSum("simsum6", "build").as("_sb"),
        originSum("n_edges", "build").as("_eb"),
        originSum("simsum6", "inserted").as("_si"),
        originSum("n_edges", "inserted").as("_ei"),
        originSum("n_nodes", "inserted").as("_ni"),
        originSum("n_backlinked", "inserted").as("_bl"))
      .select(
        (when(col("_ei") > 0, col("_si").cast("double") /
            (col("_ei") * lit(1000000L)).cast("double"))
          - when(col("_eb") > 0, col("_sb").cast("double") /
            (col("_eb") * lit(1000000L)).cast("double"))).as("sim_drift"),
        when(col("_ni") > 0,
          col("_bl").cast("double") / col("_ni").cast("double"))
          .as("backlink_cov"))
      .withColumn("rebuild_due",
        coalesce(col("sim_drift") <= lit(driftFloor), lit(false)) ||
          coalesce(col("backlink_cov") < lit(minBacklink), lit(false)))
  }

  /** Close the loop for the graph family: gauge the grown index
    * ([[graphIndexHealth]] over the inserted batch) and REBUILD it
    * ([[graphRebuild]] under the index's own config) when
    * [[graphRebuildDecision]] trips; hand the grown index back untouched
    * otherwise. `corpus` is the current member table (original corpus
    * plus every admitted batch) — the graph index carries no vectors.
    */
  def graphRebuildIfDue(
      corpus: DataFrame, id: String, vec: String, index: DataFrame,
      batch: DataFrame, driftFloor: Double = -0.05,
      minBacklink: Double = 0.2): DataFrame = {
    val due = graphRebuildDecision(
        graphIndexHealth(index, batch, id), driftFloor, minBacklink)
      .select("rebuild_due").collect().head.getBoolean(0)
    if (due) graphRebuild(corpus, id, vec, index) else index
  }

  // --- bucket-pruned serving (round 19) ---------------------------------

  /** Serving-batch bound for the point-lookup search path: every driver
    * collect in [[graphSearchServing]] is ≤ |probes|·max(ef, 2k) rows —
    * the same frontier bound the [[searchOverUnd]] broadcast hint uses.
    * The bound is sized to what a collect ACTUALLY materializes on the
    * driver (advice r19): the rows land as specialized (Long, Long)
    * tuples, ~32-48 B each plus the transient compressed result
    * batches, so 2M rows ≈ 100-150 MB peak — safe in a default-memory
    * driver where the old 8M·"just the longs" arithmetic was not. A
    * caller with a corpus-proportional probe set belongs on
    * [[graphSearch]], not on a point-lookup serving path.
    */
  private val MaxServeFrontier = 2000000L

  /** Bounded collects for the serving paths: the guard must bind BEFORE
    * rows land on the driver (review r19 — a post-collect require fires
    * after the OOM it exists to prevent), so the job is output-capped at
    * the bound + 1 and the overflow detected from the capped result.
    * Rows come back through primitive encoders (Array[Long] /
    * specialized tuples), never boxed Row objects (advice r19).
    */
  /** Run `body` with `autoBucketedScan` planning disabled, restoring the
    * caller's setting afterwards — the serving entry points' conf scope
    * (verdict r19 #3). The pin must be live at ACTION time, so any frame
    * `body` returns for later consumption must be materialized inside it
    * (the serving paths localCheckpoint their bounded results).
    *
    * REENTRANT per session (review r20): overlapping serving calls from
    * concurrent threads share one refcounted scope — the first entrant
    * saves the prior value and pins, the LAST exit restores it — so a
    * naive save/restore race can neither leak the pin nor re-enable the
    * conf under a still-running call. (A concurrent non-serving query
    * that mutates this conf itself mid-call is outside the contract.)
    */
  private val scanOffScopes = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.sql.SparkSession, (Int, Option[String])]()

  private[graft] def withAutoBucketedScanOff[A](
      spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    scanOffScopes.synchronized {
      val (depth, prior) = Option(scanOffScopes.get(spark))
        .getOrElse((0, spark.conf.getOption(key)))
      scanOffScopes.put(spark, (depth + 1, prior))
      if (depth == 0) spark.conf.set(key, "false")
    }
    try body
    finally scanOffScopes.synchronized {
      val (depth, prior) = scanOffScopes.get(spark)
      if (depth == 1) {
        scanOffScopes.remove(spark)
        prior match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      } else scanOffScopes.put(spark, (depth - 1, prior))
    }
  }

  private def boundedLimit(f: DataFrame): DataFrame =
    f.limit(math.min(MaxServeFrontier + 1, Int.MaxValue.toLong).toInt)

  private def requireBounded(n: Int, what: String): Unit =
    require(n.toLong <= MaxServeFrontier,
      s"serving $what exceeds the point-lookup bound $MaxServeFrontier — " +
        "use graphSearch for corpus-scale probe sets")

  private def boundedLongs(f: DataFrame, what: String): Array[Long] = {
    val xs = boundedLimit(f)
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    requireBounded(xs.length, what)
    xs
  }

  private def boundedPairs(f: DataFrame, what: String): Array[(Long, Long)] = {
    val xs = boundedLimit(f)
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)).collect()
    requireBounded(xs.length, what)
    xs
  }

  /** Persist a graph index's SERVING layout: the undirected edge view,
    * bucketed AND sorted by source node ([[graft.sources.Sources
    * .writeBucketed]]). This is the storage shape a deployment serves
    * from at 100 TB — the per-batch hop lookups of
    * [[graphSearchServing]] filter on `_node`, so the scan prunes to the
    * buckets the frontier actually hashes into (`SelectedBucketsCount`
    * in the plan; ServeBucketedSpec pins it) and row groups stay sorted
    * for min/max skipping — the edge frame is never re-shuffled or
    * fully probed per query batch. The O(n·k) undirected derivation is
    * paid ONCE here, at write time, like the build itself.
    */
  def graphWriteServing(
      index: DataFrame, table: String, path: String, buckets: Int = 32): Unit =
    graft.sources.Sources.writeBucketed(
      undirected(graphIndexEdges(index)), table, path, "_node", buckets)

  /** Literal-lookup ceiling: up to this many frontier ids, a lookup is a
    * literal InSet filter — bucket-pruned at the scan (the point-lookup
    * storage win) and cheap to plan. Past it, Catalyst's analysis of the
    * literal list itself becomes the bottleneck (measured: a 20k-long
    * In-list costs ~7 s of pure PLANNING per query), so bulk frontiers
    * switch to a broadcast left-semi join — literal-free, still one
    * streamed pass over the (memory- or cache-resident) edge frame.
    */
  private[graft] val LiteralLookupMax = 512

  /** [[graphSearch]] restructured as driver-orchestrated POINT LOOKUPS
    * over a bucketed serving table ([[graphWriteServing]] output read
    * back as `edges`): each hop resolves its bounded frontier
    * (≤ |probes|·max(ef, 2k) ids/pairs — the serving contract) at the
    * driver and fetches exactly the touched adjacency rows, so
    *
    *  - SMALL frontiers (≤ [[LiteralLookupMax]], e.g. the probe batch
    *    itself) scan with a literal InSet predicate that bucket-prunes
    *    on disk (plan-visible as `SelectedBucketsCount x out of y`) —
    *    the 100 TB property: a 200-probe batch against a 10⁹-node index
    *    reads only the touched buckets, not the frame;
    *  - BULK frontiers (the 2-hop/beam expansions) fetch via a broadcast
    *    semi-join of the frontier frame — literal-free (giant In-lists
    *    are a planning DoS, see [[LiteralLookupMax]]), one streamed pass;
    *  - hop-1 adjacency and beam seeds are collected ONCE (bounded) and
    *    re-broadcast as local frames, so the whole batch costs ~5 jobs
    *    instead of re-deriving every stage's lineage.
    *
    * Results are row-identical to [[graphSearch]] over the same graph
    * (ServeBucketedSpec asserts it): same candidate construction, same
    * ordered-fold cosine, same (sim DESC, id) top-k.
    */
  def graphSearchServing(
      df: DataFrame, id: String, vec: String, edges: DataFrame,
      probes: DataFrame, qId: String, k: Int, ef: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // Spark's DisableUnnecessaryBucketedScan rule strips the bucketed
    // scan — and with it ALL bucket pruning — from point lookups (no
    // join needs the hash distribution, so the planner prints
    // "Bucketed: false (disabled by query planner)" and reads every
    // bucket). Pin the conf for the duration of THIS call only
    // (verdict r19 #3): every lookup job runs inside the call and the
    // result is materialized (localCheckpoint) before the conf is
    // restored, so a mixed batch/serving session keeps its
    // auto-bucketed-scan planning for everything else it runs.
    val spark = df.sparkSession
    withAutoBucketedScanOff(spark) {
    import spark.implicits._
    val vecs = df.select(col(id).cast("long").as("_id"), col(vec).as("_v"))
    def lookup(ids: Seq[Long]): DataFrame =
      if (ids.length <= LiteralLookupMax)
        edges.where(col("_node").isInCollection(ids))
      else
        edges.join(broadcast(ids.toDF("_node")), Seq("_node"), "left_semi")
    def score(cand: DataFrame): DataFrame = cand
      .join(vecs.select(col("_id").as("_q"), col("_v").as("_qv")), "_q")
      .join(vecs.select(col("_id").as("_nb"), col("_v").as("_nv")), "_nb")
      .select(col("_q"), col("_nb"),
        Similarity.cosine(col("_qv"), col("_nv")).as("_c"))
    val w = Window.partitionBy("_q").orderBy(col("_c").desc, col("_nb"))
    val probeIds = boundedLongs(
      probes.select(col(qId).cast("long").as("_q")).distinct(), "probe set")
      .toSeq
    // hop-1 adjacency: ≤ |probes|·deg pairs — collect once, reuse as a
    // local frame for the hop-2 join AND the candidate set (toSeq is an
    // ArraySeq wrap, not a copy)
    val e1Rows = boundedPairs(
      lookup(probeIds).select(col("_node").as("_q"), col("_nb")),
      "hop-1 adjacency").toSeq
    val e1 = e1Rows.toDF("_q", "_nb")
    val hop2 = broadcast(e1.select(col("_q"), col("_nb").as("_mid")))
      .join(lookup(e1Rows.map(_._2).distinct)
        .select(col("_node").as("_mid"), col("_nb")), Seq("_mid"))
      .select("_q", "_nb")
    val cand = e1.union(hop2)
      .where(col("_nb") =!= col("_q")).distinct()
      .localCheckpoint(true) // scored AND the beam anti-join
    val scored = score(cand)
    val merged =
      if (ef <= k) scored
      else {
        val pinned = scored.localCheckpoint(true)
        // beam seeds: ≤ |probes|·ef pairs — one bounded collect feeds
        // both the hop-3 frontier and the seed-pair join frame
        val seedRows = boundedPairs(
          pinned.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") <= ef)
            .select("_q", "_nb"), "beam seed set").toSeq
        val seeds = seedRows.toDF("_q", "_mid")
        val hop3 = broadcast(seeds)
          .join(lookup(seedRows.map(_._2).distinct)
            .select(col("_node").as("_mid"), col("_nb")), Seq("_mid"))
          .where(col("_nb") =!= col("_q"))
          .select("_q", "_nb")
          .distinct()
        val fresh = hop3.join(cand, Seq("_q", "_nb"), "left_anti")
        pinned.union(score(fresh))
      }
    merged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("_q").as("q_id"), col("_nb").as("vec_id"), col("_c").as("sim"))
      // materialize while the conf pin is live — ≤ |probes|·k rows; the
      // caller's session conf is restored the moment this returns
      .localCheckpoint(true)
    }
  }
}
