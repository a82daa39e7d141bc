package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash groupBy), n-gram Jaccard (relational set
  * overlap), MinHash+LSH (banded signature buckets), SimHash (bitwise
  * near-dup), and embedding-cosine near-dup.
  *
  * Scale design: every variant reduces to groupBy/join on a derived key —
  * no pairwise O(n²) stage ever touches the full corpus. Candidate
  * generation is always a bucket join (band hash, simhash band, LSH
  * signature), and only bucket-mates are verified.
  */
object Dedup {

  /** Exact dedup on a content key: keeps the row with the smallest id per
    * distinct key. One shuffle on the (hashed) key.
    */
  def exactGroups(df: DataFrame, id: String, key: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct word 1-grams per document — the unit for Jaccard overlap. */
  def docTokens(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), explode(array_distinct(TextAnalysis.tokens(col(text)))).as("tok"))

  /** Exact n-gram Jaccard similarity for all pairs sharing >= 1 token.
    * Relational formulation: token-postings self-join -> shared counts ->
    * |A ∪ B| = |A| + |B| - shared. Quadratic in bucket size — bound the
    * input (or pre-bucket with MinHash below) at scale.
    */
  def ngramJaccardPairs(
      df: DataFrame, id: String, text: String, threshold: Double): DataFrame = {
    // no cache: the posting list is read twice (sizes + self-join) and a
    // session-lifetime cached block per call would leak executor memory
    val toks = docTokens(df, id, text)
    val sizes = toks.groupBy(id).agg(count(lit(1)).as("n_toks"))
    val a = toks.withColumnRenamed(id, "id1")
    val b = toks.withColumnRenamed(id, "id2")
    val shared = a.join(b, Seq("tok"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("shared"))
    val s1 = sizes.withColumnRenamed(id, "id1").withColumnRenamed("n_toks", "n1")
    val s2 = sizes.withColumnRenamed(id, "id2").withColumnRenamed("n_toks", "n2")
    shared.join(broadcast(s1), Seq("id1")).join(broadcast(s2), Seq("id2"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n1") + col("n2") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** Blocked edit-distance near-dup pairs: normalize each document to a
    * fixed-length signature (lowercased, whitespace-collapsed prefix),
    * block on the signature's own prefix, and verify only block-mates
    * with exact Levenshtein distance. The record-linkage classic
    * (Fellegi–Sunter blocking): candidate generation is an equi-join on
    * the block key — quadratic only WITHIN a block, never across the
    * corpus — and `levenshtein` is a codegen'd built-in on a bounded
    * `sigLen`-char string, so verification is O(sigLen²) per candidate
    * pair, independent of document length. Trades recall at the block
    * boundary (edits inside the first `blockLen` chars move a doc to a
    * different block) for a corpus-size-independent candidate set — the
    * same contract as the LSH/SimHash band families above.
    */
  /** Per-document normalized 40-char signature table, NULL-text rows
    * excluded (they can never pair — a NULL signature neither
    * equi-joins nor groups meaningfully).
    */
  private def editSigs(
      df: DataFrame, id: String, text: String, sigLen: Int): DataFrame =
    df.select(col(id),
        substring(regexp_replace(lower(col(text)), "\\s+", " "), 1, sigLen)
          .as("_sig"))
      .where(col("_sig").isNotNull)

  /** Identical-signature classes: one row per distinct signature with
    * its representative (smallest doc id) and member count — the same
    * collapse-before-anything discipline as [[simhashClasses]].
    */
  private def editSigClasses(
      df: DataFrame, id: String, text: String, sigLen: Int): DataFrame =
    editSigs(df, id, text, sigLen)
      .groupBy("_sig")
      .agg(min(col(id)).as("_rep"), count(lit(1)).as("_cnt"))
      // bounded by distinct signatures, consumed 2-4x downstream - pin
      // (r12 multi-consumer lesson)
      .localCheckpoint(true)

  /** Verified cross-class edges: DISTINCT signature pairs sharing the
    * `blockLen`-char prefix block within Levenshtein `maxDist` — the DP
    * runs once per distinct-signature pair, never per doc pair, so the
    * work is scale-INVARIANT under duplicate-class replication.
    */
  private def editClassEdges(
      classes: DataFrame, blockLen: Int, maxDist: Int): DataFrame = {
    val da = classes.select(col("_sig").as("_sig1"), col("_rep").as("_rep1"),
      col("_cnt").as("_cnt1"), substring(col("_sig"), 1, blockLen).as("_blk"))
    val db = classes.select(col("_sig").as("_sig2"), col("_rep").as("_rep2"),
      col("_cnt").as("_cnt2"), substring(col("_sig"), 1, blockLen).as("_blk"))
    da.join(db, Seq("_blk"))
      .filter(col("_sig1") < col("_sig2"))
      .withColumn("dist", levenshtein(col("_sig1"), col("_sig2")))
      .filter(col("dist") <= maxDist)
  }

  /** Blocked edit-distance near-dup pairs, COLLAPSED to signature
    * classes (the [[simhashPairs]] output contract, r16): one row per
    * identical-signature class (`id1 = id2 = rep, dist 0,
    * n_pairs = cnt·(cnt−1)/2`) plus one per verified class pair
    * (`id1 < id2` reps, `n_pairs = cnt1·cnt2`). Sum of `n_pairs` equals
    * the exploded doc-pair count, but the row count is linear in
    * DISTINCT signatures — the r16 10× tier measured the exploded
    * contract emitting 10,024× the rows for 10× replicated data (25 →
    * 250,600): on a boilerplate-heavy crawl corpus the pair LIST, not
    * the plan, was the scale-killer, exactly as with simhash.
    */
  def editDistancePairs(
      df: DataFrame, id: String, text: String,
      sigLen: Int = 40, blockLen: Int = 8, maxDist: Int = 5): DataFrame = {
    require(blockLen <= sigLen, s"blockLen $blockLen must be <= sigLen $sigLen")
    val classes = editSigClasses(df, id, text, sigLen)
    val intra = classes.filter(col("_cnt") >= 2)
      .select(col("_rep").as("id1"), col("_rep").as("id2"),
        lit(0).as("dist"),
        shiftright(col("_cnt") * (col("_cnt") - 1), 1).as("n_pairs"))
    val cross = editClassEdges(classes, blockLen, maxDist)
      .select(least(col("_rep1"), col("_rep2")).as("id1"),
        greatest(col("_rep1"), col("_rep2")).as("id2"),
        col("dist"), (col("_cnt1") * col("_cnt2")).as("n_pairs"))
    intra.unionByName(cross)
  }

  /** Edit-distance dedup as a KEEP/DROP assignment (the
    * [[simhashDedup]]/[[minhashDedup]] shape): each document's `rep_id`
    * is the smallest doc id among its identical-signature class and
    * every Levenshtein-verified neighboring class (one-step propagation
    * toward the neighborhood minimum); exactly one output row per
    * document regardless of duplicate-class size. NULL-text documents
    * keep themselves.
    */
  def editDistanceDedup(
      df: DataFrame, id: String, text: String,
      sigLen: Int = 40, blockLen: Int = 8, maxDist: Int = 5): DataFrame = {
    require(blockLen <= sigLen, s"blockLen $blockLen must be <= sigLen $sigLen")
    // ONE signature pass: feeds both the class collapse and the
    // doc->rep mapping join below
    val sigs = editSigs(df, id, text, sigLen).localCheckpoint(true)
    val classes = sigs
      .groupBy("_sig")
      .agg(min(col(id)).as("_rep"), count(lit(1)).as("_cnt"))
      .localCheckpoint(true)
    val edges = editClassEdges(classes, blockLen, maxDist)
    val neigh = edges.select(col("_sig1").as("_sig"), col("_rep2").as("_nrep"))
      .unionByName(edges.select(col("_sig2").as("_sig"), col("_rep1").as("_nrep")))
      .groupBy("_sig").agg(min(col("_nrep")).as("_nrep"))
    val classRep = classes.join(neigh, Seq("_sig"), "left")
      .select(col("_sig"),
        least(col("_rep"), coalesce(col("_nrep"), col("_rep"))).as("_crep"))
    df.select(col(id))
      .join(sigs.join(classRep, "_sig")
        .select(col(id), col("_crep")), Seq(id), "left")
      .select(col(id), coalesce(col("_crep"), col(id)).as("rep_id"))
      .withColumn("is_dup", col(id) =!= col("rep_id"))
  }

  /** 31-bit Mersenne prime — the modulus of the affine permutation
    * family. The modulus must sit AT the base-hash universe size (h is
    * 31-bit): with a much larger p, `a·h+b` wraps only a handful of
    * times and the "permutation" stays order-correlated with h, which
    * collapses the independence the band math assumes. At p = 2^31−1 the
    * product wraps ~a times (billions), and products stay under 2^62 —
    * exact signed-long math in BOTH engines: no ANSI overflow risk
    * Spark-side, plain BIGINT ops in the DuckDB oracle replay.
    *
    * Known (harmless) alias: the base hash is masked to 31 BITS, i.e.
    * h ∈ [0, 2^31−1] inclusive — 2^31 values over a p = 2^31−1 modulus —
    * so h = p collides with h = 0 under every permutation: the family is
    * a permutation of Z_p, not of the full masked domain. Both engines
    * compute it identically (oracle parity unaffected); the cost is a
    * one-in-2^31 extra collision chance per token, far below the band
    * math's own false-positive floor.
    */
  private[graft] val MinhashP: Long = (1L << 31) - 1

  /** Shared banding defaults — referenced by BOTH the operator call sites
    * and their generated oracles, so a default change cannot silently
    * desynchronize the two (it shows up as a compile-visible constant,
    * not an opaque gate hash mismatch).
    */
  private[graft] val MinhashBands = 8
  private[graft] val MinhashRowsPerBand = 4

  /** Deterministic (multiplier, offset) for permutation `i`, derived from
    * md5 at class-init — no runtime entropy (workflows replay), and the
    * same literals are inlined into the generated DuckDB oracle so both
    * engines share the family by construction. `a` ∈ [1, p), `b` ∈ [0, p).
    */
  private[graft] def minhashAffine(i: Int): (Long, Long) = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft:minhash:$i".getBytes("UTF-8"))
    def u(j: Int): Long = h(j) & 0xffL
    def w(j: Int): Long =
      ((u(j) << 24) | (u(j + 1) << 16) | (u(j + 2) << 8) | u(j + 3)) % MinhashP
    (w(0).max(1L), w(4))
  }

  /** Permutation family over a base 31-bit token hash: the classic MinHash
    * construction `(a_i·h + b_i) mod p` (MMDS ch. 3) with per-permutation
    * affine constants from [[minhashAffine]]. Chosen over xxhash64
    * re-keying so the DuckDB oracle can REPLAY the signatures exactly
    * (DuckDB has md5 but not Spark's xxhash64): the whole keep/drop
    * assignment becomes hash-checked instead of rows-only. Codegen'd
    * integer multiply-add-mod — still one string hash per token.
    */
  private def permuted(baseHash: Column, i: Int): Column = {
    val (a, b) = minhashAffine(i)
    (lit(a) * baseHash + lit(b)) % lit(MinhashP)
  }

  /** Per-document MinHash signature columns `mh0..mh{k-1}`: distinct
    * tokens explode to a posting list, each token is hashed ONCE (md5 →
    * first 8 hex chars, masked to 31 bits — the q_sample_weighted
    * replayable idiom), and the k permutation minimums are k `min`
    * aggregates in a single codegen'd hash aggregation — one shuffle on
    * the doc id, no interpreted higher-order functions.
    */
  def minhashSignatures(df: DataFrame, id: String, text: String, k: Int): DataFrame =
    docTokens(df, id, text)
      .withColumn("h",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
          .bitwiseAND(lit(0x7FFFFFFFL)))
      .groupBy(id)
      .agg(min(permuted(col("h"), 0)).as("mh0"),
        (1 until k).map(i => min(permuted(col("h"), i)).as(s"mh$i")): _*)

  /** Band-bucket hash columns over a minhash signature table: one bucket
    * id per band — md5 over ':'-joined decimal renderings of the band
    * index and that band's signature slice, truncated to 15 hex chars
    * (60-bit long key, replayable in the DuckDB oracle as
    * `CAST('0x'||substr(md5(...),1,15) AS BIGINT)`). Shared by every LSH
    * consumer so the banding scheme cannot diverge.
    */
  private def bandBucketCols(bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { b =>
      conv(substring(md5(concat_ws(":",
        lit(b).cast("string") +: (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"mh$i").cast("string")): _*)), 1, 15), 16, 10)
        .cast("long")
    }

  /** MinHash+LSH candidate pairs: signatures are cut into `bands` bands of
    * `rowsPerBand` values; documents agreeing on any whole band land in
    * the same bucket. Pairs are generated ONLY within buckets (the classic
    * shingle→minhash→band→bucket-join pipeline), then deduplicated across
    * bands. Probability of a pair surfacing ≈ 1-(1-j^r)^b for Jaccard j.
    */
  def minhashCandidatePairs(
      df: DataFrame, id: String, text: String,
      bands: Int = MinhashBands, rowsPerBand: Int = MinhashRowsPerBand): DataFrame = {
    val k = bands * rowsPerBand
    val sig = minhashSignatures(df, id, text, k)
    val banded = sig.select(col(id),
      explode(array(bandBucketCols(bands, rowsPerBand): _*)).as("bucket"))
    val a = banded.withColumnRenamed(id, "id1")
    val b = banded.withColumnRenamed(id, "id2")
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** (id, bucket) band-bucket rows — the exploded LSH view every
    * consumer shares. One signature aggregation + one narrow explode.
    */
  private def bandedBuckets(
      df: DataFrame, id: String, text: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    minhashSignatures(df, id, text, bands * rowsPerBand)
      .select(col(id),
        explode(array(bandBucketCols(bands, rowsPerBand): _*)).as("bucket"))

  /** Per-ROW band buckets — the STREAMING-SAFE signature form: the
    * batch path computes signatures as a per-doc aggregation
    * ([[minhashSignatures]]), but chaining that aggregation under a
    * windowed stream aggregate leaves append mode's supported-plan set,
    * so the edge-filter twin needs the whole signature as row-local
    * array expressions. Same token hash, same affine permutations, same
    * band md5 — bit-identical buckets to the aggregate form (asserted
    * in ExtSpec). Cost shape: the distinct-token hash array
    * materializes ONCE per row (`_hs` projection — k lambdas then read
    * the bound attribute; inlining the subtree would re-hash every
    * token k times, the single-reference lesson), then k interpreted
    * array_min transforms — fine for an ingest-edge filter, not for
    * corpus-wide batch work (use [[minhashSignatures]] there).
    * Appends `as` (array of `bands` bucket longs); tokenless docs get
    * an empty array.
    */
  private[graft] def withRowBandBuckets(
      df: DataFrame, text: String, as: String,
      bands: Int = MinhashBands, rowsPerBand: Int = MinhashRowsPerBand): DataFrame = {
    val k = bands * rowsPerBand
    val reserved = "_hs" +: as +: (0 until k).map(i => s"mh$i")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"withRowBandBuckets reserves column $c (present in input)"))
    // NO empty-token filter: the aggregate form hashes "" too (an
    // empty document's single token), so all-empty docs cluster
    // together in BOTH forms — parity over cosmetics
    val hs = transform(
      array_distinct(TextAnalysis.tokens(col(text))),
      t => conv(substring(md5(t), 1, 8), 16, 10).cast("long")
        .bitwiseAND(lit(0x7FFFFFFFL)))
    val staged = df.withColumn("_hs", hs)
    val withMins = (0 until k).foldLeft(staged) { (d, i) =>
      d.withColumn(s"mh$i", array_min(transform(col("_hs"), h => permuted(h, i))))
    }
    withMins
      .withColumn(as,
        when(size(col("_hs")) > 0,
          array(bandBucketCols(bands, rowsPerBand): _*))
          .otherwise(array().cast("array<long>")))
      .drop("_hs" +: (0 until k).map(i => s"mh$i"): _*)
  }

  /** The persisted corpus-side LSH artifact for incremental near-dup
    * admission: one `(bucket, rep_id)` row per occupied band bucket,
    * `rep_id` the smallest corpus id in the bucket. At a real
    * deployment this table is WRITTEN once (bucketed on `bucket`) and
    * only appended as batches are admitted — the corpus itself is never
    * re-hashed per ingest cycle.
    */
  def minhashBucketIndex(
      corpus: DataFrame, id: String, text: String,
      bands: Int = MinhashBands, rowsPerBand: Int = MinhashRowsPerBand): DataFrame =
    bandedBuckets(corpus, id, text, bands, rowsPerBand)
      .groupBy("bucket").agg(min(col(id)).as("rep_id"))

  /** O(batch) growth of a [[minhashBucketIndex]] artifact (round 20 —
    * the cross-trigger ingest state, advice r19): the admitted batch's
    * per-bucket minima are UNION'd onto the index without re-reducing
    * the corpus side, so a recurring intake stream appends instead of
    * re-aggregating a 100 TB bucket table every cycle. Buckets may
    * therefore repeat across appends — which every consumer already
    * tolerates by construction: [[incrementalMinhash]] min-reduces ALL
    * matched reps per document, so a duplicate bucket row can only
    * re-assert the same (or an older, smaller) representative. The
    * bands/rowsPerBand MUST match the index's build (the screens derive
    * theirs from the same shared constants).
    */
  def minhashIndexAppend(
      index: DataFrame, batch: DataFrame, id: String, text: String,
      bands: Int = MinhashBands, rowsPerBand: Int = MinhashRowsPerBand): DataFrame =
    index.unionByName(
      bandedBuckets(batch, id, text, bands, rowsPerBand)
        .groupBy("bucket").agg(min(col(id)).as("rep_id")))

  /** Incremental NEAR-DUP admission — the LSH companion to
    * [[incrementalDedup]]'s exact-fingerprint anti-join, the shape of a
    * recurring crawl cycle: screen each new-batch document against the
    * ACCEPTED corpus' bucket index, then against its own batch peers,
    * without ever re-hashing the corpus. Output: the batch rows plus
    * `rep_id` / `is_dup` — `rep_id` is the smallest corpus id sharing
    * any LSH bucket (corpus is authoritative: an admitted document
    * always wins over a batch peer), else the smallest batch id over
    * shared buckets, else the document itself (admitted). Documents
    * with no tokens produce no buckets and pass through admitted —
    * near-dup screening has no evidence about them (the
    * [[minhashDedup]] omission contract, made explicit here).
    *
    * Plan shape: one signature aggregation over the BATCH only, one
    * bucket-keyed join against the (pre-bucketed) index, one
    * bucket-keyed self-aggregation of the batch, two id-keyed left
    * joins back. Nothing touches the corpus; nothing is pairwise.
    */
  def incrementalMinhash(
      batch: DataFrame, bucketIndex: DataFrame, id: String, text: String,
      bands: Int = MinhashBands, rowsPerBand: Int = MinhashRowsPerBand): DataFrame = {
    val reserved = Seq("bucket", "rep_id", "is_dup", "_crep", "_brep")
    reserved.foreach(c => require(!batch.columns.contains(c),
      s"input must not already contain reserved column $c"))
    val bBand = bandedBuckets(batch, id, text, bands, rowsPerBand)
      .localCheckpoint(true) // consumed by both the index join and the
                             // peer aggregation; one hash pass, not two
    val vsCorpus = bBand
      .join(bucketIndex.withColumnRenamed("rep_id", "_crep"), Seq("bucket"))
      .groupBy(id).agg(min(col("_crep")).as("_crep"))
    val peerReps = bBand.groupBy("bucket").agg(min(col(id)).as("_brep"))
    val vsBatch = bBand.join(peerReps, Seq("bucket"))
      .groupBy(id).agg(min(col("_brep")).as("_brep"))
    batch
      .join(vsCorpus, Seq(id), "left")
      .join(vsBatch, Seq(id), "left")
      .withColumn("rep_id",
        coalesce(col("_crep"), col("_brep"), col(id)))
      .withColumn("is_dup", col("rep_id") =!= col(id))
      .drop("_crep", "_brep")
  }

  /** MinHash-LSH deduplication as a KEEP/DROP assignment rather than a
    * pair list: each document is assigned the smallest doc id found in any
    * of its LSH buckets (one-step label propagation toward the cluster
    * minimum). Documents with `rep_id != id` are near-dup candidates to
    * drop.
    *
    * This is the 100 TB-safe shape: a corpus with large near-dup classes
    * has QUADRATICALLY many candidate pairs (this testdata: ~8M pairs from
    * 5k docs), but the keep/drop assignment stays O(n·bands) — two
    * shuffles, no pairwise blowup. Full transitive clusters would iterate
    * this propagation to a fixed point (connected components).
    */
  def minhashDedup(
      df: DataFrame, id: String, text: String,
      bands: Int = MinhashBands, rowsPerBand: Int = MinhashRowsPerBand): DataFrame = {
    val k = bands * rowsPerBand
    val sig = minhashSignatures(df, id, text, k)
    val banded = sig.select(col(id),
      explode(array(bandBucketCols(bands, rowsPerBand): _*)).as("bucket"))
    val bucketReps = banded.groupBy("bucket")
      .agg(min(col(id)).as("bucket_rep"), count(lit(1)).as("bucket_size"))
    banded.join(bucketReps, Seq("bucket"))
      .groupBy(id)
      .agg(min(col("bucket_rep")).as("rep_id"), max(col("bucket_size")).as("max_bucket"))
      .withColumn("is_dup", col(id) =!= col("rep_id"))
  }

  /** Full transitive near-dup CLUSTERS: iterate the bucket-min label
    * propagation of [[minhashDedup]] to a fixed point (connected
    * components over the doc–bucket bipartite graph). Converges in
    * O(log(diameter)) rounds — each round is two shuffles (bucket-min,
    * doc-min), no pairwise materialization ever. `maxIter` bounds runaway
    * chains; convergence is detected by counting changed labels.
    */
  def minhashDedupClusters(
      df: DataFrame, id: String, text: String,
      bands: Int = MinhashBands, rowsPerBand: Int = MinhashRowsPerBand, maxIter: Int = 10,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // `checkpointDir` selects DURABLE lineage truncation: localCheckpoint
    // (the default) writes blocks to executor local storage only, so after
    // truncation an executor loss makes the result UNRECOMPUTABLE (the
    // lineage is gone and so are the blocks). On a long-lived cluster pass
    // a reliable store path (HDFS/S3) and the final labels are written
    // there via reliable checkpoint() instead — the label frame is one
    // (id, cluster_id) row per document, a sliver of the corpus, so the
    // durable write is cheap relative to the N-iteration propagation it
    // protects.
    checkpointDir.foreach(df.sparkSession.sparkContext.setCheckpointDir)
    val k = bands * rowsPerBand
    val sig = minhashSignatures(df, id, text, k)
    val banded = sig.select(col(id),
      explode(array(bandBucketCols(bands, rowsPerBand): _*)).as("bucket"))
      .persist()
    banded.count() // materialize once; reused every iteration

    // Iteration economy (this loop is stage-scheduling-bound, not
    // data-bound, at test scale — and at 100 TB every saved shuffle is a
    // corpus-wide pass):
    //  - `_changed` rides along inside the cached labels frame, so ONE
    //    action per iteration both materializes the new labels and measures
    //    convergence (the old shape paid an extra join + count job);
    //  - iteration 0 skips the labels joins entirely — labels are
    //    identically the doc id before the first propagation.
    var labels: DataFrame = null // null = implicit identity labels
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val withLabels =
        if (labels == null) banded.withColumn("label", col(id))
        else banded.join(labels, id)
      val bucketMin = withLabels
        .groupBy("bucket").agg(min("label").as("bucket_min"))
      val propagated = banded.join(bucketMin, Seq("bucket"))
        .groupBy(id).agg(min("bucket_min").as("prop"))
      // localCheckpoint (NOT persist) each round: persist caches blocks
      // but the logical plan keeps nesting the iteration history and
      // Catalyst re-analyzes the deepening tree every round — measured on
      // the simhash twin of this loop: 0.9 s -> 34.6 s per round by
      // iteration 9. The checkpoint truncates lineage; rounds stay flat.
      val next = (
        if (labels == null) propagated.withColumn("label", col(id))
        else propagated.join(labels, id))
        .select(col(id), least(col("label"), col("prop")).as("label"),
          (col("prop") < col("label")).as("_changed"))
        .localCheckpoint(true)
      val changed = next.filter(col("_changed")).count()
      if (labels != null) labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    banded.unpersist()
    // Truncate the N-iteration lineage and release the loop's cached
    // blocks: the returned frame must not pin per-iteration caches (their
    // lifetime would otherwise be the session's) nor recompute the whole
    // loop on first use.
    val finalLabels = labels.drop("_changed").withColumnRenamed("label", "cluster_id")
    val result =
      if (checkpointDir.isDefined) finalLabels.checkpoint(true)
      else finalLabels.localCheckpoint(true)
    labels.unpersist()
    result
  }

  /** Incremental ingest dedup: drop new-batch documents whose content
    * already exists in the accepted corpus, then dedup the survivors among
    * themselves — the shape of every recurring crawl/ingest cycle (the
    * corpus is orders of magnitude larger than the batch, and is NEVER
    * re-deduped).
    *
    * Plan shape: one anti-join of the batch against the corpus on the
    * 16-byte md5 fingerprint (at scale the corpus side is a bucketed/
    * pre-partitioned fingerprint index, so the join is exchange-free on
    * the big side), then the usual smallest-id-wins exact dedup within the
    * batch. Near-dup screening composes downstream ([[minhashDedup]] over
    * the survivors + corpus representatives).
    */
  def incrementalDedup(
      batch: DataFrame, corpus: DataFrame, id: String, text: String): DataFrame = {
    val fp = "_graft_fp"
    require(!Seq(fp, "_rn").exists(batch.columns.contains) &&
        !corpus.columns.contains(fp),
      s"incrementalDedup reserves columns ${fp}, _rn")
    val batchFp = batch.withColumn(fp, TextAnalysis.fingerprint(col(text)))
    val corpusFp = corpus.select(TextAnalysis.fingerprint(col(text)).as(fp))
    val novel = batchFp.join(corpusFp, Seq(fp), "left_anti")
    // within-batch exact dedup: smallest id per fingerprint survives
    val w = Window.partitionBy(fp).orderBy(col(id))
    novel.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", fp)
  }

  /** Bloom-screened incremental dedup — [[incrementalDedup]]'s corpus
    * screen restructured for the 100 TB shape where even the corpus
    * FINGERPRINT table is too large to join every ingest batch against:
    *
    *  1. build (or reuse — at scale it is maintained incrementally) a
    *     [[Sketches.bloomIndex]] over the corpus fingerprints: ≤ mBits/32
    *     rows, broadcastable, ONE constant-size-shuffle pass over the
    *     corpus ever;
    *  2. [[Sketches.bloomScreen]] the batch against it — no shuffle of
    *     either side, no false negatives;
    *  3. exact-verify ONLY the `maybe_seen` rows with the anti-join (the
    *     false-positive fraction plus the true duplicates), so the join's
    *     probe side shrinks from |batch| to |dups| + ε·|batch|.
    *
    * Definite-new rows (bloom says no) bypass the join entirely — the
    * Bloom no-false-negative guarantee makes the result EQUAL to the
    * plain anti-join's, which is exactly what the oracle checks. Returns
    * the batch rows not present in the corpus (batch-internal dups are
    * NOT collapsed here; compose [[incrementalDedup]] semantics
    * downstream if needed).
    */
  def bloomDedup(
      batch: DataFrame, corpus: DataFrame, text: String,
      mBits: Int = 1 << 22, k: Int = 4,
      salt: String = "graft:bloomdedup"): DataFrame = {
    val fp = "_graft_fp"
    require(!batch.columns.contains(fp) && !corpus.columns.contains(fp),
      s"bloomDedup reserves column $fp")
    val corpusFp = corpus.select(TextAnalysis.fingerprint(col(text)).as(fp))
    val index = Sketches.bloomIndex(corpusFp, col(fp), mBits, k, salt)
    // Two consumers (definite-new filter + maybe-verify join) read the
    // screened frame — pin it, or each replays the screen's full
    // upstream plan (the multi-consumer rule).
    val screened = Sketches.bloomScreen(
      index, batch.withColumn(fp, TextAnalysis.fingerprint(col(text))),
      col(fp), mBits, k, salt).localCheckpoint(true)
    val definiteNew = screened.filter(!col("maybe_seen") || col("maybe_seen").isNull)
    val verifiedNew = screened.filter(col("maybe_seen"))
      .join(corpusFp, Seq(fp), "left_anti")
    definiteNew.unionByName(verifiedNew).drop("maybe_seen", fp)
  }

  /** CHUNK-level exact dedup over content-defined chunks — the payoff of
    * [[TextAnalysis.cdcChunks]]'s edit-stable fingerprints: because a
    * chunk's identity survives upstream edits, "how much of this corpus
    * is re-used content" is one fingerprint `groupBy`, no alignment, no
    * pairwise stage. Per document: total chunks, how many were DUPLICATE
    * chunks (their fingerprint's keeper — least `(id, chunk_id)` — lives
    * elsewhere), and the duplicated token mass. A document whose
    * `dup_tokens`/`n_tokens` is high is boilerplate or a near-copy even
    * when whole-document dedup misses it (the Lee et al. motivation at
    * chunk granularity).
    *
    * Plan: [[TextAnalysis.cdcChunks]]'s exchanges + ONE fingerprint-keyed
    * window + one id-keyed regroup. All integer outputs — replays
    * exactly.
    */
  def chunkDedup(
      df: DataFrame, id: String, text: String,
      targetTokens: Int = 64): DataFrame = {
    val w = Window.partitionBy(col("chunk_fp"))
      .orderBy(col(id), col("chunk_id"))
    TextAnalysis.cdcChunks(df, id, text, targetTokens)
      .withColumn("_rn", row_number().over(w))
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("_rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(col("chunk_tokens")).as("n_tokens"),
        sum(when(col("_rn") > 1, col("chunk_tokens")).otherwise(0L))
          .as("dup_tokens"))
  }

  /** SOURCE-PRIORITY exact dedup — the multi-source corpus-merge rule
    * (Dolma-style): when the same content arrives from several sources
    * (a curated dump AND a web crawl), keep the copy from the most
    * trusted source, not the one with the smallest id. `priorities`
    * maps source → rank (SMALLER = more trusted); sources absent from
    * the map (and NULL sources) get `defaultPriority`, and ties within
    * a priority fall back to the least id — fully deterministic.
    *
    * The priority map is a PLAN LITERAL (`typedlit` + `try_element_at`)
    * — no join, no broadcast; the lookup fuses into the scan. The only
    * exchange is the one fingerprint partitioning, shared by the keeper
    * window and both annotation windows.
    *
    * Output: the surviving row per distinct content fingerprint, plus
    * `n_dups` (group size) and `n_sources` (distinct sources seen —
    * n_sources > 1 marks content whose provenance is contested).
    * NULL-text rows have no content key, pass through unconditionally,
    * and carry NULL annotations.
    */
  def priorityDedup(
      df: DataFrame, id: String, text: String, source: String,
      priorities: Map[String, Int],
      defaultPriority: Int = Int.MaxValue): DataFrame = {
    require(priorities.nonEmpty, "priorities must not be empty")
    val reserved = Seq("_fp", "_prio", "_rn", "n_dups", "n_sources")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input must not already contain reserved column $c"))
    val prio = coalesce(
      try_element_at(typedlit(priorities), col(source)),
      lit(defaultPriority))
    val wGrp = Window.partitionBy(col("_fp"))
    val wKeep = wGrp.orderBy(col("_prio"), col(id))
    val kept = df.where(col(text).isNotNull)
      .withColumn("_fp", TextAnalysis.fingerprint(col(text)))
      .withColumn("_prio", prio)
      .withColumn("_rn", row_number().over(wKeep))
      .withColumn("n_dups", count(lit(1)).over(wGrp))
      .withColumn("n_sources",
        size(collect_set(col(source)).over(wGrp)).cast("long"))
      .where(col("_rn") === 1)
      .drop("_rn", "_fp", "_prio")
    kept.unionByName(
      df.where(col(text).isNull)
        .withColumn("n_dups", lit(null).cast("long"))
        .withColumn("n_sources", lit(null).cast("long")))
  }

  /** Benchmark decontamination: drop corpus documents that share ANY word
    * `n`-gram with a benchmark/test set — the standard guard against
    * evaluation leakage in training corpora (n-gram collision against the
    * eval sets, typically n in 8..13).
    *
    * Plan shape: the benchmark (small side) explodes to a DISTINCT gram
    * set that is BROADCAST; the corpus explodes to (id, gram) and
    * semi-joins it — the 100 TB corpus never shuffles on the gram key.
    * The contaminated-id set (small by construction) then anti-joins the
    * corpus. Documents with fewer than `n` tokens (or NULL text) have no
    * gram, can't collide, and pass through the anti-join untouched.
    */
  def decontaminate(
      docs: DataFrame, benchmark: DataFrame, id: String, text: String,
      n: Int = 8, forceBroadcastContaminated: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val benchGrams = benchmark
      .select(explode(TextAnalysis.wordNgrams(col(text), n)).as("_gram"))
      .distinct()
    val docGrams = docs
      .select(col(id), explode(TextAnalysis.wordNgrams(col(text), n)).as("_gram"))
    val contaminated = docGrams
      .join(broadcast(benchGrams), Seq("_gram"), "left_semi")
      .select(id).distinct()
    // The contaminated-id set is bounded by the benchmark's GRAM REACH into
    // the corpus, NOT by the benchmark size — an adversarial corpus (every
    // doc quoting a benchmark gram) makes it as large as the corpus itself.
    // Default forces the broadcast (typical contamination is well under 1%,
    // and the corpus then stays exchange-free even with a pessimistic size
    // estimate); pass forceBroadcastContaminated = false when that bound
    // can't be trusted — AQE then broadcasts only if the runtime shuffle
    // size is actually small, else falls back to a shuffle anti-join.
    val hinted =
      if (forceBroadcastContaminated) broadcast(contaminated) else contaminated
    docs.join(hinted, Seq(id), "left_anti")
  }

  /** Contamination FORENSICS — the report behind [[decontaminate]]'s
    * verdict: which benchmark document leaks into which corpus document,
    * and through how many distinct shared word `n`-grams. Auditing a
    * decontamination pass needs this (was the hit one boilerplate
    * sentence or a wholesale quote?); so does fixing the benchmark when
    * the leak direction is benchmark-from-web.
    *
    * Plan: both sides explode to DISTINCT (id, gram) postings; the
    * benchmark side (small by definition) is BROADCAST into the gram
    * join, so the corpus never shuffles on grams; the (corpus, bench)
    * pair aggregate is bounded by actual contamination, not corpus size.
    */
  def contaminationReport(
      docs: DataFrame, benchmark: DataFrame, id: String, text: String,
      n: Int = 8): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val docGrams = docs
      .select(col(id), explode(TextAnalysis.wordNgrams(col(text), n)).as("_gram"))
      .distinct()
    val benchGrams = benchmark
      .select(col(id).as("bench_id"),
        explode(TextAnalysis.wordNgrams(col(text), n)).as("_gram"))
      .distinct()
    docGrams.join(broadcast(benchGrams), Seq("_gram"))
      .groupBy(col(id), col("bench_id"))
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** Semantic (embedding-space) benchmark decontamination: drop corpus
    * rows whose embedding is within cosine `threshold` of ANY benchmark
    * embedding — the companion to the n-gram [[decontaminate]] for
    * paraphrased leakage that shares no surface text. Exact, not ANN: a
    * benchmark is small BY DEFINITION, so the right 100 TB shape is a
    * broadcast nested-loop LEFT ANTI join — the corpus never shuffles,
    * each row scans the broadcast benchmark vectors with the codegen'd
    * [[graft.functions.FloatVectorCosine]] and short-circuits on the first
    * hit. NULL / zero-norm / mis-dimensioned pairs yield NULL cosine,
    * which never passes the threshold — such rows survive (they can't be
    * semantic leaks if they can't be compared).
    *
    * For benchmarks too large to broadcast, pre-reduce them (dedup /
    * centroid summaries) rather than swapping in an ANN index here — a
    * decontamination that can MISS leaks defeats its purpose.
    */
  def semanticDecontaminate(
      corpus: DataFrame, corpusVec: String,
      benchmark: DataFrame, benchVec: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    // same reserved-column guard as the sibling dedup operators: a corpus
    // `_bvec` would be ambiguous against the aliased benchmark vector in
    // the join condition below
    require(!corpus.columns.contains("_bvec"),
      "semanticDecontaminate reserves column _bvec")
    val bench = broadcast(benchmark.select(col(benchVec).as("_bvec")))
    corpus.join(bench,
      graft.functions.VectorFunctions
        .float_vector_cosine(col(corpusVec), col("_bvec")) >= threshold,
      "left_anti")
  }

  /** Consecutive NON-overlapping n-token spans of a document as an array
    * column — the unit of C4-style cross-document span removal. The last
    * span keeps the remainder (may be shorter than n). One `transform`
    * with a per-SPAN lambda (per-chunk lambdas are fine; per-token ones
    * run interpreted). NULL for NULL text. The span count is an exact
    * ceil-division on int-sized token counts (double division is exact
    * below 2^53, and a single document's token count is far below that).
    */
  def docSpans(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = TextAnalysis.tokens(text)
    val nSpans = floor((size(toks).cast("double") + (n - 1)) / n).cast("int")
    when(text.isNotNull,
      transform(sequence(lit(0), nSpans - 1), i =>
        array_join(slice(toks, i * n + 1, lit(n)), " ")))
  }

  /** C4-style cross-document span dedup (Raffel et al. 2020 §2.2 removed
    * any three-sentence span occurring more than once in the corpus; this
    * is the token-span variant): split every document into consecutive
    * n-token spans, count each span's DOCUMENT frequency corpus-wide, drop
    * spans appearing in more than `dfCap` documents, and reassemble the
    * surviving spans in order. Boilerplate (headers, license blocks,
    * navigation chrome) disappears from every copy at once — finer-grained
    * than whole-document dedup, which keeps one full copy per near-dup
    * cluster.
    *
    * Plan shape: explode to (id, span_idx, span), ONE span-keyed
    * aggregation with map-side partial distinct (`countDistinct(id)`), a
    * span-keyed join reusing that partitioning, then one id-keyed regroup
    * — three exchanges of span-sized data, nothing quadratic, no
    * driver-side state. At 100 TB the span-frequency table can also be
    * computed once and reused across incremental batches (same shape as
    * [[incrementalDedup]]'s fingerprint index).
    *
    * Output: the input row plus `clean_text` (surviving spans joined by a
    * single space — token-canonical, original whitespace not preserved).
    * Documents whose every span was removed get `clean_text = ""`; NULL
    * text stays NULL (left join + explicit NULL guard, so no row is lost).
    */
  def dedupSpansAcrossDocs(
      df: DataFrame, id: String, text: String,
      n: Int = 5, dfCap: Long = 1): DataFrame = {
    require(dfCap >= 1, s"dfCap must be >= 1, got $dfCap")
    val reserved = Seq("_span_idx", "_span", "_span_df", "clean_text")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input must not already contain reserved column $c"))
    // Pinned (r20): df feeds the span explode AND the final rebuild
    // join; spans feeds the frequency aggregate AND the survivor join —
    // unpinned, each consumer replays the caller's upstream plan (the
    // multi-consumer rule).
    val dfP = df.localCheckpoint(true)
    val spans = dfP
      .where(col(text).isNotNull)
      .select(col(id),
        posexplode(docSpans(col(text), n)).as(Seq("_span_idx", "_span")))
      .localCheckpoint(true)
    val freq = spans
      .groupBy("_span").agg(countDistinct(col(id)).as("_span_df"))
      .where(col("_span_df") <= dfCap)
    val rebuilt = spans
      .join(freq.drop("_span_df"), Seq("_span"), "left_semi")
      .groupBy(id)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("_span_idx"), col("_span")))),
          s => s("_span")), " ").as("clean_text"))
    dfP.join(rebuilt, Seq(id), "left")
      .withColumn("clean_text",
        when(col(text).isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("clean_text"), lit(""))))
  }

  /** EXACT-SUBSTRING dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", the ExactSubstr variant):
    * remove every VERBATIM token sequence of length ≥ `minTokens` that
    * also occurs elsewhere in the corpus — keeping exactly ONE copy (the
    * occurrence in the globally-first position). The paper builds one
    * giant suffix array; the Spark-native re-expression observes that a
    * repeated run of length L ≥ N is exactly a run of L−N+1 repeated
    * N-token WINDOWS, so sliding-window gram grouping finds the same
    * spans without any global suffix structure:
    *
    *  1. every overlapping `minTokens`-token window of every document,
    *     keyed by its md5 (grams never carry their text past the hash —
    *     the exchange moves 32-byte keys, not 50-token strings);
    *  2. windows whose key occurs more than once corpus-wide are
    *     duplicated; the occurrence with the least `(id, pos)` is the
    *     KEEPER and survives;
    *  3. non-keeper duplicated windows expand to their covered token
    *     positions (a bounded ×minTokens explode of FLAGGED rows only);
    *  4. uncovered tokens reassemble in position order.
    *
    * Unlike [[dedupSpansAcrossDocs]] (C4 fixed non-overlapping spans
    * with a document-frequency cap), this is exact-match granularity:
    * ANY alignment of a ≥N-token verbatim repeat is caught, shifted
    * copies included, and one canonical copy always survives.
    *
    * Output: input row + `clean_text` (surviving tokens joined by one
    * space) + `n_removed` (tokens removed, 0 for untouched docs, NULL
    * for NULL text). md5-collision risk on a window key is ~2⁻¹²⁸ —
    * the standard fingerprint-equality tradeoff documented at
    * [[exactDedupByHash]].
    *
    * Plan shape: one gram-keyed exchange (count + keeper rank share the
    * single window partitioning), one id-keyed regroup, one broadcast-
    * friendly left join back — nothing pairwise, nothing driver-side;
    * the only data-dependent blowup is minTokens× on the flagged subset
    * (at 100 TB the flagged fraction is the corpus duplication rate,
    * which this operator exists to make small).
    */
  def exactSubstringDedup(
      df: DataFrame, id: String, text: String,
      minTokens: Int = 50): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2, got $minTokens")
    val reserved = Seq("_pos", "_tok", "_h", "_cnt", "_keep", "_covered",
      "clean_text", "n_removed")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input must not already contain reserved column $c"))
    // Pinned (r20): the input feeds the token explode, the gram-window
    // explode, AND the final rebuild join — unpinned, each consumer
    // replayed the caller's full upstream plan (the q_dedup_substring
    // plan read 12 source scans; the multi-consumer rule).
    val dfP = df.localCheckpoint(true)
    val toks = dfP.where(col(text).isNotNull)
      .select(col(id),
        posexplode(TextAnalysis.tokens(col(text))).as(Seq("_pos", "_tok")))
      .where(col("_tok") =!= "")
    // overlapping windows: md5 of the N-token slice starting at _pos
    val grams = dfP.where(col(text).isNotNull)
      .select(col(id), TextAnalysis.tokens(col(text)).as("_t"))
      .select(col(id),
        posexplode(when(size(col("_t")) >= minTokens,
          transform(sequence(lit(0), size(col("_t")) - minTokens),
            i => md5(array_join(slice(col("_t"), i + 1, lit(minTokens)), " "))))
          .otherwise(array().cast("array<string>")))
          .as(Seq("_pos", "_h")))
    val wCnt = Window.partitionBy(col("_h"))
    val wRank = Window.partitionBy(col("_h")).orderBy(col(id), col("_pos"))
    val flagged = grams
      .withColumn("_cnt", count(lit(1)).over(wCnt))
      .withColumn("_keep", row_number().over(wRank))
      .where(col("_cnt") > 1 && col("_keep") > 1)
    // Island merge before the coverage expansion: a maximal repeated run
    // of length L flags L−N+1 CONSECUTIVE window starts, so exploding
    // each start over its N covered positions would emit ~N× the covered
    // set and need a distinct to collapse it (at the paper's N = 50,
    // 50× transient rows). Collapsing flagged starts whose coverages
    // touch (gap ≤ N — overlapping or adjacent [p, p+N−1] ranges merge
    // exactly) into island spans first emits each covered position ONCE
    // — no distinct, linear output. One id-keyed window (the rebuild
    // regroup reuses the same exchange key downstream).
    val wDoc = Window.partitionBy(col(id)).orderBy(col("_pos"))
    val islands = flagged
      .withColumn("_brk",
        when(col("_pos") - lag(col("_pos"), 1, -(minTokens.toLong + 1))
            .over(wDoc) > minTokens, 1L)
          .otherwise(0L))
      .withColumn("_isl",
        sum(col("_brk")).over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(id), col("_isl"))
      .agg(min(col("_pos")).as("_s"),
        (max(col("_pos")) + (minTokens - 1)).as("_e"))
    val covered = islands
      .select(col(id), explode(sequence(col("_s"), col("_e"))).as("_covered"))
    val rebuilt = toks
      .join(covered,
        toks(id) === covered(id) && col("_pos") === col("_covered"),
        "left_anti")
      .groupBy(id)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          s => s("_tok")), " ").as("clean_text"),
        count(lit(1)).as("_kept"))
    dfP.join(rebuilt, Seq(id), "left")
      .withColumn("clean_text",
        when(col(text).isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("clean_text"), lit(""))))
      .withColumn("n_removed",
        when(col(text).isNull, lit(null).cast("long"))
          .otherwise(
            size(filter(TextAnalysis.tokens(col(text)), t => t =!= ""))
              .cast("long") - coalesce(col("_kept"), lit(0L))))
      .drop("_kept")
  }

  /** SimHash fingerprint width: 60 bits, the widest value the replayable
    * md5-hex base hash yields without signed-overflow gymnastics (15 hex
    * chars → [0, 2^60)). Bits 60–63 of the LongType fingerprint are zero
    * for every document, which changes nothing semantically: Hamming
    * distances ignore always-equal bits and the 16-bit band scheme keeps
    * its pigeonhole recall guarantee (band 3 just carries 12 live bits).
    */
  private[graft] val SimhashBits = 60

  /** Replayable 60-bit token hash: first 15 md5 hex chars as a long — the
    * q_sample_weighted idiom, mirrored in the DuckDB oracle as
    * `CAST('0x'||substr(md5(tok),1,15) AS BIGINT)`. Chosen over xxhash64
    * so simhash pairing is oracle-checkable (DuckDB has no xxhash64).
    */
  private def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 60-bit SimHash over word tokens: each token's md5-derived hash votes
    * ±1 per bit position, the sign of each accumulated bit forms the
    * fingerprint. One pass, pure Column expressions.
    */
  def simhash64(text: Column): Column = {
    val toks = array_distinct(TextAnalysis.tokens(text))
    val counters = aggregate(
      toks,
      array_repeat(lit(0L), SimhashBits),
      (acc, t) => {
        val h = md5Hash60(t)
        zip_with(acc, sequence(lit(0), lit(SimhashBits - 1)),
          (c, i) => c + when(
            call_function("shiftright", h, i.cast("int")).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L))
      })
    aggregate(
      zip_with(counters, sequence(lit(0), lit(SimhashBits - 1)),
        (c, i) => when(c > 0,
          call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, z) => acc + z)
  }

  /** Scale-path SimHash: distinct tokens explode once, each bit position
    * is a codegen'd conditional-sum aggregate (64 sums in one hash
    * aggregation), and the fingerprint is reassembled from the bit votes.
    * Same result as [[simhash64]] for documents with at least one token,
    * ~10x faster on wide corpora because nothing runs interpreted.
    * Documented divergence: NULL-text documents explode to zero token rows
    * and are ABSENT from this table (and from [[simhashPairs]] buckets),
    * whereas [[simhash64]] returns a NULL fingerprint row for them —
    * either way they never participate in near-dup pairing.
    */
  def simhashTable(df: DataFrame, id: String, text: String): DataFrame =
    // One-pass native fingerprint (optimization r20,
    // [[graft.functions.SimhashImpl]]): the explode + 60-conditional-sum
    // aggregate this replaces shuffled ~tokens-per-doc rows per document;
    // the native expression makes the signature stage a pure map over
    // the scan. Bit-equivalence vs both legacy forms is pinned by
    // SimhashNativeSpec; the NULL-text row absence (explode emitted no
    // rows) is preserved by the isNotNull filter.
    df.where(col(text).isNotNull)
      .select(col(id),
        graft.functions.SimhashFunctions.simhash60(col(text)).as("sim"))

  /** The 4 disjoint 16-bit band-bucket keys of a simhash fingerprint:
    * band b is bits [16b, 16b+16); the band index is part of the key so
    * band 0's bucket space never collides with band 1's. Pigeonhole: a
    * pair within Hamming distance 3 differs in at most 3 bands, so it
    * MUST agree exactly on at least one band and surfaces in that band's
    * bucket. More generally, b bands guarantee recall for
    * maxHamming <= b-1; the fixed 4 bands cover the default 3.
    */
  private val SimhashBandCount = 4
  private def simhashBandKeys(sim: Column): Seq[Column] =
    (0 until SimhashBandCount).map { bnd =>
      struct(lit(bnd).as("band"),
        shiftright(sim, 16 * bnd).bitwiseAND(0xFFFFL).as("bits"))
    }

  /** Distinct-fingerprint CLASSES of a corpus: one row per distinct
    * simhash value with its representative (smallest doc id) and member
    * count. The collapse that makes the pairs/assignment APIs safe on
    * duplicate-heavy corpora: every downstream banding/joining stage
    * works on classes, whose count is bounded by the number of DISTINCT
    * fingerprints, not documents — a corpus that is 90% boilerplate
    * mirrors collapses 10x here before anything self-joins.
    */
  private def simhashClasses(df: DataFrame, id: String, text: String): DataFrame =
    simhashTable(df, id, text)
      .groupBy("sim")
      .agg(min(col(id)).as("crep"), count(lit(1)).as("cnt"))
      // bounded by DISTINCT fingerprints and consumed 2-4x downstream
      // (intra rows + both band-join sides + the rep join) - pin so each
      // consumer reads the collapsed frame, not a re-run of the corpus
      // tokenize/vote aggregation (r12 multi-consumer lesson)
      .localCheckpoint(true)

  /** Cross-class near-dup edges: pairs of DISTINCT fingerprints within
    * `maxHamming`, surfaced via the band buckets (union over bands —
    * O(classes · 4), no all-pairs stage) and verified with full Hamming
    * distance. One row per unordered class pair, carrying both reps and
    * counts. Shared by [[simhashPairs]] and [[simhashDedup]].
    */
  private def simhashClassEdges(classes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= SimhashBandCount - 1,
      s"$SimhashBandCount bands only guarantee recall for Hamming <= " +
        s"${SimhashBandCount - 1}, got $maxHamming")
    val banded = classes.select(col("sim"), col("crep"), col("cnt"),
      explode(array(simhashBandKeys(col("sim")): _*)).as("bucket"))
    val a = banded.select(col("sim").as("sim1"), col("crep").as("rep1"),
      col("cnt").as("cnt1"), col("bucket"))
    val b = banded.select(col("sim").as("sim2"), col("crep").as("rep2"),
      col("cnt").as("cnt2"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("sim1") < col("sim2")) // unordered pair, once
      .withColumn("hamming", bit_count(col("sim1").bitwiseXOR(col("sim2"))))
      .filter(col("hamming") <= maxHamming)
      // a class pair can match in several bands — dedup across bands;
      // reps/counts are functions of the sims, so they ride the distinct
      .select("sim1", "sim2", "rep1", "rep2", "cnt1", "cnt2", "hamming")
      .distinct()
  }

  /** SimHash near-dup pairs, COLLAPSED to fingerprint classes so the
    * output is never quadratic in duplicate-class size. Identical
    * fingerprints are grouped BEFORE banding; the result has one row per
    * near-dup CLASS PAIR rather than one per document pair:
    *
    *  - intra-class rows (`id1 == id2` = the class representative,
    *    `hamming = 0`): all `n_pairs = cnt·(cnt−1)/2` document pairs
    *    inside one identical-fingerprint class;
    *  - cross-class rows (`id1 < id2` = the two class representatives,
    *    `hamming` in [1, maxHamming]): all `n_pairs = cnt1·cnt2` document
    *    pairs across the two classes.
    *
    * Sum of `n_pairs` equals the exact document-pair count the exploded
    * form would emit, but the row count is linear in distinct
    * fingerprints plus class edges — on a crawl corpus where mirrored
    * boilerplate forms classes of millions of documents, the exploded
    * list is O(c²) per class and unwritable at 100 TB, while this shape
    * stays one row per class. (Recall guarantee: see
    * [[simhashBandKeys]].)
    */
  def simhashPairs(df: DataFrame, id: String, text: String, maxHamming: Int = 3): DataFrame = {
    val classes = simhashClasses(df, id, text)
    val intra = classes.filter(col("cnt") >= 2)
      .select(col("crep").as("id1"), col("crep").as("id2"),
        lit(0).as("hamming"),
        // cnt·(cnt−1) is even, so the shift is exact integer C(cnt,2) —
        // no double-division roundtrip for huge classes
        shiftright(col("cnt") * (col("cnt") - 1), 1).as("n_pairs"))
    val cross = simhashClassEdges(classes, maxHamming)
      .select(least(col("rep1"), col("rep2")).as("id1"),
        greatest(col("rep1"), col("rep2")).as("id2"),
        col("hamming"),
        (col("cnt1") * col("cnt2")).cast("long").as("n_pairs"))
    intra.unionByName(cross)
  }

  /** SimHash deduplication as a KEEP/DROP assignment (the
    * [[minhashDedup]] shape, with simhash's exact Hamming verify): each
    * document's `rep_id` is the smallest doc id among its own
    * identical-fingerprint class and every class within `maxHamming` of
    * it (one-step label propagation toward the neighborhood minimum).
    * Documents with `rep_id != id` are near-dup candidates to drop.
    *
    * This is the 100 TB-safe shape the pair list can never be: identical
    * fingerprints collapse to one class row before banding, the band
    * self-join runs over DISTINCT fingerprints only, and the per-document
    * output is exactly one row. Unlike the LSH bucket-min of
    * [[minhashDedup]], every propagation edge here is Hamming-VERIFIED —
    * two classes sharing a band but differing in > maxHamming bits never
    * merge. Full transitive closure would iterate the propagation
    * ([[minhashDedupClusters]]' loop applied to class edges).
    *
    * Documents absent from [[simhashTable]] (NULL text — no tokens, no
    * fingerprint) keep themselves: `rep_id = id`, `is_dup = false`.
    */
  def simhashDedup(df: DataFrame, id: String, text: String, maxHamming: Int = 3): DataFrame = {
    // ONE signature pass: the per-doc table feeds both the class collapse
    // and the doc->rep mapping join below
    val sigs = simhashTable(df, id, text).localCheckpoint(true)
    val classes = sigs
      .groupBy("sim")
      .agg(min(col(id)).as("crep"), count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // smallest neighboring-class rep per fingerprint, from BOTH edge
    // directions (edges carry each unordered pair once)
    val edges = simhashClassEdges(classes, maxHamming)
    val neigh = edges.select(col("sim1").as("sim"), col("rep2").as("nrep"))
      .unionByName(edges.select(col("sim2").as("sim"), col("rep1").as("nrep")))
      .groupBy("sim").agg(min(col("nrep")).as("nrep"))
    val classRep = classes.join(neigh, Seq("sim"), "left")
      .select(col("sim"),
        least(col("crep"), coalesce(col("nrep"), col("crep"))).as("_rep"))
    df.select(col(id))
      .join(sigs.join(classRep, "sim").select(col(id), col("_rep")), Seq(id), "left")
      .select(col(id), coalesce(col("_rep"), col(id)).as("rep_id"))
      .withColumn("is_dup", col(id) =!= col("rep_id"))
  }

  /** Persisted simhash band index of the accepted corpus — the simhash
    * analogue of [[minhashBucketIndex]], built ONCE per corpus state and
    * reused by every [[incrementalSimhash]] admission batch. Rows carry
    * the full fingerprint (unlike the minhash index's bucket-min): the
    * incremental screen Hamming-VERIFIES every candidate, so band
    * collisions beyond `maxHamming` never merge.
    */
  def simhashBandIndex(
      corpus: DataFrame, id: String, text: String,
      maxHamming: Int = 3, bands: Int = 0): DataFrame = {
    val nb = HammingBands.resolveBands(maxHamming, bands, SimhashBits)
    simhashTable(corpus, id, text)
      .select(col(id).as("media_id"), col("sim"),
        explode(array(
          HammingBands.bandKeys(col("sim"), SimhashBits, nb): _*)).as("bucket"))
      // stamped AFTER the explode: the analyzer's generator extraction
      // drops alias metadata on a generator expression itself
      .select(HammingBands.withLayoutMeta(col("bucket"), nb),
        col("media_id"), col("sim"))
  }

  /** Incremental simhash admission: screen a new batch against the
    * persisted corpus band index, then against batch peers — the
    * recurring-crawl shape (corpus never re-hashed) on the SIMHASH
    * fingerprint, wired through the shared
    * [[HammingBands.incrementalScreen]] core exactly like the
    * image/audio admissions (one screen implementation, four
    * modalities). NULL-text documents ride the spine and admit
    * (`rep_id = id` — no fingerprint, no evidence).
    */
  def incrementalSimhash(
      batch: DataFrame, bandIndex: DataFrame, id: String, text: String,
      maxHamming: Int = 3, bands: Int = 0): DataFrame = {
    val spine = batch.select(col(id).as("media_id"))
      .join(simhashTable(batch, id, text)
        .select(col(id).as("media_id"), col("sim")), Seq("media_id"), "left")
      .localCheckpoint(true) // incrementalScreen's caller contract
    // banding derives from the index itself (HammingBands.bandsFromIndex,
    // advice r16) — a layout mismatch fails loudly instead of silently
    // joining disjoint bucket structs and admitting every duplicate
    HammingBands.incrementalScreen(spine, bandIndex, "sim",
        SimhashBits, maxHamming, bands)
      .withColumnRenamed("media_id", id)
  }

  /** Full TRANSITIVE simhash clusters — [[simhashDedup]]'s one-step
    * propagation iterated to a fixed point, completing the simhash trio
    * (pairs / assignment / clusters) exactly as minhash has
    * ([[minhashDedupClusters]]). The decisive scale property: the label
    * propagation runs over the CLASS graph (one node per distinct
    * fingerprint, Hamming-VERIFIED edges), so each round's two joins are
    * bounded by distinct fingerprints, not documents — a duplicate-heavy
    * corpus collapses before the loop ever starts. Each round is one
    * neighbor-min join + one least() merge with ONE action (the
    * [[minhashDedupClusters]] iteration-economy discipline); documents
    * map to their class's converged label at the end, NULL-text
    * documents cluster alone.
    */
  def simhashDedupClusters(
      df: DataFrame, id: String, text: String, maxHamming: Int = 3,
      maxIter: Int = 10): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val sigs = simhashTable(df, id, text).localCheckpoint(true)
    val classes = sigs.groupBy("sim")
      .agg(min(col(id)).as("crep"), count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val edges = simhashClassEdges(classes, maxHamming)
    val und = edges.select(col("sim1").as("_s"), col("sim2").as("_d"))
      .unionByName(edges.select(col("sim2").as("_s"), col("sim1").as("_d")))
      .localCheckpoint(true) // reused every iteration
    var labels = classes.select(col("sim"), col("crep").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = und
        .join(labels.select(col("sim").as("_d"), col("label")), "_d")
        .groupBy(col("_s").as("sim"))
        .agg(min(col("label")).as("_prop"))
      // localCheckpoint (NOT persist) each round: persist caches data but
      // the logical plan keeps nesting the whole iteration history, and
      // Catalyst re-analyzes the deepening tree every round — measured
      // 0.9 s → 34.6 s per round by iteration 9 on a 3.8k-class graph;
      // the checkpoint truncates lineage and holds rounds at ~0.7 s
      // (the r11 iterative-loop lesson, relearned with numbers)
      val next = labels.join(nbrMin, Seq("sim"), "left")
        .select(col("sim"),
          least(col("label"), coalesce(col("_prop"), col("label"))).as("label"),
          (coalesce(col("_prop"), col("label")) < col("label")).as("_changed"))
        .localCheckpoint(true)
      val changed = next.filter(col("_changed")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    df.select(col(id))
      .join(sigs.join(labels.select("sim", "label"), "sim")
        .select(col(id), col("label")), Seq(id), "left")
      .select(col(id), coalesce(col("label"), col(id)).as("cluster_id"))
  }

  /** Embedding-cosine near-duplicates: LSH-bucketed candidate pairs
    * verified by exact cosine >= threshold.
    *
    * `probeHamming = 1` also pairs vectors whose signatures differ in
    * exactly one bit (multi-probe: one side's bucket key explodes to its
    * 1-bit flips) — recall rises without another signature pass, and
    * precision is untouched because every candidate is still verified by
    * exact cosine. No pair can surface twice: for a fixed pair the exact
    * match and each single-bit flip are mutually exclusive signature
    * relations, so no distinct() is needed.
    */
  def embeddingNearDupPairs(
      df: DataFrame, id: String, vec: String,
      threshold: Double, bits: Int = 10, probeHamming: Int = 0): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 1,
      s"probeHamming must be 0 or 1, got $probeHamming")
    val sigs = df.join(Similarity.hyperplaneSignatures(df, id, vec, bits), id)
    val a = sigs.select(col(id).as("id1"), col(vec).as("v1"), col("_sig"))
    val b0 = sigs.select(col(id).as("id2"), col(vec).as("v2"), col("_sig"))
    val b =
      if (probeHamming == 0) b0
      else b0.select(col("id2"), col("v2"),
        Similarity.expandSig(col("_sig"), bits).as("_sig"))
    a.join(b, Seq("_sig"))
      .filter(col("id1") < col("id2"))
      // filter on the EXACT cosine; rounding first would admit pairs up to
      // 5e-5 below the threshold. Round only for display.
      .withColumn("_exact", Similarity.cosine(col("v1"), col("v2")))
      .filter(col("_exact") >= threshold)
      .select(col("id1"), col("id2"), round(col("_exact"), 4).as("cosine"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering then WITHIN-CLUSTER pairwise cosine — the
    * web-scale recipe that removed 50% of LAION with no quality loss. A
    * document is dropped iff some LOWER-id document in its OWN cluster
    * sits at cosine >= eps (the paper's keep-lowest-index rule; chains
    * a~b~c with a!~c drop both b and c, exactly as the reference
    * implementation does — this is per-pair thresholding, not connected
    * components, which [[minhashDedupClusters]] covers for the lexical
    * case).
    *
    * Scale shape: the coarse quantizer is the SAME bounded driver-side
    * k-means the IVF index uses ([[Similarity.centroidsFor]]) — centroids
    * ride the plan as literals, so cluster assignment is a per-row codegen
    * argmax with NO shuffle. The only exchange is the within-cluster
    * self-join keyed on `_c_id`; per-cluster work is O(c²) in cluster
    * size, and the paper's own scaling argument applies: grow nCentroids
    * with the corpus (k ~ n/c for a target cluster size c) and per-cluster
    * cost stays CONSTANT while total cost stays O(n·c) — never all-pairs.
    * The balanced kmeans quantizer keeps cluster sizes even (measured by
    * the bench's list-skew telemetry), so no hot partition. CAVEAT: the
    * literal-argmax assignment is built for a COARSE quantizer — each
    * centroid adds a cosine subtree to the per-row expression, and past
    * ~64 centroids codegen/planning time dominates (measured, see
    * q_dedup_semdedup). Keep nCentroids moderate and let clusters grow;
    * corpora needing thousands of cells should assign via the IVF index
    * machinery instead.
    *
    * Emits survivors with their cluster id. Not SQL-replayable (sampled
    * k-means); invariants — dropped rows have a lower-id >= eps neighbor
    * in-cluster, survivors have none, exact duplicate vectors collapse to
    * their minimum id — are asserted in ExtSpec.
    */
  def semDeDup(
      df: DataFrame, id: String, vec: String,
      eps: Double, nCentroids: Int = 32,
      quantizer: String = "kmeans"): DataFrame = {
    require(eps > 0 && eps <= 1, s"eps must be in (0, 1], got $eps")
    val reserved =
      Seq("_c_id", "cluster_id", "_sdd_id2", "_sdd_n", "_sdd_u1", "_sdd_u2")
    require(!reserved.exists(df.columns.contains),
      s"semDeDup reserves columns ${reserved.mkString(", ")}")
    val cents = Similarity.centroidsFor(df, id, vec, nCentroids, quantizer)
    val assigned = Similarity.assignToCentroids(df, vec, cents)
    // normalize ONCE per row — the pairwise stage touches each vector
    // O(cluster) times, so paying the norms per PAIR (what cosine() does)
    // would triple the dominant stage's flops. Unit vectors go back to
    // float so the pair check is the NATIVE codegen'd float_vector_dot
    // (the interpreted HOF dot was measured 2 orders slower inside a join
    // condition); float unit elements cost ~1e-7 relative precision,
    // negligible against any sane eps. Zero vectors normalize to NaN and
    // never reach eps — the same "cosine undefined" semantics as before.
    val unit = assigned
      .withColumn("_sdd_n", Similarity.l2Norm(col(vec)))
      .withColumn("_sdd_u1",
        transform(col(vec), x => x.cast("double") / col("_sdd_n"))
          .cast("array<float>"))
      .drop("_sdd_n")
    // repartition on the cluster key with an EXPLICIT partition count —
    // one per centroid. Two measured failure modes motivate this: a small
    // corpus reads as one input split and a broadcast pair join inherits
    // that single partition; and a bare repartition(col) gets
    // AQE-coalesced back to one partition because the exchange is only a
    // few MB — AQE sizes by exchange BYTES and cannot see the O(cluster²)
    // pair work each row fans into downstream. An explicit count is
    // exempt from AQE coalescing.
    val a = unit.select(col("_c_id"), col(id), col("_sdd_u1"))
      .repartition(nCentroids, col("_c_id"))
    val b = unit.select(col("_c_id"), col(id).as("_sdd_id2"),
      col("_sdd_u1").as("_sdd_u2"))
    // one row per (doc, lower-id in-cluster neighbor >= eps); LEFT ANTI
    // keeps docs with NO such neighbor. The distinct() is REQUIRED for
    // scale even though anti-join semantics don't need it: on a dup-heavy
    // corpus a dropped doc matches O(cluster) neighbors, and shipping
    // every match into the anti-join exchange multiplied the shuffle
    // ~1500× at the 50× replica corpus — the map-side partial distinct
    // shrinks it to at most one row per dropped doc before any network.
    val dropped = a.join(b, Seq("_c_id"))
      .filter(col("_sdd_id2") < col(id))
      .filter(graft.functions.VectorFunctions.float_vector_dot(
        col("_sdd_u1"), col("_sdd_u2")) >= eps)
      .select(col(id))
      .distinct()
    assigned.join(dropped, Seq(id), "left_anti")
      .withColumnRenamed("_c_id", "cluster_id")
  }

  /** Persisted SEMANTIC dedup index of the accepted corpus — the
    * [[semDeDup]] analogue of [[simhashBandIndex]] /
    * [[minhashBucketIndex]], built ONCE per corpus state so a new crawl
    * batch can be admitted WITHOUT recomputing anything on the corpus
    * side (at 100 TB the corpus must never re-cluster). One DataFrame,
    * two row kinds:
    *
    *  - `kind = 'centroid'`: the frozen coarse quantizer — `cid` plus
    *    the centroid float vector in `v` (`member_id` NULL). Bounded by
    *    the same ≤64-centroid clamp as [[semDeDup]], so reading them
    *    back is a bounded driver-side collect.
    *  - `kind = 'member'`: one row per corpus vector — its assigned
    *    `cid`, its id in `member_id`, and its UNIT vector (float, the
    *    [[semDeDup]] normalize-once contract) in `v`, ready for the
    *    native dot kernel at screen time.
    *
    * The quantizer and the unit-normalization are byte-identical to
    * [[semDeDup]]'s, so admitting a batch against this index reproduces
    * exactly what re-running semDeDup over (corpus ∪ batch) would decide
    * for the batch rows whenever batch vectors assign to the same
    * clusters (the SemDeDup within-cluster approximation, now frozen at
    * corpus-build time).
    */
  def semDedupIndex(
      corpus: DataFrame, id: String, vec: String,
      nCentroids: Int = 32, quantizer: String = "kmeans"): DataFrame = {
    val cents = Similarity.centroidsFor(corpus, id, vec, nCentroids, quantizer)
    val spark = corpus.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("cid", LongType, nullable = false),
      StructField("member_id", LongType, nullable = true),
      StructField("v", ArrayType(FloatType), nullable = true)))
    val centRows = spark.createDataFrame(
      spark.sparkContext.parallelize(
        cents.toSeq.map { case (cid, cv) =>
          Row("centroid", cid, null, cv.toSeq) }, 1),
      schema)
    centRows.unionByName(semMemberRows(corpus, id, vec, cents))
  }

  /** The semantic index's member-row construction — assign to the given
    * (frozen) centroids, unit-normalize with the semDeDup contract —
    * shared by [[semDedupIndex]] and [[semIndexAppend]] so build-time
    * and append-time rows can never drift apart (the health gauge's
    * build-vs-appended comparison depends on them being byte-identical
    * in shape; review r18).
    */
  private def semMemberRows(
      df: DataFrame, id: String, vec: String,
      cents: Array[(Long, Array[Float])]): DataFrame =
    Similarity.assignToCentroids(df, vec, cents)
      .withColumn("_n", Similarity.l2Norm(col(vec)))
      .select(lit("member").as("kind"), col("_c_id").as("cid"),
        col(id).cast("long").as("member_id"),
        transform(col(vec), x => x.cast("double") / col("_n"))
          .cast("array<float>").as("v"))

  /** Incremental SEMANTIC admission: screen a new embedding batch
    * against the persisted [[semDedupIndex]], then against batch peers —
    * the [[graft.ext.HammingBands.incrementalScreen]] contract for the
    * embedding modality (the one modality r16 left out). The corpus side
    * is NEVER recomputed: centroids are read back as plan literals (a
    * bounded ≤64-row collect, the same class as the quantizer build),
    * batch vectors assign via the native argmax kernel (no shuffle), and
    * the only exchanges are the two cluster-keyed joins — batch×corpus
    * members and batch×batch — each verified by the codegen'd float unit
    * dot ≥ eps.
    *
    * `rep_id` = smallest corpus member id within eps in the batch row's
    * assigned cluster (corpus authoritative), else the smallest batch id
    * within eps in-cluster (self included — every vector is within eps
    * of itself, so a clone group collapses onto its min id), else the
    * row itself. Batch rows with NULL embeddings ride the spine and
    * admit (`rep_id = id` — no vector, no evidence), mirroring the
    * NULL-hash rule of the other three modalities.
    */
  /** Bounded driver-side read of a semantic index's frozen quantizer
    * (<= 64 rows by the semDeDup centroid clamp) — shared by the batch
    * admission and the streaming twin so the two cannot diverge on the
    * index layout (review r17).
    */
  private[graft] def semIndexCentroids(
      index: DataFrame): Array[(Long, Array[Float])] =
    index.filter(col("kind") === "centroid")
      .select(col("cid"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** The index's per-cluster UNIT member vectors, projected to the
    * screen's join columns — the other half of the shared layout.
    */
  private[graft] def semIndexMembers(index: DataFrame): DataFrame =
    index.filter(col("kind") === "member")
      .select(col("cid").as("_c_id"), col("member_id").as("_mid"),
        col("v").as("_mu"))

  /** Grow a semantic index by a new batch: assign against the index's
    * OWN frozen centroids (nothing to repeat wrong — the
    * [[graft.ext.Similarity.ivfAppend]] contract) and append the unit
    * member rows, byte-identical in shape to [[semDedupIndex]]'s. The
    * recurring-cycle step AFTER [[incrementalSemDedup]] admits a batch:
    * accepted vectors join the corpus state so the NEXT cycle screens
    * against them, with the corpus never re-clustered. O(batch); the
    * centroid rows pass through untouched. Centroid drift under
    * sustained growth is a REBUILD decision — [[semIndexHealth]] is its
    * gauge.
    */
  def semIndexAppend(
      index: DataFrame, batch: DataFrame, id: String, vec: String): DataFrame = {
    val cents = semIndexCentroids(index)
    require(cents.nonEmpty,
      "cannot append to an empty semantic index — build it first " +
        "(semDedupIndex), or bootstrap via incrementalSemDedup")
    index.unionByName(semMemberRows(batch, id, vec, cents))
  }

  /** Execute the rebuild [[semIndexHealth]] calls for: retrain the
    * coarse quantizer on the index's CURRENT member vectors (the
    * build + every append) and re-cluster them — the lifecycle closer
    * (build → grow → gauge → REBUILD), needing only the index artifact,
    * never the original corpus table. Members are stored UNIT (the
    * semDeDup normalize-once contract) and the quantizer is spherical,
    * so retraining on them preserves the cosine semantics exactly;
    * the re-normalization inside [[semDedupIndex]] is a no-op up to one
    * float ulp per rebuild (÷‖v‖ with ‖v‖ ≈ 1). Exactly
    * `semDedupIndex` over the member table, which is what the spec
    * asserts.
    */
  def semIndexRebuild(
      index: DataFrame, nCentroids: Int = 0,
      quantizer: String = "kmeans"): DataFrame = {
    // nCentroids <= 0 derives the index's OWN centroid count (advice
    // r18 — the derive-don't-repeat rule the config row exists for).
    val n = if (nCentroids > 0) nCentroids else semIndexCentroids(index).length
    semDedupIndex(
      index.filter(col("kind") === "member").select(col("member_id"), col("v")),
      "member_id", "v", n, quantizer)
  }

  /** Per-cluster health gauge of a semantic index — the
    * [[graft.ext.Similarity.ivfIndexHealth]] twin for the SemDeDup
    * family, through the same shared core: one row per centroid with
    * the member count and the quantized assignment-quality mass
    * `Σ floor(cos(member, centroid)·10⁶)`. Comparing health(base) to
    * health([[semIndexAppend]]ed) exposes the two rebuild triggers —
    * cluster-size skew and appended-vs-build assignment-cosine drift
    * (see q_index_health / q_index_health_sem for the thresholds).
    */
  def semIndexHealth(index: DataFrame): DataFrame =
    Similarity.indexHealthFrom(index.sparkSession, semIndexCentroids(index),
      index.filter(col("kind") === "member").select(col("cid"), col("v")))

  /** Gauge-to-action wiring for the semantic index (the
    * [[graft.ext.Similarity.ivfRebuildIfDue]] twin): rebuild the grown
    * index under its own derived config when
    * [[graft.ext.Similarity.indexRebuildDecision]] over
    * health(base)/health(grown) trips a documented threshold; pass the
    * grown index through untouched otherwise.
    */
  def semIndexRebuildIfDue(
      base: DataFrame, grown: DataFrame,
      maxListLoad: Double = 3.0, driftFloor: Double = -0.05): DataFrame =
    semIndexRebuildIfDueFlagged(base, grown, maxListLoad, driftFloor)._1

  /** [[semIndexRebuildIfDue]] plus whether it fired — see
    * [[graft.ext.Similarity.ivfRebuildIfDueFlagged]] (review r20).
    */
  private[graft] def semIndexRebuildIfDueFlagged(
      base: DataFrame, grown: DataFrame,
      maxListLoad: Double, driftFloor: Double): (DataFrame, Boolean) = {
    val due = Similarity.indexRebuildDecision(
        semIndexHealth(base), semIndexHealth(grown), maxListLoad, driftFloor)
      .select("rebuild_due").collect().head.getBoolean(0)
    if (due) (semIndexRebuild(grown), true) else (grown, false)
  }

  def incrementalSemDedup(
      batch: DataFrame, index: DataFrame, id: String, vec: String,
      eps: Double): DataFrame = {
    require(eps > 0 && eps <= 1, s"eps must be in (0, 1], got $eps")
    val frozen = semIndexCentroids(index)
    // EMPTY-INDEX BOOTSTRAP (review r17): every other incremental
    // modality self-screens a first batch against an empty corpus index
    // (bandsFromIndex's documented fallback); the semantic modality now
    // does the same by training a batch-local quantizer so the peer
    // screen has clusters to scope by — vsCorpus is vacuous (no member
    // rows) and rep_id degrades to the batch-peer/self contract. A batch
    // with no usable vectors short-circuits to all-admit.
    val cents =
      if (frozen.nonEmpty) frozen
      else {
        val usable = batch.where(col(id).isNotNull && col(vec).isNotNull)
        if (usable.isEmpty) Array.empty[(Long, Array[Float])]
        else Similarity.centroidsFor(usable, id, vec, 32, "kmeans")
      }
    if (cents.isEmpty)
      return batch.select(col(id))
        .withColumn("rep_id", col(id))
        .withColumn("is_dup", lit(false))
    val members = semIndexMembers(index)
    val assigned = Similarity.assignToCentroids(batch, vec, cents)
      .withColumn("_n", Similarity.l2Norm(col(vec)))
      .select(col("_c_id"), col(id),
        transform(col(vec), x => x.cast("double") / col("_n"))
          .cast("array<float>").as("_bu"))
      // explicit partition count on the cluster key — the semDeDup
      // lesson: AQE sizes by exchange bytes and cannot see the
      // O(cluster²) pair fan-out, so a bare repartition coalesces to 1
      .repartition(cents.length, col("_c_id"))
      .localCheckpoint(true) // feeds both screens AND the spine join
    val vsCorpus = assigned.join(members, Seq("_c_id"))
      .filter(graft.functions.VectorFunctions.float_vector_dot(
        col("_bu"), col("_mu")) >= eps)
      .groupBy(col(id)).agg(min(col("_mid")).as("_crep"))
    val vsBatch = assigned.join(
        assigned.select(col("_c_id"), col(id).as("_bid"),
          col("_bu").as("_pu")), Seq("_c_id"))
      .filter(graft.functions.VectorFunctions.float_vector_dot(
        col("_bu"), col("_pu")) >= eps)
      .groupBy(col(id)).agg(min(col("_bid")).as("_brep"))
    batch.select(col(id))
      .join(vsCorpus, Seq(id), "left")
      .join(vsBatch, Seq(id), "left")
      .withColumn("rep_id",
        coalesce(col("_crep"), col("_brep"), col(id)))
      .withColumn("is_dup", col("rep_id") =!= col(id))
      .drop("_crep", "_brep")
  }
}
