package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed LLM-corpus preparation flow — the realistic use of the
  * dedup + similarity operators in sequence, the way a training-data
  * pipeline chains them at scale:
  *
  *  1. EXACT dedup on the canonicalized content fingerprint
  *     (md5(lower(trim(text))) — 16-byte shuffle key regardless of
  *     document size), keeping the lowest id per fingerprint;
  *  2. NEAR-dup dedup over the exact survivors with MinHash+LSH keep/drop
  *     assignment (O(n·bands), no pairwise stage);
  *  3. ANN similarity search over the surviving corpus' embeddings
  *     (multi-probe hyperplane LSH).
  *
  * Each stage consumes the previous stage's survivors, so downstream cost
  * shrinks with every pass — the cheap exact pass runs first, the
  * per-token MinHash only hashes surviving documents, and the ANN index
  * is built over the deduplicated corpus only.
  */
object CorpusPipeline {

  /** Inter-stage materialization with selectable durability: the
    * default localCheckpoint truncates lineage into executor-local
    * blocks (fine single-run); with `checkpointDir` set the frame goes
    * to the reliable store instead, so an executor loss mid-pipeline
    * cannot strand a 100 TB run (advice r11 task 8). Callers set the
    * session checkpoint dir once up front.
    */
  private def pin(df: DataFrame, durable: Boolean): DataFrame =
    if (durable) df.checkpoint(true) else df.localCheckpoint(true)

  /** Survivor set after exact-fingerprint then MinHash-LSH dedup: the rows
    * of `docs` whose id is (a) the lowest id of its exact-content group and
    * (b) its own MinHash cluster representative among exact survivors.
    *
    * Default banding is 4 bands × 8 rows — a HIGH-PRECISION near-dup
    * threshold (collision probability stays negligible below Jaccard ≈0.8)
    * suited to corpus preparation, where over-merging loses real data;
    * [[Dedup.minhashDedup]]'s own 8×4 default is the aggressive recall-
    * oriented setting and collapses this testdata to a handful of cluster
    * representatives.
    */
  def dedupCorpus(
      docs: DataFrame, id: String, text: String,
      bands: Int = 4, rowsPerBand: Int = 8,
      checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(docs.sparkSession.sparkContext.setCheckpointDir)
    val exactKeep = Dedup
      .exactGroups(docs, id, TextAnalysis.fingerprint(col(text)))
      .select(col("keep_id").as(id))
    // localCheckpoint: the survivor set feeds the MinHash pass AND the
    // final semi-join — without it the fingerprint aggregate runs twice.
    // At a real 100 TB deployment this inter-stage materialization goes to
    // durable storage instead of executor-local blocks.
    val exactSurvivors = pin(
      docs.join(exactKeep, Seq(id), "left_semi"), checkpointDir.isDefined)
    val mh = Dedup.minhashDedup(exactSurvivors, id, text, bands, rowsPerBand)
    val nearKeep = mh.filter(!col("is_dup")).select(col(id))
    // Tokenless documents (NULL text — zero exploded token rows) never
    // reach minhashDedup's output; they are NOT duplicates and must pass
    // through, not silently vanish. Stage 1 already collapsed them to one
    // survivor per fingerprint.
    val tokenless = exactSurvivors.select(col(id))
      .join(mh.select(col(id)), Seq(id), "left_anti")
    exactSurvivors.join(nearKeep.unionByName(tokenless), Seq(id), "left_semi")
  }

  /** Oracle-replayable curation flow — the quality-gated variant of the
    * corpus prep chain, every stage deterministic and replayable by any
    * engine with md5/ln (unlike [[dedupCorpus]]'s MinHash stage, which is
    * xxhash-based and invariant-tested instead):
    *
    *  1. corpus-trained bigram-LM quality gate: keep documents at or
    *     above the `lmPercentile`-th percentile of
    *     [[Relevance.bigramLmScore]] — documents with fewer than two
    *     tokens have no LM judgment and are DROPPED (a one-token document
    *     is below any curation bar that cares about fluency);
    *  2. exact dedup on the canonicalized fingerprint, keeping the lowest
    *     id per group;
    *  3. deterministic train/val/test assignment ([[CorpusSampling
    *     .hashSplit]]).
    *
    * Order matters and is the cheap-to-expensive ordering a 100 TB run
    * wants: the LM gate shrinks the corpus before the dedup shuffle, and
    * the split is a zero-shuffle row-local map over the survivors.
    */
  def curate(
      docs: DataFrame, id: String, text: String,
      lmPercentile: Double = 0.25,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(docs.sparkSession.sparkContext.setCheckpointDir)
    val lm = Relevance.bigramLmScore(docs, id, text)
      .select(col(id), col("lm_score"))
    // localCheckpoint: the scored table feeds BOTH the percentile scalar
    // and the gate filter — without truncation the LM plan (a gram-table
    // shuffle) runs twice
    val scored = pin(docs.join(lm, Seq(id)), checkpointDir.isDefined)
    val gated = CorpusSampling.percentileFilter(
      scored, col("lm_score"), lmPercentile)
    val keep = Dedup
      .exactGroups(gated, id, TextAnalysis.fingerprint(col(text)))
      .select(col("keep_id").as(id))
    // no broadcast hint: the keep set is one id per DISTINCT fingerprint —
    // corpus-scale, not dimension-scale; the semi join shuffles on the
    // 8-byte id key
    val deduped = gated.join(keep, Seq(id), "left_semi")
    CorpusSampling.hashSplit(deduped, col(id), splits)
  }

  /** End-to-end demo: dedup `docs`, restrict `embeddings` to the surviving
    * ids, then run multi-probe LSH top-k with the `nProbes` lowest
    * surviving ids as probes. Returns (q_id, candidate id, cosine).
    */
  def run(
      docs: DataFrame, docId: String, text: String,
      embeddings: DataFrame, vecId: String, vec: String,
      k: Int = 10, nProbes: Int = 3,
      bits: Int = 4, tables: Int = 2,
      checkpointDir: Option[String] = None): DataFrame = {
    val survivors = dedupCorpus(docs, docId, text,
      checkpointDir = checkpointDir).select(col(docId).as(vecId))
    // checkpoint the surviving corpus: lshTopKMulti scans it once per
    // signature table plus once for candidate verification, and the probe
    // selection reads it too — without truncation each consumer would
    // replay the whole dedup lineage
    val corpus = pin(embeddings.join(survivors, Seq(vecId), "left_semi"),
      checkpointDir.isDefined)
    val probes = corpus.orderBy(col(vecId)).limit(nProbes)
      .select(col(vecId).as("q_id"), col(vec).as("q_emb"))
    Similarity.lshTopKMulti(corpus, vecId, vec, probes, "q_id", "q_emb",
      k, bits, tables, probeHamming = 1)
  }

  /** The crawl-side curation pass, composed stage-cheapest-first:
    *
    *  1. [[UrlOps.applyUrlPolicy]] — the allow/deny rule when-chain in
    *     the SCAN stage, before anything shuffles (a denied URL costs
    *     one predicate, never a shuffle slot);
    *  2. canonical-URL dedup keep-min-id — one shuffle on the canonical
    *     key; the rank window compiles to WindowGroupLimit so each map
    *     partition forwards one candidate per URL;
    *  3. [[UrlOps.domainBudget]] — per-registered-domain best-`budget`
    *     cut, the second (and last) shuffle.
    *
    * Output: the surviving rows plus `canonical_url` and `domain`.
    * Everything is exact string/integer work — the whole pass is
    * oracle-replayable (q_crawl_curate).
    */
  def curateCrawl(
      docs: DataFrame, id: String, urlCol: String, charsCol: String,
      rules: Seq[UrlOps.UrlRule], budget: Int): DataFrame = {
    // parse ONCE: canonical/domain/path are one projection in the scan
    // stage; every later stage reads the precomputed columns (the first
    // shape re-derived the URL parts per stage — ~50 string-split
    // subtree evaluations per row, measured 1.6× slower at 50×)
    val parsed = docs.withColumn("canonical_url",
        UrlOps.canonicalizeUrl(col(urlCol)))
      .withColumn("domain",
        UrlOps.registeredDomain(UrlOps.urlHost(col(urlCol))))
      .withColumn("_path", UrlOps.urlPath(col(urlCol)))
    val allowed = UrlOps.applyUrlPolicyOn(
        parsed, col("domain"), col("_path"), rules)
      .filter(col("allowed")).drop("allowed", "matched_rule", "_path")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("canonical_url")).orderBy(col(id))
    val deduped = allowed.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk")
    UrlOps.domainBudgetOn(deduped, id, col("domain"), charsCol, budget)
  }
}
