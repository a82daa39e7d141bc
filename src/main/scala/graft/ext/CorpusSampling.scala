package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-curation sampling — the step that turns a cleaned
  * corpus into a training mixture. Both operators order documents inside
  * each stratum by `(md5(text), id)`: a pseudo-random but engine-portable
  * and run-stable shuffle (md5 is bit-exact everywhere, so a DuckDB oracle
  * can replay the exact sample — unlike rand(), and unlike xxhash64, which
  * only Spark computes).
  *
  * Scale shape: both are one window over the stratum key — a single
  * shuffle, partitioned by exactly the column a mixture is balanced on.
  * Rank-limit pushdown (WindowGroupLimit) applies to the quota variant, so
  * each partition drops beyond-quota rows before the exchange.
  */
object CorpusSampling {

  private def strataOrder(text: String, id: String) =
    Seq(md5(col(text)), col(id))

  /** At most `quota` documents per stratum, deterministically
    * pseudo-randomly chosen. NULL text sorts with md5(NULL) = NULL first —
    * filter upstream if NULL documents shouldn't consume quota.
    */
  def stratifiedQuota(
      df: DataFrame, stratum: String, text: String, id: String,
      quota: Int): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    val w = Window.partitionBy(stratum).orderBy(strataOrder(text, id): _*)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= quota)
      .drop("_rk")
  }

  /** Running token sum per stratum in the deterministic order — shared by
    * both budget variants so the selection order cannot diverge.
    */
  private def cumTokens(
      df: DataFrame, stratum: String, text: String, id: String): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(strataOrder(text, id): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", TextAnalysis.tokenCount(col(text)))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
  }

  /** Documents per stratum until a TOKEN budget fills: take documents in
    * the deterministic pseudo-random order while the running token sum
    * (including the current document) stays within `budget`. The running
    * sum rides the same single window; emits `n_tokens` alongside the
    * selection so downstream mixing can account for what it got.
    */
  def tokenBudget(
      df: DataFrame, stratum: String, text: String, id: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    cumTokens(df, stratum, text, id)
      .filter(col("_cum") <= budget)
      .drop("_cum")
  }

  /** Training-mixture budgets: each stratum gets its OWN token budget from
    * the weight map (e.g. a 70/20/10 language mix as absolute token
    * counts). Strata absent from the map contribute NOTHING — a mixture
    * spec is a whitelist, and a silently-included surprise language is
    * worse than a dropped one. Same single window as [[tokenBudget]]; the
    * per-stratum cap is a literal-map lookup, so the plan stays one
    * shuffle with no join.
    */
  def tokenBudgetByStratum(
      df: DataFrame, stratum: String, text: String, id: String,
      budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "budgets must not be empty")
    require(budgets.values.forall(_ >= 1),
      s"every budget must be >= 1, got $budgets")
    // try_element_at: missing key -> NULL -> comparison NULL -> filtered
    cumTokens(df, stratum, text, id)
      .filter(col("_cum") <= try_element_at(typedlit(budgets), col(stratum)))
      .drop("_cum")
  }

  /** UniMax language-budget allocation (Chung et al. 2023,
    * arXiv:2304.09151): split a total token budget as uniformly as
    * possible across strata (languages), capping each stratum at
    * `maxEpochs` passes over its available tokens — the fairer
    * alternative to temperature sampling for multilingual mixtures.
    * Exact integer water-filling: process strata in (cap asc, stratum
    * asc) order; at each step the fair share is `remaining div
    * strataLeft` and the stratum takes `min(cap, fair)` — ascending
    * cap order makes the one sequential pass equivalent to iterative
    * redistribution, and integer division pushes rounding remainders
    * to later (larger) strata deterministically.
    *
    * Returns `(stratum, available, cap, budget)` rows. The per-stratum
    * aggregation is distributed; the water-fill loop is driver-side
    * over at most `maxStrata` rows (fail-fast above — language sets
    * are small by nature, and a runaway stratum column should not
    * silently become a driver-sized collect).
    */
  def unimaxBudgets(
      df: DataFrame, stratum: String, text: String,
      maxEpochs: Long, totalBudget: Long,
      maxStrata: Int = 1024): Seq[(String, Long, Long, Long)] = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    require(totalBudget >= 1, s"totalBudget must be >= 1, got $totalBudget")
    val rows = df
      .where(col(text).isNotNull && col(stratum).isNotNull)
      .groupBy(col(stratum))
      .agg(sum(TextAnalysis.tokenCount(col(text))).as("c"))
      .limit(maxStrata + 1)
      .collect()
    require(rows.length <= maxStrata,
      s"unimaxBudgets: more than $maxStrata strata — wrong column, or raise maxStrata")
    require(rows.nonEmpty, "unimaxBudgets: no strata (all NULL?)")
    val ranked = rows.map(r => (r.getString(0), r.getLong(1)))
      .map { case (s, c) => (s, c, c * maxEpochs) }
      .sortBy { case (s, _, cap) => (cap, s) }
    var remaining = totalBudget
    var left = ranked.length.toLong
    ranked.map { case (s, c, cap) =>
      val fair = remaining / left
      val b = math.min(cap, fair)
      remaining -= b
      left -= 1
      (s, c, cap, b)
    }.sortBy(_._1).toSeq
  }

  /** Select the UniMax mixture: [[unimaxBudgets]] feeding
    * [[tokenBudgetByStratum]] (zero-budget strata drop out of the
    * whitelist). A stratum whose budget exceeds its available tokens
    * (multi-epoch allocation) is selected in full — repetition beyond
    * one epoch is the upsampler/packer's job, not selection's.
    */
  def unimaxSample(
      df: DataFrame, stratum: String, text: String, id: String,
      maxEpochs: Long, totalBudget: Long): DataFrame = {
    val budgets = unimaxBudgets(df, stratum, text, maxEpochs, totalBudget)
      .collect { case (s, _, _, b) if b >= 1 => s -> b }.toMap
    require(budgets.nonEmpty,
      "unimaxSample: every stratum allocated zero tokens (budget too small)")
    tokenBudgetByStratum(df, stratum, text, id, budgets)
  }

  /** Sequence packing for training-data assembly: lay the corpus out as
    * independent per-shard token streams in the deterministic
    * pseudo-random order and cut every `seqTokens` tokens — the
    * concat-and-split packing used to build fixed-length LM training
    * sequences. Documents MAY span a cut; the emitted columns say exactly
    * where each document lands, so a writer can materialize the physical
    * sequences without re-deriving the layout.
    *
    * Emits per document: `shard`, `n_tokens`, `seq_first` / `seq_last`
    * (index, within the shard, of the sequence holding the document's
    * first / last token) and `seq_offset` (token offset of the document
    * start inside `seq_first`). Zero-token documents sit at the current
    * cut position with `seq_last = seq_first`.
    *
    * Plan shape: ONE shuffle on the caller-chosen `shard` expression and
    * one running-sum window per shard — shards are mutually independent,
    * so the layout parallelizes freely and is reproducible run-over-run
    * (no Spark partition nondeterminism in the output). Integer `div`,
    * not `/`: double division silently mis-bins beyond 2^53, which a
    * 100 TB token stream can reach.
    */
  /** Lexicographic md5-hex boundary for a fraction in [0, 1]: the first 8
    * hex chars of an md5 are uniform over [0, 2^32), so `hex < bound(f)`
    * selects a deterministic f-fraction of keys. String comparison of
    * lowercase hex is byte-identical in every engine — no hex→int
    * conversion (whose builtins differ across engines) is needed.
    */
  private[ext] def hexBound(frac: Double): String = {
    require(frac >= 0 && frac <= 1, s"fraction must be in [0, 1], got $frac")
    f"${math.min((frac * 4294967296.0).toLong, 0xFFFFFFFFL)}%08x"
  }

  /** Per-OPERATOR salted md5 prefix. The salt matters: if split assignment
    * and upsampling keyed off the same unsalted `md5(key)`, composing them
    * (split, then upsample within a split — the documented `scrubStream`
    * usage) would correlate the two selections: an 0.5-fraction upsample
    * applied after an 80% train split would select only from the train
    * region's hash prefix, an effective 0.5/0.8 = 62.5% fraction. Distinct
    * salts make the two hash draws independent, so composed operators keep
    * their nominal fractions (asserted in ExtSpec).
    */
  private def md5Prefix(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8)

  private[ext] val SplitSalt = "graft:split"
  private[ext] val UpsampleSalt = "graft:upsample"

  /** Deterministic train/validation/test assignment: each row's split is a
    * pure function of `key` (survives reruns, re-partitioning, and corpus
    * growth — a document never migrates between splits when unrelated rows
    * are added). `splits` maps names to fractions summing to 1; assignment
    * compares the key's salted md5 prefix against cumulative hex
    * boundaries — a chained literal comparison, zero shuffles, zero joins,
    * replayable in any engine with md5.
    *
    * NULL keys FAIL FAST (raise_error): a NULL-keyed row has no stable
    * identity to split on, and the silent alternative (NULL md5 makes
    * every boundary comparison NULL) would concentrate every NULL-id
    * document in one split. Filter or key-repair upstream.
    */
  def hashSplit(
      df: DataFrame, key: Column, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "splits must not be empty")
    require(splits.forall(_._2 > 0), s"fractions must be positive: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    require(!df.columns.contains("split"),
      "input must not already contain reserved column split")
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail.init.map(hexBound)
    val hx = md5Prefix(key, SplitSalt)
    val assigned = splits.init.zip(bounds)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), bound), rest) => when(hx < bound, name).otherwise(rest)
      }
    df.withColumn("split",
      when(key.isNull, raise_error(
        lit("graft.hashSplit: NULL split key — filter or repair ids upstream")))
        .otherwise(assigned))
  }

  /** Deterministic global shuffle — the training-data-order
    * randomization every pretraining run needs (document order is a
    * hyperparameter; it must be REPRODUCIBLE and seed-switchable).
    * Each row's `shuffle_rank` is the global rank of its salted md5
    * (full 32-hex digest — effectively collision-free ordering, ties
    * broken by key), so the permutation is a pure function of
    * (key, seed): stable across reruns, partitionings, and engines,
    * and a different `seed` gives an independent permutation (the
    * [[md5Prefix]] salt-independence argument). NULL keys fail fast —
    * a row with no identity has no stable place in the permutation.
    *
    * Plan (the q_rfm two-phase global-rank discipline — an
    * unpartitioned rank window would single-task the corpus): range-
    * repartition on (digest, key) into disjoint ordered ranges, pin the
    * partitioning (repartitionByRange's reservoir sample is
    * nondeterministic across double evaluation — the r10/r11 lesson),
    * count each range, broadcast the cumulative offsets back, and add a
    * parallel per-partition row_number. Two shuffles of slim rows, no
    * single-reducer funnel.
    */
  /** DoReMi-style domain reweighting (Xie et al. 2023, reduced to its
    * deployable core): given a per-domain EXCESS-LOSS signal (how much
    * harder a domain is than the reference — any integer-quantized
    * metric: LM score gap, classifier disagreement, here the caller's
    * choice), iterate the multiplicative-weights update that DoReMi's
    * Group-DRO proxy training performs — upweight the domains with the
    * highest excess loss, renormalize, repeat — and return the final
    * mixture weights to drive [[temperatureSample]]/[[upsampleByStratum]]
    * -class samplers.
    *
    * Everything is FIXED-POINT integer arithmetic at scale 10⁶ (losses
    * min-max-normalized to [0, S], update factor `S + lr·lossn/1000`,
    * half-up renormalization to Σw = S each round), so the whole
    * iteration replays exactly as chained BIGINT CTEs in the oracle —
    * the GD-classifier/Lloyd determinism contract. The domain table is
    * BOUNDED BY CONTRACT (`maxDomains`, default 10⁴): the loop runs on
    * driver-collected rows exactly like the classifier trainer, because
    * `iters` distributed barriers over a ≤10⁴-row frame would be pure
    * scheduling overhead (the r10 bounded-sample lesson). The corpus
    * itself is never touched — callers aggregate their loss signal
    * relationally first.
    *
    * Equal losses everywhere degrade to uniform weights; NULL domains or
    * losses fail fast (a silent NULL would siphon weight mass).
    *
    * Output: `(domain, weight_q)` with `weight_q`/10⁶ the mixture
    * probability (Σ ≈ 10⁶ up to per-domain rounding).
    */
  def doremiWeights(
      perDomainLoss: DataFrame, domain: String, lossQCol: String,
      iters: Int = 10, lrPerMille: Long = 100,
      maxDomains: Int = 10000): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters must be in [1, 100], got $iters")
    require(lrPerMille >= 1 && lrPerMille <= 1000,
      s"lrPerMille must be in [1, 1000], got $lrPerMille")
    val S = 1000000L
    val rows = perDomainLoss
      .select(col(domain).cast("string"), col(lossQCol).cast("long"))
      .limit(maxDomains + 1)
      .collect()
    require(rows.length <= maxDomains,
      s"more than $maxDomains domains — aggregate the loss signal first")
    require(rows.nonEmpty, "perDomainLoss is empty")
    require(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "NULL domain or loss — repair the loss table upstream")
    val ds = rows.map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(ds.map(_._1).distinct.length == ds.length,
      "duplicate domain rows — the loss table must be one row per domain")
    require(ds.forall(p => math.abs(p._2) < (1L << 40)),
      "quantized losses must stay below 2^40 so (loss - lo) * 10^6 cannot overflow")
    val lo = ds.map(_._2).min
    val hi = ds.map(_._2).max
    val lossn = ds.map { case (d, l) =>
      d -> (if (hi == lo) 0L else Similarity.divHalfUp((l - lo) * S, hi - lo))
    }
    var w = lossn.map { case (d, _) => d -> Similarity.divHalfUp(S, ds.length.toLong) }
    for (_ <- 1 to iters) {
      val u = w.zip(lossn).map { case ((d, wq), (_, ln)) =>
        d -> Similarity.divHalfUp(
          wq * (S + Similarity.divHalfUp(lrPerMille * ln, 1000L)), S)
      }
      val s = u.map(_._2).sum
      w = u.map { case (d, uq) => d -> Similarity.divHalfUp(uq * S, s) }
    }
    val spark = perDomainLoss.sparkSession
    import spark.implicits._
    w.toSeq.toDF(domain, "weight_q")
  }

  def deterministicShuffle(
      df: DataFrame, key: Column, seed: String = "graft:shuffle"): DataFrame = {
    require(!df.columns.contains("shuffle_rank"),
      "input must not already contain reserved column shuffle_rank")
    val guarded = df.withColumn("_sdig",
      when(key.isNull, raise_error(lit(
        "graft.deterministicShuffle: NULL shuffle key — filter or repair ids upstream"))
        .cast("string"))
        .otherwise(md5(concat(key.cast("string"), lit(seed)))))
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val parted = guarded
      .repartitionByRange(parts, col("_sdig"), key)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val wOff = org.apache.spark.sql.expressions.Window.orderBy(col("_pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("_pid").agg(count(lit(1)).as("_pn"))
      .withColumn("_poff", coalesce(sum(col("_pn")).over(wOff), lit(0L)))
      .select("_pid", "_poff")
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid")).orderBy(col("_sdig"), key)
    parted.join(broadcast(offsets), Seq("_pid"))
      .withColumn("shuffle_rank", col("_poff") + row_number().over(wLocal))
      .drop("_pid", "_poff", "_sdig")
  }

  /** Leakage-safe train/val/test split as a LIBRARY composition (the
    * q_split_cluster_safe path): the split key is the NEAR-DUP CLUSTER
    * id from [[Dedup.minhashDedupClusters]], not the document id, so a
    * near-duplicate of a training document can never land in val/test.
    * `checkpointDir` propagates to the bounded propagation loop — at
    * 100 TB pass a reliable store path so an executor loss cannot strand
    * the multi-iteration lineage (advice r11 task 8).
    */
  def clusterSafeSplit(
      docs: DataFrame, id: String, text: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      bands: Int = Dedup.MinhashBands,
      rowsPerBand: Int = Dedup.MinhashRowsPerBand,
      checkpointDir: Option[String] = None): DataFrame =
    hashSplit(
      Dedup.minhashDedupClusters(docs, id, text, bands, rowsPerBand,
        checkpointDir = checkpointDir),
      col("cluster_id"), splits)

  /** Deterministic stratum upsampling — the "epochs per domain" mixture
    * primitive (e.g. Wikipedia × 3.2, CommonCrawl × 1.0): every document
    * in stratum s is emitted floor(w_s) times, plus one more copy for a
    * deterministic frac(w_s)-fraction of documents (chosen by a SALTED md5
    * of the id — independent of [[hashSplit]]'s draw, see [[md5Prefix]] —
    * so the SAME documents get the extra copy on every run and in a
    * replaying engine). Strata absent from the map get `defaultWeight`.
    * NULL ids never receive the fractional extra copy (NULL md5 fails the
    * threshold comparison); their floor copies are still emitted.
    *
    * Emits `copy_idx` (0 until copies) so a downstream global shuffle can
    * spread the copies. Plan: per-stratum floor/bound lookups are LITERAL
    * maps (no join), the copy fan-out is filter + explode(sequence) —
    * zero shuffles; weight < 1 rows with no copy are filtered BEFORE the
    * explode (sequence(0, -1) would produce a descending range).
    */
  def upsampleByStratum(
      df: DataFrame, stratum: String, id: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0):
      DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w < 64),
      s"weights must be in [0, 64): $weights default=$defaultWeight")
    require(!df.columns.contains("copy_idx"),
      "input must not already contain reserved column copy_idx")
    def floorOf(w: Double) = math.floor(w).toLong
    val floorMap = weights.map { case (k, w) => k -> floorOf(w) }
    val boundMap = weights.map { case (k, w) => k -> hexBound(w - floorOf(w)) }
    val wFloor = coalesce(
      try_element_at(typedlit(floorMap), col(stratum)),
      lit(floorOf(defaultWeight)))
    val wBound = coalesce(
      try_element_at(typedlit(boundMap), col(stratum)),
      lit(hexBound(defaultWeight - floorOf(defaultWeight))))
    val copies = (wFloor +
      when(md5Prefix(col(id), UpsampleSalt) < wBound, 1L).otherwise(0L))
      .cast("long")
    df.withColumn("_copies", copies)
      .where(col("_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_copies")
  }

  /** Deterministic weighted sample without replacement (priority
    * sampling, Duffield–Lund–Thorup): each row draws a salted md5
    * uniform and takes priority draw/weight; the k smallest priorities
    * win, so inclusion probability rises with weight while the whole
    * selection replays bit-identically from the ids (same per-operator
    * salt convention as split/upsample). orderBy+limit compiles to
    * TakeOrderedAndProject — a distributed top-k, no global sort. The
    * priority divides identical operands on both engines, so the oracle
    * reproduces the exact selection AND order. Non-positive or NULL
    * weights are excluded (they cannot be sensibly prioritized).
    */
  def weightedSample(
      df: DataFrame, id: Column, weight: Column, k: Int,
      salt: String = "graft:wsample"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("_priority"),
      "input must not already contain reserved column _priority")
    val draw = conv(substring(
      md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10).cast("long")
    df.where(weight.isNotNull && weight > 0)
      .withColumn("_priority", draw.cast("double") / weight.cast("double"))
      .orderBy(col("_priority"), id)
      .limit(k)
  }

  /** Smallest power-of-two bucket >= n (1..16384, overflow 32768) as a
    * folded literal when()-chain — codegen'd, no join, no log2 whose
    * rounding could diverge between engines. Shared by the batch
    * length-bucket report and its streaming twin so the boundary
    * semantics cannot drift.
    */
  def lengthBucket(n: Column): Column =
    (1 to 14).foldLeft(when(n <= 1L, lit(1L))) {
      (acc, k) => acc.when(n <= (1L << k), lit(1L << k))
    }.otherwise(lit(32768L))

  /** Temperature-based mixture sampling: stratum `s` holding `n_s`
    * documents receives a document target proportional to `n_s^alpha`
    * (capped at `n_s` — sampling is without replacement), and that many
    * documents are drawn in the deterministic `(md5(text), id)` order.
    * `alpha = 1` reproduces the corpus's natural proportions, `alpha = 0`
    * gives every stratum an equal share, and the usual `alpha ∈ (0, 1)`
    * range ("temperature" in the multilingual-LM literature, e.g. the
    * mBERT/XLM-R exponent-smoothed sampling) up-weights small strata
    * without flattening the mixture entirely.
    *
    * Unlike [[stratifiedQuota]] (a FIXED per-stratum cap) the target here
    * is data-dependent, so the plan carries two extra aggregations — both
    * over the stratum-count table, which has ONE ROW PER STRATUM and is
    * broadcast everywhere it is used: counts [1 shuffle on the stratum
    * key], the normalizer Σ n^alpha [1-row scalar], targets [broadcast
    * join], then the same single stratum-keyed window as the other
    * samplers. The corpus shuffles ONCE.
    *
    * Determinism: `n_s^alpha` is double math, so targets pass through
    * `floor(round(x, 6))` — the rounding absorbs last-ulp `pow`
    * divergence between engines replaying the draw (same policy as
    * [[hexBound]]'s integer hex cut).
    */
  def temperatureSample(
      df: DataFrame, stratum: String, text: String, id: String,
      alpha: Double, totalDocs: Long): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0, 1], got $alpha")
    require(totalDocs >= 1, s"totalDocs must be >= 1, got $totalDocs")
    val reserved = Seq("_n_s", "_z", "_target", "_rk")
    require(!reserved.exists(df.columns.contains),
      s"temperatureSample reserves columns ${reserved.mkString(", ")}")
    // NULL strata are excluded ENTIRELY — from the draw (the equality
    // join below never matches NULL) and from the normalizer (else
    // unsampleable rows would deflate every real stratum's target)
    val counts = df.where(col(stratum).isNotNull)
      .groupBy(col(stratum)).agg(count(lit(1)).as("_n_s"))
    val z = counts.agg(
      sum(pow(col("_n_s").cast("double"), lit(alpha))).as("_z"))
    val targets = counts.crossJoin(broadcast(z))
      .withColumn("_target",
        least(col("_n_s"),
          floor(round(lit(totalDocs.toDouble) *
            pow(col("_n_s").cast("double"), lit(alpha)) / col("_z"),
            6)).cast("long")))
      .select(col(stratum), col("_target"))
    val w = Window.partitionBy(stratum).orderBy(strataOrder(text, id): _*)
    df.join(broadcast(targets), Seq(stratum))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= col("_target"))
      .drop("_rk", "_target")
  }

  /** Keep documents whose quality score is at or above the corpus's `p`-th
    * percentile — filtering by the score DISTRIBUTION rather than a magic
    * constant, the usual way corpus quality gates are specified.
    *
    * The exact R-7 interpolated percentile reduces to ONE broadcast row
    * (scalar aggregate), then a plain filter — no per-row join, no second
    * scan shape beyond the two passes the semantics require. At 100 TB
    * swap `percentile` for `percentile_approx` (mergeable sketch) via
    * `approx = true`; the plan shape is identical.
    */
  def percentileFilter(
      df: DataFrame, score: Column, p: Double,
      approx: Boolean = false): DataFrame = {
    require(p >= 0 && p <= 1, s"p must be in [0, 1], got $p")
    require(!df.columns.contains("_threshold"),
      "input must not already contain reserved column _threshold")
    val agg = if (approx) percentile_approx(score, lit(p), lit(10000))
              else percentile(score, lit(p))
    val threshold = df.agg(agg.cast("double").as("_threshold"))
    df.crossJoin(broadcast(threshold))
      .filter(score >= col("_threshold"))
      .drop("_threshold")
  }

  /** Token-balanced shard assignment for training-data writers: spread
    * documents over `nShards` shards so per-shard TOKEN totals (the unit
    * of training work) come out even — not per-shard document counts,
    * which skew badly when document lengths do.
    *
    * The classic greedy bin-packing is sequential driver-side state, and
    * its naive relational surrogate (row_number over ONE global
    * tokens-desc window) funnels the whole corpus through a single
    * partition — the exact anti-pattern this engine bans. This is the
    * scale-safe two-level deal instead: documents salt into
    * `spread × nShards` independent cells (`pmod(id, S)` — engine-
    * portable, requires a NUMERIC id), each cell orders its documents by
    * token count descending and deals them SERPENTINE (left-to-right,
    * then right-to-left — plain round-robin hands the larger document of
    * every round to the same early shards, a systematic gradient the
    * direction flip cancels), rotated by a cell-dependent offset so no
    * shard sees every cell's largest document. Longest-first serpentine
    * dealing keeps each CELL's allocation within one document of even,
    * summing near-even allocations keeps the TOTAL near-even (asserted
    * < 10% max/min token spread in the spec on a heavy-tailed corpus),
    * and the window partitions S ways — no global sort, no driver state,
    * replayable by any engine with row_number.
    */
  def balanceShards(
      df: DataFrame, id: String, text: String, nShards: Int,
      spread: Int = 32): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(spread >= 1, s"spread must be >= 1, got $spread")
    val reserved = Seq("n_tokens", "shard", "_rk", "_salt")
    require(!reserved.exists(df.columns.contains),
      s"balanceShards reserves columns ${reserved.mkString(", ")}")
    val s = spread.toLong * nShards
    val w = Window.partitionBy(col("_salt"))
      .orderBy(col("n_tokens").desc, col(id))
    df.withColumn("n_tokens",
        when(col(text).isNotNull, TextAnalysis.tokenCount(col(text)))
          .otherwise(lit(0L)))
      .withColumn("_salt", pmod(col(id).cast("long"), lit(s)))
      .withColumn("_rk", row_number().over(w))
      .withColumn("shard", {
        val pos = col("_rk") - 1
        val n = lit(nShards.toLong)
        val round = expr(s"(_rk - 1) div ${nShards}L")
        val k = pmod(pos, n)
        val dealt = when(pmod(round, lit(2L)) === 0, k).otherwise(n - 1 - k)
        pmod(dealt + pmod(col("_salt"), n), n).cast("int")
      })
      .drop("_rk", "_salt")
  }

  /** Materialize the physical fixed-length training sequences that
    * [[packSequences]] lays out: one row per (shard, sequence index) with
    * the sequence's token array — every sequence holds exactly
    * `seqTokens` tokens except each shard's LAST (the remainder), and
    * concatenating a shard's sequences in index order reproduces the
    * shard's deterministic token stream exactly (both invariants are
    * oracle-checked in q_pack_materialize and unit-tested in ExtSpec).
    *
    * Plan shape: [[packSequences]]'s single per-shard window, then each
    * document EXPLODES into one fragment per sequence it touches
    * (bounded: n_tokens/seqTokens + 2 fragments per document) and one
    * groupBy on (shard, seq_idx) assembles fragments in global-offset
    * order — two bounded shuffles total, no driver-side data, and each
    * output row is at most `seqTokens` tokens, so executor memory per row
    * is capped regardless of corpus size. Zero-token documents contribute
    * no fragment (there is nothing of them to materialize — their
    * PLACEMENT still comes from [[packSequences]]).
    */
  def materializeSequences(
      df: DataFrame, id: String, text: String, seqTokens: Long,
      shard: Column): DataFrame = {
    val reserved = Seq("seq_idx", "tokens", "seq_n_tokens",
      "_startg", "_toks", "_from", "_to", "_piece")
    require(!reserved.exists(df.columns.contains),
      s"materializeSequences reserves columns ${reserved.mkString(", ")}")
    val packed = packSequences(df, id, text, seqTokens, shard)
    val frag = packed
      .filter(col("n_tokens") > 0)
      .withColumn("_startg", col("seq_first") * seqTokens + col("seq_offset"))
      .withColumn("_toks", TextAnalysis.tokens(col(text)))
      .withColumn("seq_idx", explode(sequence(col("seq_first"), col("seq_last"))))
      .withColumn("_from", greatest(col("seq_idx") * seqTokens, col("_startg")))
      .withColumn("_to",
        least((col("seq_idx") + 1) * seqTokens, col("_startg") + col("n_tokens")))
      .withColumn("_piece", slice(col("_toks"),
        (col("_from") - col("_startg") + 1).cast("int"),
        (col("_to") - col("_from")).cast("int")))
    // array_sort on struct arrays orders by the FIRST field — fragment
    // global start offsets, which are distinct within a sequence (documents
    // occupy disjoint token ranges), so assembly order is total
    frag.groupBy(col("shard"), col("seq_idx"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("_from"), col("_piece")))),
        s => s.getField("_piece"))).as("tokens"))
      .withColumn("seq_n_tokens", size(col("tokens")).cast("long"))
  }

  def packSequences(
      df: DataFrame, id: String, text: String, seqTokens: Long,
      shard: Column): DataFrame = {
    require(seqTokens >= 1, s"seqTokens must be >= 1, got $seqTokens")
    val reserved =
      Seq("shard", "n_tokens", "seq_first", "seq_last", "seq_offset",
        "_cum", "_start")
    require(!reserved.exists(df.columns.contains),
      s"packSequences reserves columns ${reserved.mkString(", ")}")
    val w = Window.partitionBy(col("shard")).orderBy(strataOrder(text, id): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("n_tokens",
        when(col(text).isNotNull, TextAnalysis.tokenCount(col(text)))
          .otherwise(lit(0L)))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .withColumn("_start", col("_cum") - col("n_tokens"))
      .withColumn("seq_first", expr(s"_start div ${seqTokens}L"))
      .withColumn("seq_last",
        when(col("n_tokens") > 0, expr(s"(_cum - 1L) div ${seqTokens}L"))
          .otherwise(expr(s"_start div ${seqTokens}L")))
      .withColumn("seq_offset", pmod(col("_start"), lit(seqTokens)))
      .drop("_cum", "_start")
  }
}
