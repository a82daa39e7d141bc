package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed bag-of-words features — the
  * fastText-shaped filter behind the classic "train a tiny classifier on
  * curated positives, score the crawl" corpus-curation recipe (the GPT-3
  * and LLaMA data pipelines both gate on exactly this kind of model).
  *
  * Everything is Spark-native with BOUNDED driver state:
  *  - features: tokens hash into `dims` buckets via the md5-31-bit idiom
  *    (the minhash/oracle-replayable hash — DuckDB has md5, not Spark's
  *    xxhash64), L1-normalized per document in EXACT FIXED POINT
  *    (`xq = halfUp(cnt·10^6 / n)`) — one (id, bucket)-keyed aggregation;
  *  - training: full-batch gradient descent on the HARD-SIGMOID logistic
  *    surrogate `p = clamp(z/4 + 1/2, 0, 1)` where each iteration is ONE
  *    distributed pass (a per-document integer-z aggregation, then a
  *    bucket-keyed integer gradient aggregation of at most `dims + 1`
  *    rows collected to the driver — the weight vector is the only
  *    driver state, ~2 KB at the default 256 dims);
  *  - the intercept is a synthetic always-on feature (bucket = dims), so
  *    no special-case bias plumbing exists anywhere;
  *  - ALL arithmetic is scaled-long integer (features, z, probabilities,
  *    gradients, weights at scale 10^6; round-half-away-from-zero
  *    divisions), so training is BIT-DETERMINISTIC across partitionings,
  *    reruns, AND ENGINES — the bounded loop unrolls into the DuckDB
  *    oracle exactly (chained BIGINT CTEs, the q_bpe_train / fixed-point
  *    Lloyd technique), which is what promotes q_quality_classifier from
  *    rows-only to hash-checked.
  *
  * The hard-sigmoid link is the standard fast logistic surrogate
  * (hard-sigmoid units in quantized nets; Hastie et al.'s piecewise-
  * linear logistic view): as a quality FILTER the model is consumed as
  * `score > threshold`, and the hard link is a monotone remap of the
  * soft one — same ranking, exactly-replayable arithmetic.
  *
  * At 100 TB: train on a bounded sample (a quality classifier needs
  * thousands of labeled examples, not the whole crawl), then [[score]]
  * the full corpus — scoring is one hash aggregation, no driver
  * involvement, weights ride the plan as literals (never a join).
  */
object QualityClassifier {

  /** Shared fixed-point scale for features, probabilities, and weights
    * (10^6 ≈ micro-units). Headroom: per-doc z = Σ xq·wq ≤ 2·10^6·|wq|
    * with |wq| bounded by iters·lr·10^6 — every intermediate stays far
    * inside the exact-long (and exact-double-div) range for the bounded
    * training sets the API requires.
    */
  private[graft] val Scale = 1000000L

  final case class Model(dims: Int, weightsQ: Array[Long]) {
    require(weightsQ.length == dims + 1,
      s"weightsQ must have dims+1 entries (intercept last), got ${weightsQ.length}")
    /** Float view of the trained weights (scale-10^6 longs / 10^6). */
    def weights: Array[Double] = weightsQ.map(_.toDouble / Scale)
    def bias: Double = weightsQ(dims).toDouble / Scale
  }

  /** Token → bucket in [0, dims): md5 first 8 hex chars, masked to 31
    * bits, mod dims — the established engine-portable hash
    * ([[Dedup.minhashSignatures]]; DuckDB replays it as
    * `CAST(('0x'||substr(md5(tok),1,8)) AS BIGINT) & 2147483647 % dims`).
    */
  private[graft] def bucketOf(tok: Column, dims: Int): Column =
    (conv(substring(md5(tok), 1, 8), 16, 10).cast("long")
      .bitwiseAND(lit(0x7FFFFFFFL)) % lit(dims.toLong)).cast("int")

  /** Round-half-away-from-zero integer division column (den a positive
    * literal): sign-magnitude so Spark's truncating `div` and DuckDB's
    * `//` on non-negative operands agree exactly — mirrors
    * [[Similarity.divHalfUp]].
    */
  private def halfUpCol(num: Column, den: Long): Column = {
    require(den > 0, s"halfUpCol needs a positive denominator, got $den")
    val pos = (num * 2 + lit(den)).div(lit(2 * den))
    val neg = -((-num * 2 + lit(den)).div(lit(2 * den)))
    when(num < 0, neg).otherwise(pos)
  }

  private implicit class DivOps(val c: Column) {
    /** Long integral division (Spark SQL `div`). */
    def div(other: Column): Column = call_function("div", c, other)
  }

  /** Hard-sigmoid probability at scale 10^6 from an integer z at scale
    * 10^12: `pq = clamp(halfUp(zq / (4·10^6)) + 5·10^5, 0, 10^6)`.
    */
  private[graft] def hardSigmoidQ(zq: Column): Column =
    least(lit(Scale), greatest(lit(0L), halfUpCol(zq, 4L * Scale) + lit(Scale / 2)))

  /** Hashed, exact-fixed-point L1-normalized bag-of-words features plus
    * the intercept feature: one row per (doc, bucket) with `xq` =
    * halfUp(token-share · 10^6) (and the constant `xq = 10^6` intercept
    * row at bucket = dims). Documents with no non-empty token produce no
    * rows — there is no text to judge.
    */
  def hashedFeatures(
      df: DataFrame, id: String, text: String, dims: Int): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    val reserved = Seq("bucket", "xq", "_tok", "_cnt", "_n")
    require(!reserved.exists(df.columns.contains),
      s"hashedFeatures reserves columns ${reserved.mkString(", ")}")
    val counts = df.where(col(text).isNotNull)
      .select(col(id), explode(TextAnalysis.tokens(col(text))).as("_tok"))
      .where(col("_tok") =!= "")
      .withColumn("bucket", bucketOf(col("_tok"), dims))
      .groupBy(col(id), col("bucket")).agg(count(lit(1)).as("_cnt"))
    // per-doc totals via an UNORDERED window over the id partition
    // (whole-partition frame — no per-partition sort): one id-keyed
    // exchange, vs two for the aggregate-and-join-back alternative; the
    // sum is over longs, so the result is partition-order-exact
    val w = org.apache.spark.sql.expressions.Window.partitionBy(id)
    val feats = counts
      .withColumn("xq", halfUpCol(col("_cnt") * lit(Scale), sum(col("_cnt")).over(w)))
      .select(col(id), col("bucket"), col("xq"))
    // intercept: an always-on unit feature per document
    feats.unionByName(
      counts.select(col(id)).distinct()
        .withColumn("bucket", lit(dims))
        .withColumn("xq", lit(Scale)))
  }

  /** Variable-denominator halfUp (both sides non-negative here). */
  private def halfUpCol(num: Column, den: Column): Column =
    (num * 2 + den).div(den * 2)

  /** Per-row integer score contribution for the current weights, via a
    * plan-literal weight map — weights ride the plan, never a join.
    */
  private def zPartQ(weightsQ: Array[Long]): Column = {
    val wMap = typedlit(weightsQ.zipWithIndex.map { case (v, i) => i -> v }.toMap)
    col("xq") * element_at(wMap, col("bucket"))
  }

  /** Train the hard-sigmoid logistic model on `labeled` (must carry a
    * 0/1 label column). Full-batch gradient descent, `iters` passes,
    * constant `lr` (exactly representable at 3 decimal places — it
    * becomes the rational lrQ/1000 inside the integer update). Bit-
    * deterministic and oracle-replayable: integer sums commute exactly.
    */
  def train(
      labeled: DataFrame, id: String, text: String, label: String,
      dims: Int = 1024, iters: Int = 50, lr: Double = 2.0): Model = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0, s"lr must be > 0, got $lr")
    val lrQ = java.math.BigDecimal.valueOf(lr)
      .setScale(3, java.math.RoundingMode.UNNECESSARY) // throws if finer
      .unscaledValue().longValueExact()
    // ONE distributed job: build the hashed-feature table and collect it.
    // The training table is BOUNDED BY CONTRACT — the fixed-point
    // headroom require below caps nDocs·lr at 2000, so the collect is
    // ≤ nDocs·(dims+1) rows of four longs — and full-batch GD is
    // inherently sequential across iterations, so keeping the loop
    // distributed buys no parallelism that matters at this size while
    // paying iters job barriers (measured: 50 iterations ≈ 4.6 s of
    // pure scheduling at sf0.1). The industry shape for corpus quality
    // classifiers is exactly this split: train on a bounded labeled
    // sample at the driver, SCORE the 100 TB corpus distributed
    // ([[score]] — weights ride the plan as literals, no driver loop).
    // Integer sums commute, so the driver loop is bit-identical to the
    // former distributed window-aggregate formulation (the oracle
    // replays either).
    val feats = hashedFeatures(labeled, id, text, dims)
      .join(labeled.select(col(id),
        (col(label).cast("double") * Scale).cast("long").as("_yq")), Seq(id))
      .select(col(id), col("bucket"), col("xq"), col("_yq"))
    // Enforce the headroom contract DISTRIBUTED, before any driver
    // materialization (advice r10): an oversized labeled input must hit
    // the clean require below, not OOM the driver inside collect(). The
    // extra count job recomputes the (contract-bounded) feature table
    // once — cheap at training size, and the oversized path never
    // reaches collect at all.
    val nDocs = feats.select(col(id)).distinct().count()
    require(nDocs > 0, "no trainable documents (all empty or NULL text)")
    require(nDocs * lr <= 2000,
      s"fixed-point headroom: nDocs·lr must be <= 2000 (train on a bounded " +
        s"labeled sample), got $nDocs docs at lr=$lr")
    val rows = feats.collect()
    // group feature rows per document (any id type; insertion order is
    // irrelevant — every reduction below is a commutative long sum)
    val byDoc = rows.groupBy(_.get(0))
    val docFeats = byDoc.valuesIterator.map { rs =>
      (rs.map(r => (r.getInt(1), r.getLong(2))).toArray, rs.head.getLong(3))
    }.toArray
    val wq = new Array[Long](dims + 1)
    val gq = new Array[Long](dims + 1)
    for (_ <- 0 until iters) {
      java.util.Arrays.fill(gq, 0L)
      docFeats.foreach { case (fs, yq) =>
        var zq = 0L
        fs.foreach { case (b, xq) => zq += xq * wq(b) }
        // hard sigmoid at scale 10^6 from z at scale 10^12, then the
        // error — the exact integer link of [[hardSigmoidQ]]
        val pq = math.min(Scale,
          math.max(0L, Similarity.divHalfUp(zq, 4L * Scale) + Scale / 2))
        val eq = pq - yq
        fs.foreach { case (b, xq) => gq(b) += eq * xq }
      }
      // wq -= halfUp(lr·g/n · Scale): g = gq/Scale², lr = lrQ/1000
      var b = 0
      while (b <= dims) {
        wq(b) -= Similarity.divHalfUp(lrQ * gq(b), 1000L * nDocs * Scale)
        b += 1
      }
    }
    Model(dims, wq)
  }

  /** Score documents with a trained model: `quality_prob` =
    * hardSigmoid(w·x + b) per document, exactly the trained link. One
    * feature aggregation + one integer sum — no driver involvement, no
    * join (weights are plan literals). Documents with no tokens are
    * absent (no features to score).
    */
  def score(
      df: DataFrame, id: String, text: String, model: Model): DataFrame =
    scoreQ(df, id, text, model)
      .select(col(id),
        (col("score_q").cast("double") / Scale).as("quality_prob"))

  /** Integer hard-sigmoid scores at scale 10^6 — the thresholdable form
    * of [[score]] (`quality_prob` = `score_q` / 10^6 exactly).
    */
  def scoreQ(
      df: DataFrame, id: String, text: String, model: Model): DataFrame =
    hashedFeatures(df, id, text, model.dims)
      .groupBy(col(id))
      .agg(sum(zPartQ(model.weightsQ)).as("_zq"))
      .select(col(id), hardSigmoidQ(col("_zq")).as("score_q"))

  /** Keep the top `keepPerMille`/1000 of rows by an integer score column
    * — the FineWeb-style classifier gate. The threshold is the EXACT
    * discrete quantile: t = the r-th smallest score with
    * r = n − (n·keepPerMille div 1000) + 1, kept rows are `score ≥ t`
    * (threshold ties are kept — the deterministic over-keep).
    *
    * Scale shape: the rank never touches row space. Scores live in the
    * BOUNDED value domain [0, 10^6], so the groupBy histogram has at
    * most 10^6+1 rows regardless of corpus size; the one
    * ordered-cumulative window runs over that bounded histogram (the
    * q_ship_delay trick — value-domain-bounded, NOT a single-partition
    * row sort), and the threshold broadcasts back as a scalar filter
    * that fuses into the scan.
    */
  def topPGate(
      scored: DataFrame, scoreCol: String, keepPerMille: Long,
      maxDistinctScores: Long = Relevance.MaxHistogramValues): DataFrame = {
    require(keepPerMille >= 1 && keepPerMille <= 1000,
      s"keepPerMille must be in [1, 1000], got $keepPerMille")
    Relevance.requireBoundedIntegerScore(scored, scoreCol, "topPGate")
    val reserved = Seq("_c", "_cum", "_n", "_r", "_t")
    require(!reserved.exists(scored.columns.contains),
      s"topPGate reserves columns ${reserved.mkString(", ")}")
    // Pinned: the histogram feeds both the cumulative window and the
    // total aggregate, and the ceiling check below needs its row count —
    // without the checkpoint each consumer replays the caller's full
    // scoring plan.
    val hist = scored.groupBy(col(scoreCol)).agg(count(lit(1)).as("_c"))
      .localCheckpoint(true)
    val nVals = hist.count()
    require(nVals <= maxDistinctScores,
      s"topPGate: $nVals distinct $scoreCol values exceed the " +
        s"bounded-histogram ceiling $maxDistinctScores — quantize the score " +
        "to a coarser integer domain first, or raise maxDistinctScores " +
        "deliberately")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val thr = hist
      .withColumn("_cum", sum(col("_c")).over(w))
      .crossJoin(broadcast(hist.agg(sum(col("_c")).as("_n"))))
      .withColumn("_r",
        col("_n") - (col("_n") * lit(keepPerMille)).div(lit(1000L)) + 1)
      .filter(col("_cum") >= col("_r"))
      .agg(min(col(scoreCol)).as("_t"))
    scored.crossJoin(broadcast(thr))
      .filter(col(scoreCol) >= col("_t"))
      .drop("_t")
  }
}
