package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD) anomaly detection over grouped numeric signals —
  * the distribution-free alternative to z-scores: mean and stddev are
  * themselves corrupted by the outliers they are meant to find, while the
  * median and the median absolute deviation have a 50% breakdown point
  * (Hampel 1974; the 1.4826 factor makes MAD a consistent σ estimator
  * under normality).
  *
  * Split into TRAIN (threshold table) and APPLY (row flagging) so the
  * apply side is a stateless broadcast join usable identically on batch
  * frames and on unbounded streams
  * ([[graft.streaming.StreamingPipeline.anomalyGateStream]]).
  */
object Anomaly {

  /** 3σ-equivalent cut under normality: |x − med| > 3 · 1.4826 · MAD. */
  val DefaultK: Double = 3.0 * 1.4826

  /** Per-group robust location/scale: exact R-7 median and MAD. Two
    * aggregation passes over the corpus; the intermediate median table is
    * one row per group and broadcast back, so the corpus shuffles only on
    * the group key (twice — the MAD is a median OF deviations, which no
    * single-pass form computes exactly). At 100 TB swap `percentile` for
    * `percentile_approx` upstream if the two passes hurt; the output
    * contract is unchanged.
    *
    * Output: one row per group — (group, med, mad) — small enough to
    * broadcast into any apply site.
    */
  def madThresholds(df: DataFrame, group: String, value: String): DataFrame = {
    val reserved = Seq("med", "mad", "_absdev")
    require(!reserved.exists(df.columns.contains),
      s"madThresholds reserves columns ${reserved.mkString(", ")}")
    val med = df.groupBy(group)
      .agg(expr(s"percentile($value, 0.5)").as("med"))
    df.join(broadcast(med), group)
      .withColumn("_absdev", abs(col(value) - col("med")))
      .groupBy(group)
      // med is constant within the group (it was joined in), so first()
      // is deterministic here
      .agg(first(col("med")).as("med"),
        expr("percentile(_absdev, 0.5)").as("mad"))
  }

  /** Flag rows whose deviation exceeds k·MAD against a PRECOMPUTED
    * threshold table — stateless (broadcast join + one comparison), so it
    * runs identically over batch frames and unbounded streams. Groups
    * absent from the thresholds (never seen at train time) are left
    * UNFLAGGED rather than failed: an unknown category is a schema-drift
    * signal, not an outlier verdict. NULL values are never anomalies.
    */
  def flagOutliers(
      df: DataFrame, thresholds: DataFrame, group: String, value: String,
      k: Double = DefaultK): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.join(broadcast(thresholds), Seq(group), "left")
      .withColumn("is_anomaly",
        coalesce(abs(col(value) - col("med")) > lit(k) * col("mad"),
          lit(false)))
  }

  /** Beaconing detection: per (entity, channel), the coefficient of
    * variation of inter-arrival gaps — malware C2 check-ins arrive on a
    * timer (CV ≈ jitter fraction), human activity is bursty (CV ≥ 1).
    * The classic hunting heuristic over flow logs.
    *
    * Scale + determinism shape: gaps come from one lag window per
    * (entity, channel) partition; the moments are ORDER-INDEPENDENT
    * exact sums — Σg as BIGINT, Σg² as DECIMAL(38,0) (µs gaps square
    * past 2^63) — and each sum is cast to double ONCE at the end, so
    * the (mean, variance, CV) expression tree evaluates bit-identically
    * on any engine and any partitioning. Never use var_pop/stddev here:
    * their streaming merge order varies run to run.
    *
    * Output: (entity, channel, n_gaps, mean_gap, cv_q, is_beacon) for
    * groups with at least `minGaps` gaps; `cv_q` is floor(CV·10⁶), NULL
    * for a zero mean (all gaps zero); `is_beacon` = cv_q < thresholdQ.
    */
  /** The exact-moment aggregate columns over a `_gap` column — Σg as
    * BIGINT, Σg² as DECIMAL(38,0): order-independent, so batch and
    * streaming produce identical sums regardless of partitioning or
    * micro-batch slicing.
    */
  private[graft] def gapMomentAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_gaps"),
    sum(col("_gap")).as("gsum"),
    sum(col("_gap").cast("decimal(38,0)") * col("_gap")).as("gsumsq"))

  /** mean/cv/flag columns from the moment aggregates — ONE shared
    * expression tree so every consumer (batch, stream) computes the
    * bit-identical statistic.
    */
  private[graft] def withCvColumns(
      aggregated: DataFrame, cvThresholdQ: Long): DataFrame =
    aggregated
      .withColumn("mean_gap",
        col("gsum").cast("double") / col("n_gaps").cast("double"))
      .withColumn("cv_q",
        when(col("gsum") > 0,
          floor(sqrt(greatest(
            col("gsumsq").cast("double") / col("n_gaps").cast("double") -
              col("mean_gap") * col("mean_gap"), lit(0.0)))
            / col("mean_gap") * lit(1000000.0))))
      .withColumn("is_beacon", coalesce(col("cv_q") < cvThresholdQ, lit(false)))
      .drop("gsumsq")

  def beaconScores(
      df: DataFrame, entity: String, channel: String, tsUs: String,
      idCol: String, minGaps: Int = 5, cvThresholdQ: Long = 300000L): DataFrame = {
    require(minGaps >= 2, s"minGaps must be >= 2, got $minGaps")
    val reserved = Seq("_gap", "n_gaps", "gsum", "gsumsq", "mean_gap", "cv_q", "is_beacon")
    require(!reserved.exists(df.columns.contains),
      s"beaconScores reserves columns ${reserved.mkString(", ")}")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(entity, channel).orderBy(col(tsUs), col(idCol))
    withCvColumns(
      df.withColumn("_gap", col(tsUs) - lag(col(tsUs), 1).over(w))
        .where(col("_gap").isNotNull)
        .groupBy(entity, channel)
        .agg(gapMomentAggs.head, gapMomentAggs.tail: _*)
        .where(col("n_gaps") >= minGaps),
      cvThresholdQ)
  }

  /** Markov sequence-surprise scoring: train a first-order transition
    * model (MLE over consecutive event-type pairs per entity), then score
    * each entity's whole path by its negative log-likelihood — high
    * surprise = an entity walking transitions the population rarely
    * takes, the sequence-anomaly signal behind UEBA "unusual activity
    * chain" detections.
    *
    * Determinism: each step contributes floor(ln(n_ab/n_a)·10⁶) — the
    * probability is an identical-operand double division of exact longs,
    * ln is bit-identical JVM↔DuckDB on such inputs, and the per-entity
    * SUM is over integers, so no float accumulation order ever matters.
    * Scores are reported negated (`surprise_q` ≥ 0) so the integer
    * division for the per-step average is floor-consistent across
    * engines (negative `div` truncates differently).
    *
    * Scale: the model is |types|² rows — broadcast; the stream shuffles
    * once for the lag window and once for the per-entity sum.
    */
  /** Consecutive (entity, from, to) transition steps of an event stream
    * — pinned, because every consumer (model training AND scoring) reads
    * it at least twice.
    */
  def transitionSteps(
      df: DataFrame, entity: String, typeCol: String, tsUs: String,
      idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(entity).orderBy(col(tsUs), col(idCol))
    df.withColumn("_next", lead(col(typeCol), 1).over(w))
      .where(col("_next").isNotNull)
      .select(col(entity).as("_e"), col(typeCol).as("_a"), col("_next").as("_b"))
      .localCheckpoint(true)
  }

  /** First-order MLE transition model over [[transitionSteps]] output:
    * (_a, _b, n_ab, n_a) — |types|² rows, the frozen artifact the
    * streaming twin broadcasts.
    */
  def markovModel(steps: DataFrame): DataFrame = {
    val trans = steps.groupBy("_a", "_b").agg(count(lit(1)).as("n_ab"))
    trans.join(trans.groupBy("_a").agg(sum(col("n_ab")).as("n_a")), Seq("_a"))
  }

  /** Per-step integer surprise: −floor(ln(n_ab/n_a)·10⁶) ≥ 0. */
  private[graft] def stepSurpriseQ: org.apache.spark.sql.Column =
    -floor(log(col("n_ab").cast("double") / col("n_a").cast("double"))
      * lit(1000000.0))

  /** Theil–Sen robust trend estimation per group: the LOWER MEDIAN of
    * all pairwise slopes (y2−y1)/(x2−x1) — 29.3% breakdown point where
    * least squares is destroyed by a single outlier day, and exact
    * integer arithmetic throughout (slopes are 10⁶-scaled integer
    * divisions, the median is a rank selection, never an average).
    *
    * The pairwise stage is O(n²) per group BY DESIGN — sound only for
    * bounded series (daily/hourly counts per entity, n in the tens to
    * hundreds). The `maxPoints` contract is ENFORCED with a fail-fast
    * distributed check before any pair materializes, the same
    * bounded-domain guard pattern as perplexityBuckets: an unbounded
    * group would otherwise plan a quadratic self-join silently.
    *
    * Slopes are identical-operand double divisions of exact longs —
    * bit-exact cross-engine with no quantization (an integer `div`
    * would hit the trunc-vs-floor divergence on NEGATIVE slopes).
    */
  def theilSenSlopes(
      df: DataFrame, group: String, x: String, y: String,
      maxPoints: Int = 1024): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val pts = df.select(col(group).as("_g"), col(x).as("_x"), col(y).as("_y"))
      .localCheckpoint(true) // guard count + both pair sides
    // coalesce: max over an EMPTY frame is NULL — an empty series should
    // yield an empty slope frame, not NPE in the guard
    val biggest = pts.groupBy("_g").agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L))).head().getLong(0)
    require(biggest <= maxPoints,
      s"theilSenSlopes: a group has $biggest points (> maxPoints=$maxPoints) " +
        "— the pairwise stage is quadratic; aggregate the series first")
    val slopes = pts.as("l").join(pts.as("r"),
        col("l._g") === col("r._g") && col("l._x") < col("r._x"))
      .select(col("l._g").as("_g"),
        (expr("CAST(r._y - l._y AS DOUBLE)") /
          expr("CAST(r._x - l._x AS DOUBLE)")).as("slope"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_g").orderBy(col("slope"))
    slopes
      .withColumn("_rn", row_number().over(w))
      .withColumn("_m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_g")))
      .where(col("_rn") === expr("(_m + 1) div 2"))
      .select(col("_g").as(group), col("_m").as("n_pairs"), col("slope"))
  }

  def markovPathScores(
      df: DataFrame, entity: String, typeCol: String, tsUs: String,
      idCol: String): DataFrame = {
    val steps = transitionSteps(df, entity, typeCol, tsUs, idCol)
    steps.join(broadcast(markovModel(steps)), Seq("_a", "_b"))
      .withColumn("_sq", stepSurpriseQ)
      .groupBy(col("_e").as(entity))
      .agg(count(lit(1)).as("n_steps"), sum(col("_sq")).as("surprise_q"))
      .withColumn("avg_surprise_q", expr("surprise_q div n_steps"))
  }
  /** Population-stability-index drift (the credit-risk industry's
    * standard distribution-shift metric, here for feed/corpus
    * monitoring): per dimension group, bin a numeric column into
    * `bins` equal-width buckets over the GLOBAL [min, max], compare
    * the two snapshots' bin shares, and report
    * PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i). Rule of thumb:
    * < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
    *
    * Exactness contract (hash-gated): bin shares are Laplace-smoothed
    * — p_i = (c_i + 1) / (n + bins) — so ln never sees 0 and a
    * snapshot with zero rows degrades to the uniform distribution;
    * each share is ONE division of identical longs cast to double;
    * each bin's term is floor-quantized to 10⁻¹² BEFORE summation
    * (ln near 1.0 differs by a ulp between libm builds — measured on
    * this very metric — and a double sum would carry the ulp into the
    * hash; the integer sum is order-independent AND ulp-immune), so
    * `psi_q` is the exact pico-scaled PSI. One scan + two bounded
    * aggregates (bounds, totals) + one grid join; the (dims × bins)
    * grid left-join densifies missing bins so both engines sum the
    * same bin set.
    *
    * @param snap 0/1 column splitting rows into the two snapshots
    */
  def psiDrift(
      df: DataFrame, valueCol: String, snap: Column, dims: Seq[String],
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(dims.nonEmpty, "psiDrift needs at least one dimension column")
    val v = col(valueCol)
    val base = df.where(v.isNotNull)
      .select((dims.map(col) :+ v.as("_v") :+ snap.cast("int").as("_snap")): _*)
    val bounds = base.agg(min(col("_v")).as("_lo"), max(col("_v")).as("_hi"))
    val binned = base.crossJoin(broadcast(bounds))
      .withColumn("_bin",
        when(col("_hi") === col("_lo"), lit(0L)).otherwise(
          least(floor((col("_v") - col("_lo")) /
            ((col("_hi") - col("_lo")) / bins.toDouble)), lit(bins - 1L)))
        .cast("int"))
    val counts = binned
      .groupBy((dims.map(col) :+ col("_bin")): _*)
      .agg(sum(when(col("_snap") === 0, 1L).otherwise(0L)).as("_c0"),
        sum(when(col("_snap") =!= 0, 1L).otherwise(0L)).as("_c1"))
    val grid = base.select(dims.map(col): _*).distinct()
      .crossJoin(broadcast(
        df.sparkSession.range(bins).select(col("id").cast("int").as("_bin"))))
    val dense = grid.join(counts, dims :+ "_bin", "left")
      .select((dims.map(col) :+ col("_bin")
        :+ coalesce(col("_c0"), lit(0L)).as("_c0")
        :+ coalesce(col("_c1"), lit(0L)).as("_c1")): _*)
    val tot = dense.groupBy(dims.map(col): _*)
      .agg(sum(col("_c0")).as("_n0"), sum(col("_c1")).as("_n1"))
    val p = (col("_c0") + 1).cast("double") /
      (col("_n0") + bins).cast("double")
    val q = (col("_c1") + 1).cast("double") /
      (col("_n1") + bins).cast("double")
    dense.join(tot, dims)
      .withColumn("_termq",
        floor((p - q) * log(p / q) * lit(1e12)).cast("long"))
      .groupBy((dims.map(col) :+ col("_n0").as("n0") :+ col("_n1").as("n1"))
        .map(c => c): _*)
      .agg(sum(col("_termq")).as("psi_q"))
  }

  /** Equal-width bin index over FROZEN [lo, hi] bounds, clamped into
    * [0, bins) — unlike [[psiDrift]]'s global-bounds bin (where values
    * can never undershoot the global min), frozen-baseline monitoring
    * sees current values OUTSIDE the reference range; they land in the
    * edge bins rather than producing a negative index.
    */
  private[graft] def clampedBin(
      v: Column, lo: Double, hi: Double, bins: Int): Column =
    if (hi == lo) lit(0)
    else least(greatest(
      floor((v - lit(lo)) / lit((hi - lo) / bins)), lit(0L)),
      lit(bins - 1L)).cast("int")

  /** Per-dim DENSE bin counts as `bins` conditional-sum columns
    * `_<prefix><i>` plus the total `_n<prefix>` — one hash aggregate,
    * no grid join (bins is a small fixed constant, so densification is
    * free in the aggregate itself). The shape both [[psiDriftFrozen]]
    * sides and the streaming twin share: state per group is exactly
    * bins+1 longs.
    */
  private[graft] def denseBinCounts(
      df: DataFrame, valueCol: String, dims: Seq[String], bins: Int,
      lo: Double, hi: Double, prefix: String): DataFrame = {
    val binned = df.where(col(valueCol).isNotNull)
      .withColumn("_bin", clampedBin(col(valueCol), lo, hi, bins))
    val sums = (0 until bins).map(i =>
      sum(when(col("_bin") === i, 1L).otherwise(0L)).as(s"_$prefix$i"))
    binned.groupBy(dims.map(col): _*)
      .agg(sums.head, sums.tail: _*)
      .withColumn(s"_n$prefix",
        (0 until bins).map(i => col(s"_$prefix$i")).reduce(_ + _))
  }

  /** The pico-quantized PSI sum over dense bin-count columns — the
    * identical expression tree on the batch frozen op and the stream
    * twin, and the same per-term quantization contract as [[psiDrift]]
    * (floor to 10⁻¹² before an order-fixed integer sum).
    */
  private[graft] def psiQColumn(
      bins: Int, c0: Int => Column, n0: Column,
      c1: Int => Column, n1: Column): Column =
    (0 until bins).map { i =>
      val p = (c0(i) + 1).cast("double") / (n0 + bins).cast("double")
      val q = (c1(i) + 1).cast("double") / (n1 + bins).cast("double")
      floor((p - q) * log(p / q) * lit(1e12)).cast("long")
    }.reduce(_ + _)

  /** PSI drift of `current` against a FROZEN `reference` baseline — the
    * deployable monitoring shape of [[psiDrift]]: bins are anchored to
    * the reference's [min, max] (the baseline is an immutable artifact;
    * current values outside it clamp into the edge bins), and the
    * reference side aggregates to a BOUNDED (dims × (bins+1)) count
    * frame that broadcasts. Same smoothing + pico-quantization contract
    * as [[psiDrift]]. Documented divergences from the two-snapshot op:
    * the monitored dim universe is CURRENT-driven (a dim with reference
    * data but no current rows emits nothing — no data, no release; a
    * current-only dim scores against the uniform smoothed reference),
    * and `n0` is 0 for such current-only dims.
    */
  def psiDriftFrozen(
      current: DataFrame, reference: DataFrame, valueCol: String,
      dims: Seq[String], bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(dims.nonEmpty, "psiDriftFrozen needs at least one dimension column")
    val (lo, hi) = referenceBounds(reference, valueCol)
    val ref = denseBinCounts(reference, valueCol, dims, bins, lo, hi, "c0_")
    val cur = denseBinCounts(current, valueCol, dims, bins, lo, hi, "c1_")
    cur.join(broadcast(ref), dims, "left")
      .select((dims.map(col)
        :+ coalesce(col("_nc0_"), lit(0L)).as("n0")
        :+ col("_nc1_").as("n1")
        :+ psiQColumn(bins,
          i => coalesce(col(s"_c0_$i"), lit(0L)), coalesce(col("_nc0_"), lit(0L)),
          i => col(s"_c1_$i"), col("_nc1_")).as("psi_q")): _*)
  }

  /** The frozen baseline's global [min, max] — one bounded driver-side
    * row; throws on an all-null/empty reference (no bounds, no bins).
    */
  private[graft] def referenceBounds(
      reference: DataFrame, valueCol: String): (Double, Double) = {
    val b = reference.where(col(valueCol).isNotNull)
      .agg(min(col(valueCol)).cast("double"), max(col(valueCol)).cast("double"))
      .head()
    require(!b.isNullAt(0), "reference has no non-null values to bin")
    (b.getDouble(0), b.getDouble(1))
  }

}
