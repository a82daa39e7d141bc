package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for release/training corpora: k-anonymity and
  * l-diversity over declared quasi-identifier columns (Sweeney 2002;
  * Machanavajjhala et al. 2007). A record is re-identifiable when its
  * quasi-identifier combination is shared by fewer than k rows; a group
  * is attribute-disclosing when its sensitive column carries fewer than
  * l distinct values (everyone in the group shares the secret, so
  * linking ANY member leaks it).
  *
  * These are audit operators, not anonymizers: they surface the risk
  * mass a release would carry. The standard mitigation loop —
  * generalize a quasi column (coarser buckets), re-audit — composes from
  * these plus ordinary column arithmetic.
  *
  * Scale shape: one hash aggregate on the quasi key for k-anonymity and
  * one two-level aggregate for l-diversity — the same partial-aggregate
  * shuffles as any groupBy-count, nothing quadratic, no driver state.
  */
object Privacy {

  /** Per-group audit: (quasi..., n_rows, is_violating) for every
    * quasi-identifier combination; `is_violating` marks groups smaller
    * than k.
    */
  def kAnonymityGroups(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymityGroups needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("is_violating", col("n_rows") < k)
  }

  /** One-row release-risk summary: group counts, violating-group count,
    * rows at re-identification risk, and the at-risk per-mille of the
    * corpus (exact integer ratio).
    */
  def kAnonymitySummary(df: DataFrame, quasi: Seq[String], k: Long): DataFrame =
    kAnonymityGroups(df, quasi, k)
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("is_violating"), 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("is_violating"), col("n_rows")).otherwise(0L))
          .as("rows_at_risk"),
        sum(col("n_rows")).as("n_rows_total"))
      .withColumn("risk_pm", expr("(1000 * rows_at_risk) div n_rows_total"))

  /** Per-group l-diversity audit: (quasi..., n_rows, n_sensitive,
    * is_violating) — `n_sensitive` distinct non-NULL sensitive values,
    * violating when below l.
    */
  def lDiversityGroups(
      df: DataFrame, quasi: Seq[String], sensitive: String, l: Long): DataFrame = {
    require(quasi.nonEmpty, "lDiversityGroups needs at least one quasi-identifier")
    require(!quasi.contains(sensitive),
      "the sensitive column cannot also be a quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitive)).as("n_sensitive"))
      .withColumn("is_violating", col("n_sensitive") < l)
  }

  // --- differentially private release (Dwork et al. 2006) -------------
  //
  // The Laplace mechanism with SEEDED, group-keyed noise: u derives from
  // an md5 of (seed, group key), so a release is reproducible — rerun
  // the pipeline, publish the same numbers — and engine-replayable (the
  // correctness oracle recomputes the identical noise). Privacy comes
  // from the SECRECY OF THE SEED, exactly as in any PRG-based DP
  // deployment: an adversary without the seed faces the Laplace
  // distribution; never publish the seed with the release. Noise is
  // integerized as floor(x + 0.5) — nearest integer via a boundary set
  // (half-integers) unreachable from ln() doubles, the established
  // cross-engine-exact rounding idiom.

  /** u ∈ (0,1) \ {0.5} from the first 48 bits of md5(seed|key):
    * (h + 0.5) / 2^48 — never exactly 0 / 0.5 / 1, so the inverse CDF
    * below never sees ln(0) or a sign ambiguity.
    */
  private def unitUniform(seed: String, key: Column): Column =
    (conv(substring(md5(concat(lit(seed), lit("|"), key)), 1, 12), 16, 10)
      .cast("double") + lit(0.5)) / lit(281474976710656.0)

  /** Integer Laplace(b) noise by inverse CDF on the seeded uniform:
    * x = −b · sgn(u − ½) · ln(1 − 2·|u − ½|), released as
    * floor(x + 0.5).
    */
  private def laplaceNoise(seed: String, key: Column, b: Column): Column = {
    val u = unitUniform(seed, key)
    val centered = u - lit(0.5)
    val x = -b * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
    floor(x + lit(0.5)).cast("long")
  }

  /** ε-DP noisy group counts (sensitivity 1, Laplace b = 1/ε): one hash
    * aggregate, then map-side noise — the exact count never leaves the
    * plan. `suppressBelow` drops groups whose NOISY count falls under a
    * publication floor (thresholding on the released value is
    * DP-safe post-processing).
    */
  def dpCounts(
      df: DataFrame, groupCols: Seq[String], epsilon: Double, seed: String,
      suppressBelow: Long = Long.MinValue): DataFrame = {
    require(groupCols.nonEmpty, "dpCounts needs at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val key = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .withColumn("released",
        col("_n") + laplaceNoise(seed, key, lit(1.0 / epsilon)))
      .where(col("released") >= suppressBelow)
      .drop("_n")
  }

  /** ε-DP noisy sum of an INTEGER measure clamped to [lo, hi]
    * (sensitivity max(|lo|, |hi|), Laplace b = Δ/ε). The clamp is part
    * of the mechanism — without it one row could move the sum
    * unboundedly — and the integer domain keeps the exact sum
    * order-independent (a double sum would be merge-order-dependent
    * and unreplayable).
    */
  def dpSum(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Long, hi: Long, epsilon: Double, seed: String): DataFrame = {
    require(groupCols.nonEmpty, "dpSum needs at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    val sensitivity = math.max(math.abs(lo), math.abs(hi))
    require(sensitivity > 0, "a [0, 0] clamp releases nothing")
    val key = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    val clamped = least(greatest(col(valueCol).cast("long"), lit(lo)), lit(hi))
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(clamped).as("_s"))
      .withColumn("released",
        col("_s") + laplaceNoise(seed, key, lit(sensitivity.toDouble / epsilon)))
      .drop("_s")
  }
}
