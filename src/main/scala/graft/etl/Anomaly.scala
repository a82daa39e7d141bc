package graft.etl

import org.apache.spark.sql.DataFrame
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
}
