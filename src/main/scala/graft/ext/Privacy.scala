package graft.ext

import org.apache.spark.sql.DataFrame
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
}
