package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Privacy

/** Differentially-private release gate queries. The seeded Laplace
  * mechanism is fully deterministic given (seed, group key), so the
  * release is hash-checked end-to-end: DuckDB recomputes the identical
  * 48-bit md5 uniform, the same inverse-CDF expression tree (ln is
  * bit-identical JVM↔DuckDB on this data — the q_lm_score_kn
  * precedent), and the same floor(x + 0.5) integerization whose
  * half-integer boundary set is unreachable from ln() doubles. The
  * gate pins b exactly representable (ε = 0.5 → b = 2.0; Δ = 50 000 →
  * b = 100 000.0) so the scale never crosses an engine boundary as an
  * inexact literal.
  */
object DpQueries {

  private val Seed = "graft-r14"

  /** Shared oracle noise expression over a key column `k`, a mechanism
    * tag, and scale `b` — one line (generated SQL must never start with
    * '|'). The preimage prefix comes from [[Privacy.releaseTag]], the
    * SAME routine the mechanism folds (domain separation per
    * release/mechanism/scale, advice r14 — correlated noise across
    * releases over the same groups would cancel), so the two sides
    * cannot drift.
    */
  private def oNoise(k: String, mech: String, b: Double): String = {
    val tag = Privacy.releaseTag(Seed, mech, b)
    s"CAST(floor(-($b) * sign(((('0x' || substr(md5('$tag' || '|' || $k), 1, 12))::BIGINT::DOUBLE + 0.5) / 281474976710656.0) - 0.5) * ln(1.0 - 2.0 * abs(((('0x' || substr(md5('$tag' || '|' || $k), 1, 12))::BIGINT::DOUBLE + 0.5) / 281474976710656.0) - 0.5)) + 0.5) AS BIGINT)"
  }

  /** ε-DP noisy event counts per event type (sensitivity 1, b = 2.0). */
  val qDpCounts = QueryDef(
    "q_dp_counts",
    (s, d) => Privacy.dpCounts(
      QueryDef.eventsTable(s, d).where(col("user_id").isNotNull),
      Seq("event_type"), epsilon = 0.5, seed = Seed)
      .orderBy("event_type"),
    Some(s"""SELECT event_type,
            |       count(*) + ${oNoise("event_type", "count", 2.0)} AS released
            |FROM events WHERE user_id IS NOT NULL
            |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** ε-DP noisy revenue-style sums: the measure is the exact integer
    * cents floor(value·100), clamped to [0, 50 000] (the clamp IS the
    * sensitivity bound), Laplace b = 50 000 / 0.5 = 100 000.
    */
  val qDpSum = QueryDef(
    "q_dp_sum",
    (s, d) => Privacy.dpSum(
      QueryDef.eventsTable(s, d).where(col("user_id").isNotNull)
        .withColumn("cents", floor(col("value") * 100).cast("long")),
      Seq("event_type"), "cents", lo = 0L, hi = 50000L,
      epsilon = 0.5, seed = Seed)
      .orderBy("event_type"),
    Some(s"""SELECT event_type,
            |       CAST(sum(least(greatest(CAST(floor(value * 100) AS BIGINT), 0), 50000)) AS BIGINT)
            |         + ${oNoise("event_type", "sum", 100000.0)} AS released
            |FROM events WHERE user_id IS NOT NULL
            |GROUP BY event_type ORDER BY event_type""".stripMargin))

  val all: Seq[QueryDef] = Seq(qDpCounts, qDpSum)
}
