package graft.schema

import org.apache.spark.sql.types._

/** Schema contract for the `security_events` table.
  *
  * Mirrors the reference's required-column contract
  * (reference: src/cleaning.py:18-26) and the canonical categorical
  * vocabularies enforced post-normalization
  * (reference: src/cleaning.py:117-123).
  */
object EventSchema {

  /** Required input columns (reference: src/cleaning.py:18-26). */
  val requiredColumns: Seq[String] = Seq(
    "event_id", "timestamp", "user_id", "event_type",
    "status", "severity", "source_ip")

  /** Text columns coerced to string early (reference: src/cleaning.py:72-74). */
  val textColumns: Seq[String] =
    Seq("user_id", "event_type", "status", "severity", "source_ip")

  /** Missing-value fills (reference: src/cleaning.py:77-81). */
  val fillValues: Map[String, String] = Map(
    "user_id"   -> "unknown",
    "event_type" -> "unknown",
    "status"    -> "unknown",
    "severity"  -> "unknown",
    "source_ip" -> "0.0.0.0")

  /** Canonical status vocabulary (reference: src/cleaning.py:119). */
  val allowedStatus: Set[String] = Set("success", "failure", "unknown")

  /** Canonical severity vocabulary (reference: src/cleaning.py:120). */
  val allowedSeverity: Set[String] =
    Set("info", "low", "medium", "high", "critical", "unknown")

  /** Status synonym map, applied after text canonicalization; unmapped
    * values pass through unchanged (reference: src/normalization.py:56-75).
    */
  val statusSynonyms: Map[String, String] = Map(
    "ok" -> "success", "pass" -> "success", "passed" -> "success",
    "success" -> "success", "succeeded" -> "success",
    "allowed" -> "success", "grant" -> "success",
    "failure" -> "failure", "failed" -> "failure", "error" -> "failure",
    "denied" -> "failure", "deny" -> "failure", "blocked" -> "failure",
    "unauthorized" -> "failure",
    "unknown" -> "unknown", "" -> "unknown")

  /** Severity synonym map (reference: src/normalization.py:77-98). */
  val severitySynonyms: Map[String, String] = Map(
    "informational" -> "info", "information" -> "info", "info" -> "info",
    "notice" -> "low", "low" -> "low",
    "warn" -> "medium", "warning" -> "medium", "medium" -> "medium",
    "med" -> "medium",
    "high" -> "high", "severe" -> "high",
    "critical" -> "critical", "crit" -> "critical",
    "emergency" -> "critical",
    "unknown" -> "unknown", "" -> "unknown")

  /** Ordinal severity encoding; unmapped -> NULL
    * (reference: src/feature_engineering.py:19-32).
    */
  val severityScores: Map[String, Double] = Map(
    "info" -> 0.0, "low" -> 1.0, "medium" -> 2.0,
    "high" -> 3.0, "critical" -> 4.0)

  /** Canonical timestamp format — the only format that survives the
    * reference's infer-first-then-coerce parse on its own corpus
    * (reference: src/normalization.py:16-31; SURVEY.md §2.6 T1).
    */
  val canonicalTimestampFormat: String = "yyyy-MM-dd HH:mm:ss"

  /** Name of the synthetic ingest-order column used to reproduce the
    * reference's file-order "keep last" dedup semantics in a distributed
    * setting (SURVEY.md §1.5).
    */
  val ingestOrderCol: String = "_ingest_order"

  /** Engineered feature columns in reference output order
    * (reference: src/feature_engineering.py:3-11).
    */
  val featureColumns: Seq[String] = Seq(
    "severity_score", "user_event_count_total", "user_daily_avg_events",
    "session_id", "session_event_count", "session_duration_seconds")
}
