package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, TimestampType}

import graft.schema.EventSchema

/** Post-run schema validation (reference: src/cleaning.py:91-132) with the
  * same three modes: `off` (skip), `warn` (log issues), `strict` (throw).
  * Returns a map of {check -> details}; empty means clean.
  *
  * The domain checks aggregate distinct invalid values — one job over
  * low-cardinality columns, so the `collect` is a few rows at any scale.
  */
object Validation {

  def validateSchema(df: DataFrame): Map[String, String] = {
    val issues = scala.collection.mutable.LinkedHashMap.empty[String, String]

    val missing = EventSchema.requiredColumns.filterNot(df.columns.contains)
    if (missing.nonEmpty) {
      issues("missing_columns") =
        s"Missing required columns: ${missing.mkString("[", ", ", "]")}"
      return issues.toMap
    }

    df.schema("timestamp").dataType match {
      case TimestampType =>
        val nulls = df.filter(col("timestamp").isNull).count()
        if (nulls > 0) issues("timestamp_null_count") = nulls.toString
      case other =>
        issues("timestamp_dtype") = other.simpleString
    }

    def invalidValues(column: String, allowed: Set[String]): Seq[String] =
      df.select(col(column).cast(StringType))
        .filter(col(column).isNotNull && !col(column).isin(allowed.toSeq: _*))
        .distinct()
        .collect().map(_.getString(0)).toSeq.sorted

    val badStatus = invalidValues("status", EventSchema.allowedStatus)
    if (badStatus.nonEmpty)
      issues("invalid_status_values") = badStatus.mkString("[", ", ", "]")

    val badSeverity = invalidValues("severity", EventSchema.allowedSeverity)
    if (badSeverity.nonEmpty)
      issues("invalid_severity_values") = badSeverity.mkString("[", ", ", "]")

    issues.toMap
  }

  /** Apply a validation mode: returns the issues; throws in strict mode. */
  def check(df: DataFrame, mode: String): Map[String, String] = {
    mode.toLowerCase match {
      case "off" | "" => Map.empty
      case m =>
        val issues = validateSchema(df)
        if (issues.nonEmpty) {
          if (m == "strict")
            throw new IllegalStateException(s"Schema validation failed: $issues")
          else
            println(s"[Pipeline] Validation warnings: $issues")
        }
        issues
    }
  }
}
