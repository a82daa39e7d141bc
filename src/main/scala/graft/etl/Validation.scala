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

    val tsIsTimestamp = df.schema("timestamp").dataType == TimestampType
    if (!tsIsTimestamp)
      issues("timestamp_dtype") = df.schema("timestamp").dataType.simpleString

    // ONE pass for all data-dependent checks: the null count and the
    // distinct invalid values per domain column fold into a single
    // aggregation job (collect_set skips the NULLs that `when` emits for
    // allowed values; invalid sets are tiny by construction).
    def invalidSet(column: String, allowed: Set[String]) =
      collect_set(when(col(column).isNotNull &&
        !col(column).isin(allowed.toSeq: _*), col(column).cast(StringType)))

    val aggs =
      (if (tsIsTimestamp)
        Seq(sum(col("timestamp").isNull.cast("long")).as("_ts_nulls"))
      else Nil) ++ Seq(
        invalidSet("status", EventSchema.allowedStatus).as("_bad_status"),
        invalidSet("severity", EventSchema.allowedSeverity).as("_bad_severity"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)

    if (tsIsTimestamp) {
      val nulls = row.getAs[Long]("_ts_nulls")
      if (nulls > 0) issues("timestamp_null_count") = nulls.toString
    }
    def report(field: String, key: String): Unit = {
      val bad = row.getAs[scala.collection.Seq[String]](field).toSeq.sorted
      if (bad.nonEmpty) issues(key) = bad.mkString("[", ", ", "]")
    }
    report("_bad_status", "invalid_status_values")
    report("_bad_severity", "invalid_severity_values")

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
