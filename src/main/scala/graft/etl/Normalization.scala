package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.schema.EventSchema

/** Normalization stage: timestamp standardization + categorical
  * canonicalization (reference: src/normalization.py:16-108).
  *
  * Everything is built from codegen'd `Column` expressions — the synonym
  * maps are `typedlit` map literals resolved with `try_element_at` +
  * `coalesce` (constant-folded by Catalyst) rather than UDFs, keeping
  * predicate pushdown and whole-stage codegen intact (SURVEY.md §2.13).
  */
object Normalization {

  /** Parse string timestamps to UTC `TimestampType`, coercing parse
    * failures to NULL, optionally dropping them
    * (reference: src/normalization.py:16-31).
    *
    * The reference's pandas parse infers the format from the first non-null
    * value and coerces every non-matching row to NULL; on its corpus only
    * the canonical `yyyy-MM-dd HH:mm:ss` format survives (SURVEY.md §2.6
    * T1). We pin that format; `try_to_timestamp` nulls mismatches under
    * ANSI mode. Pass additional `lenientFormats` for a documented
    * multi-format extension (first match wins via `coalesce`).
    */
  def standardizeTimestamps(
      df: DataFrame,
      column: String = "timestamp",
      dropInvalid: Boolean = true,
      format: String = EventSchema.canonicalTimestampFormat,
      lenientFormats: Seq[String] = Nil): DataFrame = {
    if (!df.columns.contains(column)) df
    else {
      val attempts = (format +: lenientFormats)
        .map(f => try_to_timestamp(col(column), lit(f)))
      val parsed = df.withColumn(column, coalesce(attempts: _*))
      if (dropInvalid) parsed.filter(col(column).isNotNull) else parsed
    }
  }

  /** Text canonicalization kernel: lowercase, trim, collapse whitespace
    * and hyphen runs to a single underscore
    * (reference: src/normalization.py:34-40).
    */
  def normalizeText(c: Column): Column =
    regexp_replace(
      regexp_replace(lower(trim(c.cast(StringType))), "[\\s\\-]+", "_"),
      "_+", "_")

  /** Apply a synonym map with pass-through fallback: canonicalized values
    * found in the map are replaced; unmapped values keep their
    * canonicalized form (reference: src/normalization.py:74-75 `.map(m)
    * .fillna(s)`). NULLs become "unknown" before lookup.
    */
  def mapWithFallback(c: Column, synonyms: Map[String, String]): Column = {
    val norm = coalesce(normalizeText(c), lit("unknown"))
    coalesce(try_element_at(typedlit(synonyms), norm), norm)
  }

  /** Canonicalize the categorical fields
    * (reference: src/normalization.py:43-108):
    *  - `event_type`: text canonicalization, NULL -> "unknown";
    *  - `status` / `severity`: canonicalization + synonym map with
    *    pass-through fallback;
    *  - `user_id`: canonicalization, "" -> "unknown";
    *  - `source_ip`: trim only, ""/NULL -> "0.0.0.0", deliberately NO IP
    *    validation (invalid_ip / IPv6 pass through).
    *
    * Per-column guards let extra columns flow through untouched.
    */
  def normalizeCategoricals(df: DataFrame): DataFrame = {
    val has = df.columns.toSet
    var out = df
    if (has("event_type"))
      out = out.withColumn("event_type",
        coalesce(normalizeText(col("event_type")), lit("unknown")))
    if (has("status"))
      out = out.withColumn("status",
        mapWithFallback(col("status"), EventSchema.statusSynonyms))
    if (has("severity"))
      out = out.withColumn("severity",
        mapWithFallback(col("severity"), EventSchema.severitySynonyms))
    if (has("user_id")) {
      val norm = normalizeText(col("user_id"))
      out = out.withColumn("user_id",
        when(norm === "", lit("unknown")).otherwise(norm))
    }
    if (has("source_ip")) {
      val trimmed = trim(col("source_ip").cast(StringType))
      out = out.withColumn("source_ip",
        when(trimmed.isNull || trimmed === "", lit("0.0.0.0")).otherwise(trimmed))
    }
    out
  }
}
