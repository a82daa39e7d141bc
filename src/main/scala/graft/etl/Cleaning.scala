package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.schema.EventSchema

/** Cleaning stage: required-column validation, missing-value handling,
  * duplicate removal.
  *
  * Semantics mirror the reference (reference: src/cleaning.py:29-88) but the
  * implementation is declarative Spark so Catalyst can push filters into the
  * scan and pipeline the per-column expressions in whole-stage codegen.
  *
  * All transforms are `DataFrame => DataFrame` and compose with
  * `df.transform(...)`.
  */
object Cleaning {

  /** Throw if any required column is missing
    * (reference: src/cleaning.py:29-40).
    */
  def validateRequiredColumns(
      df: DataFrame,
      required: Seq[String] = EventSchema.requiredColumns): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Missing required columns: ${missing.mkString("[", ", ", "]")}")
    df
  }

  /** Missing-value handling (reference: src/cleaning.py:58-88):
    *  - drop rows with NULL `event_id` (cannot dedup or join reliably);
    *  - coerce the five text columns to string early;
    *  - fill text NULLs with `unknown` / `0.0.0.0`;
    *  - trim every string column (including a still-unparsed string
    *    `timestamp`).
    *
    * One narrow projection — all column expressions fuse into a single
    * codegen stage; the not-null filter is pushed down to the source when
    * the source supports it.
    */
  def handleMissingValues(df: DataFrame): DataFrame = {
    val keyed = df.filter(col("event_id").isNotNull)
    val casted = EventSchema.textColumns
      .filter(keyed.columns.contains)
      .foldLeft(keyed)((d, c) => d.withColumn(c, col(c).cast(StringType)))
    val fills = EventSchema.fillValues.filter { case (c, _) => casted.columns.contains(c) }
    val filled = casted.na.fill(fills)
    val stringCols = filled.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    stringCols.foldLeft(filled)((d, c) => d.withColumn(c, trim(col(c))))
  }

  /** Duplicate removal (reference: src/cleaning.py:43-55). The reference
    * runs two passes — drop full-row duplicates keeping the LAST in ingest
    * order, then drop duplicates by `event_id` keeping the LAST — but the
    * two compose to a single keep-last-per-`event_id`: `event_id` is one of
    * the full-row key's columns, so the max-ingest-order row of an
    * `event_id` group has max order within its own full-row group too — it
    * survives pass 1 and is exactly pass 2's survivor. One `event_id`-keyed
    * window therefore produces the identical result while skipping a
    * shuffle+sort on the widest possible key (every data column) — the
    * dominant cost of the e2e pipeline at scale.
    *
    * Spark has no inherent row order, so "last" is defined by an explicit
    * `_ingest_order` column (added at scan time by [[graft.Pipeline]]); if
    * absent, one is synthesized with `monotonically_increasing_id()`, which
    * reproduces file order only for single-file / single-partition ingest
    * (SURVEY.md §1.5, §7.5). Implemented as a `row_number` window rather
    * than `dropDuplicates` because the latter keeps an arbitrary row.
    */
  def removeDuplicates(df: DataFrame): DataFrame = {
    val ord = EventSchema.ingestOrderCol
    val hadOrder = df.columns.contains(ord)
    val withOrd = if (hadOrder) df else df.withColumn(ord, monotonically_increasing_id())

    val keyW = Window.partitionBy(col("event_id")).orderBy(col(ord).desc)
    val out = withOrd
      .withColumn("_rn_key", row_number().over(keyW))
      .filter(col("_rn_key") === 1)
      .drop("_rn_key")

    if (hadOrder) out else out.drop(ord)
  }
}
