package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Cleaning, Features, Normalization, Validation}
import graft.schema.EventSchema

/** Mirrors the reference CLI knobs (reference: src/pipeline.py:18,72-108). */
case class PipelineConfig(
    input: String,
    output: String,
    sessionGapMinutes: Int = 30,
    summary: Boolean = false,
    validateMode: String = "warn",
    dropUnknownSeverity: Boolean = false,
    /** Emit rows sorted by (user_id, timestamp) like the reference's file
      * output. Callers that re-sort downstream can disable the extra
      * global exchange.
      */
    sortOutput: Boolean = true,
    /** Write one CSV file (the reference's contract). Disable at
      * distributed output sizes — coalesce(1) funnels the write through a
      * single task.
      */
    singleFileOutput: Boolean = true)

/** End-to-end batch pipeline (reference: src/pipeline.py:18-69): CSV scan ->
  * required-column validation -> missing-value handling -> dedup ->
  * timestamp standardization -> categorical normalization -> [optional
  * severity filter] -> feature engineering -> [optional validation] -> CSV
  * sink -> [optional summary].
  *
  * The stage ORDER is a semantic contract (SURVEY.md §3): fill-before-dedup
  * means a row differing only by a NULL later filled to "unknown" becomes a
  * duplicate; dedup-before-parse means keep-"last" is ingest order; the
  * severity filter runs before features so dropped rows don't count toward
  * user totals or sessions.
  *
  * Unlike the reference's eager stage-at-a-time execution, the whole
  * pipeline here is ONE lazy Catalyst plan: a single action (the write)
  * triggers it, filters are pushed to the scan, and all per-user analytics
  * share one hash-partition exchange.
  */
object Pipeline {

  /** Read the raw CSV and attach `_ingest_order` so the order-dependent
    * keep-last dedup and stable sort are well-defined in a distributed
    * setting. `monotonically_increasing_id` is (partitionIndex << 33 | row)
    * and therefore follows file order when each file maps to one split; for
    * strict golden parity use single-file input (SURVEY.md §7.5(1)). At
    * 100 TB, ingest order should instead come from an explicit column in
    * the source data.
    */
  def readRaw(spark: SparkSession, input: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(input)
      .withColumn(EventSchema.ingestOrderCol, monotonically_increasing_id())

  /** The full transform chain, CSV-agnostic (testable on any DataFrame that
    * has the required columns plus `_ingest_order`).
    */
  def transform(df: DataFrame, config: PipelineConfig): DataFrame = {
    val cleaned = df
      .transform(Cleaning.validateRequiredColumns(_))
      .transform(Cleaning.handleMissingValues)
      .transform(Cleaning.removeDuplicates)
      .transform(Normalization.standardizeTimestamps(_))
      .transform(Normalization.normalizeCategoricals)

    val filtered =
      if (config.dropUnknownSeverity) cleaned.filter(col("severity") =!= "unknown")
      else cleaned

    val featured = Features.runAll(filtered, config.sessionGapMinutes)

    // Final output order is the sessionization sort, with ingest order as
    // the stable tiebreak when present (reference:
    // src/feature_engineering.py:72 and the golden file's (user_id,
    // timestamp) order — SURVEY.md §1.5). Inputs built without readRaw
    // may lack _ingest_order; sort on what exists rather than crash.
    val sortCols = Seq(col("user_id"), col("timestamp")) ++
      (if (featured.columns.contains(EventSchema.ingestOrderCol))
        Seq(col(EventSchema.ingestOrderCol)) else Nil)
    val ordered = (if (config.sortOutput) featured.orderBy(sortCols: _*)
      else featured).drop(EventSchema.ingestOrderCol)

    // Reference column order: input columns, then features in the order
    // they were engineered (golden header, data/processed_events.csv:1).
    val inputCols = df.columns.filterNot(_ == EventSchema.ingestOrderCol)
      .filter(ordered.columns.contains)
    val featCols = EventSchema.featureColumns.filter(ordered.columns.contains)
    ordered.select((inputCols ++ featCols).map(col).toSeq: _*)
  }

  def run(spark: SparkSession, config: PipelineConfig): Unit = {
    println(s"[Pipeline] Reading: ${config.input}")
    val raw = readRaw(spark, config.input)

    val processed = transform(raw, config).cache()
    try {
      if (config.validateMode.toLowerCase != "off") {
        println("[Pipeline] Validating schema…")
        Validation.check(processed, config.validateMode)
      }

      println(s"[Pipeline] Writing processed output: ${config.output}")
      // single-file output mirrors the reference's one-CSV contract;
      // disable for distributed-size outputs (one task writes otherwise)
      val out = if (config.singleFileOutput) processed.coalesce(1) else processed
      out.write
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ssxxx")
        .mode("overwrite")
        .csv(config.output)

      if (config.summary) Summary.report(processed)
    } finally processed.unpersist()
    println("[Pipeline] Done.")
  }
}

/** Post-run summary report (reference: src/pipeline.py:53-67): row/column
  * counts, time range, distinct users/event types, per-column null counts
  * (top 8), and top-5 value counts for the categorical signals.
  */
object Summary {

  def report(df: DataFrame): Unit = {
    val n = df.count()
    val Array(tmin, tmax) = df
      .agg(min(col("timestamp")), max(col("timestamp")))
      .collect()(0).toSeq.toArray
    val Array(users, etypes) = df
      .agg(countDistinct(col("user_id")), countDistinct(col("event_type")))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    println(
      s"""[Pipeline] Summary:
         |  rows: $n
         |  columns: ${df.columns.length}
         |  time range: $tmin -> $tmax
         |  users: $users | event_types: $etypes""".stripMargin)

    // Per-column null counts in one job, sorted desc, top 8.
    val nullCounts = df.select(df.columns.map(c =>
      sum(col(c).isNull.cast("long")).as(c)).toSeq: _*).collect()(0)
    val nonZero = df.columns.map(c => c -> nullCounts.getAs[Long](c))
      .filter(_._2 > 0).sortBy(-_._2).take(8)
    if (nonZero.nonEmpty)
      println("[Null counts]\n" + nonZero.map { case (c, v) => s"$c $v" }.mkString("\n"))

    Seq("event_type", "status", "severity").filter(df.columns.contains).foreach { c =>
      val top = df.groupBy(col(c)).count()
        .orderBy(col("count").desc, col(c)).limit(5).collect()
      println(s"\n[Top $c]\n" + top.map(r => s"${r.get(0)} ${r.getLong(1)}").mkString("\n"))
    }
  }
}
