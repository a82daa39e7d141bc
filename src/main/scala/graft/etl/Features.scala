package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

import graft.schema.EventSchema

/** Feature-engineering stage (reference: src/feature_engineering.py:19-103):
  * ordinal severity score, per-user event frequency, per-user daily-average
  * baseline, and inactivity-gap sessionization.
  *
  * Scale notes (100 TB design):
  *  - the three per-user computations (count-over, session lag/cumsum)
  *    share ONE `Window.partitionBy("user_id")` partitioning, so Catalyst
  *    reuses a single hash-partition exchange for all of them;
  *  - the daily-baseline aggregate produces <= |users| rows, so its join
  *    back is broadcast-able (AQE converts it at runtime);
  *  - the hot `user_id = "unknown"` key created by the cleaning fill is a
  *    known skew risk — AQE skew-join handling covers the join; for the
  *    windows, salting by a hash of event_id within "unknown" would be the
  *    escalation path (documented, not needed at test scale).
  */
object Features {

  /** Ordinal severity encoding; unmapped severities stay NULL
    * (reference: src/feature_engineering.py:19-32). Chained `when` without
    * `otherwise` yields NULL, matching the pandas `.map` semantics.
    */
  def addSeverityScore(df: DataFrame): DataFrame = {
    if (!df.columns.contains("severity")) df
    else {
      val score = EventSchema.severityScores.toSeq.sortBy(_._2)
        .foldLeft(null: Column) { case (acc, (k, v)) =>
          if (acc == null) when(col("severity") === k, lit(v))
          else acc.when(col("severity") === k, lit(v))
        }
      df.withColumn("severity_score", score.cast(DoubleType))
    }
  }

  /** Per-user total event count, broadcast to every row of the group —
    * a window count, not a groupBy+join
    * (reference: src/feature_engineering.py:35-39).
    */
  def addUserEventFrequency(df: DataFrame): DataFrame = {
    if (!df.columns.contains("user_id")) df
    else df.withColumn("user_event_count_total",
      count(col("event_id")).over(Window.partitionBy("user_id")))
  }

  /** Average events per day per user: count per (user, day), then mean of
    * the daily counts per user, merged back with a left join
    * (reference: src/feature_engineering.py:42-59). The aggregate side is
    * tiny (one row per user) so the join broadcasts.
    */
  def addUserActivityBaseline(df: DataFrame): DataFrame = {
    val ok = df.columns.contains("timestamp") &&
      df.columns.contains("user_id") &&
      df.schema("timestamp").dataType == TimestampType
    if (!ok) df
    else {
      val perUser = df.select("user_id", "timestamp")
        .withColumn("date", date_trunc("DAY", col("timestamp")))
        .groupBy("user_id", "date").count()
        .groupBy("user_id")
        .agg(avg("count").cast(DoubleType).as("user_daily_avg_events"))
      df.join(perUser, Seq("user_id"), "left")
    }
  }

  /** Inactivity-gap sessionization (reference:
    * src/feature_engineering.py:61-95): a new session starts when the gap
    * since the user's previous event is strictly greater than
    * `gapMinutes` (first event per user = gap "infinity" = new session, so
    * `session_id` starts at 1). Adds per-row `session_id`,
    * `session_event_count`, `session_duration_seconds`.
    *
    * lag + running sum share the per-user window partitioning with
    * [[addUserEventFrequency]]; sub-second precision is kept by computing
    * gaps on `timestamp` cast to double seconds (pandas
    * `total_seconds()`). Ties on `timestamp` are broken by
    * `_ingest_order` when present — pandas' stable sort keeps ingest order
    * on ties, Spark's sort does not.
    */
  def addSessionFeatures(df: DataFrame, gapMinutes: Int = 30): DataFrame = {
    if (!df.columns.contains("timestamp")) df
    else {
      val ord = EventSchema.ingestOrderCol
      val orderCols: Seq[Column] =
        if (df.columns.contains(ord)) Seq(col("timestamp"), col(ord))
        else Seq(col("timestamp"))
      val w = Window.partitionBy("user_id").orderBy(orderCols: _*)
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

      val tsSec = col("timestamp").cast(DoubleType)
      val gap = tsSec - lag(tsSec, 1).over(w)
      val newSession = gap.isNull || gap > lit(gapMinutes * 60.0)

      val withSid = df.withColumn("session_id",
        sum(newSession.cast(LongType)).over(running))

      val stats = withSid.groupBy("user_id", "session_id").agg(
        count(col("event_id")).as("session_event_count"),
        min("timestamp").as("_session_start"),
        max("timestamp").as("_session_end"))
        .withColumn("session_duration_seconds",
          col("_session_end").cast(DoubleType) - col("_session_start").cast(DoubleType))
        .drop("_session_start", "_session_end")

      withSid.join(stats, Seq("user_id", "session_id"), "left")
    }
  }

  /** All feature stages in reference order
    * (reference: src/feature_engineering.py:98-103).
    */
  def runAll(df: DataFrame, gapMinutes: Int = 30): DataFrame =
    df.transform(addSeverityScore)
      .transform(addUserEventFrequency)
      .transform(addUserActivityBaseline)
      .transform(addSessionFeatures(_, gapMinutes))
}
