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

  /** Average events per day per user
    * (reference: src/feature_engineering.py:42-59). The reference counts
    * per (user, day) then means those counts and merges back; the mean of
    * per-day counts is identically rows(user) / distinct_days(user), so
    * this computes both numbers as window aggregates over the SAME
    * per-user partitioning the other features already shuffle on — no
    * aggregate-side join, no recomputation of the upstream plan for a
    * build side. (`collect_set` holds at most the distinct days of one
    * user — bounded state.)
    */
  def addUserActivityBaseline(df: DataFrame): DataFrame = {
    val ok = df.columns.contains("timestamp") &&
      df.columns.contains("user_id") &&
      df.schema("timestamp").dataType == TimestampType
    if (!ok) df
    else {
      // count(timestamp), not count(*): pandas' groupby drops NaT days, so
      // the reference mean is over non-null-timestamp rows/days only. An
      // all-NULL user (reachable with dropInvalid=false) has 0 days — the
      // explicit NaN branch matches the reference's 0/0 = NaN AND keeps
      // ANSI mode (Spark 4 default) from throwing DIVIDE_BY_ZERO.
      val w = Window.partitionBy("user_id")
      val cnt = count(col("timestamp")).over(w).cast(DoubleType)
      val days = size(collect_set(date_trunc("DAY", col("timestamp"))).over(w))
      df.withColumn("user_daily_avg_events",
        when(days === 0, lit(Double.NaN))
          .otherwise(cnt / days.cast(DoubleType)))
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
      // Fail loudly on a non-timestamp column (the pandas reference raises
      // on .dt too): silently casting a StringType to double would NULL
      // every gap and make each row its own session.
      require(df.schema("timestamp").dataType == TimestampType,
        s"addSessionFeatures requires a TimestampType 'timestamp' column, " +
          s"got ${df.schema("timestamp").dataType.simpleString} — run " +
          "Normalization.standardizeTimestamps first")
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

      // Per-session stats as window aggregates over (user_id, session_id)
      // — the reference's groupBy+merge (src/feature_engineering.py:85-93)
      // would recompute the whole upstream plan for the aggregate side and
      // shuffle twice; one window partitioning yields identical values.
      val wSess = Window.partitionBy("user_id", "session_id")
      withSid
        .withColumn("session_event_count", count(col("event_id")).over(wSess))
        .withColumn("session_duration_seconds",
          max(col("timestamp").cast(DoubleType)).over(wSess) -
            min(col("timestamp").cast(DoubleType)).over(wSess))
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
