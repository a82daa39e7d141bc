package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle the driver checks
  * it against. Column names MUST match between the two — the driver's
  * compare sorts columns by name before hashing values.
  *
  * Determinism conventions (SURVEY.md §5.2.2):
  *  - every query ends in a full ORDER BY over a unique key, identical in
  *    both dialects;
  *  - floating-point aggregates are `round(…, n)`-ed on both sides to
  *    absorb summation-order differences;
  *  - event timestamps are surfaced as epoch-second BIGINT or DATE, never
  *    raw timestamps. The current testdata carries µs-precision TIMESTAMP,
  *    so both engines see the same instants; `eventsTable` normalizes `ts`
  *    to epoch-NANOSECOND longs for query-side arithmetic. Ordering/keys
  *    still use `ts div 1000` (µs) or coarser: µs is the finest granularity
  *    both engines share across all historical testdata encodings, and real
  *    µs-level ties exist in the data, so every ordering also tiebreaks on a
  *    unique key.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Read one testdata table. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table with `ts` normalized to epoch-NANOSECOND longs.
    * ONE shared normalizer — event-time semantics must not diverge
    * between query files (batch and streaming both go through here).
    *
    * The driver has shipped three `ts` encodings across rounds, and this
    * adapter accepts all of them:
    *  - parquet TIMESTAMP(NANOS), read as LongType epoch-nanos
    *    (`spark.sql.legacy.parquet.nanosAsLong=true`, set by Verify/Bench);
    *  - µs TIMESTAMP_NTZ (current testdata, pyarrow `timestamp[us]` with no
    *    tz): `unix_micros` rejects NTZ at analysis, so cast to TIMESTAMP
    *    first — the session tz is pinned UTC everywhere (Verify/Bench/
    *    SparkSpec), making the NTZ→TZ cast value-preserving;
    *  - µs TIMESTAMP (tz-adjusted): `unix_micros` directly.
    */
  def eventsTable(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw // already epoch-nanos
      case TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case TimestampNTZType =>
        raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(
          s"events.parquet ts has unsupported type $other; " +
            "extend QueryDef.eventsTable for the new testdata encoding")
    }
  }
}
