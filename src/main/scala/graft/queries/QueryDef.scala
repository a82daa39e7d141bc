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
  *  - event timestamps (nanosecond parquet) are surfaced as epoch-second
  *    BIGINT or DATE, never raw timestamps, because Spark keeps full ns
  *    (LongType via nanosAsLong) while DuckDB's parquet reader truncates
  *    ns→µs — ordering/keys must use `ts div 1000` (µs) or coarser so both
  *    engines see the same granularity.
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
    * The testdata's ts is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects as a timestamp; it is read as LongType nanos
    * (`spark.sql.legacy.parquet.nanosAsLong=true`, set by Verify/Bench).
    * ONE shared normalizer — event-time semantics must not diverge
    * between query files.
    */
  def eventsTable(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn(
        "ts", org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")) * 1000)
    }
  }
}
