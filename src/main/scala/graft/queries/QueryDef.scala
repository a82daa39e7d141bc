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
  *    BIGINT or DATE, never raw timestamps, because Spark truncates ns→µs
  *    on read while DuckDB keeps ns.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Read one testdata table. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
