package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Network

/** Security-analytics operators over the events stream: shuffle-scale
  * interval joins (IP-allocation / geolocation enrichment when the range
  * side outgrows broadcast), beaconing detection, funnel conversion,
  * graph triangle counting, KMV set-intersection sketches, and
  * character-entropy scoring. Same determinism conventions as the other
  * query files: full ORDER BY over a unique key, exact integer arithmetic
  * wherever possible, and identical-operand IEEE divisions where not.
  */
object SecurityQueries {

  private def events(s: SparkSession, d: String): DataFrame =
    QueryDef.eventsTable(s, d)

  private def table(s: SparkSession, d: String, t: String): DataFrame =
    QueryDef.table(s, d, t)

  /** DuckDB replay of [[Network.ipFromKey]] (first 8 md5 hex chars of the
    * salted key as a 32-bit value).
    */
  private def ipSql(key: String, salt: String): String =
    s"CAST(('0x' || substr(md5(CAST($key AS VARCHAR) || '$salt'), 1, 8)) AS BIGINT)"

  /** Shuffle-scale point-in-interval join: derive one synthetic IPv4 per
    * event and one ~2^20-wide allocation range per customer (both
    * md5-deterministic — the testdata carries neither), then count the
    * events landing inside each range. The Spark side goes through
    * [[Network.binnedRangeJoin]] — intervals exploded to 2^20-wide bins,
    * a plain EQUI-join on the bin, `BETWEEN` as a post-filter — so the
    * plan is a hash/sort-merge join AQE can skew-split, never the
    * broadcast-nested-loop a bare range predicate degenerates to when
    * the range side outgrows the broadcast threshold. The oracle runs
    * the same semantics as a direct BETWEEN join (DuckDB's IEJoin),
    * proving the binned rewrite changes the plan shape, not the answer.
    */
  val qRangeJoinBinned = QueryDef(
    "q_range_join_binned",
    (s, d) => {
      val pts = events(s, d)
        .select(col("event_id"),
          Network.ipFromKey(col("event_id"), "graft:rj:pt").as("ip"))
      val ivs = table(s, d, "customer")
        .select(col("c_custkey"),
          Network.ipFromKey(col("c_custkey"), "graft:rj:lo").as("lo"))
        .withColumn("width",
          conv(substring(md5(concat(col("c_custkey").cast("string"),
            lit("graft:rj:w"))), 1, 5), 16, 10).cast("long"))
        .withColumn("hi", least(col("lo") + col("width"), lit(4294967295L)))
        .drop("width")
      Network.binnedRangeJoin(pts, "ip", ivs, "lo", "hi", binBits = 20)
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n_hits"),
          countDistinct(col("event_id")).as("n_events"),
          min(col("ip")).as("min_ip"))
        .orderBy("c_custkey")
    },
    Some(s"""WITH pts AS (SELECT event_id, ${ipSql("event_id", "graft:rj:pt")} AS ip
              FROM events),
            ivs AS (SELECT c_custkey,
                ${ipSql("c_custkey", "graft:rj:lo")} AS lo,
                CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'graft:rj:w'), 1, 5))
                     AS BIGINT) AS width
              FROM customer)
            SELECT c_custkey, count(*) AS n_hits,
              count(DISTINCT event_id) AS n_events, min(ip) AS min_ip
            FROM pts JOIN ivs
              ON ip BETWEEN lo AND LEAST(lo + width, 4294967295)
            GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(qRangeJoinBinned)
}
