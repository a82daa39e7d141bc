package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{GraphOps, Network}

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

  /** The deterministic contact graph the triangle queries run on: nodes
    * are customers; each connects to custkey + {1, 2, 3, 5} (when that
    * customer exists), and ~1/16 of edges are deleted by an md5 coin —
    * a sparse banded graph whose triangles come from offset composition
    * (1+2=3, 2+3=5). Both engines build it from the same arithmetic.
    */
  private def contactEdges(s: SparkSession, d: String): DataFrame = {
    val c = table(s, d, "customer").select("c_custkey")
    val e0 = c
      .withColumn("off", explode(array(lit(1L), lit(2L), lit(3L), lit(5L))))
      .select(col("c_custkey").as("u"), (col("c_custkey") + col("off")).as("v"))
      .join(c.withColumnRenamed("c_custkey", "v"), Seq("v"))
      .where(substring(md5(concat(col("u").cast("string"), lit(":"),
        col("v").cast("string"), lit("graft:tri"))), 1, 1) =!= lit("0"))
      .select("u", "v")
    GraphOps.canonicalEdges(e0, "u", "v")
  }

  private val contactEdgesSql: String =
    """offs(off) AS (VALUES (1), (2), (3), (5)),
       e AS (SELECT DISTINCT a.c_custkey AS u, a.c_custkey + off AS v
             FROM customer a
             CROSS JOIN offs
             JOIN customer b ON b.c_custkey = a.c_custkey + off
             WHERE substr(md5(CAST(a.c_custkey AS VARCHAR) || ':' ||
                 CAST(a.c_custkey + off AS VARCHAR) || 'graft:tri'), 1, 1) <> '0'),
       deg AS (SELECT n, count(*) AS d
               FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
               GROUP BY 1),
       o AS (SELECT
               CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.u ELSE e.v END AS src,
               CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.v ELSE e.u END AS dst,
               CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN dv.d ELSE du.d END AS ddeg
             FROM e JOIN deg du ON e.u = du.n JOIN deg dv ON e.v = dv.n),
       tri AS (SELECT w.src, w.w1, w.w2 FROM
               (SELECT e1.src, e1.dst AS w1, e2.dst AS w2
                FROM o e1 JOIN o e2 ON e1.src = e2.src
                WHERE e1.ddeg < e2.ddeg
                   OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst)) w
               JOIN o ON o.src = w.w1 AND o.dst = w.w2)"""

  /** Global triangle census of the contact graph — degree-oriented wedge
    * closure ([[GraphOps.triangleStats]]): O(m^1.5) worst-case wedge
    * volume instead of the hub-explosive naive pivot, every step an
    * equi-join on vertex keys. The clustering coefficient is an exact
    * integer ratio (3·tri·10⁶ div wedges); the oracle replays the
    * orientation, wedge ordering, and closure joins verbatim.
    */
  val qTriangleCount = QueryDef(
    "q_triangle_count",
    (s, d) => GraphOps.triangleStats(contactEdges(s, d)),
    Some(s"""WITH $contactEdgesSql
            SELECT
              (SELECT count(*) FROM deg) AS n_nodes,
              (SELECT count(*) FROM e) AS n_edges,
              (SELECT CAST(COALESCE(sum((d * (d - 1)) // 2), 0) AS BIGINT)
               FROM deg) AS n_wedges,
              (SELECT count(*) FROM tri) AS n_triangles,
              (SELECT CASE WHEN w = 0 THEN 0 ELSE 3 * t * 1000000 // w END
               FROM (SELECT CAST(COALESCE(sum((d * (d - 1)) // 2), 0) AS BIGINT) AS w
                     FROM deg) a,
                    (SELECT count(*) AS t FROM tri) b) AS closure_q"""))

  /** Per-node triangle participation over the same graph — each closed
    * triangle credits all three corners ([[GraphOps.trianglesPerNode]]).
    */
  val qTriangleNodes = QueryDef(
    "q_triangle_nodes",
    (s, d) => GraphOps.trianglesPerNode(contactEdges(s, d)).orderBy("node"),
    Some(s"""WITH $contactEdgesSql
            SELECT node, count(*) AS n_tri FROM
              (SELECT src AS node FROM tri
               UNION ALL SELECT w1 AS node FROM tri
               UNION ALL SELECT w2 AS node FROM tri)
            GROUP BY node ORDER BY node"""))

  val all: Seq[QueryDef] = Seq(qRangeJoinBinned, qTriangleCount, qTriangleNodes)
}
