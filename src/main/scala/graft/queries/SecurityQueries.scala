package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Anomaly, Funnel}
import graft.ext.{FuzzyJoin, GraphOps, Network, Privacy, Sketches}
import graft.functions.{CharEntropyFunctions, CharEntropyImpl}

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
  /** Epoch day of the ns-timestamp (integer division — ts nanos exceed
    * 2^53, so a double division would lose precision).
    */
  private val tsEpochDay: Column = expr("ts div 86400000000000")

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

  /** Shared oracle CTEs for the KMV queries: distinct 48-bit user hashes
    * per event type and the rank-limited sketch (k = 64).
    */
  private val kmvCtes: String =
    """uh AS (SELECT DISTINCT event_type AS g,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'graft:kmv'), 1, 12))
              AS BIGINT) AS h
       FROM events WHERE user_id IS NOT NULL),
       sk AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
              FROM uh QUALIFY rn <= 64)"""

  /** KMV distinct-count estimation per event type, next to the exact
    * count it approximates. The sketch is the k smallest distinct user
    * hashes per type ([[Sketches.kmvSketch]], WindowGroupLimit-pushed),
    * the estimator exact integer division — the whole pipeline is
    * deterministic, so unlike HLL the gate hash-checks it end to end.
    */
  val qKmvDistinct = QueryDef(
    "q_kmv_distinct",
    (s, d) => {
      val ev = events(s, d)
      val est = Sketches.kmvDistinct(
        Sketches.kmvSketch(ev, "event_type", col("user_id"), 64), 64)
      val exact = ev.where(col("user_id").isNotNull)
        .groupBy(col("event_type").as("g"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      est.join(exact, Seq("g")).orderBy("g")
    },
    Some(s"""WITH $kmvCtes,
            a AS (SELECT g, count(*) AS n_sk,
                    max(CASE WHEN rn = 64 THEN h END) AS kth
                  FROM sk GROUP BY g),
            x AS (SELECT event_type AS g, count(DISTINCT user_id) AS n_exact
                  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
            SELECT a.g, n_sk,
              CASE WHEN n_sk < 64 THEN n_sk
                   ELSE 17732923532771328 // kth END AS est,
              n_exact
            FROM a JOIN x ON a.g = x.g ORDER BY a.g"""))

  /** Pairwise audience overlap between event types from the same KMV
    * sketches ([[Sketches.kmvPairStats]]): union/intersection estimates
    * and a 10⁶-scaled Jaccard, with the exact values alongside. The
    * estimate path never touches raw keys — only ≤ k sketch rows per
    * group join — which is the point at 100 TB: cohort-overlap matrices
    * from sketches, not from a (cohort, user) distinct re-shuffle.
    */
  val qKmvJaccard = QueryDef(
    "q_kmv_jaccard",
    (s, d) => {
      val ev = events(s, d)
      val est = Sketches.kmvPairStats(
        Sketches.kmvSketch(ev, "event_type", col("user_id"), 64), 64)
      val ud = ev.where(col("user_id").isNotNull)
        .select(col("event_type").as("g"), col("user_id").as("u")).distinct()
        .localCheckpoint(true)
      val singles = ud.groupBy("g").agg(count(lit(1)).as("n"))
      val inter = ud.as("a").join(ud.as("b"),
          col("a.u") === col("b.u") && col("a.g") < col("b.g"))
        .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
        .agg(count(lit(1)).as("n_inter"))
      est
        .join(singles.select(col("g").as("g1"), col("n").as("n1")), Seq("g1"))
        .join(singles.select(col("g").as("g2"), col("n").as("n2")), Seq("g2"))
        .join(inter, Seq("g1", "g2"), "left")
        .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
        .withColumn("n_union", col("n1") + col("n2") - col("n_inter"))
        .withColumn("exact_jaccard_q", expr("(1000000 * n_inter) div n_union"))
        .select("g1", "g2", "k_eff", "m", "union_est", "jaccard_q",
          "inter_est", "n_inter", "n_union", "exact_jaccard_q")
        .orderBy("g1", "g2")
    },
    Some(s"""WITH $kmvCtes,
            p AS (SELECT a.g AS g1, b.g AS g2
                  FROM (SELECT DISTINCT g FROM sk) a, (SELECT DISTINCT g FROM sk) b
                  WHERE a.g < b.g),
            uni AS (SELECT DISTINCT g1, g2, h FROM (
                      SELECT p.g1, p.g2, sk.h FROM p JOIN sk ON sk.g = p.g1
                      UNION ALL
                      SELECT p.g1, p.g2, sk.h FROM p JOIN sk ON sk.g = p.g2)),
            rk AS (SELECT g1, g2, h,
                     row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn
                   FROM uni QUALIFY rn <= 64),
            agg AS (SELECT rk.g1, rk.g2, count(*) AS k_eff,
                      max(CASE WHEN rk.rn = 64 THEN rk.h END) AS kth,
                      sum(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                               THEN 1 ELSE 0 END) AS m
                    FROM rk
                    LEFT JOIN sk sa ON sa.g = rk.g1 AND sa.h = rk.h
                    LEFT JOIN sk sb ON sb.g = rk.g2 AND sb.h = rk.h
                    GROUP BY rk.g1, rk.g2),
            est AS (SELECT g1, g2, k_eff, CAST(m AS BIGINT) AS m,
                      CASE WHEN k_eff < 64 THEN k_eff
                           ELSE 17732923532771328 // kth END AS union_est,
                      (1000000 * CAST(m AS BIGINT)) // k_eff AS jaccard_q
                    FROM agg),
            ud AS (SELECT DISTINCT event_type AS g, user_id AS u
                   FROM events WHERE user_id IS NOT NULL),
            sgl AS (SELECT g, count(*) AS n FROM ud GROUP BY g),
            ix AS (SELECT a.g AS g1, b.g AS g2, count(*) AS n_inter
                   FROM ud a JOIN ud b ON a.u = b.u AND a.g < b.g
                   GROUP BY 1, 2)
            SELECT est.g1, est.g2, k_eff, m, union_est, jaccard_q,
              (jaccard_q * union_est) // 1000000 AS inter_est,
              COALESCE(ix.n_inter, 0) AS n_inter,
              s1.n + s2.n - COALESCE(ix.n_inter, 0) AS n_union,
              (1000000 * COALESCE(ix.n_inter, 0)) //
                (s1.n + s2.n - COALESCE(ix.n_inter, 0)) AS exact_jaccard_q
            FROM est
            JOIN sgl s1 ON s1.g = est.g1
            JOIN sgl s2 ON s2.g = est.g2
            LEFT JOIN ix ON ix.g1 = est.g1 AND ix.g2 = est.g2
            ORDER BY est.g1, est.g2"""))

  /** Beaconing detection over (user, event_type) inter-arrival gaps —
    * [[Anomaly.beaconScores]]: CV of gap times from order-independent
    * exact moments (Σg BIGINT, Σg² DECIMAL/HUGEINT), each sum cast to
    * double exactly once so the whole statistic is bit-identical across
    * engines and partitionings. Random testdata mostly reads as bursty
    * (high CV) — the SPEC proves a planted timer fires the flag; this
    * gate proves the moment arithmetic.
    */
  val qBeaconing = QueryDef(
    "q_beaconing",
    (s, d) => Anomaly.beaconScores(
        events(s, d).where(col("user_id").isNotNull)
          .withColumn("ts_us", expr("ts div 1000")),
        "user_id", "event_type", "ts_us", "event_id", minGaps = 5)
      .orderBy("user_id", "event_type"),
    Some("""WITH g AS (SELECT user_id, event_type,
              epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id, event_type
                ORDER BY epoch_us(ts), event_id) AS gap
            FROM events WHERE user_id IS NOT NULL),
            a AS (SELECT user_id, event_type, count(*) AS n_gaps,
                    CAST(sum(gap) AS BIGINT) AS gsum,
                    sum(CAST(gap AS HUGEINT) * gap) AS gsumsq
                  FROM g WHERE gap IS NOT NULL
                  GROUP BY 1, 2 HAVING count(*) >= 5),
            b AS (SELECT user_id, event_type, n_gaps, gsum,
                    CAST(gsum AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap,
                    CASE WHEN gsum > 0 THEN CAST(floor(
                      sqrt(GREATEST(
                        CAST(gsumsq AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                        - (CAST(gsum AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                          * (CAST(gsum AS DOUBLE) / CAST(n_gaps AS DOUBLE)),
                        0.0))
                      / (CAST(gsum AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                      * 1000000.0) AS BIGINT) END AS cv_q
                  FROM a)
            SELECT user_id, event_type, n_gaps, gsum, mean_gap, cv_q,
              COALESCE(cv_q < 300000, false) AS is_beacon
            FROM b ORDER BY user_id, event_type"""))

  /** Three-step funnel (signup → click → purchase within 14 days of the
    * first signup) — [[Funnel.conversion]]: one filtered min-aggregate
    * per step joined on the entity key, never a window over the raw
    * stream. Ties do not advance the funnel (strict >).
    */
  val qFunnel = QueryDef(
    "q_funnel_steps",
    (s, d) => Funnel.conversion(
      events(s, d).withColumn("ts_us", expr("ts div 1000")),
      "user_id", "event_type", "ts_us",
      Seq("signup", "click", "purchase"), withinUs = 1209600000000L),
    Some("""WITH e AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS tu
              FROM events WHERE user_id IS NOT NULL),
            s1 AS (SELECT u, min(tu) AS t1 FROM e WHERE t = 'signup' GROUP BY 1),
            s2 AS (SELECT e.u, s1.t1, min(tu) AS t2
                   FROM e JOIN s1 ON e.u = s1.u
                   WHERE t = 'click' AND tu > t1 AND tu <= t1 + 1209600000000
                   GROUP BY 1, 2),
            s3 AS (SELECT e.u, min(tu) AS t3
                   FROM e JOIN s2 ON e.u = s2.u
                   WHERE t = 'purchase' AND tu > t2 AND tu <= t1 + 1209600000000
                   GROUP BY 1),
            n AS (SELECT (SELECT count(*) FROM s1) AS n1,
                         (SELECT count(*) FROM s2) AS n2,
                         (SELECT count(*) FROM s3) AS n3)
            SELECT * FROM (
              SELECT 1 AS step_idx, 'signup' AS step, n1 AS n_entities,
                CASE WHEN n1 = 0 THEN 0 ELSE 1000000 END AS conv_q FROM n
              UNION ALL
              SELECT 2, 'click', n2,
                CASE WHEN n1 = 0 THEN 0 ELSE (1000000 * n2) // n1 END FROM n
              UNION ALL
              SELECT 3, 'purchase', n3,
                CASE WHEN n1 = 0 THEN 0 ELSE (1000000 * n3) // n1 END FROM n)
            ORDER BY step_idx"""))

  /** Fixed-point character-class entropy of each document's first 256
    * code points — the DGA/gibberish detector as a native codegen'd
    * expression ([[graft.functions.CharEntropyQ]]): one pass per row,
    * zero shuffles, integer math against a frozen log2 table. The
    * oracle unnests characters and replays the same integer formula
    * against the identical table embedded as VALUES — no transcendental
    * is evaluated twice.
    */
  val qCharEntropy = QueryDef(
    "q_char_entropy",
    (s, d) => table(s, d, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        least(length(col("text")), lit(256)).cast("long").as("n_chars"),
        CharEntropyFunctions.char_entropy_q(col("text"), 256).as("ent_q"))
      .orderBy("doc_id"),
    Some(s"""WITH lq(k, l) AS (VALUES ${CharEntropyImpl.log2qSqlValues(256)}),
            ch AS (SELECT doc_id, unnest(string_split(substr(text, 1, 256), '')) AS c
                   FROM documents WHERE text IS NOT NULL AND length(text) > 0),
            cls AS (SELECT doc_id,
                      CASE WHEN ascii(c) BETWEEN 97 AND 122 THEN ascii(c) - 97
                           WHEN ascii(c) BETWEEN 65 AND 90 THEN ascii(c) - 65
                           WHEN ascii(c) BETWEEN 48 AND 57 THEN 26
                           ELSE 27 END AS cl
                    FROM ch),
            cnt AS (SELECT doc_id, cl, count(*) AS c FROM cls GROUP BY 1, 2),
            agg AS (SELECT cnt.doc_id, CAST(sum(cnt.c) AS BIGINT) AS n,
                      CAST(sum(cnt.c * lc.l) AS BIGINT) AS s
                    FROM cnt JOIN lq lc ON lc.k = cnt.c
                    GROUP BY 1)
            SELECT d.doc_id,
              CAST(COALESCE(a.n, 0) AS BIGINT) AS n_chars,
              CAST(CASE WHEN a.n IS NULL THEN 0
                   ELSE (a.n * ln.l - a.s) // a.n END AS BIGINT) AS ent_q
            FROM documents d
            LEFT JOIN agg a ON a.doc_id = d.doc_id
            LEFT JOIN lq ln ON ln.k = a.n
            WHERE d.text IS NOT NULL
            ORDER BY d.doc_id"""))

  /** The k-core oracle's peeling rounds, unrolled as MATERIALIZED CTEs
    * (e0 = the contact graph; each round: degrees → kept nodes → filtered
    * edges). Fixed unroll depth is the operator's contract.
    */
  private def kcoreUnrollSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""d$r AS MATERIALIZED (SELECT n, count(*) AS deg FROM
           (SELECT u AS n FROM e${r - 1} UNION ALL SELECT v AS n FROM e${r - 1})
           GROUP BY 1),
         n$r AS MATERIALIZED (SELECT n FROM d$r WHERE deg >= $k),
         e$r AS MATERIALIZED (SELECT u, v FROM e${r - 1}
           WHERE u IN (SELECT n FROM n$r) AND v IN (SELECT n FROM n$r))"""
    }
    (s"e0 AS MATERIALIZED (SELECT u, v FROM e)" +: steps).mkString(",\n")
  }

  /** The connected-components oracle's rounds, unrolled: per round a
    * neighbor-min CTE and a least(self, neighbor-min, label-of-label)
    * CTE — the pointer jump replayed relationally.
    */
  private def ccUnrollSql(rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""m$r AS MATERIALIZED (SELECT bi.a AS n, min(l.lbl) AS nm
            FROM bi JOIN l${r - 1} l ON l.n = bi.b GROUP BY 1),
         l$r AS MATERIALIZED (SELECT l.n,
            LEAST(l.lbl, COALESCE(m.nm, l.lbl), COALESCE(ll.lbl, l.lbl)) AS lbl
            FROM l${r - 1} l
            LEFT JOIN m$r m ON m.n = l.n
            LEFT JOIN l${r - 1} ll ON ll.n = l.lbl)"""
    }
    ("""bi AS MATERIALIZED (SELECT u AS a, v AS b FROM e
          UNION ALL SELECT v AS a, u AS b FROM e),
        l0 AS MATERIALIZED (SELECT n, n AS lbl FROM
          (SELECT DISTINCT a AS n FROM bi))""" +: steps).mkString(",\n")
  }

  /** Connected components of the contact graph via min-label propagation
    * with pointer jumping ([[GraphOps.connectedComponents]], 16 fixed
    * rounds — influence doubles per round, so the band graph's ~3000-hop
    * diameter converges with room to spare where naive propagation would
    * need 3000 shuffles). Output: component sizes.
    */
  val qGraphComponents = QueryDef(
    "q_graph_components",
    (s, d) => GraphOps.connectedComponents(contactEdges(s, d), rounds = 16)
      .groupBy(col("comp")).agg(count(lit(1)).as("n_nodes"))
      .orderBy("comp"),
    Some(s"""WITH $contactEdgesSql,
            ${ccUnrollSql(16)}
            SELECT lbl AS comp, count(*) AS n_nodes
            FROM l16 GROUP BY 1 ORDER BY comp"""))

  /** 6-core extraction on the contact graph by 6 fixed peeling rounds
    * ([[GraphOps.kCore]]) — the dense-cluster (botnet/community) motif.
    * Fixed rounds keep the oracle's unroll depth a contract rather than
    * data-dependent; at convergence the result is the exact k-core.
    */
  val qKcore = QueryDef(
    "q_kcore",
    (s, d) => GraphOps.kCore(contactEdges(s, d), k = 6, rounds = 6)
      .orderBy("node"),
    Some(s"""WITH $contactEdgesSql,
            ${kcoreUnrollSql(6, 6)}
            SELECT n AS node, count(*) AS deg FROM
              (SELECT u AS n FROM e6 UNION ALL SELECT v AS n FROM e6)
            GROUP BY 1 HAVING count(*) >= 6 ORDER BY node"""))

  /** Markov sequence-surprise per user ([[Anomaly.markovPathScores]]):
    * negative log-likelihood of each user's event-type path under the
    * population's first-order transition model. Integer step scores
    * (floor(ln(p)·10⁶)) make the per-user sum order-independent; the
    * |types|² model broadcasts.
    */
  val qPathSurprise = QueryDef(
    "q_path_surprise",
    (s, d) => Anomaly.markovPathScores(
        events(s, d).where(col("user_id").isNotNull)
          .withColumn("ts_us", expr("ts div 1000")),
        "user_id", "event_type", "ts_us", "event_id")
      .orderBy("user_id"),
    Some("""WITH st AS (SELECT user_id AS e, event_type AS a,
              lead(event_type) OVER (PARTITION BY user_id
                ORDER BY epoch_us(ts), event_id) AS b
            FROM events WHERE user_id IS NOT NULL),
            s2 AS (SELECT e, a, b FROM st WHERE b IS NOT NULL),
            tr AS (SELECT a, b, count(*) AS n_ab FROM s2 GROUP BY 1, 2),
            tt AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM tr GROUP BY 1),
            sc AS (SELECT e, CAST(floor(
                     ln(CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE))
                     * 1000000.0) AS BIGINT) AS c
                   FROM s2 JOIN tr USING (a, b) JOIN tt USING (a))
            SELECT e AS user_id, count(*) AS n_steps,
              CAST(-sum(c) AS BIGINT) AS surprise_q,
              CAST(-sum(c) AS BIGINT) // count(*) AS avg_surprise_q
            FROM sc GROUP BY 1 ORDER BY user_id"""))

  /** Blocked fuzzy matching ([[FuzzyJoin.blockedEditJoin]]): every part
    * name gets a unique '#key' tail, probes are the same names with one
    * md5-chosen character deleted (never in the last three — the suffix
    * blocker's contract), and matching runs as a suffix-3 equi-join plus
    * exact Levenshtein verify within the block — entity resolution with
    * one shuffle, no cartesian. Each probe must re-find its source at
    * distance 1 (`self_hit`); extra matches are true near-collisions.
    */
  val qFuzzyMatch = QueryDef(
    "q_fuzzy_match",
    (s, d) => {
      val cat = table(s, d, "part")
        .select(col("p_partkey"),
          concat(col("p_name"), lit("#"),
            col("p_partkey").cast("string")).as("name"))
      val probes = cat
        .withColumn("pos", (lit(2L) +
          conv(substring(md5(concat(col("p_partkey").cast("string"),
            lit("graft:fz"))), 1, 4), 16, 10).cast("long")
            % (length(col("name")).cast("long") - lit(4L))).cast("int"))
        .select(col("p_partkey").as("probe_key"),
          expr("concat(substring(name, 1, pos - 1), substring(name, pos + 1))")
            .as("probe_name"))
      FuzzyJoin.blockedEditJoin(probes, "probe_name", cat, "name",
          maxDist = 2, blocker = FuzzyJoin.suffixBlocker(3))
        .groupBy("probe_key")
        .agg(count(lit(1)).as("n_matches"),
          min(col("dist")).as("best_dist"),
          max(when(col("p_partkey") === col("probe_key"), 1L).otherwise(0L))
            .as("self_hit"))
        .orderBy("probe_key")
    },
    Some("""WITH cat AS (SELECT p_partkey,
              p_name || '#' || CAST(p_partkey AS VARCHAR) AS name FROM part),
            pr AS (SELECT p_partkey AS probe_key, name,
              2 + CAST(('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || 'graft:fz'), 1, 4))
                  AS BIGINT) % (length(name) - 4) AS pos
              FROM cat),
            pb AS (SELECT probe_key,
              substr(name, 1, CAST(pos AS INT) - 1) || substr(name, CAST(pos AS INT) + 1)
                AS probe_name
              FROM pr),
            j AS (SELECT pb.probe_key, cat.p_partkey,
                    levenshtein(pb.probe_name, cat.name) AS dist
                  FROM pb JOIN cat
                    ON lower(substr(pb.probe_name, -3, 3)) = lower(substr(cat.name, -3, 3))
                  WHERE abs(length(pb.probe_name) - length(cat.name)) <= 2)
            SELECT probe_key, count(*) AS n_matches,
              CAST(min(dist) AS INT) AS best_dist,
              CAST(max(CASE WHEN p_partkey = probe_key THEN 1 ELSE 0 END) AS BIGINT)
                AS self_hit
            FROM j WHERE dist <= 2 GROUP BY 1 ORDER BY 1"""))

  /** Trailing-7-day distinct users per day from MERGED daily KMV
    * sketches ([[Sketches.kmvWindowDistinct]]) next to the exact
    * recount: the mergeability payoff — daily sketches build once, any
    * window re-ranks ≤ k rows per contributing day, the raw keys never
    * re-shuffle. Exact twin recounts distinct (day, user) pairs fanned
    * to their windows.
    */
  val qKmvWindow = QueryDef(
    "q_kmv_window",
    (s, d) => {
      val ev = events(s, d)
      val est = Sketches.kmvWindowDistinct(
        Sketches.kmvSketch(
          ev.withColumn("day", tsEpochDay), "day", col("user_id"), 64),
        64, windowPeriods = 7)
      val ud = ev.where(col("user_id").isNotNull)
        .select(tsEpochDay.as("day"), col("user_id").as("u")).distinct()
        .localCheckpoint(true)
      val ends = ud.select("day").distinct()
      val exact = ud
        .withColumn("_end", explode(sequence(col("day"), col("day") + lit(6L))))
        .join(ends.withColumnRenamed("day", "_end"), Seq("_end"))
        .groupBy(col("_end").as("g"))
        .agg(countDistinct(col("u")).as("n_exact"))
      est.join(exact, Seq("g")).orderBy("g")
    },
    Some("""WITH uh AS (SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS g,
              CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'graft:kmv'), 1, 12))
                   AS BIGINT) AS h
            FROM events WHERE user_id IS NOT NULL),
            sk AS (SELECT g, h FROM (
              SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
              FROM uh) WHERE rn <= 64),
            ends AS (SELECT DISTINCT g FROM sk),
            co AS (SELECT DISTINCT e.g, sk.h
                   FROM sk JOIN ends e ON e.g BETWEEN sk.g AND sk.g + 6),
            rk AS (SELECT g, h,
                     row_number() OVER (PARTITION BY g ORDER BY h) AS rn
                   FROM co QUALIFY rn <= 64),
            a AS (SELECT g, count(*) AS n_sk,
                    max(CASE WHEN rn = 64 THEN h END) AS kth
                  FROM rk GROUP BY 1),
            ud AS (SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS g,
                     user_id AS u
                   FROM events WHERE user_id IS NOT NULL),
            xc AS (SELECT e.g, count(DISTINCT ud.u) AS n_exact
                   FROM ud JOIN ends e ON e.g BETWEEN ud.g AND ud.g + 6
                   GROUP BY 1)
            SELECT a.g, n_sk,
              CASE WHEN n_sk < 64 THEN n_sk
                   ELSE 17732923532771328 // kth END AS est,
              n_exact
            FROM a JOIN xc ON a.g = xc.g ORDER BY a.g"""))

  /** Theil–Sen robust trend of daily event volume per type
    * ([[Anomaly.theilSenSlopes]]): the lower-median pairwise slope —
    * one outlier day cannot drag it the way it drags least squares.
    * Slopes are identical-operand double divisions (bit-exact cross-
    * engine); the O(n²) pair stage is guarded by the operator's
    * maxPoints fail-fast (n ≈ 30 days here).
    */
  val qTrendSlope = QueryDef(
    "q_trend_slope",
    (s, d) => Anomaly.theilSenSlopes(
        events(s, d).groupBy(col("event_type"), tsEpochDay.as("day"))
          .agg(count(lit(1)).as("c")),
        "event_type", "day", "c")
      .orderBy("event_type"),
    Some("""WITH dc AS (SELECT event_type AS g,
              epoch_ns(ts) // 86400000000000 AS x, count(*) AS y
            FROM events GROUP BY 1, 2),
            sl AS (SELECT l.g,
                     CAST(r.y - l.y AS DOUBLE) / CAST(r.x - l.x AS DOUBLE) AS slope
                   FROM dc l JOIN dc r ON l.g = r.g AND l.x < r.x),
            rk AS (SELECT g, slope,
                     row_number() OVER (PARTITION BY g ORDER BY slope) AS rn,
                     count(*) OVER (PARTITION BY g) AS m
                   FROM sl)
            SELECT g AS event_type, m AS n_pairs, slope
            FROM rk WHERE rn = (m + 1) // 2 ORDER BY event_type"""))

  /** The IOC watchlist of q_ioc_match: border-free corpus-vocabulary
    * literals (no term has a proper prefix equal to a suffix, and the
    * space-separated corpus admits no cross-word junctions), so DuckDB's
    * greedy replace-count equals the automaton's all-occurrence count.
    */
  private val iocTerms: Seq[String] = Seq("table", "spark", "value",
    "query", "batch", "customer", "order", "column", "join", "data",
    "scan", "fast")

  /** Watchlist (IOC) matching with the native Aho–Corasick expression
    * ([[graft.functions.MultiMatchCount]]): every document scanned ONCE
    * against the whole watchlist — O(len + matches) per row however
    * many thousands of literals the feed carries, where the regex-
    * alternation blocklist grows with the feed. Zero shuffles; the
    * oracle replays each term's occurrence count via replace-length
    * arithmetic (exact for the border-free watchlist above).
    */
  val qIocMatch = QueryDef(
    "q_ioc_match",
    (s, d) => table(s, d, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.MultiMatchFunctions
          .multi_match_count(col("text"), iocTerms).as("n_matches"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
              CAST(${iocTerms.map(t =>
                s"(length(text) - length(replace(text, '$t', ''))) // ${t.length}")
                .mkString(" + ")} AS BIGINT) AS n_matches
            FROM documents WHERE text IS NOT NULL ORDER BY doc_id"""))

  /** Recency-decayed activity score per user: each event contributes
    * 2²⁰ halved once per day of age (EXACT — the decay is a right
    * shift, so no float ever enters; ages ≥ 63 contribute 0). The
    * streaming-friendly recency prior for triage ranking, computed as
    * one aggregate over the scan plus a broadcast max-day scalar.
    */
  val qDecayActivity = QueryDef(
    "q_decay_activity",
    (s, d) => {
      val ev = events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"), tsEpochDay.as("day"))
      val today = ev.agg(max(col("day")).as("today"))
      ev.crossJoin(broadcast(today))
        .withColumn("_c",
          expr("shiftright(1048576L, cast(least(today - day, 63L) as int))"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum(col("_c")).as("score_q"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
              FROM events WHERE user_id IS NOT NULL),
            t AS (SELECT max(day) AS today FROM ev)
            SELECT user_id, count(*) AS n_events,
              CAST(sum(1048576 >> LEAST(today - day, 63)) AS BIGINT) AS score_q
            FROM ev, t GROUP BY 1 ORDER BY user_id"""))

  /** k-anonymity audit over (event_type, day, floor(value)) quasi-
    * identifiers ([[Privacy.kAnonymityGroups]]): every combination
    * shared by fewer than k=5 rows marks its members re-identifiable.
    * One hash aggregate; floor on identical doubles is engine-proof.
    */
  val qKAnonymity = QueryDef(
    "q_k_anonymity",
    (s, d) => Privacy.kAnonymityGroups(
        events(s, d).select(col("event_type"), tsEpochDay.as("day"),
          floor(col("value")).as("value_bucket")),
        Seq("event_type", "day", "value_bucket"), k = 5)
      .orderBy("event_type", "day", "value_bucket"),
    Some("""SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
              CAST(floor(value) AS BIGINT) AS value_bucket,
              count(*) AS n_rows, count(*) < 5 AS is_violating
            FROM events GROUP BY 1, 2, 3
            ORDER BY event_type, day, value_bucket NULLS FIRST"""))

  /** One-row k-anonymity release-risk summary
    * ([[Privacy.kAnonymitySummary]]): total groups, violating groups,
    * rows at risk, and the exact at-risk per-mille.
    */
  val qPrivacyRisk = QueryDef(
    "q_privacy_risk",
    (s, d) => Privacy.kAnonymitySummary(
      events(s, d).select(col("event_type"), tsEpochDay.as("day"),
        floor(col("value")).as("value_bucket")),
      Seq("event_type", "day", "value_bucket"), k = 5),
    Some("""WITH g AS (SELECT count(*) AS n_rows FROM events
              GROUP BY event_type, epoch_ns(ts) // 86400000000000, floor(value))
            SELECT count(*) AS n_groups,
              CAST(sum(CASE WHEN n_rows < 5 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_violating,
              CAST(sum(CASE WHEN n_rows < 5 THEN n_rows ELSE 0 END) AS BIGINT)
                AS rows_at_risk,
              CAST(sum(n_rows) AS BIGINT) AS n_rows_total,
              (1000 * CAST(sum(CASE WHEN n_rows < 5 THEN n_rows ELSE 0 END) AS BIGINT))
                // CAST(sum(n_rows) AS BIGINT) AS risk_pm
            FROM g"""))

  /** l-diversity audit ([[Privacy.lDiversityGroups]]): per
    * (event_type, day) group, the distinct-user count — a group whose
    * sensitive attribute (here user identity) has fewer than l=5
    * distinct values discloses it to anyone who links a member.
    */
  val qLDiversity = QueryDef(
    "q_l_diversity",
    (s, d) => Privacy.lDiversityGroups(
        events(s, d).select(col("event_type"), tsEpochDay.as("day"),
          col("user_id")),
        Seq("event_type", "day"), "user_id", l = 5)
      .orderBy("event_type", "day"),
    Some("""SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
              count(*) AS n_rows,
              count(DISTINCT user_id) AS n_sensitive,
              count(DISTINCT user_id) < 5 AS is_violating
            FROM events GROUP BY 1, 2 ORDER BY event_type, day"""))

  /** Multi-blocker fuzzy matching ([[FuzzyJoin.multiBlockEditJoin]],
    * prefix-4 ∪ suffix-4): the deletion position now ranges over the
    * WHOLE name — a head deletion escapes the prefix block but not the
    * suffix one and vice versa, so the union has provably full recall
    * for one edit and every probe's `self_hit` is 1. The fixture names
    * carry the key at BOTH ends ("key#words#key") because blocking keys
    * must be discriminative where they are taken from: a prefix block
    * over the ~15 distinct adjective heads of p_name degenerates to
    * quadratic blocks (measured 59 s at sf0.1 — the operator did exactly
    * what the blocker asked), while key-led heads and tails keep every
    * block O(1). Two equi-join passes plus a distinct — no cartesian.
    */
  val qFuzzyMulti = QueryDef(
    "q_fuzzy_multi",
    (s, d) => {
      // pinned: each blocker pass is a consumer (the multi-consumer rule)
      val cat = table(s, d, "part")
        .select(col("p_partkey"),
          concat(col("p_partkey").cast("string"), lit("#"), col("p_name"),
            lit("#"), col("p_partkey").cast("string")).as("name"))
        .localCheckpoint(true)
      val probes = cat
        .withColumn("pos", (lit(1L) +
          conv(substring(md5(concat(col("p_partkey").cast("string"),
            lit("graft:fzm"))), 1, 4), 16, 10).cast("long")
            % length(col("name")).cast("long")).cast("int"))
        .select(col("p_partkey").as("probe_key"),
          expr("concat(substring(name, 1, pos - 1), substring(name, pos + 1))")
            .as("probe_name"))
        .localCheckpoint(true)
      FuzzyJoin.multiBlockEditJoin(probes, "probe_name", cat, "name",
          maxDist = 2,
          Seq(FuzzyJoin.prefixBlocker(4), FuzzyJoin.suffixBlocker(4)))
        .groupBy("probe_key")
        .agg(count(lit(1)).as("n_matches"),
          min(col("dist")).as("best_dist"),
          max(when(col("p_partkey") === col("probe_key"), 1L).otherwise(0L))
            .as("self_hit"))
        .orderBy("probe_key")
    },
    Some("""WITH cat AS (SELECT p_partkey,
              CAST(p_partkey AS VARCHAR) || '#' || p_name || '#' ||
                CAST(p_partkey AS VARCHAR) AS name FROM part),
            pr AS (SELECT p_partkey AS probe_key, name,
              1 + CAST(('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || 'graft:fzm'), 1, 4))
                  AS BIGINT) % length(name) AS pos
              FROM cat),
            pb AS (SELECT probe_key,
              substr(name, 1, CAST(pos AS INT) - 1) || substr(name, CAST(pos AS INT) + 1)
                AS probe_name
              FROM pr),
            j AS (SELECT DISTINCT probe_key, p_partkey, dist FROM (
              SELECT pb.probe_key, cat.p_partkey,
                levenshtein(pb.probe_name, cat.name) AS dist
              FROM pb JOIN cat
                ON lower(substr(pb.probe_name, 1, 4)) = lower(substr(cat.name, 1, 4))
              WHERE abs(length(pb.probe_name) - length(cat.name)) <= 2
              UNION ALL
              SELECT pb.probe_key, cat.p_partkey,
                levenshtein(pb.probe_name, cat.name) AS dist
              FROM pb JOIN cat
                ON lower(substr(pb.probe_name, -4, 4)) = lower(substr(cat.name, -4, 4))
              WHERE abs(length(pb.probe_name) - length(cat.name)) <= 2)
              WHERE dist <= 2)
            SELECT probe_key, count(*) AS n_matches,
              CAST(min(dist) AS INT) AS best_dist,
              CAST(max(CASE WHEN p_partkey = probe_key THEN 1 ELSE 0 END) AS BIGINT)
                AS self_hit
            FROM j GROUP BY 1 ORDER BY 1"""))

  /** Referential-integrity audit — orphan foreign keys per relation
    * (the data-quality gate a warehouse runs before trusting a feed):
    * left-anti probes of each fact FK against its dimension, reported
    * as one row per relation with orphan and total counts and the exact
    * orphan per-mille. Anti-joins are plain shuffled equi-joins (or
    * broadcasts when the dimension is small) — no row ever leaves the
    * executor tier.
    */
  val qFkOrphans = QueryDef(
    "q_fk_orphans",
    (s, d) => {
      val spark = s
      import spark.implicits._
      def audit(rel: String, fact: DataFrame, fk: String,
          dim: DataFrame, pk: String): DataFrame = {
        val total = fact.where(col(fk).isNotNull).count()
        val orphans = fact.where(col(fk).isNotNull)
          .join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti").count()
        Seq((rel, orphans, total,
          if (total == 0) 0L else 1000L * orphans / total))
          .toDF("relation", "n_orphans", "n_rows", "orphan_pm")
      }
      audit("orders.custkey", table(s, d, "orders"), "o_custkey",
          table(s, d, "customer"), "c_custkey")
        .unionAll(audit("lineitem.orderkey", table(s, d, "lineitem"),
          "l_orderkey", table(s, d, "orders"), "o_orderkey"))
        .unionAll(audit("lineitem.partkey", table(s, d, "lineitem"),
          "l_partkey", table(s, d, "part"), "p_partkey"))
        .unionAll(audit("lineitem.suppkey", table(s, d, "lineitem"),
          "l_suppkey", table(s, d, "supplier"), "s_suppkey"))
        .unionAll(audit("customer.nationkey", table(s, d, "customer"),
          "c_nationkey", table(s, d, "nation"), "n_nationkey"))
        .orderBy("relation")
    },
    Some("""SELECT relation, n_orphans, n_rows,
              CASE WHEN n_rows = 0 THEN 0
                   ELSE (1000 * n_orphans) // n_rows END AS orphan_pm
            FROM (
              SELECT 'orders.custkey' AS relation,
                (SELECT count(*) FROM orders o WHERE o_custkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
                  AS n_orphans,
                (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL) AS n_rows
              UNION ALL
              SELECT 'lineitem.orderkey',
                (SELECT count(*) FROM lineitem l WHERE l_orderkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
                (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL)
              UNION ALL
              SELECT 'lineitem.partkey',
                (SELECT count(*) FROM lineitem l WHERE l_partkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
                (SELECT count(*) FROM lineitem WHERE l_partkey IS NOT NULL)
              UNION ALL
              SELECT 'lineitem.suppkey',
                (SELECT count(*) FROM lineitem l WHERE l_suppkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
                (SELECT count(*) FROM lineitem WHERE l_suppkey IS NOT NULL)
              UNION ALL
              SELECT 'customer.nationkey',
                (SELECT count(*) FROM customer c WHERE c_nationkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
                (SELECT count(*) FROM customer WHERE c_nationkey IS NOT NULL)
            ) t ORDER BY relation"""))

  /** Pairwise association rules ([[graft.ext.AssocRules.pairRules]])
    * over (user, day) baskets of the `props.k` item domain — "which
    * signals co-fire". Counts and support/confidence are exact integer
    * arithmetic; lift's double expression tree has a fixed shape on
    * both engines.
    */
  val qAssocRules = QueryDef(
    "q_assoc_rules",
    (s, d) => {
      val bi = events(s, d).where(col("user_id").isNotNull)
        .select(concat_ws("_", col("user_id"),
            expr("ts div 86400000000000")).as("basket"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
      graft.ext.AssocRules.pairRules(bi, "basket", "item", minSupport = 2L)
        .orderBy("i1", "i2")
    },
    Some("""WITH bi AS (
              SELECT DISTINCT
                user_id::VARCHAR || '_'
                  || (epoch_ns(ts) // 86400000000000)::VARCHAR AS b,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS i
              FROM events WHERE user_id IS NOT NULL),
            n AS (SELECT count(DISTINCT b) AS nb FROM bi),
            ic AS (SELECT i, count(*) AS ni FROM bi GROUP BY 1
                   HAVING count(*) >= 2),
            f AS (SELECT bi.b, bi.i FROM bi JOIN ic ON ic.i = bi.i),
            p AS (SELECT l.i AS i1, r.i AS i2, count(*) AS n12
                  FROM f l JOIN f r ON l.b = r.b AND l.i < r.i
                  GROUP BY 1, 2 HAVING count(*) >= 2)
            SELECT p.i1, p.i2, p.n12, c1.ni AS n1, c2.ni AS n2,
              n.nb AS n_baskets,
              1000000 * p.n12 // n.nb AS support_q,
              1000000 * p.n12 // c1.ni AS conf12_q,
              1000000 * p.n12 // c2.ni AS conf21_q,
              (CAST(p.n12 AS DOUBLE) * CAST(n.nb AS DOUBLE))
                / (CAST(c1.ni AS DOUBLE) * CAST(c2.ni AS DOUBLE)) AS lift
            FROM p
            JOIN ic c1 ON c1.i = p.i1
            JOIN ic c2 ON c2.i = p.i2, n
            ORDER BY i1, i2"""))

  val all: Seq[QueryDef] = Seq(qRangeJoinBinned, qTriangleCount,
    qTriangleNodes, qKmvDistinct, qKmvJaccard, qBeaconing, qFunnel,
    qCharEntropy, qKcore, qPathSurprise, qFuzzyMatch, qFuzzyMulti,
    qKAnonymity, qPrivacyRisk, qLDiversity, qFkOrphans, qKmvWindow,
    qGraphComponents, qDecayActivity, qIocMatch, qTrendSlope, qAssocRules)
}
