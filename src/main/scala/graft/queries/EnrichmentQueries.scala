package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Network, Sketches}
import graft.functions.ZOrderFunctions

/** Events-domain enrichment and layout analytics: threat-intel CIDR
  * longest-prefix matching, Z-order clustering keys, event-transition
  * matrices, and equi-depth binning. Same determinism conventions as
  * ParityQueries (full ORDER BY over a unique key; exact integer
  * arithmetic or identical-operand divisions — nothing summation-order
  * dependent).
  */
object EnrichmentQueries {

  private def events(s: SparkSession, d: String): DataFrame =
    QueryDef.eventsTable(s, d)

  /** Epoch day of the ns-timestamp (integer division — ts nanos exceed
    * 2^53, so a double division would lose precision).
    */
  private val tsEpochDay: Column = expr("ts div 86400000000000")

  /** The literal threat feed used by q_cidr_match — nested blocks
    * (160.0.0.0/11 inside 128.0.0.0/2, 200.0.0.0/6 inside 192.0.0.0/3,
    * 10.0.0.0/8 inside 0.0.0.0/2) exercise longest-prefix selection, and
    * 96.0.0.0–127.255.255.255 is deliberately uncovered so the inner
    * match drops rows. The oracle carries the same list verbatim.
    */
  private val threatFeed: Seq[(String, String)] = Seq(
    "0.0.0.0/2" -> "bogon-low",
    "64.0.0.0/3" -> "scanner",
    "10.0.0.0/8" -> "internal",
    "128.0.0.0/2" -> "botnet",
    "160.0.0.0/11" -> "tor-exit",
    "192.0.0.0/3" -> "ddos",
    "200.0.0.0/6" -> "spam",
    "224.0.0.0/3" -> "multicast-res")

  private val threatFeedSql: String = threatFeed
    .map { case (c, l) => s"('$c', '$l')" }.mkString(", ")

  /** Threat-intel enrichment: classify each event's address by the
    * longest-prefix-matching CIDR of a feed. The feed folds into the plan
    * as a literal array (Network.lpmEnrich), so the event side streams
    * through with ZERO exchanges — the 100 TB shape for any
    * broadcast-size dimension applied per-row. Addresses are derived
    * md5-deterministically (the testdata has no IP column); the oracle
    * replays the derivation, the CIDR mask arithmetic, and the
    * prefix-desc argmax in SQL.
    */
  val qCidrMatch = QueryDef(
    "q_cidr_match",
    (s, d) => {
      val e = events(s, d)
        .withColumn("_ip", Network.ipFromKey(col("event_id"), "graft:ip"))
      Network.lpmEnrich(e, col("_ip"), threatFeed)
        .where(col("_lpm").isNotNull)
        .select(col("event_id"), Network.ipDotted(col("_ip")).as("ip"),
          col("_lpm.cidr").as("cidr"), col("_lpm.label").as("label"),
          col("_lpm.prefix").as("prefix"))
        .orderBy("event_id")
    },
    Some(s"""WITH feed(cidr, label) AS (VALUES $threatFeedSql),
            b AS (SELECT cidr, label,
                    CAST(split_part(cidr, '/', 2) AS INT) AS prefix,
                    CAST(split_part(split_part(cidr, '/', 1), '.', 1) AS BIGINT) * 16777216
                  + CAST(split_part(split_part(cidr, '/', 1), '.', 2) AS BIGINT) * 65536
                  + CAST(split_part(split_part(cidr, '/', 1), '.', 3) AS BIGINT) * 256
                  + CAST(split_part(split_part(cidr, '/', 1), '.', 4) AS BIGINT) AS raw
                  FROM feed),
            r AS (SELECT cidr, label, prefix,
                    raw - raw % CAST(POWER(2, 32 - prefix) AS BIGINT) AS lo,
                    raw - raw % CAST(POWER(2, 32 - prefix) AS BIGINT)
                        + CAST(POWER(2, 32 - prefix) AS BIGINT) - 1 AS hi
                  FROM b),
            e AS (SELECT event_id,
                    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'graft:ip'), 1, 8))
                         AS BIGINT) AS ipn
                  FROM events)
            SELECT event_id, ip, cidr, label, prefix FROM (
              SELECT e.event_id,
                CAST((ipn >> 24) & 255 AS VARCHAR) || '.' ||
                CAST((ipn >> 16) & 255 AS VARCHAR) || '.' ||
                CAST((ipn >> 8) & 255 AS VARCHAR) || '.' ||
                CAST(ipn & 255 AS VARCHAR) AS ip,
                r.cidr, r.label, r.prefix,
                row_number() OVER (PARTITION BY e.event_id ORDER BY r.prefix DESC) AS rk
              FROM e JOIN r ON e.ipn BETWEEN r.lo AND r.hi) t
            WHERE rk = 1 ORDER BY event_id"""))

  /** The 32 bitwise-OR terms replaying ZOrderImpl.interleave16 in plain
    * SQL over pre-masked 16-bit inputs a and b.
    */
  private val zorderSqlTerms: String = (0 until 16)
    .map(i => s"(((a >> $i) & 1) << ${2 * i}) | (((b >> $i) & 1) << ${2 * i + 1})")
    .mkString(" | ")

  /** Z-order clustering key over (user_id, epoch day) — the layout key a
    * writer sorts by so every output file gets a tight min/max box in
    * BOTH dimensions and scans filtering on either can skip files
    * (NetworkSpec asserts the actual file-skipping win). Native codegen'd
    * expression; the oracle replays the interleave as 32 bitwise terms.
    */
  val qZorderKey = QueryDef(
    "q_zorder_key",
    (s, d) => events(s, d)
      .select(col("event_id"),
        ZOrderFunctions.zorder16(
          col("user_id").bitwiseAND(lit(65535L)),
          tsEpochDay.bitwiseAND(lit(65535L))).as("zkey"))
      .orderBy("event_id"),
    Some(s"""WITH m AS (SELECT event_id,
              (CAST(user_id AS BIGINT) & 65535) AS a,
              ((epoch_ns(ts) // 86400000000000) & 65535) AS b
            FROM events)
            SELECT event_id, $zorderSqlTerms AS zkey
            FROM m ORDER BY event_id"""))

  /** First-order event-transition matrix (Markov counts): per ordered
    * (event_type → next event_type) pair within a user's timeline, the
    * transition count and probability. One user-keyed exchange for the
    * lead window, one 16-byte-keyed exchange for the pair counts; the
    * probability divides identical longs on both engines, so no rounding
    * is needed for bit-exactness.
    */
  val qEventTransitions = QueryDef(
    "q_event_transitions",
    (s, d) => {
      // Order by µs-truncated ts (`ts div 1000`) + event_id: DuckDB's
      // parquet reader truncates ns→µs, so ordering by raw ns could flip
      // lead() for same-µs events and break oracle parity.
      val w = Window.partitionBy("user_id")
        .orderBy(expr("ts div 1000"), col("event_id"))
      events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .where(col("next_type").isNotNull)
        .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("event_type")).cast("double"))
        .orderBy("event_type", "next_type")
    },
    Some("""WITH nx AS (SELECT event_type,
              lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
            FROM events),
            c AS (SELECT event_type, next_type, count(*) AS n FROM nx
                  WHERE next_type IS NOT NULL GROUP BY 1, 2)
            SELECT event_type, next_type, n,
              CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) AS p
            FROM c ORDER BY event_type, next_type"""))

  /** Equi-depth (quartile) binning of the value column — the
    * feature-discretization shape that scales: exact quartile boundaries
    * from ONE small aggregate, broadcast back over the stream (no global
    * sort, no single-partition ntile window). Boundary parity with DuckDB
    * uses the established percentile ↔ quantile_cont (R-7) equivalence.
    */
  val qBinEquidepth = QueryDef(
    "q_bin_equidepth",
    (s, d) => {
      val vals = events(s, d).where(col("value").isNotNull).select("value")
      val bounds = vals.agg(
        expr("percentile(value, array(0.25, 0.5, 0.75))").as("bs"))
      vals.crossJoin(broadcast(bounds))
        .withColumn("bin",
          when(col("value") <= col("bs")(0), 1)
            .when(col("value") <= col("bs")(1), 2)
            .when(col("value") <= col("bs")(2), 3)
            .otherwise(4))
        .groupBy("bin").agg(count(lit(1)).as("n_rows"),
          min("value").as("min_value"), max("value").as("max_value"))
        .orderBy("bin")
    },
    Some("""WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
            b AS (SELECT quantile_cont(value, 0.25) AS q1,
                         quantile_cont(value, 0.5) AS q2,
                         quantile_cont(value, 0.75) AS q3 FROM v)
            SELECT bin, count(*) AS n_rows,
              min(value) AS min_value, max(value) AS max_value FROM (
              SELECT CASE WHEN value <= q1 THEN 1 WHEN value <= q2 THEN 2
                          WHEN value <= q3 THEN 3 ELSE 4 END AS bin, value
              FROM v, b) t
            GROUP BY bin ORDER BY bin"""))

  /** Top event-type paths: each user-day's time-ordered event_type
    * sequence as a '>'-joined path string, ranked by frequency (top 20,
    * value tiebreak). The per-group ordered concat is collect_list +
    * array_sort on (ts, event_id, event_type) structs — bounded by a
    * user's daily volume — and the top-k is orderBy+limit, which Catalyst
    * rewrites to TakeOrderedAndProject (distributed top-k, no global
    * sort). At 100 TB, group on md5(path) and join the winners back for
    * display so the shuffle carries 16-byte keys, not path strings.
    */
  val qSessionPaths = QueryDef(
    "q_session_paths",
    (s, d) => events(s, d)
      .groupBy(col("user_id"), tsEpochDay.as("day"))
      .agg(array_join(
        transform(
          // Sort key is µs-truncated ts to match DuckDB's ns→µs parquet
          // read; event_id breaks same-µs ties identically on both engines.
          array_sort(collect_list(struct(expr("ts div 1000").as("tus"),
            col("event_id"), col("event_type")))),
          x => x("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(20),
    Some("""WITH p AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
              string_agg(event_type, '>' ORDER BY ts, event_id) AS path
            FROM events GROUP BY 1, 2)
            SELECT path, count(*) AS n FROM p
            GROUP BY path ORDER BY n DESC, path LIMIT 20"""))

  /** Feed-drift report: split the stream at its midpoint day and compare
    * per-event-type volume and value-null rates between the halves — the
    * check a pipeline runs before trusting that yesterday's feed still
    * looks like last week's. One scan, conditional sums; the ratio
    * divides identical longs on both engines (NULL when a type is absent
    * from the first half), so the report is bit-exact with no rounding.
    */
  val qDriftReport = QueryDef(
    "q_drift_report",
    (s, d) => {
      val e = events(s, d).withColumn("day", tsEpochDay)
      val pivot = e.agg(
        expr("(min(day) + max(day) + 1) div 2").as("pivot"))
      e.crossJoin(broadcast(pivot))
        .groupBy("event_type").agg(
          sum(when(col("day") < col("pivot"), 1L).otherwise(0L)).as("n_first"),
          sum(when(col("day") >= col("pivot"), 1L).otherwise(0L)).as("n_second"),
          sum(when(col("day") < col("pivot") && col("value").isNull, 1L)
            .otherwise(0L)).as("null_first"),
          sum(when(col("day") >= col("pivot") && col("value").isNull, 1L)
            .otherwise(0L)).as("null_second"))
        .withColumn("rate_ratio", col("n_second").cast("double") /
          nullif(col("n_first").cast("double"), lit(0.0)))
        .orderBy("event_type")
    },
    Some("""WITH d AS (SELECT event_type, value,
              epoch_ns(ts) // 86400000000000 AS day FROM events),
            p AS (SELECT (min(day) + max(day) + 1) // 2 AS cut FROM d)
            SELECT event_type,
              CAST(sum(CASE WHEN day < cut THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
              CAST(sum(CASE WHEN day >= cut THEN 1 ELSE 0 END) AS BIGINT) AS n_second,
              CAST(sum(CASE WHEN day < cut AND value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_first,
              CAST(sum(CASE WHEN day >= cut AND value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_second,
              CAST(sum(CASE WHEN day >= cut THEN 1 ELSE 0 END) AS DOUBLE)
                / NULLIF(CAST(sum(CASE WHEN day < cut THEN 1 ELSE 0 END) AS DOUBLE), 0)
                AS rate_ratio
            FROM d, p GROUP BY event_type ORDER BY event_type"""))

  /** Per-type CDF normalization: percent_rank of value within each
    * event_type (event_id tiebreak makes ranks unique, so the
    * (rank−1)/(n−1) division has identical integer operands on both
    * engines — bit-exact with no rounding). One exchange on event_type.
    * DuckDB defaults window ORDER BY to NULLS LAST vs Spark's NULLS
    * FIRST — spelled explicitly in the oracle.
    */
  val qPercentRank = QueryDef(
    "q_percent_rank",
    (s, d) => events(s, d)
      .select(col("event_id"), col("event_type"),
        percent_rank().over(
          Window.partitionBy("event_type")
            .orderBy(col("value"), col("event_id"))).as("pr"))
      .orderBy("event_id"),
    Some("""SELECT event_id, event_type,
              percent_rank() OVER (PARTITION BY event_type
                ORDER BY value NULLS FIRST, event_id) AS pr
            FROM events ORDER BY event_id"""))

  /** Day-of-week seasonality profile: per (weekday × event_type) volume
    * and within-day share. The weekday comes from pure integer epoch-day
    * arithmetic ((day + 4) mod 7, anchored on 1970-01-01 = Thursday) —
    * no calendar/timezone functions to diverge between engines; the
    * share divides identical longs.
    */
  val qWeekdayProfile = QueryDef(
    "q_weekday_profile",
    (s, d) => events(s, d)
      .withColumn("dow", (tsEpochDay + 4) % 7)
      .groupBy("dow", "event_type").agg(count(lit(1)).as("n"))
      .withColumn("share", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("dow")).cast("double"))
      .orderBy("dow", "event_type"),
    Some("""WITH d AS (SELECT ((epoch_ns(ts) // 86400000000000) + 4) % 7 AS dow,
              event_type FROM events),
            c AS (SELECT dow, event_type, count(*) AS n FROM d GROUP BY 1, 2)
            SELECT dow, event_type, n,
              CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY dow) AS DOUBLE) AS share
            FROM c ORDER BY dow, event_type"""))

  /** Tukey-fence outlier detection: flag values outside
    * [q1 − 1.5·IQR, q3 + 1.5·IQR]. The complement of the MAD gate
    * (q_anomaly_mad) for box-plot semantics; same scale shape — exact
    * quartiles from one small aggregate, broadcast back, stateless flag
    * over the stream. The fence arithmetic applies identical double
    * operations to identical quantile values on both engines.
    */
  val qOutliersIqr = QueryDef(
    "q_outliers_iqr",
    (s, d) => {
      val vals = events(s, d).where(col("value").isNotNull)
      val bounds = vals.agg(
        expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3"))
      vals.crossJoin(broadcast(bounds))
        .where(col("value") > col("q3") + lit(1.5) * (col("q3") - col("q1")) ||
          col("value") < col("q1") - lit(1.5) * (col("q3") - col("q1")))
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    },
    Some("""WITH v AS (SELECT event_id, event_type, value FROM events
              WHERE value IS NOT NULL),
            b AS (SELECT quantile_cont(value, 0.25) AS q1,
                         quantile_cont(value, 0.75) AS q3 FROM v)
            SELECT event_id, event_type, value FROM v, b
            WHERE value > q3 + 1.5 * (q3 - q1)
               OR value < q1 - 1.5 * (q3 - q1)
            ORDER BY event_id"""))

  /** Market-basket association over user-days: for each unordered pair
    * of event_types co-occurring in a user's day, the co-occurrence
    * count and lift = P(ab)/(P(a)·P(b)). Group sizes are bounded by the
    * type vocabulary (≤ |types| rows per user-day after distinct, ≤
    * C(|types|,2) pairs), so the self-join cannot blow up; the type
    * totals broadcast. Lift multiplies longs and divides once —
    * bit-exact. NULL user_ids are excluded explicitly (equality join
    * would drop them silently; the filter makes it a contract).
    */
  val qAssocPairs = QueryDef(
    "q_assoc_pairs",
    (s, d) => {
      val ud = events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"), tsEpochDay.as("day"), col("event_type"))
        .distinct()
      val groups = ud.select("user_id", "day").distinct()
        .agg(count(lit(1)).as("g"))
      val singles = ud.groupBy(col("event_type").as("t")).agg(count(lit(1)).as("n_t"))
      val pairs = ud.as("a").join(ud.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(singles.withColumnRenamed("n_t", "n_a")), col("type_a") === col("t")).drop("t")
        .join(broadcast(singles.withColumnRenamed("n_t", "n_b")), col("type_b") === col("t")).drop("t")
        .crossJoin(broadcast(groups))
        .withColumn("lift", (col("n_ab") * col("g")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"))
        .select("type_a", "type_b", "n_ab", "lift")
        .orderBy("type_a", "type_b")
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id,
              epoch_ns(ts) // 86400000000000 AS day, event_type
            FROM events WHERE user_id IS NOT NULL),
            g AS (SELECT count(*) AS g FROM (SELECT DISTINCT user_id, day FROM ud)),
            s AS (SELECT event_type AS t, count(*) AS n_t FROM ud GROUP BY 1),
            p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                    count(*) AS n_ab
                  FROM ud a JOIN ud b ON a.user_id = b.user_id
                    AND a.day = b.day AND a.event_type < b.event_type
                  GROUP BY 1, 2)
            SELECT type_a, type_b, n_ab,
              CAST(n_ab * g AS DOUBLE) / CAST(sa.n_t * sb.n_t AS DOUBLE) AS lift
            FROM p, g
            JOIN s sa ON p.type_a = sa.t
            JOIN s sb ON p.type_b = sb.t
            ORDER BY type_a, type_b"""))

  /** Equal-width histogram (10 bins over the observed [min, max],
    * boundaries broadcast). The bin index applies the identical
    * subtract/divide/floor to identical doubles on both engines; the top
    * edge clamps into the last bin.
    */
  val qHistEquiwidth = QueryDef(
    "q_hist_equiwidth",
    (s, d) => {
      val vals = events(s, d).where(col("value").isNotNull).select("value")
      val bounds = vals.agg(min("value").as("lo"), max("value").as("hi"))
      vals.crossJoin(broadcast(bounds))
        .withColumn("bin", least(
          floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / 10.0)),
          lit(9L)).cast("int"))
        .groupBy("bin").agg(count(lit(1)).as("n_rows"))
        .orderBy("bin")
    },
    Some("""WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
            b AS (SELECT min(value) AS lo, max(value) AS hi FROM v)
            SELECT CAST(least(floor((value - lo) / ((hi - lo) / 10.0)), 9) AS INT) AS bin,
              count(*) AS n_rows
            FROM v, b GROUP BY 1 ORDER BY bin"""))

  /** CUSUM change detection over daily volumes: per event_type, the
    * running deviation of daily counts from the type's mean rate — the
    * classic drift detector for "did this feed's volume shift
    * mid-history". Bit-exactness trick: the running sum stays INTEGER
    * (running·D − k·T, all longs) and divides by D exactly once at the
    * end — a windowed sum of doubles would be frame-algorithm-dependent
    * across engines, an integer sum cannot be.
    */
  val qCusumDaily = QueryDef(
    "q_cusum_daily",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"), tsEpochDay.as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = daily.groupBy("event_type")
        .agg(sum("n").as("t"), count(lit(1)).as("dd"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily.join(broadcast(tot), "event_type")
        .withColumn("k", row_number().over(w))
        .withColumn("run", sum(col("n")).over(w))
        .withColumn("cusum",
          (col("run") * col("dd") - col("k") * col("t")).cast("double") /
            col("dd").cast("double"))
        .select("event_type", "day", "n", "cusum")
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (SELECT event_type,
              epoch_ns(ts) // 86400000000000 AS day, count(*) AS n
            FROM events GROUP BY 1, 2),
            tot AS (SELECT event_type, sum(n) AS t, count(*) AS dd
                    FROM daily GROUP BY 1)
            SELECT daily.event_type, day, n,
              CAST(sum(n) OVER (PARTITION BY daily.event_type ORDER BY day) * dd
                   - row_number() OVER (PARTITION BY daily.event_type ORDER BY day) * t
                   AS DOUBLE) / CAST(dd AS DOUBLE) AS cusum
            FROM daily JOIN tot ON daily.event_type = tot.event_type
            ORDER BY daily.event_type, day"""))

  /** Trailing-7-day active users (WAU) per day — the canonical sliding
    * DISTINCT metric, which no window frame can express exactly (distinct
    * doesn't decompose over frames). Scale shape: reduce once to distinct
    * (user, day) pairs — the only event-volume-sized step — then a
    * BROADCAST interval join against the tiny day dimension fans each
    * pair to ≤7 target days, and one distinct-count per day finishes.
    * Nothing event-sized shuffles more than twice; pure integers.
    */
  val qActiveUsers7d = QueryDef(
    "q_active_users_7d",
    (s, d) => {
      val pairs = events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"), tsEpochDay.as("day")).distinct()
      val days = pairs.select(col("day").as("target_day")).distinct()
      pairs.join(broadcast(days),
          col("day").between(col("target_day") - 6, col("target_day")))
        .groupBy("target_day")
        .agg(countDistinct(col("user_id")).as("wau"))
        .orderBy("target_day")
    },
    Some("""WITH p AS (SELECT DISTINCT user_id,
              epoch_ns(ts) // 86400000000000 AS day
            FROM events WHERE user_id IS NOT NULL),
            days AS (SELECT DISTINCT day AS target_day FROM p)
            SELECT target_day, count(DISTINCT user_id) AS wau
            FROM p JOIN days ON p.day BETWEEN target_day - 6 AND target_day
            GROUP BY target_day ORDER BY target_day"""))

  /** DAU/WAU stickiness: daily distinct users over trailing-7-day
    * distinct users, per day — the engagement ratio on top of
    * [[qActiveUsers7d]]'s interval-join shape. Identical-operand long
    * division keeps the ratio bit-exact.
    */
  val qStickiness = QueryDef(
    "q_stickiness",
    (s, d) => {
      val pairs = events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"), tsEpochDay.as("day")).distinct()
      val dau = pairs.groupBy(col("day").as("target_day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = pairs
        .join(broadcast(pairs.select(col("day").as("target_day")).distinct()),
          col("day").between(col("target_day") - 6, col("target_day")))
        .groupBy("target_day")
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, "target_day")
        .withColumn("stickiness",
          col("dau").cast("double") / col("wau").cast("double"))
        .orderBy("target_day")
    },
    Some("""WITH p AS (SELECT DISTINCT user_id,
              epoch_ns(ts) // 86400000000000 AS day
            FROM events WHERE user_id IS NOT NULL),
            dau AS (SELECT day AS target_day, count(DISTINCT user_id) AS dau
                    FROM p GROUP BY 1),
            days AS (SELECT DISTINCT day AS target_day FROM p),
            wau AS (SELECT target_day, count(DISTINCT user_id) AS wau
                    FROM p JOIN days ON p.day BETWEEN target_day - 6 AND target_day
                    GROUP BY target_day)
            SELECT dau.target_day, dau, wau,
              CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
            FROM dau JOIN wau ON dau.target_day = wau.target_day
            ORDER BY dau.target_day"""))

  /** New-vs-returning split: per day, users active for the FIRST time
    * vs users seen before — the acquisition/retention decomposition.
    * One pass computes each user's first day (a user-keyed aggregate);
    * the per-day split is conditional counting on pure integers.
    */
  val qNewVsReturning = QueryDef(
    "q_new_vs_returning",
    (s, d) => {
      val pairs = events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"), tsEpochDay.as("day")).distinct()
      val first = pairs.groupBy("user_id").agg(min("day").as("first_day"))
      pairs.join(first, "user_id")
        .groupBy("day").agg(
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("new_users"),
          sum(when(col("day") > col("first_day"), 1L).otherwise(0L)).as("returning_users"))
        .orderBy("day")
    },
    Some("""WITH p AS (SELECT DISTINCT user_id,
              epoch_ns(ts) // 86400000000000 AS day
            FROM events WHERE user_id IS NOT NULL),
            f AS (SELECT user_id, min(day) AS first_day FROM p GROUP BY 1)
            SELECT day,
              CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
              CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
            FROM p JOIN f ON p.user_id = f.user_id
            GROUP BY day ORDER BY day"""))

  /** Count–min sketch frequency estimation ([[Sketches.countMinSketch]] /
    * [[Sketches.countMinLookup]]): per-user event counts estimated from a
    * 4×64 counter table. Width 64 over ~150 users forces real collisions,
    * so the CMS upper-bound property (`n_est >= n_true`, equality when
    * some row is collision-free) is exercised, not vacuous. The sketch
    * build shuffles at most depth·width groups per map task regardless of
    * corpus size — constant-size exchange, constant-size broadcast back.
    * md5-derived bucket draws replay exactly in SQL.
    */
  val qCountMin = QueryDef(
    "q_countmin",
    (s, d) => {
      val e = events(s, d)
      val sketch = Sketches.countMinSketch(e, col("user_id"), width = 64, depth = 4)
      val truth = e.where(col("user_id").isNotNull)
        .groupBy("user_id").agg(count(lit(1)).as("n_true"))
      Sketches.countMinLookup(sketch, truth, col("user_id"), width = 64, depth = 4)
        .orderBy("user_id")
    },
    Some("""WITH ks AS (SELECT user_id, count(*) AS n_true,
              md5(CAST(user_id AS VARCHAR) || 'graft:cms') AS hex
            FROM events WHERE user_id IS NOT NULL GROUP BY 1, 3),
            h AS (SELECT user_id, n_true, j,
                    ('0x' || substr(hex, j * 8 + 1, 8))::BIGINT % 64 AS bucket
                  FROM ks, unnest(range(4)) AS t(j)),
            sk AS (SELECT j, bucket, sum(n_true) AS c FROM h GROUP BY 1, 2)
            SELECT h.user_id, h.n_true, CAST(min(sk.c) AS BIGINT) AS n_est
            FROM h JOIN sk ON h.j = sk.j AND h.bucket = sk.bucket
            GROUP BY h.user_id, h.n_true
            ORDER BY user_id"""))

  /** Gini coefficient of per-user event volume — the concentration
    * statistic behind "do 1% of users generate 90% of traffic". Closed
    * form over ranked counts: G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ), all
    * INTEGER sums with ONE division at the end — the bit-exact recipe
    * (windowed double sums are frame-algorithm-dependent across engines;
    * integer sums cannot be).
    *
    * Scale shape: the rank-weighted sum needs GLOBAL ranks over users,
    * but never materializes them. Ranks under ORDER BY (n, user_id) give
    * every block of users sharing count value v the consecutive ranks
    * (base, base + h]; Σ i·v over the block = v·(base·h + h(h+1)/2) —
    * independent of the user tiebreak order inside the block. So the sum
    * folds over the count-MULTIPLICITY histogram (one row per distinct
    * per-user count — bounded by the count value domain, thousands of
    * times smaller than user cardinality), and the only unpartitioned
    * window runs over that bounded histogram, not over users (the
    * q_ship_delay trick; the previous formulation single-task-sorted all
    * users at 100×).
    */
  val qGini = QueryDef(
    "q_gini",
    (s, d) => {
      val counts = events(s, d).where(col("user_id").isNotNull)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      val hist = counts.groupBy("n").agg(count(lit(1)).as("h"))
      val wv = Window.orderBy(col("n"))
        .rowsBetween(Window.unboundedPreceding, -1)
      hist.withColumn("base", coalesce(sum(col("h")).over(wv), lit(0L)))
        .withColumn("s_part",
          col("n") * (col("base") * col("h") +
            expr("h * (h + 1) div 2")))
        .agg(sum(col("h")).as("nu"), sum(col("n") * col("h")).as("t"),
          sum(col("s_part")).as("s"))
        .select(col("nu").as("n_users"), col("t").as("total_events"),
          ((lit(2) * col("s") - (col("nu") + 1) * col("t")).cast("double") /
            (col("nu") * col("t")).cast("double")).as("gini"))
    },
    Some("""WITH c AS (SELECT user_id, count(*) AS n FROM events
              WHERE user_id IS NOT NULL GROUP BY 1),
            r AS (SELECT user_id, n,
                    row_number() OVER (ORDER BY n, user_id) AS i FROM c),
            a AS (SELECT count(*) AS nu, sum(n) AS t, sum(i * n) AS s FROM r)
            SELECT nu AS n_users, CAST(t AS BIGINT) AS total_events,
              CAST(2 * s - (nu + 1) * t AS DOUBLE)
                / CAST(nu * t AS DOUBLE) AS gini
            FROM a"""))

  /** Benford first-significant-digit profile of order line prices — the
    * fabricated-data smell test. The digit comes from the SHORTEST-
    * ROUND-TRIP string rendering of the double (identical in both
    * engines — the established VARCHAR-hop equivalence), which is safe
    * here because every price is in [901, 105000): no sign, no leading
    * zero, no scientific notation. Shares divide identical longs.
    */
  val qBenford = QueryDef(
    "q_benford",
    (s, d) => QueryDef.table(s, d, "lineitem")
      .select(substring(col("l_extendedprice").cast("string"), 1, 1).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("share", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy()).cast("double"))
      .orderBy("digit"),
    Some("""WITH d AS (SELECT substr(CAST(l_extendedprice AS VARCHAR), 1, 1)
              AS digit FROM lineitem),
            c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1)
            SELECT digit, n,
              CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share
            FROM c ORDER BY digit"""))

  /** TPC-H Q5-shaped star-join revenue: six-table join (fact lineitem ⋈
    * filtered orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region) with the
    * same-nation constraint, revenue per nation for one region-year.
    * Scale shape: the date filter pushes into the orders scan, the three
    * true dimensions broadcast (nation/region/supplier here; at 100 TB
    * supplier joins like a fact), and lineitem⋈orders⋈customer shuffle on
    * their join keys — Catalyst/AQE pick sides. Bit-exactness: prices
    * cast double→DECIMAL(12,2) BEFORE multiplying (2-decimal money is
    * below the cast's rounding granularity on both engines), the product
    * stays decimal scale 4, the sum is order-independent decimal, and ONE
    * final cast to double is correctly rounded in both engines.
    */
  val qStarRevenue = QueryDef(
    "q_star_revenue",
    (s, d) => {
      val li = QueryDef.table(s, d, "lineitem")
      val ord = QueryDef.table(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val cust = QueryDef.table(s, d, "customer")
      val supp = QueryDef.table(s, d, "supplier")
      val nat = QueryDef.table(s, d, "nation")
      val reg = QueryDef.table(s, d, "region").where(col("r_name") === "ASIA")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
            .cast("double").as("revenue"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, count(*) AS n_lines,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                       * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                AS revenue
            FROM lineitem, orders, customer, supplier, nation, region
            WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name ORDER BY n_name"""))

  /** Pareto frontier (skyline) of users over (event volume, peak event
    * value): users no other user dominates in both metrics. Scale shape:
    * the skyline never sorts the raw point set — it reduces to per-x
    * maxima (|distinct x| rows), takes a running max over that BOUNDED
    * aggregate ordered by x desc (ROWS frame over unique x — exact,
    * engine-independent), and joins the two small tables back to the
    * per-user aggregate. A point is dominated iff some strictly-greater
    * x attains y' >= y, or its own x-group attains a strictly greater y;
    * exact-tie points are mutually non-dominating and both survive.
    * Pure integers throughout.
    */
  val qParetoFront = QueryDef(
    "q_pareto_front",
    (s, d) => {
      val pts = events(s, d)
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("x"), max(col("value")).as("y"))
      val perX = pts.groupBy("x").agg(max("y").as("max_y"))
      val wx = Window.orderBy(col("x").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val dom = perX.withColumn("m1", max(col("max_y")).over(wx))
      pts.join(broadcast(dom), "x")
        .where(col("y") === col("max_y") &&
          (col("m1").isNull || col("y") > col("m1")))
        .select("user_id", "x", "y")
        .orderBy("user_id")
    },
    Some("""WITH pts AS (SELECT user_id, count(*) AS x, max(value) AS y
            FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
            GROUP BY 1),
            perx AS (SELECT x, max(y) AS max_y FROM pts GROUP BY 1),
            dom AS (SELECT x, max_y,
                      max(max_y) OVER (ORDER BY x DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
                    FROM perx)
            SELECT user_id, pts.x, y FROM pts JOIN dom ON pts.x = dom.x
            WHERE y = max_y AND (m1 IS NULL OR y > m1)
            ORDER BY user_id"""))

  /** TPC-H Q1-shaped pricing summary: the full aggregate battery per
    * (returnflag, linestatus) — quantity/price/discounted/charged sums,
    * three means, row count — in ONE partial+final hash aggregate pass
    * over the fact scan with the ship-date filter pushed down.
    * Bit-exactness: money casts double→DECIMAL before arithmetic so every
    * sum is order-independent; `sum_charge`'s scale-6 decimal sum can
    * exceed 2^53 once scaled, where the engines' decimal→double paths
    * round differently — and a decimal DOWNCAST diverges too (Spark casts
    * HALF_UP, DuckDB TRUNCATES: 28472760.715155 → .72 vs .71, measured).
    * So the truncation is made EXPLICIT and identical: floor(sum·100)
    * — unambiguous on positive decimals in both engines — yields an
    * integer far below 2^53 whose double conversion is exact, and one
    * final division by 100 is correctly rounded identically. Quantities
    * are integer-valued doubles (exact in any order); means divide
    * identical operands.
    */
  val qPricingSummary = QueryDef(
    "q_pricing_summary",
    (s, d) => {
      val ep = col("l_extendedprice").cast("decimal(12,2)")
      val disc = col("l_discount").cast("decimal(3,2)")
      val tax = col("l_tax").cast("decimal(3,2)")
      QueryDef.table(s, d, "lineitem")
        .where(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(ep).cast("double").as("sum_base_price"),
          sum(ep * (lit(1).cast("decimal(3,2)") - disc)).cast("double")
            .as("sum_disc_price"),
          (floor(sum(ep * (lit(1).cast("decimal(3,2)") - disc)
            * (lit(1).cast("decimal(3,2)") + tax)) * lit(100))
            .cast("double") / lit(100.0)).as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (sum(ep).cast("double") / count(lit(1))).as("avg_price"),
          (sum(disc).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
              sum(l_quantity) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                AS sum_base_price,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                AS sum_disc_price,
              CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2)))
                   * (1 + CAST(l_tax AS DECIMAL(3,2)))) * 100)
                AS DOUBLE) / 100 AS sum_charge,
              sum(l_quantity) / count(*) AS avg_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / count(*) AS avg_price,
              CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE)
                / count(*) AS avg_disc,
              count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1999-01-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** TPC-H Q3-shaped top unshipped orders: segment-filtered three-table
    * join, per-order revenue, top 10 — the classic
    * filter→join→agg→TakeOrderedAndProject pipeline (no global sort; each
    * map task ships only its local top 10). Revenue is an
    * order-independent decimal sum whose scaled integer stays far below
    * 2^53 per order, so the final double cast is exact in both engines;
    * the orderkey tiebreak pins ties.
    */
  val qTopOrders = QueryDef(
    "q_top_orders",
    (s, d) => {
      val cut = lit("1998-07-01").cast("timestamp")
      val cust = QueryDef.table(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING")
      val ord = QueryDef.table(s, d, "orders").where(col("o_orderdate") < cut)
      val li = QueryDef.table(s, d, "lineitem").where(col("l_shipdate") > cut)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },
    Some("""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                AS revenue
            FROM lineitem, orders, customer
            WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-07-01'
              AND l_shipdate > TIMESTAMP '1998-07-01'
            GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
            ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** TPC-H Q18-shaped large-volume orders: aggregate-THEN-join — the
    * HAVING filter collapses the fact table to the qualifying order keys
    * BEFORE any join touches orders/customer, so the join input is the
    * small filtered aggregate, not the raw facts (the at-scale shape;
    * the optimizer can additionally semi-join/bloom-prune the dimension
    * side). Quantities are integer-valued doubles — exact sums in any
    * order — and the HAVING threshold compares exactly.
    */
  val qLargeOrders = QueryDef(
    "q_large_orders",
    (s, d) => {
      val big = QueryDef.table(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("total_qty"))
        .where(col("total_qty") > 180)
      big
        .join(QueryDef.table(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(QueryDef.table(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("l_orderkey"),
          to_date(col("o_orderdate")).as("o_orderdate"), col("total_qty"))
        .orderBy("l_orderkey")
    },
    Some("""SELECT c_name, l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
              total_qty
            FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
                  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 180) big
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY l_orderkey"""))

  /** Shipping-delay distribution per order priority: exact integer
    * day-difference between line shipment and order placement, with
    * min/max and exact R-7 percentiles. SCALE-CRITICAL shape: the
    * built-in exact `percentile` materializes the full value multiset
    * per group — with 5 groups over the 30 M-row 50× join that is ~6 M
    * values per reducer, measured 70-175 s solo. `delay_days` has a
    * BOUNDED integer domain (~120 distinct values), so the rewrite
    * collapses the join to a (priority, delay) HISTOGRAM first — the
    * only fact-sized step, a map-side-combinable count on a tiny key
    * space — and derives the interpolated percentile from cumulative
    * counts: rank bounds r1=floor(h), r2=ceil(h) at h=p·(n−1), each
    * bound's value looked up by cum-count containment, then Spark's own
    * two-sided interpolation v1·(r2−h) + v2·(h−r1), which hash-matches
    * DuckDB's quantile_cont (the established parity, now from counts
    * instead of a multiset).
    */
  val qShipDelay = QueryDef(
    "q_ship_delay",
    (s, d) => {
      val dist = QueryDef.table(s, d, "lineitem")
        .join(QueryDef.table(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("delay_days",
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast("long"))
        .groupBy("o_orderpriority", "delay_days")
        .agg(count(lit(1)).as("cnt"))
      val cum = dist.withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy("o_orderpriority").orderBy("delay_days")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val totals = dist.groupBy("o_orderpriority")
        .agg(sum(col("cnt")).as("n"), min("delay_days").as("min_days"),
          max("delay_days").as("max_days"))
      val targets = totals
        .select(col("o_orderpriority"), col("n"), col("min_days"),
          col("max_days"),
          explode(array(lit(0.5), lit(0.9), lit(0.99))).as("p"))
        .withColumn("h", col("p") * (col("n") - 1).cast("double"))
        .withColumn("r1", floor(col("h")).cast("long"))
        .withColumn("r2", ceil(col("h")).cast("long"))
      // value at 0-based rank r = first delay whose cumulative count
      // exceeds r; the cum table is domain-sized, so it broadcasts, and
      // BOTH rank lookups fold into one conditional aggregation pass
      targets.join(broadcast(cum), Seq("o_orderpriority"))
        .groupBy(col("o_orderpriority"), col("n"), col("min_days"),
          col("max_days"), col("p"), col("h"), col("r1"), col("r2"))
        .agg(min(when(col("cum") >= col("r1") + 1, col("delay_days"))).as("v1"),
          min(when(col("cum") >= col("r2") + 1, col("delay_days"))).as("v2"))
        .withColumn("pv", when(col("r1") === col("r2"), col("v1").cast("double"))
          .otherwise(col("v1").cast("double") * (col("r2").cast("double") - col("h")) +
            col("v2").cast("double") * (col("h") - col("r1").cast("double"))))
        .groupBy(col("o_orderpriority"), col("n").as("n_lines"),
          col("min_days"), col("max_days"))
        .agg(max(when(col("p") === 0.5, col("pv"))).as("p50"),
          max(when(col("p") === 0.9, col("pv"))).as("p90"),
          max(when(col("p") === 0.99, col("pv"))).as("p99"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH j AS (SELECT o_orderpriority,
              date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) AS delay_days
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
            SELECT o_orderpriority, count(*) AS n_lines,
              min(delay_days) AS min_days, max(delay_days) AS max_days,
              quantile_cont(delay_days, 0.5) AS p50,
              quantile_cont(delay_days, 0.9) AS p90,
              quantile_cont(delay_days, 0.99) AS p99
            FROM j GROUP BY 1 ORDER BY o_orderpriority"""))

  /** Exact GLOBAL row_number under `sortCols` without a single-partition
    * window: range-repartition on the sort key (disjoint ordered ranges —
    * the rank is exact wherever the sampled boundaries fall), count each
    * range partition, broadcast the cumulative offsets back, and add a
    * PER-PARTITION row_number. Both window passes are parallel (the
    * offset window runs over `parts` rows); the cost is two shuffles of
    * the input instead of one all-rows single-task sort. Sort keys must
    * be unique per row (callers tiebreak on a key column).
    */
  private def withGlobalRank(
      df: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    // localCheckpoint pins ONE materialized range partitioning: the
    // offsets branch and the main branch would otherwise each
    // re-evaluate the repartition, and RangePartitioner's reservoir
    // sample depends on upstream row order — nondeterministic under
    // concurrent shuffle fetch — so the two evaluations can disagree on
    // boundaries and mis-align _poff with _pid (caught by the r10 gate:
    // 67/1500 q_rfm rows off by one quintile).
    rankedOnStable(
      df.repartitionByRange(
          df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
          sortCols: _*)
        .withColumn("_pid", spark_partition_id())
        .localCheckpoint(true),
      rankCol, sortCols: _*)
  }

  /** The offsets+local-row_number tail of the global rank, over an
    * ALREADY range-partitioned frame carrying `_pid`. Split out so
    * [[globalRankTable]] can skip the per-call checkpoint when the
    * input's evaluation is known-deterministic.
    */
  private[graft] def rankedOnStable(
      parted: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("_pid").agg(count(lit(1)).as("_pn"))
      .withColumn("_poff", coalesce(sum(col("_pn")).over(wOff), lit(0L)))
      .select("_pid", "_poff")
    val wLocal = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
    parted.join(broadcast(offsets), Seq("_pid"))
      .withColumn(rankCol, col("_poff") + row_number().over(wLocal))
      .drop("_pid", "_poff")
  }


  /** `ntile(k)` of 1-based global rank `i` over `n` rows, in closed form
    * (the first n mod k buckets get ⌈n/k⌉ rows, the rest ⌊n/k⌋ — the SQL
    * standard definition both engines implement). Pure integer
    * arithmetic; `ceil(a/b) = (a+b-1) div b` on positive operands.
    */
  private def ntileOfRank(i: String, n: String, k: Int): Column =
    expr(s"""CASE WHEN $i <= ($n % $k) * ($n div $k + 1)
             THEN ($i + ($n div $k)) div (($n div $k) + 1)
             ELSE ($n % $k) + ($i - ($n % $k) * (($n div $k) + 1)
                               + ($n div $k) - 1) div ($n div $k) END""")

  /** RFM segmentation: per customer, recency (days from last order to
    * the corpus max date), frequency (order count), monetary (exact
    * decimal spend), each cut into quintiles — the classic marketing
    * segmentation. The custkey tiebreak makes every quintile assignment
    * deterministic in both engines; recency ranks DESCENDING so
    * quintile 5 = most recent.
    *
    * Scale shape (r10 verdict task 4 — ONE pass instead of three): the
    * three metric streams STACK into a single (metric_id, sortable
    * value, custkey) frame — recency negated so every metric ranks
    * ascending, longs widened to double (exact: both < 2^53) — and ONE
    * [[withGlobalRank]] over (mi, mv, custkey) ranks all of them: metric
    * blocks are contiguous under the composite range partitioning, so
    * the within-metric rank is just `global − (mi−1)·n`. One sampling
    * job, one range shuffle of 3n slim rows, one pinned checkpoint
    * (same race-free discipline), then a custkey groupBy pivots ranks
    * AND the metric values back (recoverable exactly from `mv`, so the
    * original table is never re-joined). An unpartitioned `ntile(5)`
    * window would single-task-sort all customers, three times (the
    * round-9 verdict's scale finding); three separate global ranks cost
    * 3 checkpoints + 6 shuffles (the r10 shape, 2.4 s solo).
    */
  val qRfm = QueryDef(
    "q_rfm",
    (s, d) => {
      // Pin the per-customer aggregate ONCE: maxDay, nTot, and the
      // stacked stream below each consume it, and without the checkpoint
      // every consumer re-scans and re-aggregates the orders table (the
      // dominant fixed cost of the r10 shape).
      val per = QueryDef.table(s, d, "orders")
        .groupBy("o_custkey")
        .agg(max(to_date(col("o_orderdate"))).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("monetary"))
        .localCheckpoint(true)
      // max date and customer count in ONE scalar pass over the cache,
      // broadcast ONCE: `_n` rides the stacked rows through the range
      // shuffle (8 bytes/row) so no second scalar job is needed later
      val scalars = per.agg(max("last_order").as("max_day"),
        count(lit(1)).as("_n"))
      val stacked = per.crossJoin(broadcast(scalars))
        .withColumn("recency_days",
          datediff(col("max_day"), col("last_order")).cast("long"))
        .select(col("o_custkey"), col("_n"), explode(array(
          struct(lit(1).as("mi"),
            (-col("recency_days")).cast("double").as("mv")),
          struct(lit(2).as("mi"), col("frequency").cast("double").as("mv")),
          struct(lit(3).as("mi"), col("monetary").as("mv")))).as("s"))
        .select(col("s.mi").as("mi"), col("s.mv").as("mv"),
          col("o_custkey"), col("_n"))
      // The post-shuffle checkpoint stays NON-NEGOTIABLE: a tempting
      // "the input is checkpointed, so both branches resample the same
      // boundaries" argument was tried here and MEASURED WRONG — the
      // offsets and main branches plan separate (differently-pruned)
      // range exchanges, and their reservoir samples still diverged on
      // 113/1500 customers at 4 partitions, exactly the r10 race class.
      // Only a materialization BETWEEN the shuffle and its two consumers
      // pins one boundary set.
      val ranked = withGlobalRank(stacked, "_g",
        col("mi"), col("mv"), col("o_custkey"))
      ranked
        .withColumn("_r", col("_g") - (col("mi") - 1).cast("long") * col("_n"))
        .groupBy("o_custkey")
        .agg(
          max(when(col("mi") === 1, -col("mv"))).cast("long").as("recency_days"),
          max(when(col("mi") === 2, col("mv"))).cast("long").as("frequency"),
          max(when(col("mi") === 3, col("mv"))).as("monetary"),
          max(when(col("mi") === 1, col("_r"))).as("_ri"),
          max(when(col("mi") === 2, col("_r"))).as("_rf"),
          max(when(col("mi") === 3, col("_r"))).as("_rm"),
          max(col("_n")).as("_n"))
        .withColumn("r", ntileOfRank("_ri", "_n", 5).cast("long"))
        .withColumn("f", ntileOfRank("_rf", "_n", 5).cast("long"))
        .withColumn("m", ntileOfRank("_rm", "_n", 5).cast("long"))
        .select(col("o_custkey"), col("recency_days"), col("frequency"),
          col("monetary"), col("r"), col("f"), col("m"),
          concat(col("r"), col("f"), col("m")).as("rfm"))
        .orderBy("o_custkey")
    },
    Some("""WITH per AS (SELECT o_custkey,
              max(CAST(o_orderdate AS DATE)) AS last_order,
              count(*) AS frequency,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS monetary
            FROM orders GROUP BY 1),
            mx AS (SELECT max(last_order) AS max_day FROM per),
            r AS (SELECT o_custkey,
                    date_diff('day', last_order, max_day) AS recency_days,
                    frequency, monetary,
                    ntile(5) OVER (ORDER BY date_diff('day', last_order, max_day) DESC,
                      o_custkey) AS r,
                    ntile(5) OVER (ORDER BY frequency, o_custkey) AS f,
                    ntile(5) OVER (ORDER BY monetary, o_custkey) AS m
                  FROM per, mx)
            SELECT o_custkey, recency_days, frequency, monetary, r, f, m,
              CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS rfm
            FROM r ORDER BY o_custkey"""))

  /** Entry/exit profile: each user-day's FIRST and LAST event_type (by
    * the unique (ts, event_id) order), aggregated into a day-boundary
    * transition table — "how do sessions open and close". One argmin/
    * argmax aggregate per user-day (min_by/max_by over an orderable
    * struct — no window pass, so the heavy step is a single partial+
    * final aggregation), then a vocabulary²-bounded re-aggregation.
    * Cross-engine ordering runs at MICROSECOND granularity: DuckDB's
    * parquet reader TRUNCATES the ns timestamps to µs (verified against
    * the raw int64 values), so Spark orders by `ts div 1000` — identical
    * to DuckDB's µs — with the event_id tiebreak deciding equal-µs rows
    * the same way in both engines. DuckDB lacks arg_min over a composite
    * key, so the oracle replays the argmin/argmax as two row_number
    * windows.
    */
  val qEntryExit = QueryDef(
    "q_entry_exit",
    (s, d) => events(s, d).where(col("user_id").isNotNull)
      .withColumn("ts_us", expr("ts div 1000"))
      .groupBy(col("user_id"), tsEpochDay.as("day"))
      .agg(
        min_by(col("event_type"), struct(col("ts_us"), col("event_id"))).as("entry_type"),
        max_by(col("event_type"), struct(col("ts_us"), col("event_id"))).as("exit_type"),
        count(lit(1)).as("n"))
      .groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_events"))
      .orderBy("entry_type", "exit_type"),
    Some("""WITH o AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
              event_type,
              row_number() OVER (
                PARTITION BY user_id, epoch_ns(ts) // 86400000000000
                ORDER BY epoch_us(ts), event_id) AS rk_a,
              row_number() OVER (
                PARTITION BY user_id, epoch_ns(ts) // 86400000000000
                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rk_d
            FROM events WHERE user_id IS NOT NULL),
            s AS (SELECT user_id, day,
                    max(CASE WHEN rk_a = 1 THEN event_type END) AS entry_type,
                    max(CASE WHEN rk_d = 1 THEN event_type END) AS exit_type,
                    count(*) AS n
                  FROM o GROUP BY 1, 2)
            SELECT entry_type, exit_type, count(*) AS n_days,
              CAST(sum(n) AS BIGINT) AS n_events
            FROM s GROUP BY 1, 2 ORDER BY entry_type, exit_type"""))

  /** Inter-arrival gap percentiles per event_type: exact p50/p90/p99 of
    * the within-(user, type) consecutive-event gaps — the latency-style
    * distribution profile. The lag window shuffles once on its partition
    * key; percentiles ride the established percentile ↔ quantile_cont
    * (R-7 interpolation) parity over exact integer gaps. Gaps are in
    * MICROSECONDS (`ts div 1000` ↔ `epoch_us(ts)`): DuckDB's parquet
    * reader truncates the ns column to µs, so µs is the finest
    * granularity both engines share — ordering and values alike.
    */
  val qGapPercentiles = QueryDef(
    "q_gap_percentiles",
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_us"), col("event_id"))
      events(s, d).where(col("user_id").isNotNull)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .where(col("gap").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap, array(0.5, 0.9, 0.99))").as("ps"))
        .select(col("event_type"), col("n_gaps"),
          col("ps")(0).as("p50"), col("ps")(1).as("p90"), col("ps")(2).as("p99"))
        .orderBy("event_type")
    },
    Some("""WITH g AS (SELECT event_type,
              epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id, event_type
                ORDER BY epoch_us(ts), event_id) AS gap
            FROM events WHERE user_id IS NOT NULL),
            q AS (SELECT event_type, count(*) AS n_gaps,
                    quantile_cont(gap, [0.5, 0.9, 0.99]) AS ps
                  FROM g WHERE gap IS NOT NULL GROUP BY 1)
            SELECT event_type, n_gaps, ps[1] AS p50, ps[2] AS p90, ps[3] AS p99
            FROM q ORDER BY event_type"""))


  /** Population-stability-index drift of the value distribution between
    * the stream's two halves, per event_type
    * ([[graft.etl.Anomaly.psiDrift]], 10 equal-width bins over the
    * global range, Laplace-smoothed shares, pico-quantized integer PSI
    * sum — ln near 1.0 drifts a ulp between libm builds, so each term
    * floors to 10⁻¹² before the order-independent long sum). The oracle
    * replays binning, the (type × bin) grid densify, and the identical
    * quantization.
    */
  val qPsiDrift = QueryDef(
    "q_psi_drift",
    (s, d) => {
      val e = events(s, d).where(col("value").isNotNull)
        .withColumn("day", tsEpochDay)
      val pivot = e.agg(expr("(min(day) + max(day) + 1) div 2").as("_cut"))
      val withSnap = e.crossJoin(broadcast(pivot))
        .withColumn("_s", (col("day") >= col("_cut")).cast("int"))
      graft.etl.Anomaly.psiDrift(withSnap, "value", col("_s"),
          Seq("event_type"), bins = 10)
        .orderBy("event_type")
    },
    Some("""WITH d AS (SELECT event_type, value,
              epoch_ns(ts) // 86400000000000 AS day
            FROM events WHERE value IS NOT NULL),
            p AS (SELECT (min(day) + max(day) + 1) // 2 AS cut FROM d),
            b AS (SELECT min(value) AS lo, max(value) AS hi FROM d),
            binned AS (SELECT event_type,
                CASE WHEN day >= cut THEN 1 ELSE 0 END AS snap,
                CASE WHEN hi = lo THEN 0
                     ELSE CAST(least(floor((value - lo) / ((hi - lo) / 10.0)), 9) AS INT)
                END AS bin
              FROM d, p, b),
            counts AS (SELECT event_type, bin,
                sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS c0,
                sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS c1
              FROM binned GROUP BY 1, 2),
            grid AS (SELECT g.event_type, CAST(r.range AS INT) AS bin
                     FROM (SELECT DISTINCT event_type FROM d) g, range(10) r),
            dense AS (SELECT grid.event_type, grid.bin,
                coalesce(c0, 0) AS c0, coalesce(c1, 0) AS c1
              FROM grid LEFT JOIN counts
                ON counts.event_type = grid.event_type
               AND counts.bin = grid.bin),
            tot AS (SELECT event_type, CAST(sum(c0) AS BIGINT) AS n0,
                      CAST(sum(c1) AS BIGINT) AS n1
                    FROM dense GROUP BY 1),
            terms AS (SELECT dense.event_type, bin, n0, n1,
                (CAST(c0 + 1 AS DOUBLE) / CAST(n0 + 10 AS DOUBLE)
                 - CAST(c1 + 1 AS DOUBLE) / CAST(n1 + 10 AS DOUBLE))
                * ln((CAST(c0 + 1 AS DOUBLE) / CAST(n0 + 10 AS DOUBLE))
                     / (CAST(c1 + 1 AS DOUBLE) / CAST(n1 + 10 AS DOUBLE)))
                  AS term
              FROM dense JOIN tot USING (event_type))
            SELECT event_type, n0, n1,
              CAST(sum(CAST(floor(term * 1e12) AS BIGINT)) AS BIGINT) AS psi_q
            FROM terms GROUP BY event_type, n0, n1
            ORDER BY event_type"""))

  /** PSI drift against a FROZEN baseline ([[graft.etl.Anomaly
    * .psiDriftFrozen]] — the deployable monitoring shape behind the
    * r16 streaming twin): the stream's FIRST half is the immutable
    * reference (bins anchored to ITS [min,max]; later values outside
    * clamp to the edge bins), the second half is the monitored current
    * batch. Same smoothing + pico-quantization as [[qPsiDrift]]; the
    * oracle replays the frozen bounds, the clamped binning, and the
    * current-driven dim universe (reference counts left-joined, 0 when
    * a dim is current-only).
    */
  val qPsiDriftFrozen = QueryDef(
    "q_psi_drift_frozen",
    (s, d) => {
      val e = events(s, d).where(col("value").isNotNull)
        .withColumn("day", tsEpochDay)
      val pivot = e.agg(expr("(min(day) + max(day) + 1) div 2").as("_cut"))
      val halves = e.crossJoin(broadcast(pivot))
      graft.etl.Anomaly.psiDriftFrozen(
          halves.where(col("day") >= col("_cut")),
          halves.where(col("day") < col("_cut")),
          "value", Seq("event_type"), bins = 10)
        .orderBy("event_type")
    },
    Some("""WITH d AS (SELECT event_type, value,
              epoch_ns(ts) // 86400000000000 AS day
            FROM events WHERE value IS NOT NULL),
            p AS (SELECT (min(day) + max(day) + 1) // 2 AS cut FROM d),
            ref AS (SELECT event_type, value FROM d, p WHERE day < cut),
            cur AS (SELECT event_type, value FROM d, p WHERE day >= cut),
            b AS (SELECT CAST(min(value) AS DOUBLE) AS lo,
                         CAST(max(value) AS DOUBLE) AS hi FROM ref),
            rb AS (SELECT event_type,
                CASE WHEN hi = lo THEN 0
                     ELSE CAST(least(greatest(
                       floor((value - lo) / ((hi - lo) / 10.0)), 0), 9) AS INT)
                END AS bin
              FROM ref, b),
            cb AS (SELECT event_type,
                CASE WHEN hi = lo THEN 0
                     ELSE CAST(least(greatest(
                       floor((value - lo) / ((hi - lo) / 10.0)), 0), 9) AS INT)
                END AS bin
              FROM cur, b),
            rcounts AS (SELECT event_type, bin, count(*) AS c0
                        FROM rb GROUP BY 1, 2),
            ccounts AS (SELECT event_type, bin, count(*) AS c1
                        FROM cb GROUP BY 1, 2),
            grid AS (SELECT g.event_type, CAST(r.range AS INT) AS bin
                     FROM (SELECT DISTINCT event_type FROM cb) g, range(10) r),
            dense AS (SELECT grid.event_type, grid.bin,
                coalesce(c0, 0) AS c0, coalesce(c1, 0) AS c1
              FROM grid
              LEFT JOIN rcounts ON rcounts.event_type = grid.event_type
                               AND rcounts.bin = grid.bin
              LEFT JOIN ccounts ON ccounts.event_type = grid.event_type
                               AND ccounts.bin = grid.bin),
            tot AS (SELECT event_type, CAST(sum(c0) AS BIGINT) AS n0,
                      CAST(sum(c1) AS BIGINT) AS n1
                    FROM dense GROUP BY 1),
            terms AS (SELECT dense.event_type, bin, n0, n1,
                (CAST(c0 + 1 AS DOUBLE) / CAST(n0 + 10 AS DOUBLE)
                 - CAST(c1 + 1 AS DOUBLE) / CAST(n1 + 10 AS DOUBLE))
                * ln((CAST(c0 + 1 AS DOUBLE) / CAST(n0 + 10 AS DOUBLE))
                     / (CAST(c1 + 1 AS DOUBLE) / CAST(n1 + 10 AS DOUBLE)))
                  AS term
              FROM dense JOIN tot USING (event_type))
            SELECT event_type, n0, n1,
              CAST(sum(CAST(floor(term * 1e12) AS BIGINT)) AS BIGINT) AS psi_q
            FROM terms GROUP BY event_type, n0, n1
            ORDER BY event_type"""))

  val all: Seq[QueryDef] =
    Seq(qCidrMatch, qZorderKey, qEventTransitions, qBinEquidepth,
      qSessionPaths, qDriftReport, qPercentRank, qWeekdayProfile,
      qOutliersIqr, qAssocPairs, qHistEquiwidth, qCusumDaily,
      qActiveUsers7d, qStickiness, qNewVsReturning,
      qCountMin, qGini, qBenford, qStarRevenue, qParetoFront,
      qPricingSummary, qTopOrders, qLargeOrders, qShipDelay, qRfm,
      qEntryExit, qGapPercentiles, qPsiDrift, qPsiDriftFrozen)
}
