package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Pipeline, PipelineConfig}
import QueryDef.table

/** The flagship end-to-end query: the ENTIRE reference pipeline — dirty
  * input -> missing-value handling -> keep-last dedup -> timestamp parse ->
  * categorical normalization -> severity score, per-user counts, daily
  * baseline, sessionization — hash-matched against a DuckDB oracle that
  * replays the same semantics in ANSI SQL.
  *
  * The dirty input is synthesized DETERMINISTICALLY from the events table
  * (same rules in both dialects): mixed-case/padded categoricals, synonym
  * storms, blank severities, a non-canonical timestamp format on every
  * (event_id % 7 == 3) row (dropped by the parse), injected full-row
  * duplicates (% 13) and key duplicates with conflicting payloads (% 19,
  * where keep-last-by-ingest-order decides the winner).
  */
object PipelineQuery {

  private def synthRaw(s: SparkSession, d: String): DataFrame = {
    val e = QueryDef.eventsTable(s, d)
    val base = e.select(
      col("event_id"),
      (col("event_id") * 2).as("_ingest_order"),
      when(col("event_id") % 7 === 3, lit("17-12-2025 10:00:00"))
        .otherwise(date_format(timestamp_seconds(expr("ts div 1000000000")),
          "yyyy-MM-dd HH:mm:ss")).as("timestamp"),
      concat(lit("User-"), col("user_id").cast("string")).as("user_id"),
      when(col("event_id") % 3 === 0, upper(col("event_type")))
        .when(col("event_id") % 3 === 1, concat(col("event_type"), lit("  ")))
        .otherwise(concat(lit(" "), col("event_type"))).as("event_type"),
      when(col("event_id") % 5 === 0, "ok")
        .when(col("event_id") % 5 === 1, "FAILED")
        .when(col("event_id") % 5 === 2, "denied ")
        .when(col("event_id") % 5 === 3, "")
        .otherwise("Success").as("status"),
      when(col("event_id") % 6 === 0, "informational")
        .when(col("event_id") % 6 === 1, "WARN")
        .when(col("event_id") % 6 === 2, "crit")
        .when(col("event_id") % 6 === 3, "")
        .when(col("event_id") % 6 === 4, "High")
        .otherwise("notice").as("severity"),
      when(col("event_id") % 11 === 0, lit(""))
        .otherwise(concat(lit("10.0."), col("user_id").cast("string"))).as("source_ip"))

    // Duplicate injection in ONE pass (no self-unions — the events scan
    // runs once): every row emits itself; (% 19 == 7) rows additionally
    // emit a key-duplicate with a conflicting status later in ingest order
    // (keep-last must pick it); (% 13 == 0) rows emit an exact full-row
    // duplicate (removed by the full-row dedup).
    val copy = struct(
      (col("event_id") * 2 + 1).as("_ingest_order"),
      when(col("event_id") % 19 === 7, lit("Denied")).otherwise(col("status")).as("status"))
    val original = struct(col("_ingest_order"), col("status"))
    base
      .withColumn("_copy", explode(
        when(col("event_id") % 19 === 7 ||
          (col("event_id") % 13 === 0), array(original, copy))
          .otherwise(array(original))))
      .withColumn("_ingest_order", col("_copy._ingest_order"))
      .withColumn("status", col("_copy.status"))
      .drop("_copy")
  }

  val qE2ePipeline = QueryDef(
    "q_e2e_pipeline",
    (s, d) => {
      // sortOutput=false: the query applies its own deterministic ORDER BY
      // below, so the pipeline's file-order sort would be a redundant
      // global exchange.
      val out = Pipeline.transform(synthRaw(s, d),
        PipelineConfig(input = "", output = "", sessionGapMinutes = 30,
          sortOutput = false))
      out.select(
        col("event_id"),
        unix_timestamp(col("timestamp")).as("ts_sec"),
        col("user_id"), col("event_type"), col("status"),
        col("severity"), col("source_ip"), col("severity_score"),
        col("user_event_count_total"),
        col("user_daily_avg_events"),
        col("session_id"), col("session_event_count"),
        col("session_duration_seconds"))
        .orderBy("user_id", "ts_sec", "event_id")
    },
    Some("""WITH base AS (
        SELECT event_id,
          event_id * 2 AS ingest,
          CASE WHEN event_id % 7 = 3 THEN '17-12-2025 10:00:00'
               ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS ts_raw,
          'User-' || CAST(user_id AS VARCHAR) AS user_raw,
          CASE WHEN event_id % 3 = 0 THEN upper(event_type)
               WHEN event_id % 3 = 1 THEN event_type || '  '
               ELSE ' ' || event_type END AS etype_raw,
          CASE event_id % 5 WHEN 0 THEN 'ok' WHEN 1 THEN 'FAILED'
               WHEN 2 THEN 'denied ' WHEN 3 THEN '' ELSE 'Success' END AS status_raw,
          CASE event_id % 6 WHEN 0 THEN 'informational' WHEN 1 THEN 'WARN'
               WHEN 2 THEN 'crit' WHEN 3 THEN '' WHEN 4 THEN 'High'
               ELSE 'notice' END AS sev_raw,
          CASE WHEN event_id % 11 = 0 THEN ''
               ELSE '10.0.' || CAST(user_id AS VARCHAR) END AS ip_raw
        FROM events),
      raw AS (
        SELECT * FROM base
        UNION ALL
        SELECT event_id, event_id * 2 + 1, ts_raw, user_raw, etype_raw,
               'Denied', sev_raw, ip_raw
        FROM base WHERE event_id % 19 = 7
        UNION ALL
        SELECT event_id, event_id * 2 + 1, ts_raw, user_raw, etype_raw,
               status_raw, sev_raw, ip_raw
        FROM base WHERE event_id % 13 = 0 AND event_id % 19 <> 7),
      trimmed AS (
        SELECT event_id, ingest, trim(ts_raw) AS ts_raw, trim(user_raw) AS user_raw,
               trim(etype_raw) AS etype_raw, trim(status_raw) AS status_raw,
               trim(sev_raw) AS sev_raw, trim(ip_raw) AS ip_raw
        FROM raw),
      d1 AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (
            PARTITION BY event_id, ts_raw, user_raw, etype_raw, status_raw,
                         sev_raw, ip_raw
            ORDER BY ingest DESC) AS rn
          FROM trimmed) t WHERE rn = 1),
      d2 AS (
        SELECT * FROM (
          SELECT event_id, ingest, ts_raw, user_raw, etype_raw, status_raw,
                 sev_raw, ip_raw,
                 row_number() OVER (PARTITION BY event_id ORDER BY ingest DESC) AS rn2
          FROM d1) t WHERE rn2 = 1),
      parsed AS (
        SELECT event_id, ingest,
               try_strptime(ts_raw, '%Y-%m-%d %H:%M:%S') AS ts,
               user_raw, etype_raw, status_raw, sev_raw, ip_raw
        FROM d2
        WHERE try_strptime(ts_raw, '%Y-%m-%d %H:%M:%S') IS NOT NULL),
      norm AS (
        SELECT event_id, ingest, ts,
          regexp_replace(regexp_replace(lower(trim(user_raw)),
            '[\s\-]+', '_', 'g'), '_+', '_', 'g') AS user_id,
          regexp_replace(regexp_replace(lower(trim(etype_raw)),
            '[\s\-]+', '_', 'g'), '_+', '_', 'g') AS event_type,
          CASE regexp_replace(regexp_replace(lower(trim(status_raw)),
                 '[\s\-]+', '_', 'g'), '_+', '_', 'g')
            WHEN 'ok' THEN 'success' WHEN 'success' THEN 'success'
            WHEN 'failed' THEN 'failure' WHEN 'denied' THEN 'failure'
            WHEN '' THEN 'unknown'
            ELSE regexp_replace(regexp_replace(lower(trim(status_raw)),
                   '[\s\-]+', '_', 'g'), '_+', '_', 'g') END AS status,
          CASE regexp_replace(regexp_replace(lower(trim(sev_raw)),
                 '[\s\-]+', '_', 'g'), '_+', '_', 'g')
            WHEN 'informational' THEN 'info' WHEN 'warn' THEN 'medium'
            WHEN 'crit' THEN 'critical' WHEN 'high' THEN 'high'
            WHEN 'notice' THEN 'low' WHEN '' THEN 'unknown'
            ELSE regexp_replace(regexp_replace(lower(trim(sev_raw)),
                   '[\s\-]+', '_', 'g'), '_+', '_', 'g') END AS severity,
          CASE WHEN ip_raw = '' THEN '0.0.0.0' ELSE ip_raw END AS source_ip
        FROM parsed),
      scored AS (
        SELECT *,
          CAST(CASE severity WHEN 'info' THEN 0 WHEN 'low' THEN 1
               WHEN 'medium' THEN 2 WHEN 'high' THEN 3
               WHEN 'critical' THEN 4 END AS DOUBLE) AS severity_score,
          count(event_id) OVER (PARTITION BY user_id) AS user_event_count_total
        FROM norm),
      daily AS (
        SELECT user_id,
          CAST(count(*) AS DOUBLE) / count(DISTINCT CAST(ts AS DATE))
            AS user_daily_avg_events
        FROM norm GROUP BY user_id),
      gaps AS (
        SELECT *, CAST(floor(epoch(ts)) AS BIGINT)
            - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, ingest) AS gap
        FROM scored),
      sess AS (
        SELECT *, CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY ts, ingest
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_id
        FROM gaps),
      stats AS (
        SELECT user_id, session_id, count(event_id) AS session_event_count,
          CAST(max(floor(epoch(ts))) - min(floor(epoch(ts))) AS DOUBLE)
            AS session_duration_seconds
        FROM sess GROUP BY 1, 2)
      SELECT s.event_id, CAST(floor(epoch(s.ts)) AS BIGINT) AS ts_sec,
        s.user_id, s.event_type, s.status, s.severity, s.source_ip,
        s.severity_score, s.user_event_count_total,
        d.user_daily_avg_events,
        s.session_id, st.session_event_count, st.session_duration_seconds
      FROM sess s
      JOIN daily d ON s.user_id = d.user_id
      JOIN stats st ON s.user_id = st.user_id AND s.session_id = st.session_id
      ORDER BY s.user_id, ts_sec, s.event_id"""))

  /** Apples-to-apples throughput benchmark at the baseline's scale: the
    * full pipeline over a security-schema synthesis of LINEITEM (~600k
    * rows at sf0.1 — the row count BASELINE.md measures the reference at,
    * where it runs 20.5 s single-threaded). Rows-only correctness check
    * (the hash-matched variant is q_e2e_pipeline); this entry exists so
    * BENCH reports a directly comparable number.
    *
    * Output has FEWER rows than the input scan: the synthesized
    * `event_id = l_orderkey*10 + l_linenumber` collides because testdata
    * lineitem contains duplicate (l_orderkey, l_linenumber) pairs (44,930
    * distinct ids over 58,824 rows at sf0.01), and keep-last dedup
    * correctly collapses each id to one survivor. PipelineSpec pins
    * output rows == distinct surviving event_ids.
    */
  val qE2eThroughput = QueryDef(
    "q_e2e_throughput",
    (s, d) => {
      val li = table(s, d, "lineitem")
      val raw = li.select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("event_id"),
        monotonically_increasing_id().as("_ingest_order"),
        when(col("l_orderkey") % 50 === 0, lit("not a timestamp"))
          .otherwise(date_format(
            col("l_shipdate") + expr("make_interval(0,0,0,0,0,0, l_orderkey % 86399)"),
            "yyyy-MM-dd HH:mm:ss")).as("timestamp"),
        concat(lit("User-"), pmod(col("l_suppkey"), lit(500)).cast("string")).as("user_id"),
        when(col("l_returnflag") === "A", "Log-In")
          .when(col("l_returnflag") === "N", "file access ")
          .otherwise(" LOG OUT").as("event_type"),
        when(col("l_linestatus") === "O", "ok").otherwise("FAILED").as("status"),
        when(pmod(col("l_partkey"), lit(6)) === 0, "informational")
          .when(pmod(col("l_partkey"), lit(6)) === 1, "WARN")
          .when(pmod(col("l_partkey"), lit(6)) === 2, "crit")
          .when(pmod(col("l_partkey"), lit(6)) === 3, "")
          .when(pmod(col("l_partkey"), lit(6)) === 4, "High")
          .otherwise("notice").as("severity"),
        concat(lit("10.1."), pmod(col("l_suppkey"), lit(255)).cast("string")).as("source_ip"))
      Pipeline.transform(raw,
        PipelineConfig(input = "", output = "", sessionGapMinutes = 30,
          sortOutput = false))
        .select("event_id", "user_id", "session_id", "session_event_count")
    },
    None)

  val all: Seq[QueryDef] = Seq(qE2ePipeline, qE2eThroughput)
}
