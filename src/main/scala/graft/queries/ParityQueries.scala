package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDef.table

/** Reference-parity operator queries over the driver testdata, one per row
  * of SURVEY.md §2's operator inventory. Each is idiomatic declarative
  * Spark — Catalyst handles pushdown/pruning/broadcast — with a DuckDB
  * oracle in ANSI SQL.
  *
  * Scale notes are attached per query where the plan shape matters at
  * 100 TB (broadcast vs shuffle join, shared window partitioning,
  * TakeOrderedAndProject for top-k).
  */
object ParityQueries {

  /** Events with `ts` as epoch-nanos longs (shared normalizer — see
    * [[QueryDef.eventsTable]]); all event-time math here is integer
    * arithmetic on those nanos, which makes ordering and gap semantics
    * bit-exact with the DuckDB oracle's nanosecond timestamps.
    */
  private def events(s: SparkSession, d: String): DataFrame =
    QueryDef.eventsTable(s, d)

  /** Per-user event ordering used by all sessionization queries: event time
    * (ns) with event_id as the deterministic tiebreak.
    */
  /** Per-user event-time window order. Ordered by µs-truncated ts
    * (`ts div 1000`) because DuckDB's parquet reader truncates ns→µs:
    * ordering by raw ns could diverge from every oracle's `ORDER BY ts,
    * event_id` for same-µs events. event_id makes the order total.
    */
  private val userOrder = Window.partitionBy("user_id")
    .orderBy(expr("ts div 1000"), col("event_id"))

  /** Whole-second epoch used for gap math — integer division of the nanos,
    * matching the oracle's `floor(epoch(ts))`.
    */
  private val tsSec: Column = expr("ts div 1000000000")

  /** Calendar day of the event (UTC). */
  private val tsDay: Column = to_date(timestamp_seconds(tsSec))

  /** Exact order-independent sum of a 2-decimal double column: summed as
    * DECIMAL (exact rational arithmetic, immune to fp summation order),
    * cast back to double. Without this, round(sum(double), n) can land on
    * a rounding boundary and differ from the oracle in the last digit —
    * observed at sf0.1 (one part in ~10^9 flipped a 4-decimal round).
    */
  private def exactSum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact mean built from the exact sum (identical operands on both
    * engines -> identical division -> identical rounding).
    */
  private def exactAvg(c: Column): Column = exactSum(c) / count(c)

  // --- S-family: scans -----------------------------------------------------

  val qScanParquet = QueryDef(
    "q_scan_parquet",
    (s, d) => events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id"),
    Some("""SELECT event_id, user_id, event_type, value
            FROM events ORDER BY event_id"""))

  /** CSV scan semantics under the gate (reference `src/pipeline.py:20`
    * reads its input CSV with pandas; the golden e2e covers the file
    * path, this covers the parser semantics cross-engine): a
    * deterministic CSV document — header row, RFC-4180 quoted fields
    * containing commas and DOUBLED quotes, empty-field nulls, int and
    * double columns — is rendered in-plan from the documents table,
    * parsed by the REAL Spark CSV scanner (header + schema inference;
    * `escape = "` selects RFC doubling, not backslash semantics), and
    * the parsed values are hash-compared against the oracle's direct
    * reconstruction of what a correct parse must yield. CR/LF and
    * backslashes are spaced out of the raw text on both sides so the
    * payload stays single-line and escape-neutral; quotes in the data
    * (plus an injected `p,"q" ` prefix) exercise the doubling path on
    * real content. The single-partition coalesce is a correctness-probe
    * artifact (header must be the first line of the Dataset[String]) —
    * the production CSV path reads files, where Spark handles headers
    * per-file.
    */
  val qScanCsv = QueryDef(
    "q_scan_csv",
    (s, d) => {
      import s.implicits._
      val raw = QueryDef.table(s, d, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat(lit("p,\"q\" "),
            regexp_replace(substring(col("text"), 1, 24),
              "[\\r\\n\\\\]", " ")).as("_txt"),
          (col("doc_id").cast("double") * lit(0.25)).as("_score"))
      val lines = raw.select(
        concat(
          col("doc_id").cast("string"), lit(","),
          lit("\""), regexp_replace(col("_txt"), "\"", "\"\""), lit("\""),
          lit(","),
          col("_score").cast("string"), lit(","),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(""))
            .otherwise(concat(lit("x"), col("doc_id")))).as("line"),
        lit(1).as("_ord"))
      val header = s.range(1)
        .select(lit("doc_id,txt,score,extra").as("line"), lit(0).as("_ord"))
      val ds = header.unionByName(lines)
        .orderBy(col("_ord"), col("line")).coalesce(1)
        .select("line").as[String]
      s.read
        .option("header", "true")
        .option("inferSchema", "true")
        .option("escape", "\"")
        .csv(ds)
        .orderBy("doc_id")
    },
    Some("""SELECT CAST(doc_id AS INTEGER) AS doc_id,
              'p,"q" ' || regexp_replace(substr(text, 1, 24),
                '[\r\n\\]', ' ', 'g') AS txt,
              CAST(doc_id AS DOUBLE) * 0.25 AS score,
              CASE WHEN doc_id % 3 = 0 THEN NULL
                   ELSE 'x' || CAST(doc_id AS VARCHAR) END AS extra
            FROM documents WHERE doc_id < 200 ORDER BY doc_id"""))

  /** JSONL (newline-delimited JSON) scan — THE interchange format of LLM
    * corpus pipelines (every public crawl dump, instruction set, and
    * eval suite ships as .jsonl). Semantics under the gate: schema
    * inference over heterogeneous rows (a field ABSENT on a third of the
    * rows infers as a nullable column), JSON string escaping round-trip
    * (quotes and backslashes in real document text), nested structs
    * (read back through a dotted path), arrays (surfaced via size), and
    * numeric widths (integer → bigint, exact-binary-fraction doubles).
    * The render side is `to_json(struct(...))` — null fields drop from
    * the serialized object, which is exactly what exercises the
    * absent-field inference on read. The oracle computes the same values
    * straight from the documents table, so any divergence in the
    * serialize→infer→parse loop fails the hash.
    */
  val qScanJsonl = QueryDef(
    "q_scan_jsonl",
    (s, d) => {
      import s.implicits._
      val raw = QueryDef.table(s, d, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat(lit("q\"\\ "),
            regexp_replace(substring(col("text"), 1, 24),
              "[\\r\\n\\\\]", " ")).as("txt"),
          (col("doc_id").cast("double") / lit(4.0)).as("score"),
          col("lang"))
      val ds = raw.select(to_json(struct(
          col("doc_id"), col("txt"), col("score"),
          when(pmod(col("doc_id"), lit(3)) =!= 0,
            concat(lit("x"), col("doc_id"))).as("extra"),
          array(col("lang"), lit("doc")).as("tags"),
          struct(col("lang").as("lang")).as("meta"))).as("line"))
        .as[String]
      s.read.json(ds)
        .select(col("doc_id"), col("txt"), col("score"), col("extra"),
          size(col("tags")).cast("long").as("n_tags"),
          col("meta.lang").as("lang"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              'q"\ ' || regexp_replace(substr(text, 1, 24),
                '[\r\n\\]', ' ', 'g') AS txt,
              CAST(doc_id AS DOUBLE) / 4.0 AS score,
              CASE WHEN doc_id % 3 = 0 THEN NULL
                   ELSE 'x' || CAST(doc_id AS VARCHAR) END AS extra,
              CAST(2 AS BIGINT) AS n_tags,
              lang
            FROM documents WHERE doc_id < 200 ORDER BY doc_id"""))

  /** Opaque binary-shard round-trip through Spark's `binaryFile` source
    * ([[graft.ext.CorpusIO.writeBinaryShards]]/`readBinaryShards`): one
    * deterministic payload file per document (PNG headers for `%3 ≠ 2`,
    * garbage otherwise), written by executors, listed back with glob
    * pruning, ids parsed from filenames, decoded by the pure-JVM image
    * decoder. The oracle recomputes format/dims/sizes straight from the
    * same derivation — so the gate pins the WHOLE file round-trip:
    * payload bytes, source `length` metadata, filename→id parse, and
    * decode, end to end.
    */
  val qScanBinary = QueryDef(
    "q_scan_binary",
    (s, d) => {
      val dir = ExtensionQueries.jsonlTempRoot + "/bin_" +
        Integer.toHexString(d.hashCode)
      val png = concat(
        lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        lpad(hex(pmod(col("doc_id"), lit(1920)) + 1), 8, "0"),
        lpad(hex(pmod(col("doc_id"), lit(1080)) + 1), 8, "0"),
        lit("0806000000DEADBEEF"),
        expr("repeat('00', CAST(doc_id % 5 AS INT))"),
        lit("0000000049454E44AE426082"))
      val garbage = concat(lit("00112233"), lpad(hex(col("doc_id")), 8, "0"))
      val payloads = table(s, d, "documents")
        .filter(col("doc_id") < 300)
        .select(col("doc_id"),
          unhex(when(pmod(col("doc_id"), lit(3)) =!= 2, png)
            .otherwise(garbage)).as("payload"))
      graft.ext.CorpusIO.writeBinaryShards(payloads, "doc_id", "payload", dir, "bin")
      val shards = graft.ext.CorpusIO.readBinaryShards(s, dir, "*.bin")
        .select(col("shard_id").cast("long").as("media_id"),
          col("length").as("shard_bytes"), col("content"))
      val feats = graft.ext.Multimodal.extractFeatures(s,
        shards.select(col("media_id"), lit("image").as("kind"),
          col("content").as("payload"))).toDF()
      feats.join(shards.select("media_id", "shard_bytes"), Seq("media_id"))
        .select("media_id", "format", "n_bytes", "shard_bytes", "width", "height")
        .orderBy("media_id")
    },
    Some("""WITH payload AS (
              SELECT doc_id,
                CASE WHEN doc_id % 3 <> 2 THEN
                  '89504E470D0A1A0A' || '0000000D' || '49484452'
                  || lpad(hex(doc_id % 1920 + 1), 8, '0')
                  || lpad(hex(doc_id % 1080 + 1), 8, '0')
                  || '0806000000DEADBEEF'
                  || repeat('00', CAST(doc_id % 5 AS INT))
                  || '0000000049454E44AE426082'
                ELSE '00112233' || lpad(hex(doc_id), 8, '0') END AS ph
              FROM documents WHERE doc_id < 300),
            bin AS (
              SELECT doc_id, hex(unhex(ph)) AS h,
                CAST(octet_length(unhex(ph)) AS BIGINT) AS n_bytes
              FROM payload)
            SELECT doc_id AS media_id,
              CASE WHEN substr(h, 1, 16) = '89504E470D0A1A0A' THEN 'png'
                   ELSE 'unknown' END AS format,
              n_bytes, n_bytes AS shard_bytes,
              CASE WHEN substr(h, 1, 16) = '89504E470D0A1A0A'
                THEN CAST(CAST('0x' || substr(h, 33, 8) AS BIGINT) AS INT)
                END AS width,
              CASE WHEN substr(h, 1, 16) = '89504E470D0A1A0A'
                THEN CAST(CAST('0x' || substr(h, 41, 8) AS BIGINT) AS INT)
                END AS height
            FROM bin ORDER BY media_id"""))

  /** ORC round-trip: write a typed document slice as ORC (the OTHER
    * columnar interchange format warehouse exports arrive in — strings,
    * longs, doubles, a date, an array), read it back through Spark's
    * vectorized ORC scan with a column-pruning projection, and gate the
    * values against the oracle computing them straight from the source
    * table. Pins type round-tripping and predicate/pruning semantics on
    * the ORC path the same way q_scan_jsonl pins the JSON path.
    */
  val qScanOrc = QueryDef(
    "q_scan_orc",
    (s, d) => {
      val dir = ExtensionQueries.jsonlTempRoot + "/orc_" +
        Integer.toHexString(d.hashCode)
      table(s, d, "documents")
        .filter(col("doc_id") < 300)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (col("n_chars").cast("double") / lit(4.0)).as("score"),
          to_date(lit("2026-01-01")).as("snap_date"),
          array(col("lang"), col("source")).as("tags"))
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .filter(col("n_chars") > 100)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("score"),
          col("snap_date"), size(col("tags")).cast("long").as("n_tags"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, n_chars,
              CAST(n_chars AS DOUBLE) / 4.0 AS score,
              DATE '2026-01-01' AS snap_date,
              CAST(2 AS BIGINT) AS n_tags
            FROM documents
            WHERE doc_id < 300 AND n_chars > 100
            ORDER BY doc_id"""))

  // --- F-family: filters (pushed into the parquet scan by Catalyst) -------

  val qFilterNotnull = QueryDef(
    "q_filter_notnull",
    (s, d) => events(s, d)
      .filter(col("props").isNotNull)
      .select("event_id").orderBy("event_id"),
    Some("SELECT event_id FROM events WHERE props IS NOT NULL ORDER BY event_id"))

  val qFilterTs = QueryDef(
    "q_filter_ts",
    (s, d) => events(s, d)
      // 2024-01-15T00:00:00Z in epoch nanos; whole-second boundary, so the
      // ns-vs-µs representations agree on membership.
      .filter(col("ts") >= lit(1705276800L * 1000000000L))
      .select("event_id").orderBy("event_id"),
    Some("""SELECT event_id FROM events
            WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id"""))

  val qFilterNeq = QueryDef(
    "q_filter_neq",
    (s, d) => events(s, d)
      .filter(col("event_type") =!= "error")
      .select("event_id").orderBy("event_id"),
    Some("SELECT event_id FROM events WHERE event_type <> 'error' ORDER BY event_id"))

  // --- P-family: projection / derived columns ------------------------------

  val qProject = QueryDef(
    "q_project",
    (s, d) => events(s, d)
      // raw product, no round(): both engines compute the identical IEEE
      // double, while their round() algorithms disagree on exact halves
      .select(col("event_id"), col("value"),
        (col("value") * 1.1).as("value_adj"))
      .orderBy("event_id"),
    Some("""SELECT event_id, value, value * 1.1 AS value_adj
            FROM events ORDER BY event_id"""))

  // --- D-family: deduplication ---------------------------------------------

  val qDedupFull = QueryDef(
    "q_dedup_full",
    (s, d) => events(s, d)
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type"),
    Some("""SELECT DISTINCT user_id, event_type
            FROM events ORDER BY user_id, event_type"""))

  /** Keep-LAST dedup: latest row per (user_id, event_type) under a total
    * order — the reference's keep-last-in-ingest-order (src/cleaning.py:51)
    * re-expressed on event-time with an explicit tiebreak, as a
    * `row_number` window rather than `dropDuplicates` (which keeps an
    * arbitrary row).
    */
  val qDedupKey = QueryDef(
    "q_dedup_key",
    (s, d) => {
      // µs-truncated ts (DuckDB's parquet read granularity); event_id
      // tiebreak keeps the winner identical on both engines.
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(expr("ts div 1000").desc, col("event_id").desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          tsSec.as("ts_sec"))
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, event_id,
              CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events) t
            WHERE rn = 1 ORDER BY user_id, event_type"""))

  // --- M-family: missing values / coercion ---------------------------------

  val qFillna = QueryDef(
    "q_fillna",
    (s, d) => events(s, d)
      .select(col("event_id"),
        coalesce(nullif(col("event_type"), lit("error")), lit("unknown"))
          .as("event_type_filled"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              coalesce(nullif(event_type, 'error'), 'unknown') AS event_type_filled
            FROM events ORDER BY event_id"""))

  val qTrimAll = QueryDef(
    "q_trim_all",
    (s, d) => events(s, d)
      .select(col("event_id"),
        trim(concat(lit("  "), col("event_type"), lit("\t "))).as("trimmed"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              trim(concat('  ', event_type, chr(9), ' ')) AS trimmed
            FROM events ORDER BY event_id"""))

  // --- N-family: normalization vocabulary ----------------------------------

  /** The reference's text-canonicalization kernel (lower, trim, separator
    * runs -> "_"; src/normalization.py:34-40) applied to a synthesized
    * dirty string.
    */
  val qNormText = QueryDef(
    "q_norm_text",
    (s, d) => events(s, d)
      .select(col("event_id"),
        regexp_replace(
          regexp_replace(
            lower(trim(concat(lit("  "), col("event_type"), lit(" - "), col("event_type")))),
            "[\\s\\-]+", "_"),
          "_+", "_").as("norm"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              regexp_replace(regexp_replace(
                lower(trim(concat('  ', event_type, ' - ', event_type))),
                '[\s\-]+', '_', 'g'), '_+', '_', 'g') AS norm
            FROM events ORDER BY event_id"""))

  /** Synonym map with pass-through fallback (src/normalization.py:56-75):
    * a `typedlit` map + `try_element_at` + `coalesce` — constant-folded,
    * codegen-friendly, no UDF.
    */
  val qMapStatus = QueryDef(
    "q_map_status",
    (s, d) => {
      val m = Map("error" -> "failure", "purchase" -> "success", "signup" -> "success")
      events(s, d)
        .select(col("event_id"),
          coalesce(try_element_at(typedlit(m), col("event_type")), col("event_type"))
            .as("status_class"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
              CASE WHEN event_type = 'error' THEN 'failure'
                   WHEN event_type IN ('purchase', 'signup') THEN 'success'
                   ELSE event_type END AS status_class
            FROM events ORDER BY event_id"""))

  /** Same mapping pattern feeding an aggregation (map + groupBy fuse into
    * one stage before the exchange).
    */
  val qMapSeverity = QueryDef(
    "q_map_severity",
    (s, d) => {
      val m = Map("error" -> "failure", "purchase" -> "success", "signup" -> "success")
      events(s, d)
        .select(coalesce(try_element_at(typedlit(m), col("event_type")), col("event_type"))
          .as("status_class"))
        .groupBy("status_class").agg(count(lit(1)).as("n"))
        .orderBy("status_class")
    },
    Some("""SELECT CASE WHEN event_type = 'error' THEN 'failure'
                        WHEN event_type IN ('purchase', 'signup') THEN 'success'
                        ELSE event_type END AS status_class,
                   count(*) AS n
            FROM events GROUP BY 1 ORDER BY status_class"""))

  /** Ordinal encode with NULL for unmapped values — chained `when` without
    * `otherwise` (src/feature_engineering.py:19-32).
    */
  val qSeverityScore = QueryDef(
    "q_severity_score",
    (s, d) => events(s, d)
      .select(col("event_id"),
        when(col("event_type") === "error", 4)
          .when(col("event_type") === "purchase", 2)
          .when(col("event_type") === "signup", 1)
          .as("score"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              CASE event_type WHEN 'error' THEN 4 WHEN 'purchase' THEN 2
                              WHEN 'signup' THEN 1 END AS score
            FROM events ORDER BY event_id"""))

  val qNormIp = QueryDef(
    "q_norm_ip",
    (s, d) => {
      val ipRaw = when(col("event_type") === "error", lit("  "))
        .otherwise(concat(lit("10.0.0."), col("user_id").cast("string")))
      events(s, d)
        .select(col("event_id"),
          when(trim(ipRaw) === "", "0.0.0.0").otherwise(trim(ipRaw)).as("ip"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
              CASE WHEN trim(ip_raw) = '' THEN '0.0.0.0' ELSE trim(ip_raw) END AS ip
            FROM (SELECT event_id,
                    CASE WHEN event_type = 'error' THEN '  '
                         ELSE concat('10.0.0.', CAST(user_id AS VARCHAR)) END AS ip_raw
                  FROM events) t
            ORDER BY event_id"""))

  // --- T-family: date/time --------------------------------------------------

  /** Round-trip parse at the pinned canonical format (SURVEY.md §2.6 T1):
    * format, reparse with `to_timestamp`, surface as epoch seconds.
    */
  val qParseTs = QueryDef(
    "q_parse_ts",
    (s, d) => events(s, d)
      .select(col("event_id"),
        unix_timestamp(
          to_timestamp(date_format(timestamp_seconds(tsSec), "yyyy-MM-dd HH:mm:ss"),
            "yyyy-MM-dd HH:mm:ss")).as("parsed_sec"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              CAST(floor(epoch(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
                '%Y-%m-%d %H:%M:%S'))) AS BIGINT) AS parsed_sec
            FROM events ORDER BY event_id"""))

  /** Lenient multi-format parse (SURVEY.md §2.6 T1 extension): mixed-format
    * timestamp strings — the reference's own fixture mixes 6 formats
    * (reference: data/raw_events.csv:2-41) — parsed through
    * [[graft.etl.Normalization.standardizeTimestamps]]'s `lenientFormats`
    * chain, first match wins, unparseable rows dropped. Strings are
    * synthesized deterministically (format chosen by event_id % 5, one
    * branch deliberately unparseable) so the DuckDB oracle can replay the
    * identical coalesce(try_strptime…) chain.
    */
  val qParseTsLenient = QueryDef(
    "q_parse_ts_lenient",
    (s, d) => {
      val t = timestamp_seconds(tsSec)
      val raw = events(s, d).select(
        col("event_id"),
        when(col("event_id") % 5 === 0, date_format(t, "yyyy-MM-dd HH:mm:ss"))
          .when(col("event_id") % 5 === 1, date_format(t, "dd-MM-yyyy HH:mm:ss"))
          .when(col("event_id") % 5 === 2, date_format(t, "yyyy/MM/dd HH:mm"))
          .when(col("event_id") % 5 === 3, date_format(t, "MM/dd/yyyy HH:mm:ss"))
          .otherwise(concat(lit("ts="), col("ts"))).as("timestamp"))
      graft.etl.Normalization.standardizeTimestamps(raw,
          lenientFormats = Seq("dd-MM-yyyy HH:mm:ss", "yyyy/MM/dd HH:mm",
            "MM/dd/yyyy HH:mm:ss"))
        .select(col("event_id"),
          unix_timestamp(col("timestamp")).as("parsed_sec"))
        .orderBy("event_id")
    },
    Some("""WITH base AS (
              SELECT event_id,
                CASE event_id % 5
                  WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
                  WHEN 1 THEN strftime(ts, '%d-%m-%Y %H:%M:%S')
                  WHEN 2 THEN strftime(ts, '%Y/%m/%d %H:%M')
                  WHEN 3 THEN strftime(ts, '%m/%d/%Y %H:%M:%S')
                  ELSE 'ts=' || CAST(epoch_ns(ts) AS VARCHAR) END AS raw
              FROM events),
            parsed AS (
              SELECT event_id, coalesce(
                try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
                try_strptime(raw, '%d-%m-%Y %H:%M:%S'),
                try_strptime(raw, '%Y/%m/%d %H:%M'),
                try_strptime(raw, '%m/%d/%Y %H:%M:%S')) AS p
              FROM base)
            SELECT event_id, CAST(floor(epoch(p)) AS BIGINT) AS parsed_sec
            FROM parsed WHERE p IS NOT NULL ORDER BY event_id"""))

  val qDateFloor = QueryDef(
    "q_date_floor",
    (s, d) => events(s, d)
      .groupBy(col("user_id"), tsDay.as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id", "day"),
    Some("""SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY user_id, CAST(ts AS DATE)
            ORDER BY user_id, day"""))

  /** Per-user consecutive-event gap in whole seconds (reference T3,
    * src/feature_engineering.py:74-77); NULL (not inf) marks the first
    * event per user.
    */
  val qTimeDelta = QueryDef(
    "q_time_delta",
    (s, d) => events(s, d)
      .select(col("event_id"),
        (tsSec - lag(tsSec, 1).over(userOrder)).as("gap_sec"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              CAST(floor(epoch(ts)) AS BIGINT)
                - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS gap_sec
            FROM events ORDER BY event_id"""))

  val qMinmaxTs = QueryDef(
    "q_minmax_ts",
    (s, d) => events(s, d)
      .agg(count(lit(1)).as("n"),
        min(tsSec).as("ts_min_sec"), max(tsSec).as("ts_max_sec")),
    Some("""SELECT count(*) AS n,
              min(CAST(floor(epoch(ts)) AS BIGINT)) AS ts_min_sec,
              max(CAST(floor(epoch(ts)) AS BIGINT)) AS ts_max_sec
            FROM events"""))

  // --- A-family: aggregations ----------------------------------------------

  /** Grouped count broadcast to every row — a window count over the shared
    * per-user partitioning, not a groupBy + join (reference A1).
    */
  val qCountOver = QueryDef(
    "q_count_over",
    (s, d) => events(s, d)
      .select(col("event_id"),
        count(col("event_id")).over(Window.partitionBy("user_id")).as("user_total"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              count(event_id) OVER (PARTITION BY user_id) AS user_total
            FROM events ORDER BY event_id"""))

  /** Two-level aggregation: daily counts per user, then the per-user mean
    * of those counts (reference A2). Both aggregations share the user_id
    * grouping so the second needs no extra exchange.
    */
  val qDailyAvg = QueryDef(
    "q_daily_avg",
    (s, d) => events(s, d)
      .groupBy(col("user_id"), tsDay.as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg((sum("n").cast("double") / count("n")).as("daily_avg"))
      .orderBy("user_id"),
    Some("""SELECT user_id, CAST(sum(n) AS DOUBLE) / count(n) AS daily_avg
            FROM (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
                  FROM events GROUP BY user_id, CAST(ts AS DATE)) t
            GROUP BY user_id ORDER BY user_id"""))

  val qGlobalAgg = QueryDef(
    "q_global_agg",
    (s, d) => table(s, d, "orders")
      .agg(count(lit(1)).as("n_rows"),
        exactSum(col("o_totalprice")).as("sum_price"),
        exactAvg(col("o_totalprice")).as("avg_price"),
        min(to_date(col("o_orderdate"))).as("min_date"),
        max(to_date(col("o_orderdate"))).as("max_date")),
    Some("""SELECT count(*) AS n_rows,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                / count(o_totalprice) AS avg_price,
              min(CAST(o_orderdate AS DATE)) AS min_date,
              max(CAST(o_orderdate AS DATE)) AS max_date
            FROM orders"""))

  /** Exact distinct counts (reference A5). At 100 TB the documented scale
    * variant is `approx_count_distinct` (HLL) — exact kept here because the
    * oracle is exact.
    */
  val qCountDistinct = QueryDef(
    "q_count_distinct",
    (s, d) => events(s, d)
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types")),
    Some("""SELECT count(DISTINCT user_id) AS n_users,
              count(DISTINCT event_type) AS n_types FROM events"""))

  /** Per-column null counts in ONE pass (reference A6) — a single
    * projection of conditional sums, not one job per column.
    */
  val qNullCounts = QueryDef(
    "q_null_counts",
    (s, d) => {
      val e = events(s, d)
      e.select(e.columns.toSeq.map(c =>
        sum(col(c).isNull.cast("long")).as(s"${c}_nulls")): _*)
    },
    Some("""SELECT count(*) - count(event_id) AS event_id_nulls,
              count(*) - count(ts) AS ts_nulls,
              count(*) - count(user_id) AS user_id_nulls,
              count(*) - count(event_type) AS event_type_nulls,
              count(*) - count(value) AS value_nulls,
              count(*) - count(props) AS props_nulls
            FROM events"""))

  /** Frequency top-k (reference A7): Catalyst rewrites orderBy+limit to
    * TakeOrderedAndProject — a distributed top-k, no global sort.
    * Deterministic secondary key on the value.
    */
  val qTopkValues = QueryDef(
    "q_topk_values",
    (s, d) => events(s, d)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type")).limit(5),
    Some("""SELECT event_type, count(*) AS n FROM events
            GROUP BY event_type ORDER BY n DESC, event_type LIMIT 5"""))

  /** Domain validation as set difference (reference src/cleaning.py:119-130). */
  val qDomainCheck = QueryDef(
    "q_domain_check",
    (s, d) => events(s, d)
      .select("event_type").distinct()
      .filter(!col("event_type").isin("click", "view", "purchase"))
      .orderBy("event_type"),
    Some("""SELECT DISTINCT event_type FROM events
            WHERE event_type NOT IN ('click', 'view', 'purchase')
            ORDER BY event_type"""))

  // --- J-family: joins ------------------------------------------------------

  /** Left join of a tiny per-user aggregate back onto events (reference J1).
    * The build side is <= |users| rows — Catalyst/AQE broadcasts it, so no
    * shuffle of the probe side.
    */
  val qJoinLeft = QueryDef(
    "q_join_left",
    (s, d) => {
      val e = events(s, d)
      val avgs = e.groupBy("user_id")
        .agg(exactAvg(col("value")).as("user_avg_value"))
      e.select("event_id", "user_id")
        .join(broadcast(avgs), Seq("user_id"), "left")
        .select("event_id", "user_id", "user_avg_value")
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id, e.user_id, u.user_avg_value
            FROM events e
            LEFT JOIN (SELECT user_id,
                         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                           / count(value) AS user_avg_value
                       FROM events GROUP BY user_id) u
              ON e.user_id = u.user_id
            ORDER BY e.event_id"""))

  /** Composite-key join (reference J2): per-(user, day) counts joined back
    * on both keys.
    */
  val qJoinComposite = QueryDef(
    "q_join_composite",
    (s, d) => {
      val e = events(s, d).withColumn("day", tsDay)
      val daily = e.groupBy("user_id", "day").agg(count(lit(1)).as("user_day_events"))
      e.join(broadcast(daily), Seq("user_id", "day"))
        .select("event_id", "user_day_events")
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id, d.user_day_events
            FROM events e
            JOIN (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS user_day_events
                  FROM events GROUP BY 1, 2) d
              ON e.user_id = d.user_id AND CAST(e.ts AS DATE) = d.day
            ORDER BY e.event_id"""))

  /** Multi-way inner equi-join over the star schema: orders ⋈ customer ⋈
    * nation. Dimension tables broadcast; the fact table never shuffles.
    */
  val qJoinInner = QueryDef(
    "q_join_inner",
    (s, d) => table(s, d, "orders")
      .join(broadcast(table(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("order_count"),
        exactSum(col("o_totalprice")).as("total_price"))
      .orderBy("n_name"),
    Some("""SELECT n_name, count(*) AS order_count,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  /** Semi join: customers that have at least one order — `left_semi`
    * (EXISTS) touches only the probe side's columns and short-circuits on
    * first match; no row multiplication, build side broadcastable.
    */
  val qJoinSemi = QueryDef(
    "q_join_semi",
    (s, d) => table(s, d, "customer")
      .join(table(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").orderBy("c_custkey"),
    Some("""SELECT c_custkey FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  /** Anti join: customers with no URGENT order — `left_anti` (NOT EXISTS)
    * against a filtered build side (every customer has SOME order in this
    * data, so the unfiltered anti set would be empty).
    */
  val qJoinAnti = QueryDef(
    "q_join_anti",
    (s, d) => table(s, d, "customer")
      .join(table(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey").orderBy("c_custkey"),
    Some("""SELECT c_custkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  /** FULL OUTER join — per-user-day 'click' vs 'error' volumes, keeping
    * user-days present on either side (the feature-table alignment shape:
    * neither side is authoritative). The aggregated sides make (user_id,
    * day) unique per side, so the joined key set is unique and the final
    * ORDER BY is total; NULL user_ids are filtered explicitly (NULL keys
    * never equi-match, which would otherwise emit order-ambiguous
    * half-rows). Spark's using-columns join coalesces the keys exactly
    * like the oracle's COALESCE.
    */
  val qJoinFull = QueryDef(
    "q_join_full",
    (s, d) => {
      val e = events(s, d).where(col("user_id").isNotNull)
        .withColumn("day", expr("ts div 86400000000000"))
      val a = e.where(col("event_type") === "click")
        .groupBy("user_id", "day").agg(count(lit(1)).as("n_click"))
      val b = e.where(col("event_type") === "error")
        .groupBy("user_id", "day").agg(count(lit(1)).as("n_err"))
      a.join(b, Seq("user_id", "day"), "full_outer")
        .select("user_id", "day", "n_click", "n_err")
        .orderBy("user_id", "day")
    },
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
              event_type FROM events WHERE user_id IS NOT NULL),
            a AS (SELECT user_id, day, count(*) AS n_click FROM e
                  WHERE event_type = 'click' GROUP BY 1, 2),
            b AS (SELECT user_id, day, count(*) AS n_err FROM e
                  WHERE event_type = 'error' GROUP BY 1, 2)
            SELECT COALESCE(a.user_id, b.user_id) AS user_id,
              COALESCE(a.day, b.day) AS day, n_click, n_err
            FROM a FULL OUTER JOIN b
              ON a.user_id = b.user_id AND a.day = b.day
            ORDER BY user_id, day"""))

  /** Backward as-of join ([[graft.operators.TemporalJoins.asofJoin]]): every
    * event picks up the latest "mark" at-or-before its event time for the
    * same user — the canonical feature-as-of-time join. Marks are a
    * deterministic event subset aggregated to one value per (user, ts) so
    * the as-of match is unique. DuckDB replays it with its native
    * ASOF LEFT JOIN — a bit-exact oracle for an operator Spark lacks.
    */
  val qAsofJoin = QueryDef(
    "q_asof_join",
    (s, d) => {
      val e = events(s, d).select("event_id", "user_id", "ts")
      val marks = events(s, d)
        .filter(col("event_id") % 10 === 0)
        .groupBy("user_id", "ts")
        .agg(min(col("value")).as("mark_value"))
      graft.operators.TemporalJoins.asofJoin(
          e, marks, key = "user_id", leftTime = "ts", rightTime = "ts")
        .select("event_id", "mark_value")
        .orderBy("event_id")
    },
    Some("""WITH marks AS (
              SELECT user_id, ts, min(value) AS mark_value FROM events
              WHERE event_id % 10 = 0 GROUP BY user_id, ts)
            SELECT e.event_id, m.mark_value
            FROM events e ASOF LEFT JOIN marks m
              ON e.user_id = m.user_id AND e.ts >= m.ts
            ORDER BY e.event_id"""))

  /** The same as-of query through the CUSTOM WHOLE-OPERATOR path
    * ([[graft.plans.AsOfJoinExec]] — LogicalPlan + SparkStrategy +
    * SparkPlan, §7.3 tier (c)): identical semantics to [[qAsofJoin]],
    * planned as a per-key sorted merge instead of a union + window. Sharing
    * the DuckDB ASOF LEFT JOIN oracle keeps both implementations pinned to
    * the same bit-exact answer.
    */
  val qAsofJoinExec = QueryDef(
    "q_asof_join_exec",
    (s, d) => {
      val e = events(s, d).select("event_id", "user_id", "ts")
      val marks = events(s, d)
        .filter(col("event_id") % 10 === 0)
        .groupBy("user_id", "ts")
        .agg(min(col("value")).as("mark_value"))
      graft.plans.AsOfJoin.asofJoinExec(
          e, marks, key = "user_id", leftTime = "ts", rightTime = "ts")
        .select("event_id", "mark_value")
        .orderBy("event_id")
    },
    Some("""WITH marks AS (
              SELECT user_id, ts, min(value) AS mark_value FROM events
              WHERE event_id % 10 = 0 GROUP BY user_id, ts)
            SELECT e.event_id, m.mark_value
            FROM events e ASOF LEFT JOIN marks m
              ON e.user_id = m.user_id AND e.ts >= m.ts
            ORDER BY e.event_id"""))

  /** Binned range join ([[graft.operators.TemporalJoins.rangeJoinBinned]]):
    * events against one-hour spans opened by every 100th event, same user,
    * point-in-interval. The oracle is the plain inequality join — small
    * enough at test scale, while the binned form is the one that survives
    * 100 TB (equi-join on (key, bin), no per-key cross product).
    */
  val qRangeJoin = QueryDef(
    "q_range_join",
    (s, d) => {
      val hourNs = 3600L * 1000000000L
      val e = events(s, d).select("event_id", "user_id", "ts")
      val spans = events(s, d)
        .filter(col("event_id") % 100 === 0)
        .select(col("event_id").as("span_id"), col("user_id"),
          col("ts").as("s"), (col("ts") + hourNs).as("e"))
      graft.operators.TemporalJoins.rangeJoinBinned(
          e, "ts", spans, "s", "e", key = "user_id", binWidth = hourNs)
        .select("event_id", "span_id")
        .orderBy("event_id", "span_id")
    },
    Some("""WITH spans AS (
              SELECT event_id AS span_id, user_id, ts AS s,
                     ts + INTERVAL 1 HOUR AS e
              FROM events WHERE event_id % 100 = 0)
            SELECT ev.event_id, sp.span_id
            FROM events ev JOIN spans sp
              ON ev.user_id = sp.user_id AND ev.ts >= sp.s AND ev.ts <= sp.e
            ORDER BY ev.event_id, sp.span_id"""))

  // --- set operations -------------------------------------------------------

  /** UNION / INTERSECT / EXCEPT in one query: nation keys vs customer
    * nation keys, tagged by which set operation produced the row.
    */
  val qSetOps = QueryDef(
    "q_set_ops",
    (s, d) => {
      val nations = table(s, d, "nation").select(col("n_nationkey").as("k"))
      val custNations = table(s, d, "customer")
        .select(col("c_nationkey").cast("int").as("k"))
      val union = nations.union(custNations).distinct()
        .withColumn("op", lit("union"))
      val intersect = nations.intersect(custNations)
        .withColumn("op", lit("intersect"))
      val except = nations.except(custNations)
        .withColumn("op", lit("except"))
      union.unionByName(intersect).unionByName(except)
        .orderBy("op", "k")
    },
    Some("""WITH n AS (SELECT n_nationkey AS k FROM nation),
                 c AS (SELECT CAST(c_nationkey AS INTEGER) AS k FROM customer)
            SELECT k, 'union' AS op FROM (SELECT k FROM n UNION SELECT k FROM c) u
            UNION ALL
            SELECT k, 'intersect' AS op FROM (SELECT k FROM n INTERSECT SELECT k FROM c) i
            UNION ALL
            SELECT k, 'except' AS op FROM (SELECT k FROM n EXCEPT SELECT k FROM c) e
            ORDER BY op, k"""))

  /** ROLLUP: subtotals + grand total over the Q1 grouping keys. The
    * rollup's NULL subtotal keys sort NULLS FIRST on both engines
    * (explicit in the oracle — DuckDB defaults to NULLS LAST).
    */
  val qRollup = QueryDef(
    "q_rollup",
    (s, d) => table(s, d, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), exactSum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Explicit GROUPING SETS — the general form behind rollup/cube: the
    * caller picks exactly which aggregation grains materialize (here both
    * single-dimension grains and the grand total, but NOT the full
    * cross). One scan, Expand-based like rollup; NULL grain markers sort
    * NULLS FIRST explicitly in the oracle.
    */
  val qGroupingSets = QueryDef(
    "q_grouping_sets",
    (s, d) => events(s, d)
      .withColumn("dow", (expr("ts div 86400000000000") + 4) % 7)
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("dow")), Seq()),
        col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("dow")),
    Some("""WITH e AS (SELECT event_type,
              ((epoch_ns(ts) // 86400000000000) + 4) % 7 AS dow FROM events)
            SELECT event_type, dow, count(*) AS n FROM e
            GROUP BY GROUPING SETS ((event_type), (dow), ())
            ORDER BY event_type NULLS FIRST, dow NULLS FIRST"""))

  /** Exact interpolated percentiles per group — profiling staple. Spark's
    * `percentile` and DuckDB's `quantile_cont` both use R-7 linear
    * interpolation over the sorted values, so the results hash-match
    * (verified bit-exact at all sfs). The at-scale variant is
    * `percentile_approx` (t-digest-style sketch), analogous to
    * q_approx_distinct's HLL.
    */
  val qPercentiles = QueryDef(
    "q_percentiles",
    (s, d) => events(s, d)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"),
        expr("percentile(value, 0.95)").as("p95"))
      .orderBy("event_type"),
    Some("""SELECT event_type, quantile_cont(value, 0.5) AS med,
              quantile_cont(value, 0.95) AS p95
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** The documented at-scale variant of A5: HyperLogLog approximate
    * distinct. Sketch values are engine-specific, so no SQL oracle —
    * accuracy vs the exact count is asserted in QueriesSpec (rows-only
    * driver check).
    */
  val qApproxDistinct = QueryDef(
    "q_approx_distinct",
    (s, d) => events(s, d)
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users")),
    None)

  /** The at-scale variant of q_percentiles: `percentile_approx` (a
    * Greenwald-Khanna-style mergeable quantile sketch — fixed memory per
    * group regardless of group size, partial+final merge like any
    * algebraic aggregate, vs exact percentile's full sort per group).
    * Sketch-ONLY on purpose: bundling the exact percentile here would make
    * the benched cost the full per-group sort the sketch exists to avoid.
    * Accuracy 100 (≈1% rank error) stays below the ~2k-row test groups so
    * the approximation path is genuinely exercised (at accuracy ≥ group
    * size the sketch degenerates to exact and the error test is vacuous).
    * Sketch results are engine-specific, so rows-only driver check;
    * QueriesSpec bounds the error against an independently computed exact
    * median.
    */
  val qApproxPercentiles = QueryDef(
    "q_approx_percentiles",
    (s, d) => events(s, d)
      .groupBy("event_type")
      .agg(expr("percentile_approx(value, 0.5, 100)").as("approx_med"))
      .orderBy("event_type"),
    None)

  /** A1's skew-safe escalation path ([[graft.etl.Skew.countOverSalted]]):
    * the two-phase salted aggregation must equal the plain window count
    * bit-for-bit — oracle-checked here against the window form, so the
    * mega-key mitigation can never drift from the semantics it replaces.
    */
  val qCountOverSalted = QueryDef(
    "q_count_over_salted",
    (s, d) => graft.etl.Skew.countOverSalted(
        events(s, d).select("event_id", "user_id"),
        key = "user_id", countCol = "event_id", out = "n")
      .select("event_id", "n")
      .orderBy("event_id"),
    Some("""SELECT event_id,
              count(event_id) OVER (PARTITION BY user_id) AS n
            FROM events ORDER BY event_id"""))

  // --- W-family: windows & sessionization ----------------------------------

  val qSort = QueryDef(
    "q_sort",
    (s, d) => events(s, d)
      .select("event_id", "user_id", "value")
      .orderBy(col("user_id"), col("value").desc, col("event_id")),
    Some("""SELECT event_id, user_id, value FROM events
            ORDER BY user_id, value DESC, event_id"""))

  val qLag = QueryDef(
    "q_lag",
    (s, d) => events(s, d)
      .select(col("event_id"), lag(col("value"), 1).over(userOrder).as("prev_value"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
            FROM events ORDER BY event_id"""))

  /** Rolling event-time aggregate: events per user in the trailing hour —
    * a RANGE frame over epoch seconds (frame specs beyond W3's running
    * total; the common rate-limiter / burst-detector shape).
    */
  val qRollingCount = QueryDef(
    "q_rolling_count",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(tsSec)
        .rangeBetween(-3600L, 0L)
      events(s, d)
        .select(col("event_id"), count(lit(1)).over(w).as("events_last_hour"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
              count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS events_last_hour
            FROM events ORDER BY event_id"""))

  /** Session id assignment (reference W3): strict `gap > 1800s` starts a
    * new session; NULL gap (first event per user) does too, so ids start
    * at 1. lag + running sum share one per-user sort — a single exchange.
    */
  private def withSessionId(e: DataFrame): DataFrame = {
    val gap = tsSec - lag(tsSec, 1).over(userOrder)
    e.withColumn("session_id",
      sum((gap.isNull || gap > 1800).cast("long"))
        .over(userOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private val sessionIdSql =
    """SELECT *, CAST(SUM(CASE WHEN gap_sec IS NULL OR gap_sec > 1800 THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       FROM (SELECT event_id, user_id, ts,
               CAST(floor(epoch(ts)) AS BIGINT)
                 - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS gap_sec
             FROM events) g"""

  val qSessionId = QueryDef(
    "q_session_id",
    (s, d) => withSessionId(events(s, d))
      .select("event_id", "user_id", "session_id")
      .orderBy("event_id"),
    Some(s"""SELECT event_id, user_id, session_id
             FROM ($sessionIdSql) t ORDER BY event_id"""))

  /** Per-session multi-aggregate (reference A3 + T4). */
  val qSessionAgg = QueryDef(
    "q_session_agg",
    (s, d) => withSessionId(events(s, d))
      .groupBy("user_id", "session_id")
      .agg(count(col("event_id")).as("session_event_count"),
        min(tsSec).as("session_start_sec"),
        (max(tsSec) - min(tsSec)).as("session_duration_sec"))
      .orderBy("user_id", "session_id"),
    Some(s"""SELECT user_id, session_id,
               count(event_id) AS session_event_count,
               min(CAST(floor(epoch(ts)) AS BIGINT)) AS session_start_sec,
               max(CAST(floor(epoch(ts)) AS BIGINT))
                 - min(CAST(floor(epoch(ts)) AS BIGINT)) AS session_duration_sec
             FROM ($sessionIdSql) t
             GROUP BY user_id, session_id ORDER BY user_id, session_id"""))

  /** The full sessionization composite (reference W4 = W2+W3+A3+J2):
    * per-row session id plus its session's stats joined back on the
    * composite key.
    */
  val qSessionize = QueryDef(
    "q_sessionize",
    (s, d) => {
      // Per-session stats as window aggregates — one (user, session)
      // partitioning instead of groupBy + join-back (which would recompute
      // the session-id plan for the build side).
      val wSess = Window.partitionBy("user_id", "session_id")
      withSessionId(events(s, d))
        .withColumn("session_event_count", count(col("event_id")).over(wSess))
        .withColumn("session_duration_sec",
          max(tsSec).over(wSess) - min(tsSec).over(wSess))
        .select("event_id", "user_id", "session_id",
          "session_event_count", "session_duration_sec")
        .orderBy("event_id")
    },
    Some(s"""SELECT t.event_id, t.user_id, t.session_id,
               st.session_event_count, st.session_duration_sec
             FROM ($sessionIdSql) t
             JOIN (SELECT user_id, session_id,
                     count(event_id) AS session_event_count,
                     max(CAST(floor(epoch(ts)) AS BIGINT))
                       - min(CAST(floor(epoch(ts)) AS BIGINT)) AS session_duration_sec
                   FROM ($sessionIdSql) s2
                   GROUP BY user_id, session_id) st
               ON t.user_id = st.user_id AND t.session_id = st.session_id
             ORDER BY t.event_id"""))

  // --- flagship ------------------------------------------------------------

  /** TPC-H Q1-style pricing summary on lineitem — the flagship aggregate:
    * partial+final hash aggregation, all expressions codegen'd, scan prunes
    * to the 7 referenced columns.
    */
  val q1Agg = QueryDef(
    "q1_agg",
    (s, d) => table(s, d, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        exactAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                AS sum_disc_price,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                / count(l_quantity) AS avg_qty,
              CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                / count(l_discount) AS avg_disc,
              count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  // --- reshaping & semi-structured -----------------------------------------

  /** Pivot (long→wide): per-day event counts, one column per event type.
    * The pivot VALUES are explicit — without them Spark runs a planning-time
    * `collect(distinct event_type)` over the corpus (an extra full scan at
    * 100 TB) and the output schema becomes data-dependent, which no
    * downstream contract can pin. With explicit values the plan is a
    * (day, event_type) count with MAP-SIDE partial aggregation feeding a
    * day-keyed pivot aggregate — the corpus reduces to ~|days×types| rows
    * before the second exchange, so the pivot itself is trivial at any
    * scale. Missing (day, type) cells are 0, matching the oracle's FILTER
    * counts.
    */
  val qPivot = QueryDef(
    "q_pivot",
    (s, d) => events(s, d)
      .withColumn("day", tsDay)
      .groupBy("day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
      .orderBy("day"),
    Some("""SELECT CAST(ts AS DATE) AS day,
              count(*) FILTER (event_type = 'click') AS click,
              count(*) FILTER (event_type = 'error') AS error,
              count(*) FILTER (event_type = 'purchase') AS purchase,
              count(*) FILTER (event_type = 'signup') AS signup,
              count(*) FILTER (event_type = 'view') AS view
            FROM events GROUP BY CAST(ts AS DATE) ORDER BY day"""))

  /** Unpivot (wide→long): per-type value statistics melted to
    * (event_type, stat, stat_value) rows — the inverse reshape, Spark's
    * native `unpivot` (codegen'd Expand, row-local, zero extra shuffles
    * beyond the one aggregation). The mean rides the exact decimal-sum
    * path so the melted doubles hash-match the oracle bit-for-bit.
    */
  val qUnpivot = QueryDef(
    "q_unpivot",
    (s, d) => events(s, d)
      .groupBy("event_type")
      .agg(min("value").as("min_value"), exactAvg(col("value")).as("avg_value"),
        max("value").as("max_value"))
      .unpivot(Array(col("event_type")),
        Array(col("min_value"), col("avg_value"), col("max_value")),
        "stat", "stat_value")
      .orderBy("event_type", "stat"),
    Some("""WITH s AS (SELECT event_type, min(value) AS min_value,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)
                    AS avg_value,
                  max(value) AS max_value
                FROM events GROUP BY event_type)
            SELECT event_type, stat, stat_value FROM (
              SELECT event_type, 'min_value' AS stat, min_value AS stat_value FROM s
              UNION ALL
              SELECT event_type, 'avg_value' AS stat, avg_value FROM s
              UNION ALL
              SELECT event_type, 'max_value' AS stat, max_value FROM s) t
            ORDER BY event_type, stat"""))

  /** CUBE over (event_type, day): all four grouping-set combinations in one
    * pass — Expand multiplies rows 4× BEFORE the single exchange (map-side
    * partial aggregation still applies per grouping set). `grouping()`
    * flags distinguish "NULL because subtotal" from a genuine NULL group,
    * surfaced as int on both engines.
    */
  val qCube = QueryDef(
    "q_cube",
    (s, d) => events(s, d)
      .withColumn("day", tsDay)
      .cube("event_type", "day")
      .agg(count(lit(1)).as("n"),
        grouping(col("event_type")).cast("int").as("g_type"),
        grouping(col("day")).cast("int").as("g_day"))
      .orderBy(col("event_type"), col("day")),
    Some("""SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
              CAST(GROUPING(event_type) AS INT) AS g_type,
              CAST(GROUPING(CAST(ts AS DATE)) AS INT) AS g_day
            FROM events
            GROUP BY CUBE (event_type, CAST(ts AS DATE))
            ORDER BY event_type NULLS FIRST, day NULLS FIRST"""))

  /** The ranking-window family (reference §2.10 widened): rank /
    * dense_rank / percent_rank / cume_dist over an ORDER WITH TIES
    * (event_type within user — tie-stable functions emit one value per
    * tie group, deterministic under ties), plus ntile over the UNIQUE
    * (ts, event_id) order — ntile splits tie groups by physical row
    * order, so determinism requires a total order. Both windows share the
    * user_id partitioning: ONE exchange, two sorts.
    */
  val qRankFamily = QueryDef(
    "q_rank_family",
    (s, d) => {
      val wTie = Window.partitionBy("user_id").orderBy("event_type")
      events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          rank().over(wTie).as("rk"),
          dense_rank().over(wTie).as("drk"),
          round(percent_rank().over(wTie), 6).as("prk"),
          round(cume_dist().over(wTie), 6).as("cd"),
          ntile(4).over(userOrder).as("quartile"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type,
              rank() OVER w AS rk,
              dense_rank() OVER w AS drk,
              round(percent_rank() OVER w, 6) AS prk,
              round(cume_dist() OVER w, 6) AS cd,
              ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS quartile
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY event_type NULLS FIRST)
            ORDER BY event_id"""))

  /** Forward fill (time-series gap repair): carry the last non-NULL
    * observation forward within each user's timeline — `last(...,
    * ignoreNulls)` over a running ROWS frame, the standard Spark ffill
    * idiom (one window, no self-join, no driver state). NULLs are planted
    * deterministically (event_id % 7) so both the fill and pass-through
    * paths are oracle-exercised; leading NULLs (nothing to carry) stay
    * NULL.
    */
  val qFfill = QueryDef(
    "q_ffill",
    (s, d) => events(s, d)
      .withColumn("v_sparse",
        when(pmod(col("event_id"), lit(7)) === 0, lit(null))
          .otherwise(col("value")))
      .withColumn("v_filled",
        last(col("v_sparse"), ignoreNulls = true)
          .over(userOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("event_id", "user_id", "v_sparse", "v_filled")
      .orderBy("event_id"),
    Some("""SELECT event_id, user_id, v_sparse,
              last_value(v_sparse IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
            FROM (SELECT *,
                    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
                      AS v_sparse
                  FROM events) t
            ORDER BY event_id"""))

  /** SCD-2 style state timeline: each event opens an interval
    * [valid_from, valid_to) closed by the user's NEXT event — the
    * warehouse pattern for "what was this entity's state at time t".
    * One lead() over the shared user window; the open (current) interval
    * carries NULL valid_to and an is_current flag.
    */
  val qScd2 = QueryDef(
    "q_scd2",
    (s, d) => events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsSec.as("valid_from"),
        lead(tsSec, 1).over(userOrder).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("event_id"),
    Some("""SELECT event_id, user_id, event_type,
              CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
              lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
              lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                AS is_current
            FROM events ORDER BY event_id"""))

  /** Semi-structured JSON extraction from the raw `props` payload — both
    * production shapes: `get_json_object` (per-path lazy extraction) and
    * `from_json` with a PINNED schema (one parse per row, typed struct
    * out — the 100 TB shape: schema inference over JSON is a second full
    * scan, and per-path extraction re-parses the payload per path).
    * Malformed JSON yields NULL in both, never a failed task.
    */
  val qJsonExtract = QueryDef(
    "q_json_extract",
    (s, d) => events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_lazy"),
        from_json(col("props"), "k BIGINT", Map.empty[String, String])
          .getField("k").as("k_typed"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_lazy,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
            FROM events ORDER BY event_id"""))

  // --- event analytics: funnel, cohort, anomaly -----------------------------

  /** Ordered funnel: how many users progressed view → click → purchase,
    * each stage STRICTLY after the previous one (first qualifying event
    * per stage). Three user-keyed aggregations that all share the
    * user_id partitioning; per-user stage tables are one row per user, so
    * the stage joins are cheap and AQE broadcasts them when small. Stage
    * counts are engine-exact integers.
    */
  val qFunnel = QueryDef(
    "q_funnel",
    (s, d) => {
      val e = events(s, d).select("user_id", "event_type", "ts")
      val s1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id").where(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id").where(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      s1.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("1_view"))
        .unionByName(
          s2.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("2_click")))
        .unionByName(
          s3.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("3_purchase")))
        .select("stage", "n_users")
        .orderBy("stage")
    },
    Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
                 s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e
                        JOIN s1 USING (user_id)
                        WHERE event_type = 'click' AND ts > t1
                        GROUP BY e.user_id),
                 s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e
                        JOIN s2 USING (user_id)
                        WHERE event_type = 'purchase' AND ts > t2
                        GROUP BY e.user_id)
            SELECT stage, n_users FROM (
              SELECT '1_view' AS stage, count(*) AS n_users FROM s1
              UNION ALL SELECT '2_click', count(*) FROM s2
              UNION ALL SELECT '3_purchase', count(*) FROM s3) t
            ORDER BY stage"""))

  /** Cohort retention: users cohorted by their FIRST active day, activity
    * counted per (cohort day, day offset) — the retention triangle. The
    * per-user first-day table is one row per user (user-keyed agg shared
    * with everything else user-partitioned), then one distinct-count over
    * the joined events.
    */
  val qCohortRetention = QueryDef(
    "q_cohort_retention",
    (s, d) => {
      val e = events(s, d).withColumn("day", tsDay)
      val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
      e.join(first, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort_day", "day_offset")
    },
    Some("""WITH first AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
                           FROM events GROUP BY user_id)
            SELECT f.cohort_day,
              CAST(CAST(e.ts AS DATE) - f.cohort_day AS INT) AS day_offset,
              count(DISTINCT e.user_id) AS active_users
            FROM events e JOIN first f USING (user_id)
            GROUP BY f.cohort_day, day_offset
            ORDER BY f.cohort_day, day_offset"""))

  /** Robust anomaly gate ([[graft.etl.Anomaly]]): median/MAD outlier
    * detection per event_type — the distribution-free alternative to
    * z-scores (mean/stddev are
    * themselves corrupted by the outliers they're meant to find). Exact
    * R-7 medians on both engines; the threshold is the standard
    * 3σ-equivalent 3·1.4826·MAD. Two aggregation passes over the corpus
    * (med, then MAD of deviations) with the one-row-per-type tables
    * broadcast back — no window over the corpus, no driver-side data.
    */
  val qAnomalyMad = QueryDef(
    "q_anomaly_mad",
    (s, d) => {
      val e = events(s, d)
      val thr = graft.etl.Anomaly.madThresholds(e, "event_type", "value")
      graft.etl.Anomaly.flagOutliers(e, thr, "event_type", "value")
        .groupBy("event_type")
        .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
          sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    },
    Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                         FROM events GROUP BY event_type),
                 dev AS (SELECT e.event_type, m.med,
                           abs(e.value - m.med) AS absdev
                         FROM events e JOIN med m USING (event_type)),
                 mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad
                         FROM dev GROUP BY event_type)
            SELECT d.event_type, max(d.med) AS med, max(a.mad) AS mad,
              count(*) FILTER (d.absdev > 3.0 * 1.4826 * a.mad)
                AS n_outliers
            FROM dev d JOIN mad a USING (event_type)
            GROUP BY d.event_type ORDER BY d.event_type"""))

  /** Keyed upsert ([[graft.operators.Upsert]]): MERGE semantics as a plain
    * relational plan — a deterministic change set (every 10th order
    * repriced + restatused, every 1000th re-keyed as an insert) merged
    * into the base; updated rows replace, inserts append, the rest pass
    * through. Update keys broadcast into the anti join, so the base never
    * shuffles.
    */
  val qUpsert = QueryDef(
    "q_upsert",
    (s, d) => {
      val base = table(s, d, "orders")
      val updates = base.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
      val inserts = base.filter(pmod(col("o_orderkey"), lit(1000)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
      graft.operators.Upsert.upsert(
          base, updates.unionByName(inserts), "o_orderkey")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), to_date(col("o_orderdate")).as("o_date"),
          col("o_orderpriority"))
        .orderBy("o_orderkey")
    },
    Some("""WITH updates AS (
              SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                o_totalprice + 1.0 AS o_totalprice, o_orderdate,
                o_orderpriority
              FROM orders WHERE o_orderkey % 10 = 0
              UNION ALL
              SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
                o_totalprice, o_orderdate, o_orderpriority
              FROM orders WHERE o_orderkey % 1000 = 0)
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
              CAST(o_orderdate AS DATE) AS o_date, o_orderpriority
            FROM (
              SELECT * FROM updates
              UNION ALL
              SELECT * FROM orders b
              WHERE NOT EXISTS (SELECT 1 FROM updates u
                                WHERE u.o_orderkey = b.o_orderkey)) t
            ORDER BY o_orderkey"""))

  /** The serving-table data-skipping path end-to-end
    * ([[graft.operators.ManifestTable]]): commit a full batch with
    * per-file min/max stats, upsert a delta, COMPACT with stats + range
    * layout (the OPTIMIZE-style clustering that makes envelopes narrow),
    * then read a selective key range through [[ManifestTable
    * .scanWithPredicate]] — files whose [min,max] cannot intersect the
    * range are never opened. The oracle replays the upsert-then-filter
    * semantics straight from the source table, so a pruning bug that
    * drops or resurrects rows breaks the hash. Fresh temp table per
    * invocation (bench reruns must not stack versions).
    */
  val qManifestPrune = QueryDef(
    "q_manifest_prune",
    (s, d) => {
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(ExtensionQueries.jsonlTempRoot),
        "mprune_").toString + "/table"
      new java.io.File(dir).mkdirs()
      val M = graft.operators.ManifestTable
      val base = table(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      M.commit(
        base.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
          .repartitionByRange(8, col("o_orderkey")),
        dir, batchId = 0L, statsCols = Seq("o_orderkey"))
      M.commitDelta(
        base.filter(pmod(col("o_orderkey"), lit(5)) === 0)
          .withColumn("o_orderstatus", lit("D"))
          .withColumn("o_totalprice", col("o_totalprice") + lit(1.0)),
        dir, batchId = 1L)
      M.compact(s, dir, "o_orderkey", batchId = 2L,
        statsCols = Seq("o_orderkey"), layout = Seq("o_orderkey"),
        layoutFiles = 8)
      M.scanWithPredicate(s, dir, "o_orderkey",
          lower = Some(100L), upper = Some(2500L)).get
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
              CASE WHEN o_orderkey % 5 = 0 THEN 'D'
                   ELSE o_orderstatus END AS o_orderstatus,
              CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                   ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE (o_orderkey % 3 <> 0 OR o_orderkey % 5 = 0)
              AND o_orderkey BETWEEN 100 AND 2500
            ORDER BY o_orderkey"""))

  /** Second-moment statistics — variance, stddev, correlation, and the
    * least-squares slope of json k on value — per event_type, built from
    * EXACT decimal power sums rather than the built-in double aggregates
    * (`var_samp`/`corr` accumulate in doubles, so their results depend on
    * partition-merge order and can't hash-match a replaying engine). The
    * recipe: 2-decimal-exact casts, decimal Σx/Σx²/Σxy (order-independent
    * exact rationals), each cast to double ONCE, then an identical double
    * expression tree on both engines — every operand and operation
    * matches bit-for-bit, so the doubles do too. One aggregation, one
    * exchange; the moment combine is map-side partial like any sum.
    */
  val qStatsMoments = QueryDef(
    "q_stats_moments",
    (s, d) => {
      val e = events(s, d)
        .withColumn("x", col("value").cast("decimal(18,2)"))
        .withColumn("y",
          get_json_object(col("props"), "$.k").cast("decimal(18,2)"))
      val m = e.groupBy("event_type")
        .agg(count(lit(1)).as("n0"),
          sum(col("x")).as("sx0"), sum(col("y")).as("sy0"),
          sum(col("x") * col("x")).as("sxx0"),
          sum(col("y") * col("y")).as("syy0"),
          sum(col("x") * col("y")).as("sxy0"))
      val n = col("n0").cast("double")
      val sx = col("sx0").cast("double"); val sy = col("sy0").cast("double")
      val sxx = col("sxx0").cast("double"); val syy = col("syy0").cast("double")
      val sxy = col("sxy0").cast("double")
      val dx = n * sxx - sx * sx
      val dy = n * syy - sy * sy
      val cov = n * sxy - sx * sy
      m.select(col("event_type"), col("n0").as("n"),
          (dx / (n * (n - 1))).as("var_x"),
          sqrt(dx / (n * (n - 1))).as("stddev_x"),
          (cov / sqrt(dx * dy)).as("corr_xy"),
          (cov / dx).as("slope_yx"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, n,
              (n * sxx - sx * sx) / (n * (n - 1)) AS var_x,
              sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS stddev_x,
              (n * sxy - sx * sy)
                / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_xy,
              (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_yx
            FROM (
              SELECT event_type, count(*) AS n,
                CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                CAST(sum(x * x) AS DOUBLE) AS sxx,
                CAST(sum(y * y) AS DOUBLE) AS syy,
                CAST(sum(x * y) AS DOUBLE) AS sxy
              FROM (SELECT event_type,
                      CAST(CAST(value AS VARCHAR) AS DECIMAL(18,2)) AS x,
                      CAST(json_extract_string(props, '$.k')
                           AS DECIMAL(18,2)) AS y
                    FROM events) raw
              GROUP BY event_type) t
            ORDER BY event_type"""))

  /** Per-group top-k: the 3 highest-value events per type via a ranking
    * window cut at k — compiles with a WindowGroupLimit below the
    * exchange (PlanSpec-pinned), so each map task keeps only its local
    * top 3 per group BEFORE shuffling: the 100 TB-safe top-k shape, vs a
    * full per-group sort.
    */
  val qTopkPerGroup = QueryDef(
    "q_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("value").desc, col("event_id"))
      events(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("event_type", "rk", "event_id", "value")
        .orderBy("event_type", "rk")
    },
    Some("""SELECT event_type, rk, event_id, value FROM (
              SELECT event_type, event_id, value,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY value DESC NULLS LAST, event_id) AS rk
              FROM events) t
            WHERE rk <= 3 ORDER BY event_type, rk"""))

  /** Column profiler — the data-quality report a pipeline runs before
    * trusting a new feed: per column, row count, NULL count, and exact
    * distinct count, as one tidy (column, n_rows, n_null, n_distinct)
    * table. ONE scan: multiple count-distincts in a single aggregate
    * compile to an Expand (row multiplies by #distinct-aggs BEFORE the
    * exchange, with partial aggregation per branch) — at 100 TB swap
    * exact distincts for approx_count_distinct and the Expand disappears;
    * the output contract is unchanged.
    */
  val qProfile = QueryDef(
    "q_profile",
    (s, d) => {
      val e = events(s, d)
      val cols = Seq("event_id", "user_id", "event_type", "value", "props")
      val aggs = count(lit(1)).as("_n") +:
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
          countDistinct(col(c)).as(s"_dist_$c")))
      val wide = e.agg(aggs.head, aggs.tail: _*)
      val long = cols.map(c =>
        wide.select(lit(c).as("column_name"), col("_n").as("n_rows"),
          col(s"_null_$c").as("n_null"), col(s"_dist_$c").as("n_distinct")))
        .reduce(_ unionByName _)
      long.orderBy("column_name")
    },
    Some("""WITH w AS (SELECT count(*) AS n,
              CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
              count(DISTINCT event_id) AS dist_event_id,
              CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
              count(DISTINCT user_id) AS dist_user_id,
              CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
              count(DISTINCT event_type) AS dist_event_type,
              CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
              count(DISTINCT value) AS dist_value,
              CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
              count(DISTINCT props) AS dist_props
            FROM events)
            SELECT column_name, n_rows, n_null, n_distinct FROM (
              SELECT 'event_id' AS column_name, n AS n_rows,
                null_event_id AS n_null, dist_event_id AS n_distinct FROM w
              UNION ALL SELECT 'user_id', n, null_user_id, dist_user_id FROM w
              UNION ALL SELECT 'event_type', n, null_event_type, dist_event_type FROM w
              UNION ALL SELECT 'value', n, null_value, dist_value FROM w
              UNION ALL SELECT 'props', n, null_props, dist_props FROM w) t
            ORDER BY column_name"""))

  val all: Seq[QueryDef] = Seq(
    q1Agg, qScanParquet, qScanCsv, qScanJsonl, qScanBinary, qScanOrc,
    qFilterNotnull, qFilterTs, qFilterNeq,
    qProject,
    qDedupFull, qDedupKey, qFillna, qTrimAll, qNormText, qMapStatus,
    qMapSeverity, qSeverityScore, qNormIp, qParseTs, qParseTsLenient,
    qDateFloor, qTimeDelta,
    qMinmaxTs, qCountOver, qDailyAvg, qGlobalAgg, qCountDistinct, qNullCounts,
    qTopkValues, qDomainCheck, qJoinLeft, qJoinComposite, qJoinInner,
    qJoinSemi, qJoinAnti, qJoinFull, qAsofJoin, qAsofJoinExec, qRangeJoin,
    qSetOps, qRollup, qGroupingSets, qPercentiles, qApproxDistinct,
    qApproxPercentiles, qCountOverSalted, qSort,
    qLag, qRollingCount, qSessionId, qSessionAgg, qSessionize,
    qPivot, qUnpivot, qCube, qJsonExtract,
    qRankFamily, qFfill, qScd2,
    qFunnel, qCohortRetention, qAnomalyMad, qUpsert, qManifestPrune,
    qStatsMoments, qTopkPerGroup, qProfile)
}
