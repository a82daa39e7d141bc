package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.etl.{Cleaning, Features, Normalization}

/** Micro-fixture unit tests for the ETL kernels (FIXTURES.md §3). */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("status/severity synonym maps: synonyms, blanks, unmapped pass-through") {
    val df = Seq(
      ("1", "ok"), ("2", "FAILED"), ("3", "denied "), ("4", ""),
      ("5", "weird"), ("6", "Passed"), ("7", "unauthorized"))
      .toDF("event_id", "status")
    val out = Normalization.normalizeCategoricals(df)
      .select("event_id", "status").as[(String, String)].collect().toMap
    assert(out("1") === "success")
    assert(out("2") === "failure")
    assert(out("3") === "failure")
    assert(out("4") === "unknown")
    assert(out("5") === "weird") // unmapped passes through canonicalized
    assert(out("6") === "success")
    assert(out("7") === "failure")

    val sev = Seq(("1", "informational"), ("2", "WARN "), ("3", "crit"),
      ("4", "severe"), ("5", "notice"), ("6", "bogus"), ("7", " "))
      .toDF("event_id", "severity")
    val sevOut = Normalization.normalizeCategoricals(sev)
      .select("event_id", "severity").as[(String, String)].collect().toMap
    assert(sevOut === Map("1" -> "info", "2" -> "medium", "3" -> "critical",
      "4" -> "high", "5" -> "low", "6" -> "bogus", "7" -> "unknown"))
  }

  test("text canonicalization: case, whitespace and hyphen runs collapse") {
    val df = Seq(("1", "  File -  Access "), ("2", "log-in"), ("3", "A  B--C"))
      .toDF("event_id", "event_type")
    val out = Normalization.normalizeCategoricals(df)
      .select("event_id", "event_type").as[(String, String)].collect().toMap
    assert(out === Map("1" -> "file_access", "2" -> "log_in", "3" -> "a_b_c"))
  }

  test("timestamp parse: only canonical format survives, others coerce to null and drop") {
    val df = Seq(
      ("1", "2025-12-17 08:00:00"),
      ("2", "2025-12-17T08:10:00Z"),
      ("3", "12/17/2025 08:20:00"),
      ("4", "invalid"),
      ("5", "2025-12-17 23:59:59"))
      .toDF("event_id", "timestamp")
    val kept = Normalization.standardizeTimestamps(df)
      .select("event_id").as[String].collect().toSet
    assert(kept === Set("1", "5"))

    val lenient = Normalization.standardizeTimestamps(df,
      lenientFormats = Seq("yyyy-MM-dd'T'HH:mm:ssX", "MM/dd/yyyy HH:mm:ss"))
      .select("event_id").as[String].collect().toSet
    assert(lenient === Set("1", "2", "3", "5"))
  }

  test("session boundary is strict: gap == threshold does NOT start a new session") {
    // gaps of 1799s, 1800s, 1801s with the default 30-minute threshold
    val base = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val df = Seq(
      (1L, at(0), "u"), (2L, at(1799), "u"), (3L, at(1799 + 1800), "u"),
      (4L, at(1799 + 1800 + 1801), "u"))
      .toDF("event_id", "timestamp", "user_id")
    val out = Features.addSessionFeatures(df, gapMinutes = 30)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out(1L) === 1L)
    assert(out(2L) === 1L) // 1799 < 1800
    assert(out(3L) === 1L) // exactly 1800 is NOT > 1800
    assert(out(4L) === 2L) // 1801 > 1800 starts session 2
  }

  test("single-event user: session_id=1, count=1, duration=0.0") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2025-01-01 10:00:00"), "solo"))
      .toDF("event_id", "timestamp", "user_id")
    val r = Features.addSessionFeatures(df).collect()(0)
    assert(r.getAs[Long]("session_id") === 1L)
    assert(r.getAs[Long]("session_event_count") === 1L)
    assert(r.getAs[Double]("session_duration_seconds") === 0.0)
  }

  test("keep-last dedup honors ingest order, key dedup runs after full-row dedup") {
    val df = Seq(
      (10L, "first payload", 0L),
      (10L, "second payload", 1L),  // same key, later ingest -> kept
      (11L, "same", 2L),
      (11L, "same", 3L))            // exact full-row dup (modulo order col)
      .toDF("event_id", "payload", "_ingest_order")
    val out = Cleaning.removeDuplicates(df)
      .select("event_id", "payload", "_ingest_order")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((10L, "second payload", 1L), (11L, "same", 3L)))
  }

  test("fill-before-dedup: rows differing only by a NULL become duplicates after fill") {
    val df = Seq(
      (1L, "2025-01-01 00:00:00", "alice", "login", Some("ok"), "low", "1.1.1.1", 0L),
      (1L, "2025-01-01 00:00:00", "alice", "login", None, "low", "1.1.1.1", 1L))
      .toDF("event_id", "timestamp", "user_id", "event_type", "status",
        "severity", "source_ip", "_ingest_order")
    // After fill, row 2's status becomes "unknown" != "ok" -> NOT a full dup,
    // but key-dedup on event_id still keeps only the LAST ingest.
    val out = df.transform(Cleaning.handleMissingValues)
      .transform(Cleaning.removeDuplicates)
    assert(out.count() === 1)
    assert(out.select("status").as[String].collect()(0) === "unknown")
  }

  test("severity score: ordinal encode, unmapped -> NULL") {
    val df = Seq(("1", "info"), ("2", "critical"), ("3", "unknown"), ("4", "bogus"))
      .toDF("event_id", "severity")
    val out = Features.addSeverityScore(df)
      .select("event_id", "severity_score").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("1") === Some(0.0))
    assert(out("2") === Some(4.0))
    assert(out("3") === None)
    assert(out("4") === None)
  }

  test("user activity baseline: mean of per-day counts") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2025-01-01 10:00:00"), "u"),
      (2L, java.sql.Timestamp.valueOf("2025-01-01 11:00:00"), "u"),
      (3L, java.sql.Timestamp.valueOf("2025-01-02 10:00:00"), "u"),
      (4L, java.sql.Timestamp.valueOf("2025-01-03 10:00:00"), "v"))
      .toDF("event_id", "timestamp", "user_id")
    val out = Features.addUserActivityBaseline(df)
      .select("user_id", "user_daily_avg_events").distinct()
      .as[(String, Double)].collect().toMap
    assert(out("u") === 1.5) // days: 2 events, 1 event -> mean 1.5
    assert(out("v") === 1.0)
  }

  test("activity baseline: all-NULL-timestamp user gets NaN, not an ANSI divide error") {
    // reachable with standardizeTimestamps(dropInvalid = false); without
    // the explicit 0-days branch, ANSI mode throws DIVIDE_BY_ZERO here
    val df = Seq(
      (1L, Option.empty[java.sql.Timestamp], "ghost"),
      (2L, Some(java.sql.Timestamp.valueOf("2025-01-01 10:00:00")), "u"))
      .toDF("event_id", "timestamp", "user_id")
    val out = Features.addUserActivityBaseline(df)
      .select("user_id", "user_daily_avg_events").distinct()
      .as[(String, Double)].collect().toMap
    assert(out("ghost").isNaN)
    assert(out("u") === 1.0)
  }

  test("session features refuse a non-timestamp column loudly") {
    val df = Seq((1L, "2025-01-01 00:00:00", "u"))
      .toDF("event_id", "timestamp", "user_id") // timestamp is a STRING
    val e = intercept[IllegalArgumentException] {
      Features.addSessionFeatures(df)
    }
    assert(e.getMessage.contains("TimestampType"))
  }

  test("transform works on inputs without _ingest_order") {
    val df = Seq(
      (1L, "2025-01-01 10:00:00", "u", "login", "ok", "low", "1.1.1.1"),
      (2L, "2025-01-01 10:05:00", "u", "logout", "ok", "low", "1.1.1.1"))
      .toDF("event_id", "timestamp", "user_id", "event_type", "status",
        "severity", "source_ip")
    val out = Pipeline.transform(df, PipelineConfig(input = "", output = ""))
    assert(out.count() === 2)
    assert(!out.columns.contains("_ingest_order"))
  }

  test("CLI parser reports a missing flag value instead of crashing") {
    val e = intercept[IllegalArgumentException] {
      Main.parseArgs(Array("--input"))
    }
    assert(e.getMessage.contains("--input requires a value"))
  }

  test("salted count matches the window even with NULL keys") {
    import graft.etl.Skew
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, Some("u")), (2L, None), (3L, None), (4L, Some("v")))
      .toDF("event_id", "user_id")
    val windowed = df.withColumn("n",
      count(col("event_id")).over(Window.partitionBy("user_id")))
      .select("event_id", "n").as[(Long, Long)].collect().toMap
    val salted = Skew.countOverSalted(df, "user_id", "event_id", "n")
      .select("event_id", "n").as[(Long, Long)].collect().toMap
    assert(salted === windowed) // NULL-key rows count 2, not 0
  }

  test("required-column validation raises with the missing columns named") {
    val e = intercept[IllegalArgumentException] {
      Cleaning.validateRequiredColumns(Seq((1L, "x")).toDF("event_id", "user_id"))
    }
    assert(e.getMessage.contains("timestamp"))
    assert(e.getMessage.contains("severity"))
  }
}
