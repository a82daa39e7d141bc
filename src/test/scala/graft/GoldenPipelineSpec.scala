package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-file e2e: run the full pipeline on the reference's adversarial
  * 40-row fixture and compare typed values against the committed golden
  * output. The golden file was generated with `--drop-unknown-severity` and
  * `--session-gap-minutes >= 45` (empirically verified — SURVEY.md §2.14),
  * so the test passes gap=60 and the severity drop.
  */
class GoldenPipelineSpec extends SparkSpec {

  private def resource(name: String): String =
    getClass.getResource(s"/$name").getPath

  /** Canonical typed row: (event_id, epochSec, user, etype, status, sev, ip,
    * sevScore, total, dailyAvg, sessionId, sessionCount, sessionDur).
    */
  private def canonical(df: DataFrame): Seq[Seq[Any]] = {
    df.select(
      col("event_id").cast("double"),
      col("timestamp").cast("timestamp").cast("long"),
      col("user_id").cast("string"),
      col("event_type").cast("string"),
      col("status").cast("string"),
      col("severity").cast("string"),
      col("source_ip").cast("string"),
      col("severity_score").cast("double"),
      col("user_event_count_total").cast("long"),
      col("user_daily_avg_events").cast("double"),
      col("session_id").cast("long"),
      col("session_event_count").cast("long"),
      col("session_duration_seconds").cast("double"))
      .collect().toSeq.map(_.toSeq)
  }

  test("pipeline reproduces the reference golden output (gap=60, drop unknown severity)") {
    val outDir = Files.createTempDirectory("graft-golden").toString + "/out"
    Pipeline.run(spark, PipelineConfig(
      input = resource("raw_events.csv"),
      output = outDir,
      sessionGapMinutes = 60,
      dropUnknownSeverity = true,
      validateMode = "strict"))

    val produced = spark.read.option("header", "true")
      .option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ssxxx")
      .csv(outDir)
    val golden = spark.read.option("header", "true")
      .option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ssxxx")
      .csv(resource("processed_events.csv"))

    assert(produced.columns.toSeq === golden.columns.toSeq)

    val got = canonical(produced)
    val want = canonical(golden)
    assert(got.length === want.length, s"row count ${got.length} != ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g === w, s"row $i differs:\n  got  $g\n  want $w")
    }
  }

  test("default flags (gap=30, keep unknown severity) match a rerun-of-reference snapshot") {
    // processed_events_gap30_defaults.csv was produced by running the
    // reference itself with documented defaults (SURVEY.md §5.2.1 case 2);
    // the committed golden needs non-default flags (§2.14 caveat).
    val outDir = Files.createTempDirectory("graft-golden30").toString + "/out"
    Pipeline.run(spark, PipelineConfig(
      input = resource("raw_events.csv"),
      output = outDir,
      sessionGapMinutes = 30,
      dropUnknownSeverity = false,
      validateMode = "strict"))
    val produced = spark.read.option("header", "true")
      .option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ssxxx")
      .csv(outDir)
    val golden = spark.read.option("header", "true")
      .option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ssxxx")
      .csv(resource("processed_events_gap30_defaults.csv"))
    val got = canonical(produced)
    val want = canonical(golden)
    assert(got.length === want.length, s"row count ${got.length} != ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g === w, s"row $i differs:\n  got  $g\n  want $w")
    }
  }

  test("default gap=30 splits alice's 40+ minute gaps into separate sessions") {
    val raw = Pipeline.readRaw(spark, resource("raw_events.csv"))
    val out = Pipeline.transform(raw, PipelineConfig(
      input = "", output = "", sessionGapMinutes = 30, dropUnknownSeverity = true))
    val alice = out.filter(col("user_id") === "alice")
      .select("session_id").distinct().count()
    assert(alice > 1, "alice should have multiple sessions at gap=30")
  }

  test("strict validation passes on pipeline output, fails on raw input") {
    val raw = Pipeline.readRaw(spark, resource("raw_events.csv"))
    val cfg = PipelineConfig(input = "", output = "")
    val out = Pipeline.transform(raw, cfg)
    assert(graft.etl.Validation.validateSchema(out).isEmpty)

    val dirty = raw.withColumnRenamed("timestamp", "ts_raw")
    val issues = graft.etl.Validation.validateSchema(dirty)
    assert(issues.contains("missing_columns"))
  }
}
