package graft

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's argparse surface
  * (reference: src/pipeline.py:72-108). Hand-rolled parser — the build is
  * offline, no extra dependencies (build.sbt:6-9).
  *
  * Usage:
  *   graft.Main --input data/raw_events.csv --output out_dir
  *     [--session-gap-minutes 30] [--summary]
  *     [--validate off|warn|strict] [--drop-unknown-severity]
  */
object Main {

  def parseArgs(args: Array[String]): PipelineConfig = {
    var cfg = PipelineConfig(input = "data/raw_events.csv", output = "data/processed_events")
    var i = 0
    def valueOf(flag: String): String = {
      require(i + 1 < args.length, s"$flag requires a value")
      args(i + 1)
    }
    while (i < args.length) {
      args(i) match {
        case "--input" => cfg = cfg.copy(input = valueOf("--input")); i += 2
        case "--output" => cfg = cfg.copy(output = valueOf("--output")); i += 2
        case "--session-gap-minutes" =>
          cfg = cfg.copy(sessionGapMinutes = valueOf("--session-gap-minutes").toInt); i += 2
        case "--summary" => cfg = cfg.copy(summary = true); i += 1
        case "--drop-unknown-severity" =>
          cfg = cfg.copy(dropUnknownSeverity = true); i += 1
        case "--validate" =>
          val mode = valueOf("--validate")
          require(Set("off", "warn", "strict").contains(mode),
            s"--validate must be off|warn|strict, got: $mode")
          cfg = cfg.copy(validateMode = mode); i += 2
        case other =>
          throw new IllegalArgumentException(s"Unknown argument: $other")
      }
    }
    cfg
  }

  def main(args: Array[String]): Unit = {
    val cfg = parseArgs(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("security-data-pipeline")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Pipeline.run(spark, cfg)
    finally spark.stop()
  }
}
