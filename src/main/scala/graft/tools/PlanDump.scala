package graft.tools

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization-round evidence artifacts (`plans/rNN/<query>_<tag>.txt`).
  *
  * Env:
  *   SPARK_GRAFT_PLAN_QUERIES  comma-separated query names (required)
  *   SPARK_GRAFT_PLAN_OUT      output directory (default plans/r20)
  *   SPARK_GRAFT_PLAN_TAG      file suffix, e.g. before/after (default before)
  *   SPARK_GRAFT_SF_DIR        data dir (default /root/testdata/sf0.1)
  *
  * Uses the bench session geometry (local[32], 32 shuffle partitions) so
  * the dumped plans match what the bench actually executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "plans/r20")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val names = sys.env.getOrElse("SPARK_GRAFT_PLAN_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "SPARK_GRAFT_PLAN_QUERIES is required")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- names) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${q}_$tag.txt"), txt)
        println(s"[plandump] wrote $outDir/${q}_$tag.txt (${txt.length} chars)")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[plandump] $q FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
