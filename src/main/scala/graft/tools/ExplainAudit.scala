// scratch: print exchange/scan summary for new queries
package graft.tools

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val qs = sys.env.get("SPARK_GRAFT_AUDIT")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q_dsir_score", "q_dsir_sample", "q_embed_drift",
        "q_domain_budget_weighted"))
    for (q <- qs) {
      val plan = graft.SparkEntry.queries(q)(spark, d)
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(plan).toSeq
      val bcasts = plan.split("\n").count(_.contains("BroadcastExchange"))
      val scans = plan.split("\n").count(_.contains("FileScan"))
      println(s"$q: shuffles=${exchanges.size} ${exchanges.mkString("|")} broadcasts=$bcasts scans=$scans")
    }
    spark.stop()
  }
}
