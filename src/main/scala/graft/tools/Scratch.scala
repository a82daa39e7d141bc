package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc stage-decomposition timings for optimization rounds. Not part
  * of any gate; SPARK_GRAFT_SCRATCH selects the probe.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    sys.env.getOrElse("SPARK_GRAFT_SCRATCH", "video") match {
      case "video" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        // replicate VideoQueries.qVideoScenecut's payload synthesis
        val q = graft.SparkEntry.queries
        // 1. full query (warm)
        timeIt("q_video_scenecut full #1") { noop(q("q_video_scenecut")(spark, sfDir)) }
        timeIt("q_video_scenecut full #2") { noop(q("q_video_scenecut")(spark, sfDir)) }
        // 2. synthesis only: payload built but only its length consumed
        //    (forces full expression eval, skips decode)
        val mediaQ = graft.queries.VideoQueries.scenecutMediaProbe(spark, sfDir)
        timeIt("synthesis only (length) #1") { noop(mediaQ.select(length(col("payload")))) }
        timeIt("synthesis only (length) #2") { noop(mediaQ.select(length(col("payload")))) }
        // 3. decode+hash only: synthesis pinned first, then hashes
        val pinned = mediaQ.localCheckpoint(true)
        timeIt("decode+hash over pinned #1") {
          noop(graft.ext.VideoFingerprint.videoKeyframeHashes(spark, pinned))
        }
        timeIt("decode+hash over pinned #2") {
          noop(graft.ext.VideoFingerprint.videoKeyframeHashes(spark, pinned))
        }
      case "components" =>
        val q = graft.SparkEntry.queries
        timeIt("q_graph_components #1") { noop(q("q_graph_components")(spark, sfDir)) }
        timeIt("q_graph_components #2") { noop(q("q_graph_components")(spark, sfDir)) }
      case "ccrounds" =>
        // replicate connectedComponents with per-round walls + changed
        // counts over the q_graph_components contact graph
        val c = spark.read.parquet(s"$sfDir/customer.parquet").select("c_custkey")
        val e0 = c
          .withColumn("off", explode(array(lit(1L), lit(2L), lit(3L), lit(5L))))
          .select(col("c_custkey").as("u"), (col("c_custkey") + col("off")).as("v"))
          .join(c.withColumnRenamed("c_custkey", "v"), Seq("v"))
          .where(substring(md5(concat(col("u").cast("string"), lit(":"),
            col("v").cast("string"), lit("graft:tri"))), 1, 1) =!= lit("0"))
          .select("u", "v")
        val edges = graft.ext.GraphOps.canonicalEdges(e0, "u", "v")
          .localCheckpoint(true)
        println(s"[scratch] edges = ${edges.count()}")
        val both = edges.select(col("u").as("a"), col("v").as("b"))
          .unionAll(edges.select(col("v").as("a"), col("u").as("b")))
          .localCheckpoint(true)
        var lbl = both.select(col("a").as("n")).distinct()
          .withColumn("lbl", col("n")).localCheckpoint(true)
        for (r <- 1 to 16) {
          val t0 = System.nanoTime()
          val nbrMin = both
            .join(lbl.select(col("n").as("b"), col("lbl").as("_nl")), Seq("b"))
            .groupBy(col("a").as("n")).agg(min(col("_nl")).as("_nm"))
          val stepped = lbl.join(nbrMin, Seq("n"), "left")
            .join(lbl.select(col("n").as("_ln"), col("lbl").as("_ll")),
              col("lbl") === col("_ln"), "left")
            .select(col("n"),
              least(col("lbl"), coalesce(col("_nm"), col("lbl")),
                coalesce(col("_ll"), col("lbl"))).as("lbl"),
              col("lbl").as("_prev"))
          val pinned = stepped.localCheckpoint(true)
          val t1 = System.nanoTime()
          val changed = pinned.where(col("lbl") =!= col("_prev")).count()
          val t2 = System.nanoTime()
          lbl = pinned.drop("_prev")
          println(f"[scratch] round $r%2d step ${(t1-t0)/1e9}%6.3f s probe ${(t2-t1)/1e9}%6.3f s changed $changed")
        }
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
