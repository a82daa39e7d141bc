package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Spill-path validation harness (VERDICT r11 task 1): every bench and
  * scale number so far fit comfortably in the 128 GiB sandbox, so the
  * sort/aggregate SPILL code paths — the ones a 100 TB run lives in —
  * had never been executed. This main runs the heavy end of the query
  * suite twice-comparable: once under a roomy heap (the reference
  * fingerprints) and once under a deliberately constrained heap
  * (`SPARK_DRIVER_MEM=3g`) at 50× data, where UnsafeExternalSorter and
  * HashAggregate's sort-based fallback must spill to disk to finish.
  *
  * Two facts are recorded per query, and both matter:
  *  - `spill_disk_bytes`/`spill_mem_bytes` from the task-metrics
  *    listener — PROOF the constrained run actually exercised the spill
  *    path (a run that never spills validates nothing);
  *  - an order-independent result fingerprint (row count + sum of
  *    xxhash64 over the canonical JSON of each row) computed on the
  *    query's parquet-materialized output — spilled and in-memory
  *    execution must be bit-identical.
  *
  * The output is parquet-materialized BEFORE fingerprinting so the
  * aggregation added for the fingerprint cannot let Catalyst elide the
  * query's own sorts (EliminateSorts would drop an ORDER BY directly
  * under an aggregate — and the global sorts are exactly the operators
  * under test).
  *
  * Env: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_SPILL_ONLY (csv filter), SPARK_GRAFT_SPILL_OUT (scratch
  * dir, default /tmp/spill_probe). Prints ONE JSON line.
  */
object SpillProbe {

  /** The heavy set: global sorts, wide aggregations, the iterative
    * cluster/rank frames, BM25's corpus-wide joins, DSIR's n-gram
    * explosion, and the full e2e pipeline — the shapes that spill first
    * at 100 TB.
    */
  private val DefaultSet = Seq(
    "q_e2e_throughput", "q_sort", "q_rfm", "q_count_distinct",
    "q_topk_values", "q_sessionize", "q_dedup_clusters", "q_dedup_minhash",
    "q_bm25", "q_dsir_score", "q_tfidf_topterms", "q_rollup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfx50")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SPILL_OUT", "/tmp/spill_probe")
    val only = sys.env.get("SPARK_GRAFT_SPILL_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Shuffle partitions are a SEPARATE knob (SPARK_GRAFT_SHUFFLE): at a
    // fixed heap, fewer reducers means more state per task — the lever
    // that forces hash-aggregate fallback and sort spills without
    // touching the scan layout (so monotonically_increasing_id-derived
    // results stay comparable across runs).
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spillMem = new AtomicLong(0L)
    val spillDisk = new AtomicLong(0L)
    val peakExec = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
          peakExec.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })

    // The filter SELECTS (it may name queries outside the default heavy
    // set — late-round additions are probed the same way).
    val names = only match {
      case Some(sel) =>
        val unknown = sel.filterNot(graft.SparkEntry.queries.contains)
        require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
        sel.toSeq.sorted
      case None => DefaultSet
    }
    val heapMax = Runtime.getRuntime.maxMemory()
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      // settle the async listener bus so deltas attribute to the query
      Thread.sleep(1000)
      val (m0, d0) = (spillMem.get(), spillDisk.get())
      val t0 = System.nanoTime()
      val out = s"$scratch/$name"
      fn(spark, sfDir).write.mode("overwrite").parquet(out)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      val (m1, d1) = (spillMem.get(), spillDisk.get())
      val back = spark.read.parquet(out)
      val fp = back.select(
          count(lit(1)).as("n"),
          sum(xxhash64(to_json(struct(back.columns.toIndexedSeq.map(col): _*)))
            .cast("decimal(38,0)")).as("h"))
        .collect()(0)
      // Release cross-query state: iterative operators localCheckpoint
      // per round and those blocks otherwise pin storage memory for the
      // rest of the probe, bleeding one query's footprint into the next
      // (measured: q_dsir_score 254 s after the dedup family vs ~6 s in
      // a fresh JVM).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      val row = s""""$name":{"sec":$sec,"rows":${fp.getLong(0)},""" +
        s""""fingerprint":"${Option(fp.get(1)).map(_.toString).getOrElse("null")}",""" +
        s""""spill_mem_bytes":${m1 - m0},"spill_disk_bytes":${d1 - d0}}"""
      // scalastyle:off println
      System.err.println(s"[spill] $name sec=${"%.1f".format(sec)} " +
        s"rows=${fp.getLong(0)} spillDiskMB=${(d1 - d0) / 1048576}")
      // scalastyle:on println
      row
    }
    println(s"""{"metric":"spill_probe","heap_max_bytes":$heapMax,""" +
      s""""sf_dir":"$sfDir","shuffle_partitions":$shuffle,""" +
      s""""peak_execution_memory_bytes":${peakExec.get()},""" +
      s""""total_spill_disk_bytes":${spillDisk.get()},""" +
      s""""queries":{${results.mkString(",")}}}""")
    spark.stop()
  }
}
