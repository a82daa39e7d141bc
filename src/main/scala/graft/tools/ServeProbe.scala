package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Search-ONLY scale pins for the persisted ANN indexes (round 18): the
  * index artifacts build UNTIMED (and pin), then the probe times just
  * the serving path — [[graft.ext.GraphAnn.graphSearchIndex]] and
  * [[graft.ext.Similarity.ivfSearchIndex]] — at a FIXED probe-batch
  * size across corpus scales. This is the measurement the gate queries
  * cannot give: they are self-contained, so their walls include the
  * one-off index build, which is linear-by-design and dominated the r17
  * 100× tier (q_ann_graph_search flagged 25.6× — all build). A serving
  * deployment pays the build once offline; what must stay flat as the
  * corpus grows 100× is the per-query-batch search wall, because per
  * probe the graph candidate set is ≤ g + g² and the IVF candidate set
  * is nProbe posting lists.
  *
  * [[ScaleProbe]] is unsuitable here: it unpersists every cached RDD
  * between runs, which would tear down the pinned index mid-probe.
  *
  * Env: SPARK_GRAFT_BASE_DIR, SPARK_GRAFT_SCALE_DIR,
  * SPARK_GRAFT_SCALE_FACTOR (label), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_RUNS (default 3), SPARK_GRAFT_PROBE_N (default 200),
  * SPARK_GRAFT_SERVE_OUT (artifact path). Prints one JSON line.
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE_DIR", "/root/testdata/sf0.1")
    val scaled = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/sfx10")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val probeN = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "200").toInt
    // settle window between an untimed index build and its timed search
    // runs: the 100x builds run minutes at full width and leave GC/THP/
    // scheduler heat that inflated the first probe attempts ~2x
    val settleSec = sys.env.getOrElse("SPARK_GRAFT_SETTLE_SEC", "60").toInt
    val outFile =
      sys.env.getOrElse("SPARK_GRAFT_SERVE_OUT", "SCALE_GRAPHSERVE.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(): Double = ToolIO.load()

    /** min-of-N noop-write seconds of `mk()`'s plan (the index inputs are
      * pinned by the caller, so repeated runs re-execute only the search).
      */
    def timed(mk: () => DataFrame): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    // "legacy": the r18 methodology — pinned in-memory und/index frames.
    // "bucketed": the r19 serving layout — indexes WRITTEN via
    // graphWriteServing/ivfWriteServing (bucketed+sorted by node/list
    // id), search served by the point-lookup paths
    // (graphSearchServing/ivfSearchServing) whose per-hop InSet filters
    // bucket-prune the scan. IVF additionally applies deployment
    // geometry — nLists = max(64, min(1024, 4·√n)) (the FAISS sizing
    // guideline) — because a frozen 64-list quantizer makes per-batch
    // candidate mass grow LINEARLY with the corpus no matter how the
    // postings are stored.
    val mode = sys.env.getOrElse("SPARK_GRAFT_SERVE_MODE", "legacy")

    /** (corpus_rows, graph_search_sec, ivf_search_sec) for one dir —
      * the bucketed-layout serving probe.
      */
    def probeDirBucketed(dir: String, tag: String): (Long, Double, Double) = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .where(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint(true) // corpus side of every search join
      val n = e.count()
      val probes = e.select(col("vec_id").as("q_id"))
        .orderBy("q_id").limit(probeN)
        .localCheckpoint(true)
      val art = java.nio.file.Files
        .createTempDirectory(s"graft_serve_$tag").toString
      System.err.println(s"[serveprobe] $dir: graph index + serving layout" +
        " (untimed)")
      val gIdx = graft.ext.GraphAnn.graphIndex(e, "vec_id", "embedding",
        k = 16, iters = 2).localCheckpoint(true)
      val gBuckets = math.max(32L, n / 200L).toInt
      graft.ext.GraphAnn.graphWriteServing(gIdx, s"g_serve_$tag",
        s"$art/edges", gBuckets)
      val edgesDisk = spark.table(s"g_serve_$tag")
      // disk-layout pruning evidence, captured BEFORE the hot replica is
      // pinned: the probe-frontier lookup's bucket-pruned scan plan
      spark.conf
        .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val h1 = edgesDisk.where(col("_node").isInCollection(
        probes.collect().map(_.getLong(0)).toSeq))
      h1.write.format("noop").mode("overwrite").save()
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(h1.queryExecution.executedPlan.toString)
        .map(m => s"${m.group(1)}/${m.group(2)}").getOrElse("none")
      System.err.println(s"[serveprobe] $dir hop1 buckets: $sel " +
        s"(gBuckets=$gBuckets)")
      // serve-session open: pin the hot replica of the artifact — a
      // serving deployment reads the bucketed table once per index
      // state, not once per query batch; per-batch lookups then filter
      // the memory-resident frame. COALESCED first: a cached bucketed
      // table keeps one partition per bucket, so a 1000-bucket layout
      // made every per-batch lookup a 1000-task scan (~10 ms of pure
      // scheduling per task-wave — measured as the whole x100 residual);
      // the replica needs only ~2 partitions per core.
      val edges = edgesDisk.coalesce(2 * cpus.toInt).persist()
      edges.count(): Unit
      System.gc(); Thread.sleep(settleSec * 1000L)
      val gSec = timed(() => graft.ext.GraphAnn.graphSearchServing(
        e, "vec_id", "embedding", edges, probes, "q_id", k = 10, ef = 160))
      val nLists = math.max(64, math.min(1024, (4 * math.sqrt(n.toDouble)).toInt))
      System.err.println(s"[serveprobe] $dir: ivf index nLists=$nLists" +
        " + serving layout (untimed)")
      val iIdx = graft.ext.Similarity.ivfIndex(e, "vec_id", "embedding",
        nCentroids = nLists)
      graft.ext.Similarity.ivfWriteServing(iIdx, s"ivf_serve_$tag",
        s"$art/ivf", buckets = math.max(32, nLists / 4))
      val iTable = spark.table(s"ivf_serve_$tag").coalesce(2 * cpus.toInt)
        .persist()
      iTable.count(): Unit // serve-session open, as for the graph table
      val vecProbes = probes
        .join(e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
          Seq("q_id"))
        .localCheckpoint(true)
      System.gc(); Thread.sleep(settleSec * 1000L)
      val iSec = timed(() => graft.ext.Similarity.ivfSearchServing(
        iTable, vecProbes, "q_id", "q_emb", k = 10, nProbe = 8))
      edges.unpersist(); iTable.unpersist()
      (n, gSec, iSec)
    }

    /** (corpus_rows, graph_search_sec, ivf_search_sec) for one dir. */
    def probeDir(dir: String): (Long, Double, Double) = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .where(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint(true) // corpus side of every search join
      val n = e.count()
      // fixed probe batch: the FIRST probeN node ids — identical batch
      // size at every scale, so the ratio isolates corpus-side growth
      val probes = e.select(col("vec_id").as("q_id"))
        .orderBy("q_id").limit(probeN)
        .localCheckpoint(true)
      System.err.println(s"[serveprobe] $dir: building graph index (untimed)")
      val gIdx = graft.ext.GraphAnn.graphIndex(e, "vec_id", "embedding",
        k = 16, iters = 2).localCheckpoint(true)
      // the undirected edge view derives + pins ONCE per dir (review
      // r18): it is O(n·k) union+distinct PREP a serving deployment
      // pays once per index state, not per query batch — leaving it
      // inside the timed lambda re-ran it every run and misattributed
      // corpus-linear work to the candidate-bounded search
      val und = graft.ext.GraphAnn.undirected(
          graft.ext.GraphAnn.graphIndexEdges(gIdx))
        .localCheckpoint(true)
      System.gc(); Thread.sleep(settleSec * 1000L)
      // probeCount is KNOWN here (a fixed serving batch), so the
      // broadcast gate skips its bounded counting job (advice r19)
      val gSec = timed(() => graft.ext.GraphAnn.searchOverUnd(
        e, "vec_id", "embedding", und, probes, "q_id", k = 10, ef = 160,
        probeCount = probeN.toLong))
      System.err.println(s"[serveprobe] $dir: building ivf index (untimed)")
      val iIdx = graft.ext.Similarity.ivfIndex(e, "vec_id", "embedding",
        nCentroids = 64).localCheckpoint(true)
      val vecProbes = probes
        .join(e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
          Seq("q_id"))
        .localCheckpoint(true)
      System.gc(); Thread.sleep(settleSec * 1000L)
      val iSec = timed(() => graft.ext.Similarity.ivfSearchIndex(
        iIdx, vecProbes, "q_id", "q_emb", k = 10, nProbe = 8))
      (n, gSec, iSec)
    }

    val load0 = load()
    val (n1, g1, i1) =
      if (mode == "bucketed") probeDirBucketed(base, "base") else probeDir(base)
    val loadMid = load()
    val (nN, gN, iN) =
      if (mode == "bucketed") probeDirBucketed(scaled, "x") else probeDir(scaled)
    val loadEnd = load()
    def f(d: Double): String = ToolIO.f3(d)
    val methodDesc =
      if (mode == "bucketed")
        "bucketed serving layout (graphWriteServing/ivfWriteServing) written untimed, " +
          "disk bucket-prune evidence captured on the cold table, then the hot replica " +
          "pinned once per index state (serve-session open, untimed); search via the " +
          "point-lookup paths (graphSearchServing/ivfSearchServing, hybrid InSet/" +
          "semi-join frontier lookups; ivf nLists=max(64,min(1024,4*sqrt(n)))), " +
          s"noop-written, min of $runs runs, FIXED $probeN-probe batch at both scales"
      else
        "index built+pinned untimed, search noop-written, min of " +
          s"$runs runs, FIXED $probeN-probe batch at both scales"
    val line =
      s"""{"metric":"ann_serve_search_only${if (mode == "bucketed") "_bucketed" else ""}","factor":$factor,""" +
        s""""method":"$methodDesc","""+
        s""""base_dir":"$base","scale_dir":"$scaled",""" +
        s""""load_avg_start":$load0,"load_avg_mid":$loadMid,"load_avg_end":$loadEnd,""" +
        s""""corpus_rows":{"base":$n1,"scaled":$nN},""" +
        s""""graph_search_sec":{"base":${f(g1)},"scaled":${f(gN)},"ratio":${f(gN / g1)}},""" +
        s""""ivf_search_sec":{"base":${f(i1)},"scaled":${f(iN)},"ratio":${f(iN / i1)}}}"""
    println(line)
    ToolIO.writeAtomic(outFile, line)
    spark.stop()
  }
}
