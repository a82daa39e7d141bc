package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Where does the per-batch graph/IVF SEARCH wall actually go at scale?
  * The r18 ServeProbe pinned search-only ratios of 4.8×/5.3× at 100×
  * corpus and adjudicated the residual as "the per-batch scan of the
  * pinned index frame" — this tool decomposes that residual into its
  * candidate stages (hop expansion, candidate distinct, exact-cosine
  * scoring, beam round) so the r19 bucketed-serving work optimizes the
  * measured bottleneck instead of the assumed one. Diagnostic only; no
  * gate reads it.
  *
  * Env: SPARK_GRAFT_DIR (corpus), SPARK_GRAFT_CPUS, SPARK_GRAFT_RUNS,
  * SPARK_GRAFT_PROBE_N. Prints one JSON line.
  */
object ServeBreakdown {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_DIR", "/tmp/sfx100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val probeN = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "200").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(mk: () => DataFrame): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val n = e.count()
    val probes = e.select(col("vec_id").as("q_id"))
      .orderBy("q_id").limit(probeN).localCheckpoint(true)
    System.err.println(s"[breakdown] $dir n=$n: building graph (untimed)")
    val gIdx = graft.ext.GraphAnn.graphIndex(e, "vec_id", "embedding",
      k = 16, iters = 2).localCheckpoint(true)
    val und = graft.ext.GraphAnn.undirected(
      graft.ext.GraphAnn.graphIndexEdges(gIdx)).localCheckpoint(true)
    val undRows = und.count()
    System.gc(); Thread.sleep(15000)

    // --- stage variants (mirror searchOverUnd's internals) -------------
    val vecs = e.select(col("vec_id").as("_id"), col("embedding").as("_v"))
      .localCheckpoint(true)
    val q = probes.select(col("q_id").as("_q"))
    def hop1 = broadcast(q)
      .join(und.select(col("_node").as("_q"), col("_nb")), Seq("_q"))
    def hop2 = broadcast(hop1.select(col("_q"), col("_nb").as("_mid")))
      .join(und.select(col("_node").as("_mid"), col("_nb")), Seq("_mid"))
      .select("_q", "_nb")
    def cand = hop1.union(hop2).where(col("_nb") =!= col("_q")).distinct()
    def score(c: DataFrame): DataFrame = c
      .join(vecs.select(col("_id").as("_q"), col("_v").as("_qv")), "_q")
      .join(vecs.select(col("_id").as("_nb"), col("_v").as("_nv")), "_nb")
      .select(col("_q"), col("_nb"),
        graft.ext.Similarity.cosine(col("_qv"), col("_nv")).as("_c"))

    val tHops = timed(() => hop1.union(hop2))            // raw hop joins
    val tCand = timed(() => cand)                        // + distinct
    val candPinned = cand.localCheckpoint(true)
    val nCand = candPinned.count()
    val tScore = timed(() => score(candPinned))          // scoring joins only
    val tEf0 = timed(() => graft.ext.GraphAnn.searchOverUnd(
      e, "vec_id", "embedding", und, probes, "q_id", k = 10, ef = 0))
    val tFull = timed(() => graft.ext.GraphAnn.searchOverUnd(
      e, "vec_id", "embedding", und, probes, "q_id", k = 10, ef = 160))
    // beam internals: the scored pin + seeds + hop3 + anti-join + rescore
    val w = Window.partitionBy("_q").orderBy(col("_c").desc, col("_nb"))
    val scoredPinned = score(candPinned).localCheckpoint(true)
    val tSeeds = timed(() => scoredPinned
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 160)
      .select("_q", "_nb"))
    val seedsPinned = scoredPinned
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 160)
      .select("_q", "_nb").localCheckpoint(true)
    def hop3 = broadcast(seedsPinned.select(col("_q"), col("_nb").as("_mid")))
      .join(und.select(col("_node").as("_mid"), col("_nb")), Seq("_mid"))
      .where(col("_nb") =!= col("_q")).select("_q", "_nb").distinct()
    val tHop3 = timed(() => hop3)
    val hop3Pinned = hop3.localCheckpoint(true)
    val nHop3 = hop3Pinned.count()
    val tAnti = timed(() => hop3Pinned.join(candPinned, Seq("_q", "_nb"), "left_anti"))
    val freshPinned = hop3Pinned.join(candPinned, Seq("_q", "_nb"), "left_anti")
      .localCheckpoint(true)
    val nFresh = freshPinned.count()
    val tScoreFresh = timed(() => score(freshPinned))
    val tVecScan = timed(() => vecs)
    val tUndScan = timed(() => und)

    // --- ivf side -------------------------------------------------------
    System.err.println(s"[breakdown] building ivf (untimed)")
    val iIdx = graft.ext.Similarity.ivfIndex(e, "vec_id", "embedding",
      nCentroids = 64).localCheckpoint(true)
    val vecProbes = probes
      .join(e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        Seq("q_id")).localCheckpoint(true)
    System.gc(); Thread.sleep(10000)
    val tIvf = timed(() => graft.ext.Similarity.ivfSearchIndex(
      iIdx, vecProbes, "q_id", "q_emb", k = 10, nProbe = 8))

    def f(d: Double): String = ToolIO.f3(d)
    println(
      s"""{"metric":"serve_breakdown","dir":"$dir","n":$n,"und_rows":$undRows,""" +
      s""""n_cand":$nCand,"n_hop3":$nHop3,"n_fresh":$nFresh,""" +
      s""""hops_sec":${f(tHops)},"cand_distinct_sec":${f(tCand)},""" +
      s""""score_sec":${f(tScore)},"seeds_sec":${f(tSeeds)},""" +
      s""""hop3_sec":${f(tHop3)},"anti_sec":${f(tAnti)},""" +
      s""""score_fresh_sec":${f(tScoreFresh)},""" +
      s""""search_ef0_sec":${f(tEf0)},"search_full_sec":${f(tFull)},""" +
      s""""vec_scan_sec":${f(tVecScan)},"und_scan_sec":${f(tUndScan)},""" +
      s""""ivf_search_sec":${f(tIvf)}}""")
    spark.stop()
  }
}
