package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.{GraphAnn, Similarity}

/** Bucket-pruned index serving (round 19, verdict r18 "Next #1"):
  *
  *  1. the serving layouts ([[GraphAnn.graphWriteServing]] /
  *     [[Similarity.ivfWriteServing]]) produce bucketed tables whose
  *     per-batch lookups PRUNE the scan — plan-visible as
  *     `SelectedBucketsCount x out of y` with x < y;
  *  2. the pruned search paths ([[GraphAnn.graphSearchServing]] /
  *     [[Similarity.ivfSearchServing]]) return row-identical results to
  *     the reference paths over the same frozen index.
  */
class ServeBucketedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .where(col("embedding").isNotNull)
    .select("vec_id", "embedding")
    .localCheckpoint(true)

  private def selectedBuckets(plan: String): Seq[(Int, Int)] =
    "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan)
      .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq

  // The serving entry points pin this themselves; the spec's standalone
  // lookup probes need it too (DisableUnnecessaryBucketedScan otherwise
  // strips bucket pruning from point lookups — "Bucketed: false
  // (disabled by query planner)").
  spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
    "false")

  test("conf pin is reentrant: overlapping serve scopes restore once") {
    // review r20: overlapping serving calls share one refcounted scope —
    // the inner exit must NOT restore early (which would strip pruning
    // from the outer call's remaining jobs), and the last exit restores
    // the true prior value
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    spark.conf.set(key, "true")
    GraphAnn.withAutoBucketedScanOff(spark) {
      assert(spark.conf.get(key) == "false")
      GraphAnn.withAutoBucketedScanOff(spark) {
        assert(spark.conf.get(key) == "false")
      }
      assert(spark.conf.get(key) == "false",
        "inner exit must not restore while the outer scope is live")
    }
    assert(spark.conf.get(key) == "true",
      "last exit must restore the pre-scope value")
    spark.conf.set(key, "false") // back to the spec-wide setting
  }

  test("graph serving: bucketed lookups prune buckets, results identical") {
    val dir = Files.createTempDirectory("graft-gserve").toString
    val index = GraphAnn.graphIndex(e, "vec_id", "embedding", k = 8, iters = 2)
      .localCheckpoint(true)
    GraphAnn.graphWriteServing(index, "g_serve_edges", s"$dir/edges",
      buckets = 32)
    try {
      val edges = spark.table("g_serve_edges")
      val probes = e.select(col("vec_id").as("q_id"))
        .filter(pmod(col("q_id"), lit(41)) === 0)

      // point lookup of a small frontier prunes the bucket set
      val oneHop = edges.where(col("_node").isInCollection(Seq(0L, 41L, 82L)))
      oneHop.collect()
      val sel = selectedBuckets(oneHop.queryExecution.executedPlan.toString)
      assert(sel.nonEmpty, "no bucket-pruned scan in the lookup plan")
      assert(sel.forall { case (x, y) => x <= 3 && y == 32 },
        s"3-id frontier should touch <= 3 of 32 buckets, got $sel")

      // the full serving search: identical rows to the reference path.
      // Conf scoping (verdict r19 #3): the call pins
      // autoBucketedScan=false internally, materializes under the pin,
      // and must RESTORE the caller's setting — a mixed-workload
      // session keeps its auto-bucketed-scan planning.
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      val served = GraphAnn.graphSearchServing(e, "vec_id", "embedding",
        edges, probes, "q_id", k = 5, ef = 24)
      assert(spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled") == "true",
        "serving call must not leak its conf pin into the caller session")
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val reference = GraphAnn.graphSearch(e, "vec_id", "embedding",
        GraphAnn.graphIndexEdges(index), probes, "q_id", k = 5, ef = 24)
      val s = served.as[(Long, Long, Double)].collect().toSet
      val r = reference.as[(Long, Long, Double)].collect().toSet
      assert(s == r, s"served results diverge: ${(s diff r).take(3)} vs " +
        s"${(r diff s).take(3)}")
      assert(s.nonEmpty)

      // the hop-1 lookup inside the serving search is itself pruned
      val probeIds = probes.as[Long].collect().toSeq
      val h1 = edges.where(col("_node").isInCollection(probeIds))
      h1.collect()
      val selH1 = selectedBuckets(h1.queryExecution.executedPlan.toString)
      assert(selH1.nonEmpty && selH1.forall { case (x, y) =>
        x < y && x <= probeIds.length },
        s"probe-frontier lookup not pruned: $selH1 for ${probeIds.length} ids")
    } finally spark.sql("DROP TABLE IF EXISTS g_serve_edges")
  }

  test("ivf serving: probed-list lookups prune buckets, results identical") {
    val dir = Files.createTempDirectory("graft-iserve").toString
    val index = Similarity.ivfIndex(e, "vec_id", "embedding", nCentroids = 16)
      .localCheckpoint(true)
    Similarity.ivfWriteServing(index, "ivf_serve", s"$dir/ivf", buckets = 16)
    try {
      val table = spark.table("ivf_serve")
      val probes = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .localCheckpoint(true)

      // conf scoping: same restore contract as the graph path
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      val served = Similarity.ivfSearchServing(table, probes, "q_id", "q_emb",
        k = 5, nProbe = 2)
      assert(spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled") == "true",
        "serving call must not leak its conf pin into the caller session")
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val reference = Similarity.ivfSearchIndex(index, probes, "q_id", "q_emb",
        k = 5, nProbe = 2)
      val s = served.as[(Long, Long, Double)].collect().toSet
      val r = reference.as[(Long, Long, Double)].collect().toSet
      assert(s == r, s"ivf served results diverge: ${(s diff r).take(3)} vs " +
        s"${(r diff s).take(3)}")
      assert(s.nonEmpty)

      // 3 probes x nProbe=2 touch <= 6 lists -> <= 6 of 16 buckets
      val (cents, _, _, _) = Similarity.ivfIndexCentroids(table)
      assert(cents.length == 16)
      val pruned = table.where(
        col("kind") === "posting" && col("cid").isInCollection(Seq(0L, 3L)))
      pruned.collect()
      val sel = selectedBuckets(pruned.queryExecution.executedPlan.toString)
      assert(sel.nonEmpty && sel.forall { case (x, y) => x <= 2 && y == 16 },
        s"2-list lookup should touch <= 2 of 16 buckets, got $sel")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_serve")
  }
}
