package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, GraphAnn, Similarity}

/** Gauge-to-action wiring (verdict r18 #5): a DEGRADED grown index trips
  * the rebuild decision and gets rebuilt; a HEALTHY one passes through
  * untouched. The decision math itself is oracle-checked by
  * q_index_rebuild_due{,_sem,_graph}; this spec pins the action side.
  */
class RebuildDueSpec extends SparkSpec {
  import spark.implicits._

  /** 4 tight clusters along distinct axes; ids 0.. within cluster c get
    * vectors near axis c so the trained quantizer recovers the axes.
    */
  private def clusteredVecs(n: Int, dim: Int = 8): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      val c = i % 4
      val v = Array.fill(dim)(0.01f * ((i * 7 % 5) + 1))
      v(c) = 1.0f
      (i.toLong, v.toSeq)
    }

  private def toVecDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))

  private def centroidSet(index: org.apache.spark.sql.DataFrame) =
    index.filter(col("kind") === "centroid")
      .select(col("cid"), col("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSet

  test("ivf: drifting append trips the rebuild, aligned append does not") {
    val corpus = toVecDf(clusteredVecs(80))
    val base = Similarity.ivfIndex(corpus, "vec_id", "embedding",
      nCentroids = 4).localCheckpoint(true)

    // aligned batch: clones of the corpus distribution, shifted ids
    val healthyBatch = toVecDf(clusteredVecs(40).map {
      case (i, v) => (i + 1000L, v) })
    val grownOk = Similarity.ivfAppend(base, healthyBatch,
      "vec_id", "embedding").localCheckpoint(true)
    val decOk = Similarity.indexRebuildDecision(
        Similarity.ivfIndexHealth(base), Similarity.ivfIndexHealth(grownOk))
      .collect().head
    assert(!decOk.getAs[Boolean]("rebuild_due"),
      s"aligned append should not trip: $decOk")
    val keptIdx = Similarity.ivfRebuildIfDue(base, grownOk)
    assert(centroidSet(keptIdx) == centroidSet(grownOk),
      "healthy index must pass through with its frozen centroids")

    // drifting batch: negated vectors — assigned cosine ≈ −1, the
    // appended-vs-build drift collapses far below the −0.05 floor
    val driftBatch = toVecDf(clusteredVecs(40).map {
      case (i, v) => (i + 2000L, v.map(x => -x)) })
    val grownBad = Similarity.ivfAppend(base, driftBatch,
      "vec_id", "embedding").localCheckpoint(true)
    val decBad = Similarity.indexRebuildDecision(
        Similarity.ivfIndexHealth(base), Similarity.ivfIndexHealth(grownBad))
      .collect().head
    assert(decBad.getAs[Boolean]("rebuild_due") &&
      decBad.getAs[Double]("sim_drift") < -0.05,
      s"drifting append should trip: $decBad")
    val rebuilt = Similarity.ivfRebuildIfDue(base, grownBad)
    assert(centroidSet(rebuilt) != centroidSet(grownBad),
      "degraded index must come back retrained")
    // the rebuild retrains on the CURRENT members, so the new quantizer
    // explains the drifted mass better than the frozen one did
    val oldMass = Similarity.ivfIndexHealth(grownBad)
      .agg(sum("simsum6")).collect().head.getLong(0)
    val newMass = Similarity.ivfIndexHealth(rebuilt)
      .agg(sum("simsum6")).collect().head.getLong(0)
    assert(newMass > oldMass,
      s"rebuild should raise assignment quality: $oldMass -> $newMass")
  }

  test("sem: rebuild-if-due trips on drift, passes through when healthy") {
    val corpus = toVecDf(clusteredVecs(80))
    val base = Dedup.semDedupIndex(corpus, "vec_id", "embedding",
      nCentroids = 4).localCheckpoint(true)
    val healthy = Dedup.semIndexAppend(base,
        toVecDf(clusteredVecs(40).map { case (i, v) => (i + 1000L, v) }),
        "vec_id", "embedding").localCheckpoint(true)
    assert(centroidSet(Dedup.semIndexRebuildIfDue(base, healthy)) ==
      centroidSet(healthy))
    val degraded = Dedup.semIndexAppend(base,
        toVecDf(clusteredVecs(40).map {
          case (i, v) => (i + 2000L, v.map(x => -x)) }),
        "vec_id", "embedding").localCheckpoint(true)
    assert(centroidSet(Dedup.semIndexRebuildIfDue(base, degraded)) !=
      centroidSet(degraded), "drifted semantic index must retrain")
  }

  test("graph: decision trips on synthetic degradation, IfDue acts on it") {
    // synthetic gauges — the decision is pure arithmetic over the frame
    def gauge(insMeanQ6: Long, backlinked: Long) = Seq(
      ("build", 90L, 900L, 900L * 950000L, Option.empty[Long]),
      ("inserted", 10L, 100L, 100L * insMeanQ6, Some(backlinked)))
      .toDF("origin", "n_nodes", "n_edges", "simsum6", "n_backlinked")
    val healthy = GraphAnn.graphRebuildDecision(gauge(940000L, 9L))
      .collect().head
    assert(!healthy.getAs[Boolean]("rebuild_due"), s"healthy: $healthy")
    val drifted = GraphAnn.graphRebuildDecision(gauge(880000L, 9L))
      .collect().head
    assert(drifted.getAs[Boolean]("rebuild_due") &&
      drifted.getAs[Double]("sim_drift") < -0.05, s"drifted: $drifted")
    val orphaned = GraphAnn.graphRebuildDecision(gauge(940000L, 1L))
      .collect().head
    assert(orphaned.getAs[Boolean]("rebuild_due") &&
      orphaned.getAs[Double]("backlink_cov") < 0.2, s"orphaned: $orphaned")

    // end-to-end action: thresholds force each branch deterministically
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("embedding").isNotNull)
      .select("vec_id", "embedding").localCheckpoint(true)
    val corpus = e.filter(pmod(col("vec_id"), lit(7)) =!= 0)
    val batch = e.filter(pmod(col("vec_id"), lit(7)) === 0)
    val index = GraphAnn.graphIndex(corpus, "vec_id", "embedding",
      k = 8, iters = 1).localCheckpoint(true)
    val grown = GraphAnn.graphInsertIndex(corpus, "vec_id", "embedding",
      index, batch, ef = 16, hops = 1).localCheckpoint(true)
    val all = corpus.unionByName(batch)
    // not due: impossible thresholds leave the grown index untouched
    val kept = GraphAnn.graphRebuildIfDue(all, "vec_id", "embedding",
      grown, batch.select("vec_id"), driftFloor = -10.0, minBacklink = 0.0)
    assert(kept.filter(col("kind") === "edge").count() ==
      grown.filter(col("kind") === "edge").count())
    assert(GraphAnn.graphIndexEdges(kept).orderBy("vec_id", "nb_rank")
      .collect().toSeq ==
      GraphAnn.graphIndexEdges(grown).orderBy("vec_id", "nb_rank")
        .collect().toSeq, "not-due must return the grown index untouched")
    // due: a guaranteed-trip threshold (coverage ≤ 1 < 1.01) rebuilds
    // under the index's own config — equal to a fresh graphIndex build
    val rebuilt = GraphAnn.graphRebuildIfDue(all, "vec_id", "embedding",
      grown, batch.select("vec_id"), driftFloor = -10.0, minBacklink = 1.01)
    val fresh = GraphAnn.graphIndex(all, "vec_id", "embedding",
      k = 8, iters = 1)
    assert(GraphAnn.graphIndexEdges(rebuilt).orderBy("vec_id", "nb_rank")
      .collect().toSeq ==
      GraphAnn.graphIndexEdges(fresh).orderBy("vec_id", "nb_rank")
        .collect().toSeq,
      "due must rebuild under the index's own derived config")
  }
}
