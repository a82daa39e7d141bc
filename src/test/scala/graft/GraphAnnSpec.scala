package graft

import org.apache.spark.sql.functions._

import graft.ext.{GraphAnn, Similarity}

/** NN-Descent graph-ANN invariants: convergence toward the true k-NN
  * graph, monotone improvement over the init (the top-k-over-superset
  * property), search recall against brute force on real embeddings,
  * plan shape, and parameter guards.
  */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated clusters in 8-d: intra-cluster cosine ~1,
    * cross-cluster ~0 — the true k-NN graph is cluster-local.
    */
  private def clustered(perCluster: Int) = {
    val rows = for {
      c <- 0 until 3
      i <- 0 until perCluster
    } yield {
      val base = Array.fill(8)(0.05f)
      base(c * 2) = 1f
      base(c * 2 + 1) = 0.5f + 0.01f * i // small intra-cluster spread
      ((c * perCluster + i).toLong, base.toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("nnDescentGraph converges to cluster-local neighbors") {
    val df = clustered(12) // 36 nodes, 3 clusters of 12
    val g = GraphAnn.nnDescentGraph(df, "vec_id", "embedding", k = 6, iters = 3)
      .select("vec_id", "nb_id").as[(Long, Long)].collect()
    assert(g.nonEmpty)
    // after refinement every reported neighbor is in the node's cluster
    val wrong = g.filter { case (a, b) => a / 12 != b / 12 }
    assert(wrong.isEmpty, s"cross-cluster neighbors survived: ${wrong.take(5).toSeq}")
    // and nodes report a full (or near-full) neighbor list
    val counts = g.groupBy(_._1).map(_._2.length)
    assert(counts.min >= 5, s"under-filled neighbor lists: min ${counts.min}")
  }

  test("each round only improves: neighbor quality is monotone in iters") {
    val df = clustered(10)
    def sumByNode(iters: Int): Map[Long, Double] =
      GraphAnn.nnDescentGraph(df, "vec_id", "embedding", k = 4, iters = iters)
        .groupBy("vec_id").agg(sum("sim").as("s"))
        .as[(Long, Double)].collect().toMap
    // candidates ⊇ current neighbors each round and every cosine in this
    // fixture is positive, so each node's top-k sim SUM can only grow
    val s1 = sumByNode(1)
    val s3 = sumByNode(3)
    s1.foreach { case (node, v1) =>
      assert(s3.getOrElse(node, 0.0) >= v1 - 1e-9,
        s"node $node regressed: ${s3.get(node)} < $v1")
    }
  }

  test("graphSearch recall@10 vs brute force on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val graph = GraphAnn.nnDescentGraph(e, "vec_id", "embedding", k = 16, iters = 4)
    val probes = e.select(col("vec_id").as("q_id"))
      .filter(pmod(col("q_id"), lit(41)) === 0)
    val got = GraphAnn.graphSearch(e, "vec_id", "embedding", graph,
        probes, "q_id", k = 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        e.filter(pmod(col("vec_id"), lit(41)) === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet === exact.keySet)
    val recall = exact.keys.toSeq.map { q =>
      (got(q) intersect exact(q)).size.toDouble / exact(q).size
    }
    val mean = recall.sum / recall.size
    assert(mean >= 0.75, s"graph-search recall@10 $mean below floor")

    // the search-time beam knob lifts recall WITHOUT rebuilding: ef=160
    // (the exported q_ann_graph_search point) must clear the >=0.95
    // family bar here and never lose to the plain two-hop search
    val gotEf = GraphAnn.graphSearch(e, "vec_id", "embedding", graph,
        probes, "q_id", k = 10, ef = 160)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(gotEf.keySet === exact.keySet)
    val recallEf = exact.keys.toSeq.map { q =>
      (gotEf(q) intersect exact(q)).size.toDouble / exact(q).size
    }
    val meanEf = recallEf.sum / recallEf.size
    assert(meanEf >= 0.95, s"beam-search recall@10 $meanEf below the family bar")
    assert(meanEf >= mean - 1e-9, s"ef widened the beam but recall fell: $meanEf < $mean")
    // beam results are a superset-refinement: every probe still gets k rows
    assert(gotEf.values.forall(_.size == 10))
  }

  test("graphInsert links a new batch cluster-locally and leaves untouched rows byte-identical") {
    val corpus = clustered(12) // 36 nodes, clusters of 12 by id/12
    val graph = GraphAnn.nnDescentGraph(corpus, "vec_id", "embedding",
      k = 6, iters = 3).localCheckpoint(true)
    // four NEW vectors in cluster 0's direction, INTERLEAVED into the
    // corpus spread (0.505, 0.515, …) so each is some corpus node's true
    // nearest neighbor — the back-link must then crack that node's top-k
    val batch = (0 until 4).map { i =>
      val base = Array.fill(8)(0.05f)
      base(0) = 1f
      base(1) = 0.505f + 0.01f * i
      ((100 + i).toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val merged = GraphAnn.graphInsert(corpus, "vec_id", "embedding",
        graph, batch, k = 6, ef = 12, hops = 2)
      .localCheckpoint(true)
    def cluster(id: Long): Long = if (id >= 100) 0L else id / 12
    val edges = merged.select("vec_id", "nb_id").as[(Long, Long)].collect()
    // every batch node is present with a full cluster-local list
    val batchEdges = edges.filter(_._1 >= 100)
    assert(batchEdges.groupBy(_._1).size === 4)
    assert(batchEdges.groupBy(_._1).forall(_._2.length == 6))
    assert(batchEdges.forall { case (_, nb) => cluster(nb) == 0L },
      s"batch linked cross-cluster: ${batchEdges.filter(e => cluster(e._2) != 0L).take(5).toSeq}")
    // back-link: some corpus node in cluster 0 now lists a batch neighbor
    assert(edges.exists { case (n, nb) => n < 100 && nb >= 100 },
      "no corpus node back-linked the batch")
    // sublinearity observable: nodes outside cluster 0 were never touched —
    // their rows (ranks and sims included) are byte-identical to the input
    val before = graph.filter(col("vec_id") >= 12)
      .as[(Long, Int, Long, Double)].collect().toSet
    val after = merged.filter(col("vec_id") >= 12 && col("vec_id") < 100)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(after === before, "untouched corpus rows changed")
    // k-bound everywhere
    assert(edges.groupBy(_._1).forall(_._2.length <= 6))
  }

  test("graphInsert merged-graph search recall on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val corpus = e.filter(pmod(col("vec_id"), lit(7)) =!= 0)
    val batch = e.filter(pmod(col("vec_id"), lit(7)) === 0)
    val graph = GraphAnn.nnDescentGraph(corpus, "vec_id", "embedding",
      k = 16, iters = 4).localCheckpoint(true)
    val merged = GraphAnn.graphInsert(corpus, "vec_id", "embedding",
        graph, batch, k = 16, ef = 32, hops = 2)
      .localCheckpoint(true)
    val probes = e.select(col("vec_id").as("q_id"))
      .filter(pmod(col("q_id"), lit(41)) === 0)
    val got = GraphAnn.graphSearch(e, "vec_id", "embedding", merged,
        probes, "q_id", k = 10, ef = 160)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        e.filter(pmod(col("vec_id"), lit(41)) === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        "q_id", "q_emb", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet === exact.keySet)
    val recall = exact.keys.toSeq.map { q =>
      (got(q) intersect exact(q)).size.toDouble / exact(q).size
    }
    val mean = recall.sum / recall.size
    assert(mean >= 0.95,
      s"merged-graph recall@10 $mean below the family bar (batch probes included)")
  }

  test("graphIndex round-trips through parquet; search and insert serve from the artifact") {
    val df = clustered(12)
    val corpus = df.where(col("vec_id") % 7 =!= 0)
    val batch = df.where(col("vec_id") % 7 === 0)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_graphidx_").toString + "/index.parquet"
    GraphAnn.graphIndex(corpus, "vec_id", "embedding", k = 4, iters = 2)
      .write.mode("overwrite").parquet(idxPath)
    val index = spark.read.parquet(idxPath)
    // the edge view IS the raw builder output (config row filtered out)
    val edges = GraphAnn.graphIndexEdges(index)
      .as[(Long, Int, Long, Double)].collect().toSet
    val direct = GraphAnn.nnDescentGraph(corpus, "vec_id", "embedding",
        k = 4, iters = 2)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(edges === direct, "persisted edge list diverges from the builder")
    // search from the artifact = search over the raw graph
    val probes = corpus.where(col("vec_id") < 3).select(col("vec_id").as("q_id"))
    val viaIndex = GraphAnn.graphSearchIndex(corpus, "vec_id", "embedding",
        index, probes, "q_id", k = 3, ef = 0)
      .as[(Long, Long, Double)].collect().toSet
    val viaGraph = GraphAnn.graphSearch(corpus, "vec_id", "embedding",
        GraphAnn.graphIndexEdges(index), probes, "q_id", k = 3, ef = 0)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaIndex === viaGraph)
    // insertion derives k from the config row and returns a NEW index
    // whose edge view equals raw graphInsert at the same parameters
    val grown = GraphAnn.graphInsertIndex(corpus, "vec_id", "embedding",
      index, batch, ef = 8, hops = 2)
    val grownEdges = GraphAnn.graphIndexEdges(grown)
      .as[(Long, Int, Long, Double)].collect().toSet
    val rawInsert = GraphAnn.graphInsert(corpus, "vec_id", "embedding",
        GraphAnn.graphIndexEdges(index), batch, k = 4, ef = 8, hops = 2)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(grownEdges === rawInsert)
    // the grown index keeps the build config for the NEXT growth cycle
    assert(GraphAnn.graphIndexConfig(grown) === ((4, 2)))
    // a frame with no config row fails loudly
    intercept[IllegalArgumentException](
      GraphAnn.graphIndexConfig(index.filter(col("kind") === "edge")))
  }

  test("no cartesian stage anywhere in build or search") {
    val df = clustered(8)
    val g = GraphAnn.nnDescentGraph(df, "vec_id", "embedding", k = 4, iters = 1)
    val plan = GraphAnn.graphSearch(df, "vec_id", "embedding", g,
        df.select(col("vec_id").as("q_id")).limit(3), "q_id", k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("parameter guards") {
    val df = clustered(2)
    intercept[IllegalArgumentException](
      GraphAnn.nnDescentGraph(df, "vec_id", "embedding", k = 0, iters = 1))
    intercept[IllegalArgumentException](
      GraphAnn.nnDescentGraph(df, "vec_id", "embedding", k = 2, iters = 0))
    intercept[IllegalArgumentException](
      GraphAnn.graphSearch(df, "vec_id", "embedding", df.limit(0),
        df.select(col("vec_id").as("q_id")), "q_id", k = 0))
    val g = GraphAnn.nnDescentGraph(df, "vec_id", "embedding", k = 2, iters = 1)
    intercept[IllegalArgumentException]( // ef below k
      GraphAnn.graphInsert(df, "vec_id", "embedding", g, df, k = 4, ef = 2))
    intercept[IllegalArgumentException]( // zero hops
      GraphAnn.graphInsert(df, "vec_id", "embedding", g, df, k = 2, ef = 4, hops = 0))
  }
}
