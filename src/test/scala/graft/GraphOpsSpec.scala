package graft

import org.apache.spark.sql.functions._

import graft.ext.GraphOps

/** Triangle census invariants: hand-counted motifs, brute-force parity
  * on a pseudo-random graph, and hub-safety of the orientation.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val e = GraphOps.canonicalEdges(edges.toDF("a", "b"), "a", "b")
    val r = GraphOps.triangleStats(e).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("K4 has 4 triangles, a path has none; self-loops and duplicates drop") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val (n, m, w, t, c) = stats(k4 ++ Seq((2L, 2L), (1L, 0L), (3L, 1L)))
    assert((n, m, t) === (4L, 6L, 4L))
    // Center-counted wedges: every node has degree 3 -> 4 * C(3,2) = 12,
    // and in a clique every wedge closes: closure_q = 3*4*1e6/12 = 1e6.
    assert(w === 12L)
    assert(c === 1000000L)
  }

  test("triangleStats: an empty edge frame yields the all-zero census") {
    val e = GraphOps.canonicalEdges(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    val r = GraphOps.triangleStats(e).head()
    assert((0 to 4).map(r.getLong) === Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("triangle star graph: hub with leaves has zero triangles") {
    val star = (1L to 20L).map(i => (0L, i))
    val (_, m, _, t, c) = stats(star)
    assert(m === 20L && t === 0L && c === 0L)
  }

  test("brute-force parity on a pseudo-random graph") {
    // 60 nodes, deterministic LCG edge selection (~12% density).
    val edges = for {
      i <- 0L until 60L; j <- (i + 1) until 60L
      if ((i * 2654435761L + j * 40503L) % 100) < 12
    } yield (i, j)
    val eset = edges.toSet
    val brute = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L; c <- (b + 1) until 60L
      if eset((a, b)) && eset((b, c)) && eset((a, c))
    } yield 1).size.toLong
    val (_, m, _, t, _) = stats(edges)
    assert(m === edges.size.toLong)
    assert(t === brute)
    assert(brute > 0, "degenerate fixture: no triangles to check")
  }

  test("trianglesPerNode credits all three corners and sums to 3x count") {
    val edges = for {
      i <- 0L until 60L; j <- (i + 1) until 60L
      if ((i * 2654435761L + j * 40503L) % 100) < 12
    } yield (i, j)
    val e = GraphOps.canonicalEdges(edges.toDF("a", "b"), "a", "b")
    val total = GraphOps.triangleStats(e).head().getLong(3)
    val per = GraphOps.trianglesPerNode(e)
      .agg(sum("n_tri")).as[Long].head()
    assert(per === 3 * total)
  }

  test("kCore: cliques survive, stars dissolve, peeling cascades by round") {
    val k4 = (for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)).toDF("a", "b")
    val k4core = GraphOps.kCore(GraphOps.canonicalEdges(k4, "a", "b"), 3, 4)
      .as[(Long, Long)].collect().toSet
    assert(k4core === (0L to 3L).map(_ -> 3L).toSet)

    val star = (1L to 10L).map((0L, _)).toDF("a", "b")
    assert(GraphOps.kCore(GraphOps.canonicalEdges(star, "a", "b"), 2, 3)
      .count() === 0L)

    // Path 1-2-3-4-5 at k=2: round 1 peels the endpoints leaving 2-3-4,
    // whose NEW endpoints only die in round 2 — fixed rounds expose the
    // cascade stage by stage.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val e = GraphOps.canonicalEdges(path, "a", "b")
    val r1 = GraphOps.kCore(e, 2, 1).as[(Long, Long)].collect().toSet
    assert(r1 === Set((3L, 2L)))
    assert(GraphOps.kCore(e, 2, 2).count() === 0L)
  }

  test("connectedComponents: pointer jumping collapses a long path in log rounds") {
    // an 800-node path has diameter 799: naive min-propagation would need
    // 799 rounds; the jump gets there in ~log2
    val path = (0L until 799L).map(i => (i, i + 1)).toDF("a", "b")
    val e = GraphOps.canonicalEdges(path, "a", "b")
    val comps = GraphOps.connectedComponents(e, rounds = 12)
      .select("comp").distinct().as[Long].collect()
    assert(comps.toSeq === Seq(0L))
  }

  test("connectedComponents: separates components and labels by the minimum") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L))
      .toDF("a", "b")
    val e = GraphOps.canonicalEdges(edges, "a", "b")
    val got = GraphOps.connectedComponents(e, rounds = 6)
      .as[(Long, Long)].collect().toSet
    assert(got === Set(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("early fixed-point exit returns the full unroll's output (r20)") {
    // A 40-node path converges (pointer jumping) well inside 16 rounds;
    // any round budget PAST convergence must return the identical
    // labeling — that's the proof obligation of the early-exit
    // optimization (a round that changes nothing is the identity, so
    // skipping the remaining rounds cannot change the output).
    val path = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val e = GraphOps.canonicalEdges(path, "a", "b")
    val atConvergence = GraphOps.connectedComponents(e, rounds = 8)
      .as[(Long, Long)].collect().toSet
    val bigBudget = GraphOps.connectedComponents(e, rounds = 16)
      .as[(Long, Long)].collect().toSet
    assert(bigBudget === atConvergence)
    assert(bigBudget === (0L until 40L).map(_ -> 0L).toSet)

    // kCore: K4 + a pendant chain peels in 2 rounds; budgets 2 and 6
    // must agree (edge count stable => edge set stable => identity).
    val k4chain = (for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)) ++
      Seq((3L, 4L), (4L, 5L))
    val ke = GraphOps.canonicalEdges(k4chain.toDF("a", "b"), "a", "b")
    val r2 = GraphOps.kCore(ke, 3, 2).as[(Long, Long)].collect().toSet
    val r6 = GraphOps.kCore(ke, 3, 6).as[(Long, Long)].collect().toSet
    assert(r6 === r2)
    assert(r6 === (0L to 3L).map(_ -> 3L).toSet)
  }

  test("orientation bounds hub out-degree: star hub keeps out-degree 0") {
    // In a star the hub has max degree, so every edge orients leaf->hub:
    // the hub is never a wedge pivot — the scale guarantee in miniature.
    val star = (1L to 50L).map(i => (0L, i)).toDF("a", "b")
    val e = GraphOps.canonicalEdges(star, "a", "b")
    val m = classOf[GraphOps.type].getDeclaredMethod("orientByDegree",
      classOf[org.apache.spark.sql.DataFrame])
    m.setAccessible(true)
    val o = m.invoke(GraphOps, e).asInstanceOf[org.apache.spark.sql.DataFrame]
    val hubOut = o.where(col("src") === 0L).count()
    assert(hubOut === 0L)
  }
}
