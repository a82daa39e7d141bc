package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph motif counting — triangle counting by degree
  * orientation (the MapReduce formulation of Suri & Vassilvitskii, WWW
  * 2011: orient every undirected edge from its lower-(degree, id)
  * endpoint to the higher one, enumerate wedges only at each edge's
  * SOURCE, and close them against the oriented edge set).
  *
  * Why this shape at 100 TB: the naive wedge enumeration pivots on every
  * vertex and explodes on hubs (a degree-10⁶ vertex contributes 5·10¹¹
  * wedges). Orientation caps the out-degree of every vertex at O(√m)
  * (a vertex keeps only edges toward HIGHER-degree endpoints, and fewer
  * than √m endpoints can have degree above √m), so the wedge volume is
  * O(m^1.5) worst-case and O(m·arboricity) on real graphs — the standard
  * scalable bound. Every step is an equi-join or aggregate on vertex
  * keys: plain shuffles, AQE-splittable, no driver state.
  */
object GraphOps {

  /** Canonicalize an undirected edge list: (u, v) with u < v, self-loops
    * dropped, parallel edges collapsed.
    */
  def canonicalEdges(edges: DataFrame, src: String, dst: String): DataFrame =
    edges.select(least(col(src), col(dst)).as("u"),
        greatest(col(src), col(dst)).as("v"))
      .where(col("u") < col("v"))
      .distinct()

  /** Degree-oriented edge list of a canonical (u < v, distinct) edge
    * frame: one row per edge, `src → dst` where (deg, id) of src is
    * lexicographically smaller. Carries `ddeg` (dst's degree) so wedge
    * generation can order a wedge's two far endpoints without another
    * join. Pinned (localCheckpoint) because the triangle join consumes
    * it three times — the multi-consumer rule.
    */
  private[ext] def orientByDegree(canonical: DataFrame): DataFrame = {
    val deg = canonical.select(col("u").as("n"))
      .unionAll(canonical.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = canonical
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    withDeg.select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, col("dv")).otherwise(col("du")).as("ddeg"))
      .localCheckpoint(true)
  }

  /** Global triangle census of an undirected graph: one row with
    * `n_nodes`, `n_edges`, `n_wedges` (unordered open/closed two-paths),
    * `n_triangles`, and the global clustering coefficient as a
    * fixed-point ratio `closure_q = (3 · triangles · 10⁶) div wedges`
    * (exact integer arithmetic — no float crosses an engine boundary).
    *
    * `edges` must be canonical (u < v, distinct): build it with
    * [[canonicalEdges]].
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val o = orientByDegree(edges)
    // Wedges pivot at the oriented source; the two far endpoints are
    // ordered by the SAME (deg, id) key the orientation used, so the
    // closing edge — if present — is oriented exactly e1.dst → e2.dst.
    val e1 = o.select(col("src"), col("dst").as("w1"), col("ddeg").as("g1"))
    val e2 = o.select(col("src"), col("dst").as("w2"), col("ddeg").as("g2"))
    val triangles = e1.join(e2, "src")
      .where(col("g1") < col("g2") ||
        (col("g1") === col("g2") && col("w1") < col("w2")))
      .join(o.select(col("src").as("w1"), col("dst").as("w2")), Seq("w1", "w2"))
    // Node and wedge counts analytically from the UNORIENTED degree frame
    // (n_wedges = Σ C(deg, 2), the classic center-counted two-paths of the
    // clustering-coefficient denominator) — the oriented wedge frame, the
    // potentially huge intermediate, is built exactly once, for the
    // triangle join.
    val degStats = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .agg(count(lit(1)).as("nodes"),
        // coalesce: sum over an EMPTY edge frame is NULL, and the zero-row
        // census should read all-zeros, not NPE on getLong
        coalesce(expr("sum((d * (d - 1)) div 2)"), lit(0L)).as("w"))
      .head()
    val nNodes = degStats.getLong(0)
    val nWedges = degStats.getLong(1)
    val nEdges = edges.count()
    val nTri = triangles.count()
    val closureQ = if (nWedges == 0) 0L else 3L * nTri * 1000000L / nWedges
    edges.sparkSession.range(1).select(
      lit(nNodes).as("n_nodes"), lit(nEdges).as("n_edges"),
      lit(nWedges).as("n_wedges"), lit(nTri).as("n_triangles"),
      lit(closureQ).as("closure_q"))
  }

  /** Approximate k-core by fixed-round peeling: repeatedly drop nodes of
    * degree < k and the edges touching them, `rounds` times, then report
    * the surviving nodes of degree ≥ k with their residual degrees. At
    * convergence (no node dropped in a round) this IS the k-core — the
    * maximal subgraph where every node keeps ≥ k neighbors, the standard
    * dense-community/botnet-cluster extractor.
    *
    * The round count is a CONTRACT, not a convergence test: both the
    * operator and its oracle execute exactly `rounds` peels, so results
    * are comparable engine-to-engine even mid-convergence (a data-driven
    * stopping rule would make the oracle unroll depth data-dependent).
    * Each round is a degree aggregate plus two equi-joins against the
    * kept-node list; the edge frame is checkpointed per round — the
    * iterative-loop planning rule — so plans stay constant-size.
    *
    * `edges` must be canonical (u < v, distinct).
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
    var e = edges.localCheckpoint(true)
    // Early fixed-point exit (optimization r20): each round only FILTERS
    // the edge set (e' ⊆ e), so an unchanged edge COUNT means an
    // unchanged edge SET, hence unchanged degrees, hence every later
    // round is the identity — the output after `rounds` rounds is
    // bit-identical whether or not the identity rounds actually execute
    // (GraphOpsSpec pins this against the full unroll). The count is a
    // cheap scan of the round's already-checkpointed blocks; a skipped
    // round saves a degree aggregate plus two shuffled joins.
    var prevCount = e.count()
    var converged = false
    for (r <- 1 to rounds if !converged) {
      val keep = degrees(e).where(col("deg") >= k).select("n")
        .localCheckpoint(true)
      e = e.join(keep.withColumnRenamed("n", "u"), Seq("u"))
        .join(keep.withColumnRenamed("n", "v"), Seq("v"))
        .select("u", "v")
        .localCheckpoint(true)
      if (r < rounds) { // the final round's probe gates nothing
        val c = e.count()
        converged = c == prevCount
        prevCount = c
      }
    }
    degrees(e).where(col("deg") >= k)
      .select(col("n").as("node"), col("deg"))
  }

  /** Connected components by min-label propagation WITH pointer jumping
    * (the hash-to-min family, Rastogi et al. 2013): each round a node
    * takes the minimum of its neighbors' labels AND its label's label
    * (`lbl(lbl(v))`). The jump is what makes this scale: plain
    * min-propagation needs DIAMETER rounds (a 10⁷-node chain = 10⁷
    * shuffles), the jump doubles the influence radius every round, so
    * O(log d) rounds suffice — the difference between 24 and 10⁷ jobs
    * at 100 TB. Fixed `rounds` is the oracle-unroll contract (same rule
    * as [[kCore]]); at convergence the label IS the component minimum.
    *
    * Dedup's bucket-min clustering ([[Dedup]]) is the naive-propagation
    * sibling — correct there because near-dup clusters have tiny
    * diameters; THIS is the operator for long-chain graphs.
    *
    * `edges` must be canonical (u < v, distinct). Output: (node, comp).
    */
  def connectedComponents(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    val e = edges.localCheckpoint(true)
    val both = e.select(col("u").as("a"), col("v").as("b"))
      .unionAll(e.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint(true)
    var lbl = both.select(col("a").as("n")).distinct()
      .withColumn("lbl", col("n"))
      .localCheckpoint(true)
    // Early fixed-point exit (optimization r20): the step is a
    // deterministic function of the label state over the static edge
    // list, so a round that changes NO label has reached the fixed
    // point and every later round is the identity — the output after
    // `rounds` rounds is bit-identical whether or not the identity
    // rounds execute (GraphOpsSpec pins this against the full unroll).
    // Influence doubles per round (pointer jumping), so real graphs
    // converge well before a worst-case-sized round budget; the changed-
    // label probe is a cheap scan of the round's checkpointed blocks,
    // a skipped round saves two shuffled joins plus an aggregate.
    var converged = false
    for (r <- 1 to rounds if !converged) {
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
      // the final round's probe is dead weight — its answer gates nothing
      converged = r < rounds &&
        pinned.where(col("lbl") =!= col("_prev")).isEmpty
      lbl = pinned.drop("_prev")
    }
    lbl.select(col("n").as("node"), col("lbl").as("comp"))
  }

  /** Per-node triangle participation: (node, n_tri) for every node that
    * closes at least one triangle — the local signal that separates
    * community members from bridge/hub nodes. Same oriented join as
    * [[triangleStats]]; each triangle credits all three corners.
    */
  def trianglesPerNode(edges: DataFrame): DataFrame = {
    val o = orientByDegree(edges)
    val e1 = o.select(col("src"), col("dst").as("w1"), col("ddeg").as("g1"))
    val e2 = o.select(col("src"), col("dst").as("w2"), col("ddeg").as("g2"))
    val tri = e1.join(e2, "src")
      .where(col("g1") < col("g2") ||
        (col("g1") === col("g2") && col("w1") < col("w2")))
      .join(o.select(col("src").as("w1"), col("dst").as("w2")), Seq("w1", "w2"))
      .select("src", "w1", "w2")
      // three consumers below (one per credited corner) — pin, or the
      // wedge join replays three times
      .localCheckpoint(true)
    tri.select(col("src").as("node"))
      .unionAll(tri.select(col("w1").as("node")))
      .unionAll(tri.select(col("w2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }
}
