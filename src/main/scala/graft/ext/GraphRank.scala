package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph authority for crawl curation: FIXED-POINT PageRank over a
  * (src, dst) edge frame — the classic "which domains does the web
  * vouch for" signal that feeds crawl scheduling and per-domain quality
  * priors alongside [[UrlOps.domainRollup]].
  *
  * Numerics follow the suite's trainable-loop discipline (the Lloyd /
  * GD / label-propagation pattern): ranks are scale-10¹² longs, every
  * division is the shared round-half-up integer rational, every
  * reduction is an exact commutative long sum — bit-deterministic under
  * any partitioning and replayable verbatim as an unrolled DuckDB CTE
  * chain. Magnitude headroom: Σ ranks ≈ RankScale (probability mass up
  * to half-up residue), so per-node inputs stay ≤ ~10¹² and the damping
  * product ≤ ~10¹⁵ — longs throughout.
  *
  * Graph conventions (documented, standard simplifications): parallel
  * edges collapse (simple graph), self-loops count like any edge, and a
  * DANGLING node's mass is by default dropped rather than redistributed
  * — the teleport term keeps every rank positive, and at crawl scale
  * the dangling correction is a constant that rescales ranks without
  * reordering them. Pass `redistributeDangling = true` for the textbook
  * treatment (dangling mass re-enters through the teleport
  * distribution each iteration, so Σ ranks ≈ RankScale and magnitudes
  * compare directly against NetworkX/GraphX).
  *
  * Scale shape: per iteration, ONE src-keyed join of the edge frame
  * against the rank frame (+ the static out-degree frame) and ONE
  * dst-keyed aggregation — no driver-side graph, no collect; ranks are
  * checkpointed per iteration (bounded lineage, the label-propagation
  * treatment). `iters` is bounded — PageRank at damping 0.85 moves
  * under 10⁻³ of mass after ~10 rounds on real web graphs.
  */
object GraphRank {

  /** Rank scale: 10¹² (a rank of 1.0 in probability terms). */
  val RankScale: Long = 1000000000000L

  /** Round-half-up positive integer division as a Column (Spark SQL
    * `div` — integral division, matching DuckDB `//` on non-negative
    * operands).
    */
  private def halfUpCol(num: Column, den: Column): Column =
    call_function("div", num * 2 + den, den * 2)

  private def halfUpLong(num: Long, den: Long): Long =
    (2 * num + den) / (2 * den)

  /** PageRank over `edges`: returns `(node, rank_q)` with `rank_q` at
    * [[RankScale]]. `dampingPerMille` is the damping factor ×1000 (850 =
    * the classic 0.85) so the teleport split stays exact integers.
    *
    * `teleportTo` personalizes the walk (topic-sensitive PageRank,
    * Haveliwala WWW 2002): the teleport mass lands uniformly on that
    * node SET instead of the whole graph, so ranks answer "authoritative
    * as seen FROM my target domains" — the authority prior that pairs
    * with the DSIR target-domain selection. Teleport-set nodes absent
    * from the graph still receive teleport mass (they are legitimate
    * walk restarts); with personalization, nodes unreachable from the
    * set converge to rank 0.
    *
    * `redistributeDangling` adds the standard dangling correction:
    * each iteration's mass stranded on out-degree-0 nodes is summed
    * (ONE extra node-frame aggregation, broadcast back as a 1-row
    * scalar — no driver action) and re-enters uniformly over the
    * teleport distribution before damping. WITHIN one iteration the
    * correction is the same additive term for every node on the
    * uniform walk, but across iterations that mass propagates through
    * edges non-uniformly, so final rank ORDER may differ from the
    * dropped-mass variant — do not rely on order-equivalence between
    * the two modes; magnitudes become mass-conserving.
    *
    * `checkpointDir` selects DURABLE per-iteration lineage truncation
    * (the [[Dedup.minhashDedupClusters]] contract): the default
    * localCheckpoint pins blocks to executor storage, so an executor
    * loss mid-run makes every later iteration unrecomputable; on a
    * long-lived cluster pass a reliable store path and each
    * iteration's node-sized rank frame (a sliver of any real corpus)
    * is checkpointed there instead.
    */
  def pageRank(
      edges: DataFrame, src: String, dst: String,
      iters: Int = 10, dampingPerMille: Int = 850,
      teleportTo: Option[Seq[String]] = None,
      checkpoint: Boolean = true,
      redistributeDangling: Boolean = false,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(dampingPerMille >= 0 && dampingPerMille <= 1000,
      s"dampingPerMille must be in [0, 1000], got $dampingPerMille")
    require(teleportTo.forall(_.nonEmpty), "teleportTo must be non-empty")
    // Pinned (r20): e is scanned by the node derivation, the out-degree
    // aggregate, the dangling set, AND every iteration's contribution
    // join — unpinned, each iteration re-derived the edge list from the
    // raw input (a source scan + distinct exchange per iteration).
    val e = edges
      .select(col(src).cast("string").as("_src"),
        col(dst).cast("string").as("_dst"))
      .where(col("_src").isNotNull && col("_dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val spark = edges.sparkSession
    val graphNodes = e.select(col("_src").as("node"))
      .unionByName(e.select(col("_dst").as("node")))
    val nodes = teleportTo
      .fold(graphNodes) { ts =>
        import spark.implicits._
        graphNodes.unionByName(ts.toDF("node"))
      }
      .distinct()
      .localCheckpoint(true) // scanned every iteration; pin it once
    // ONE bounded scalar action — the same class as the trainers' counts
    val nNodes = nodes.count()
    require(nNodes > 0, "pageRank: empty graph")
    // loop-invariant (r20): (edge, out-degree) is static across
    // iterations — join it ONCE and pin, so each iteration is one join
    // against the current ranks plus the contribution aggregate instead
    // of re-running the degree aggregate and a second join
    val eDeg = e.join(e.groupBy("_src").agg(count(lit(1)).as("_deg")), "_src")
      .localCheckpoint(true)
    // per-node teleport and initial mass: uniform over the graph, or
    // uniform over the teleport set (0 elsewhere) when personalized
    val (tele, r0) = teleportTo match {
      case None =>
        val t = lit(halfUpLong(
          (1000L - dampingPerMille) * RankScale, 1000L * nNodes))
        (t, lit(halfUpLong(RankScale, nNodes)))
      case Some(ts) =>
        val member = col("node").isin(ts.distinct: _*)
        val t = when(member, lit(halfUpLong(
            (1000L - dampingPerMille) * RankScale,
            1000L * ts.distinct.size))).otherwise(lit(0L))
        (t, when(member,
          lit(halfUpLong(RankScale, ts.distinct.size))).otherwise(lit(0L)))
    }
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    // static dangling set: graph nodes with no outgoing edge (teleport-
    // only nodes included — their mass strands identically)
    val dangling =
      if (redistributeDangling)
        nodes.join(e.select(col("_src").as("node")).distinct(),
          Seq("node"), "left_anti").localCheckpoint(true)
      else null
    // per-node share of a given stranded mass under the teleport
    // distribution (uniform, or uniform over the personalized set)
    val danglingShare: Column => Column = dm => teleportTo match {
      case None => halfUpCol(dm, lit(nNodes))
      case Some(ts) =>
        when(col("node").isin(ts.distinct: _*),
          halfUpCol(dm, lit(ts.distinct.size.toLong))).otherwise(lit(0L))
    }
    var ranks = nodes.withColumn("_r", r0)
    for (_ <- 1 to iters) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "_src"), "_src")
        .select(col("_dst").as("node"),
          halfUpCol(col("_r"), col("_deg")).as("_c"))
        .groupBy("node").agg(sum("_c").as("_in"))
      val base = nodes.join(contribs, Seq("node"), "left")
      val withIn =
        if (redistributeDangling) {
          val dm = ranks.join(dangling, Seq("node"), "left_semi")
            .agg(coalesce(sum("_r"), lit(0L)).as("_dm"))
          base.crossJoin(broadcast(dm))
            .withColumn("_in",
              coalesce(col("_in"), lit(0L)) + danglingShare(col("_dm")))
        } else base.withColumn("_in", coalesce(col("_in"), lit(0L)))
      ranks = withIn
        .select(col("node"),
          (tele + halfUpCol(
            lit(dampingPerMille.toLong) * col("_in"),
            lit(1000L))).as("_r"))
      // bounded-lineage discipline: without this, iteration i's plan
      // embeds every prior join/agg and planning goes quadratic
      if (checkpointDir.isDefined) ranks = ranks.checkpoint(true)
      else if (checkpoint) ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("node"), col("_r").as("rank_q"))
  }
}
