package graft

import org.apache.spark.sql.functions._

import graft.ext.GraphRank

/** Behavioral sanity for the fixed-point PageRank — the oracle gate pins
  * cross-engine exactness; these pin that the ranks mean what PageRank
  * ranks mean.
  */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  test("a star's hub outranks its leaves; leaves tie exactly") {
    // every leaf links to the hub, the hub links back to one leaf.
    // 40 iterations: this graph OSCILLATES (hub and leaf a trade mass
    // each round, amplitude decaying by d² per cycle), so the converged
    // ordering hub > a only emerges once the swing has died down —
    // at 10 iterations the snapshot can still have a on top.
    val edges = (Seq("a", "b", "c", "d").map(_ -> "hub") :+ ("hub" -> "a"))
      .toDF("src", "dst")
    val ranks = GraphRank.pageRank(edges, "src", "dst", iters = 40)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("hub") > ranks("a"))
    assert(ranks("a") > ranks("b"), "the hub's back-link must lift leaf a")
    assert(ranks("b") == ranks("c") && ranks("c") == ranks("d"),
      "symmetric leaves must tie bit-exactly")
  }

  test("a cycle is rank-uniform and mass is conserved to half-up residue") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst")
    val ranks = GraphRank.pageRank(edges, "src", "dst", iters = 10)
      .collect().map(r => r.getLong(1))
    assert(ranks.distinct.length == 1, s"cycle ranks differ: ${ranks.toSeq}")
    val total = ranks.sum
    assert(math.abs(total - GraphRank.RankScale) <= 100,
      s"mass $total drifted from ${GraphRank.RankScale}")
  }

  test("personalized teleport: unreachable nodes sink to 0, absent targets restart") {
    // a -> b -> c, plus an island x -> y unreachable from the target
    val edges = Seq("a" -> "b", "b" -> "c", "x" -> "y").toDF("src", "dst")
    val ranks = GraphRank.pageRank(edges, "src", "dst", iters = 20,
        teleportTo = Some(Seq("a", "z")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // z is not in the graph but is a legitimate restart point: it holds
    // exactly its teleport share (no in-links)
    assert(ranks.contains("z") && ranks("z") > 0)
    assert(ranks("a") == ranks("z"), "a has no in-links either: same rank")
    // mass flows a -> b -> c; nothing reaches the island
    assert(ranks("b") > 0 && ranks("c") > 0)
    assert(ranks("x") == 0 && ranks("y") == 0,
      s"island must sink to 0, got x=${ranks("x")} y=${ranks("y")}")
  }

  test("dangling redistribution conserves mass and preserves rank order") {
    // chain a -> b -> c: c is dangling and strands mass by default
    val edges = Seq("a" -> "b", "b" -> "c").toDF("src", "dst")
    val drop = GraphRank.pageRank(edges, "src", "dst", iters = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val redist = GraphRank.pageRank(edges, "src", "dst", iters = 20,
        redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // drop mode leaks c's mass every round: total well below RankScale
    assert(drop.values.sum < GraphRank.RankScale * 9 / 10)
    // textbook mode conserves mass to half-up residue
    assert(math.abs(redist.values.sum - GraphRank.RankScale) <= 100,
      s"mass ${redist.values.sum} drifted from ${GraphRank.RankScale}")
    // rank ORDER agrees between the modes (the documented drop-mode
    // contract: the dangling correction rescales, it does not reorder)
    def order(m: Map[String, Long]) =
      m.toSeq.sortBy { case (n, r) => (-r, n) }.map(_._1)
    assert(order(drop) == order(redist))
    // every node strictly gains mass under redistribution
    assert(Seq("a", "b", "c").forall(n => redist(n) > drop(n)))
    // personalized variant also conserves mass (teleport set holds it)
    val ppr = GraphRank.pageRank(edges, "src", "dst", iters = 20,
        teleportTo = Some(Seq("a")), redistributeDangling = true)
      .collect().map(r => r.getLong(1))
    assert(math.abs(ppr.sum - GraphRank.RankScale) <= 100,
      s"personalized mass ${ppr.sum} drifted")
  }

  test("durable checkpointDir yields identical ranks and writes the dir") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pr-ckpt").toString
    val local = GraphRank.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val durable = GraphRank.pageRank(edges, "src", "dst", iters = 5,
        checkpointDir = Some(dir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(local == durable)
    // the reliable store actually received the iteration frames
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .count() > 0, "checkpoint dir is empty — durable path not taken")
  }

  test("ranks are partitioning-invariant") {
    val edges = (0 until 200)
      .map(i => (s"n${i % 23}", s"n${(i * 31 + 7) % 23}"))
      .toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      GraphRank.pageRank(df, "src", "dst", iters = 5)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(edges.repartition(13)) == run(edges.orderBy(col("dst"))))
  }
}
