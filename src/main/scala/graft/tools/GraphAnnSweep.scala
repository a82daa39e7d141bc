// Recall/cost sweep for the graph-ANN search-time beam knob (ef).
// The graph is built ONCE (k=16, iters=4 — the q_ann_nndescent point);
// each ef point pays only the search. Round-16 measured frontier at
// sf0.1 (recall@10 / search wall s, build 8.1 s):
//   ef=0 0.851/1.3 | 20 0.857 | 32 0.876 | 48 0.914 | 64 0.933
//   ef=96 0.959/1.1-2.1 | 128 0.971/1.7 | 160 0.984/1.6 | 224 0.988/1.5
// Exported point in GraphAnnQueries: ef=160 (>=0.95 bar with margin,
// wall within 1.3x of the ef=0 two-hop search).
package graft.tools

import org.apache.spark.sql.functions._
import graft.ext.{GraphAnn, Similarity}

object GraphAnnSweep {

  /** Insert mode (SPARK_GRAFT_SWEEP_MODE=insert): build the corpus graph
    * on the 6/7 slice, admit the 1/7 batch via [[GraphAnn.graphInsert]],
    * and measure (a) recall@10 of the exported search config over the
    * MERGED graph vs brute force on the full corpus, (b) the same for a
    * full rebuild over corpus+batch — the quality ceiling — and (c) the
    * wall of insert vs rebuild (the sublinearity evidence).
    */
  private def insertMode(spark: org.apache.spark.sql.SparkSession, d: String): Unit = {
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding")
    val corpus = e.filter(pmod(col("vec_id"), lit(7)) =!= 0)
    val batch = e.filter(pmod(col("vec_id"), lit(7)) === 0)
    val probes = e.filter(pmod(col("vec_id"), lit(41)) === 0)
      .select(col("vec_id").as("q_id"))
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        e.filter(pmod(col("vec_id"), lit(41)) === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        "q_id", "q_emb", 10)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(graph: org.apache.spark.sql.DataFrame): Double = {
      val got = GraphAnn.graphSearch(e, "vec_id", "embedding", graph,
          probes, "q_id", k = 10, ef = 160)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    val t0 = System.nanoTime()
    val corpusGraph = GraphAnn.nnDescentGraph(corpus, "vec_id", "embedding",
      k = 16, iters = 4).localCheckpoint(true)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val merged = GraphAnn.graphInsert(corpus, "vec_id", "embedding",
      corpusGraph, batch, k = 16, ef = 32, hops = 2).localCheckpoint(true)
    val tInsert = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val rebuilt = GraphAnn.nnDescentGraph(e, "vec_id", "embedding",
      k = 16, iters = 4).localCheckpoint(true)
    val tRebuild = (System.nanoTime() - t2) / 1e9
    println(f"SWEEP insert corpus_build=$tBuild%.2f insert=$tInsert%.2f " +
      f"rebuild=$tRebuild%.2f recall_merged=${recallOf(merged)}%.3f " +
      f"recall_rebuilt=${recallOf(rebuilt)}%.3f")
  }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (sys.env.get("SPARK_GRAFT_SWEEP_MODE").contains("insert")) {
      insertMode(spark, d); spark.stop(); return
    }
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = e.filter(pmod(col("vec_id"), lit(41)) === 0)
      .select(col("vec_id").as("q_id"))
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        e.filter(pmod(col("vec_id"), lit(41)) === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        "q_id", "q_emb", 10)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val tBuild0 = System.nanoTime()
    val graph = GraphAnn.nnDescentGraph(e, "vec_id", "embedding",
        k = 16, iters = 4)
      .localCheckpoint(true)
    println(f"SWEEP graph build wall=${(System.nanoTime() - tBuild0) / 1e9}%.2f")

    for (ef <- Seq(0, 48, 96, 160, 224)) {
      val t0 = System.nanoTime()
      val got = GraphAnn.graphSearch(e, "vec_id", "embedding", graph,
          probes, "q_id", k = 10, ef = ef)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (got & exact).size.toDouble / exact.size
      println(f"SWEEP graph ef=$ef recall=$recall%.3f wall=$sec%.2f")
    }
    spark.stop()
  }
}
