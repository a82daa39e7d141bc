// Recall/cost sweep for the ANN operating points. Round-13 measured
// frontier at sf0.1 (recall@10 / wall s):
//   lsh  b6 t4 0.733/3.9 | b6 t8 0.900/3.1 | b6 t12 0.967/3.8
//        b8 t4 0.467     | b8 t8 0.633     | b8 t12 0.767
//   pq   m8 rf16 0.733 | m8 rf32 0.900/1.9 | m8 rf64 0.967/1.8
//        m16 rf16 0.967 | m16 rf32 1.000/2.9 (m16 doubles encode cost)
//   ivf  np8 1.000/0.9 | np12 1.000 | np16 1.000
//   ivfpq np8 rf16 0.767 | rf32 0.900 | rf48 0.933 | rf64 1.000/1.9
// Chosen defaults in the q_ann_* queries: lsh b6 t12, pq m8 rf64,
// ivf np8, ivfpq np8 rf64 — every exported family >= 0.95 with margin
// against testdata regeneration, at equal-or-lower wall than the old
// 0.73 points (the rerank tail is cheap; candidates stay bounded).
package graft.tools

import org.apache.spark.sql.functions._
import graft.ext.Similarity

object AnnSweep {
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
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        probes, "q_id", "q_emb", 10)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def measure(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (got & exact).size.toDouble / exact.size
      println(f"SWEEP $name recall=$recall%.3f wall=$sec%.2f")
    }

    for (bits <- Seq(6, 8); tables <- Seq(4, 8, 12)) {
      measure(s"lsh bits=$bits tables=$tables probe=1") {
        Similarity.lshTopKMulti(e, "vec_id", "embedding", probes,
          "q_id", "q_emb", 10, bits = bits, tables = tables, probeHamming = 1)
      }
    }
    for (rf <- Seq(16, 32, 64); m <- Seq(8, 16)) {
      measure(s"pq m=$m rf=$rf") {
        Similarity.pqTopK(e, "vec_id", "embedding", probes,
          "q_id", "q_emb", k = 10, m = m, ksub = 16, rerankFactor = rf)
      }
    }
    for (np <- Seq(8, 12, 16)) {
      measure(s"ivf nprobe=$np") {
        Similarity.ivfTopK(e, "vec_id", "embedding", probes,
          "q_id", "q_emb", k = 10, nCentroids = 32, nProbe = np)
      }
    }
    for (np <- Seq(8); rf <- Seq(16, 32, 48, 64)) {
      measure(s"ivfpq nprobe=$np rf=$rf") {
        Similarity.ivfPqTopK(e, "vec_id", "embedding", probes,
          "q_id", "q_emb", k = 10, nCentroids = 32, nProbe = np,
          rerankFactor = rf)
      }
    }
    spark.stop()
  }
}
