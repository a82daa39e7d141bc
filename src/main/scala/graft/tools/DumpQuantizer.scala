package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug dump of the driver-side trained quantizers (fixed-point Lloyd
  * centroids + PQ codebooks) as JSON — the mid-point ground truth the
  * generated DuckDB oracle CTE chains are validated against while
  * iterating (scripts/scratch_kmeans.py compares this against the SQL
  * replay step by step, which is ~100× faster than debugging through the
  * whole end-to-end gate).
  */
object DumpQuantizer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "/tmp/quantizer_dump.json"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = graft.ext.Similarity.kmeansCentroids(
      e, "vec_id", "embedding", nCentroids = 32)
    val cbs = graft.ext.Similarity.pqCodebooks(
      e, "vec_id", "embedding", m = 8, ksub = 16, iters = 10)
    def fmtF(a: Array[Float]): String =
      a.map(v => "%.9e".format(v.toDouble)).mkString("[", ",", "]")
    val cj = cents.map { case (id, cv) => s"""{"cid":$id,"f":${fmtF(cv)}}""" }
      .mkString("[", ",", "]")
    val bj = cbs.map(cb => cb.map(fmtF).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      s"""{"centroids":$cj,"codebooks":$bj}""")
    println(s"wrote $out")
    spark.stop()
  }
}
