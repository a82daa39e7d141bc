package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proof data generator: writes an N× scaled copy of a testdata
  * directory by replicating the FACT tables (events, orders, lineitem)
  * with shifted keys and passing the dimension tables through unchanged —
  * the standard fact-scaling shape (more facts per dimension row, dims
  * broadcastable at every scale).
  *
  * Key treatment per copy `c` (0-based; copy 0 is the original):
  *  - events: `event_id += c × (max id + 1)` and likewise `user_id`, so
  *    user cardinality scales with the data (sessions keep their per-user
  *    shape); NULL user_ids stay NULL in EVERY copy, so the dominant-key
  *    skew the salted operators defend against scales too.
  *  - orders + lineitem: the SAME `o_orderkey` offset on both sides, so
  *    the join keys stay consistent and selectivity is scale-invariant.
  *  - timestamps, payloads, measures: unchanged (duplicated facts at the
  *    same instants — a denser history, not a longer one).
  *
  * Usage: `runMain graft.ScaleGen <srcSfDir> <outDir> <factor>`
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorStr) = args
    val factor = factorStr.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame =
      spark.read.parquet(s"$srcDir/$t.parquet")
    // Repartition before writing: the explode-based replication is NARROW
    // (output partitioning = the small source's 1-4 input splits), which
    // would serialize every downstream CPU-dense scan onto a handful of
    // giant files — measured 84× wall on a 50× corpus for the JSON-parse
    // query. Real N× corpora arrive as N× more files; make the generator
    // honest about that.
    def write(df: DataFrame, t: String): Unit =
      df.repartition(cpus.toInt).write.mode("overwrite")
        .parquet(s"$outDir/$t.parquet")

    /** Replicate `factor`× in ONE pass (explode over the copy index — no
      * N-way union plan) with per-copy column rewrites.
      */
    def replicate(df: DataFrame, rewrite: (DataFrame, org.apache.spark.sql.Column) => DataFrame): DataFrame = {
      val cols = df.columns
      val exploded = df.withColumn("_copy",
        explode(sequence(lit(0L), lit(factor - 1L))))
      rewrite(exploded, col("_copy")).select(cols.toIndexedSeq.map(col): _*)
    }

    val events = read("events")
    val Array(eventOffset, userOffset) = events
      .agg(max(col("event_id")).cast("long"), max(col("user_id")).cast("long"))
      .head().toSeq.map(_.asInstanceOf[Long] + 1L).toArray
    write(replicate(events, (df, c) => df
      .withColumn("event_id", col("event_id") + c * eventOffset)
      // NULL + anything = NULL, so NULL user_ids replicate as NULL
      .withColumn("user_id", col("user_id") + c * userOffset)), "events")

    val orders = read("orders")
    val orderOffset =
      orders.agg(max(col("o_orderkey")).cast("long")).head().getLong(0) + 1L
    write(replicate(orders, (df, c) => df
      .withColumn("o_orderkey", col("o_orderkey") + c * orderOffset)), "orders")
    write(replicate(read("lineitem"), (df, c) => df
      .withColumn("l_orderkey", col("l_orderkey") + c * orderOffset)), "lineitem")

    // corpus tables replicate too — text/vector payloads unchanged (the
    // copies are exact duplicates: a denser corpus with factor-sized
    // duplicate classes, the realistic stress for dedup keep/drop
    // operators; pair-LISTING queries are excluded from scaled runs since
    // duplicate classes blow up pair counts quadratically by definition)
    val docs = read("documents")
    val docOffset =
      docs.agg(max(col("doc_id")).cast("long")).head().getLong(0) + 1L
    write(replicate(docs, (df, c) => df
      .withColumn("doc_id", col("doc_id") + c * docOffset)), "documents")
    val embs = read("embeddings")
    val vecOffset =
      embs.agg(max(col("vec_id")).cast("long")).head().getLong(0) + 1L
    write(replicate(embs, (df, c) => df
      .withColumn("vec_id", col("vec_id") + c * vecOffset)), "embeddings")

    // dimensions pass through unchanged
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(read(t), t)

    println(s"scaled $srcDir x$factor -> $outDir " +
      s"(events ${events.count() * factor} rows)")
    spark.stop()
  }
}
