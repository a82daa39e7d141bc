package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for per-key analytics (SURVEY.md §7.5(5)).
  *
  * After the cleaning fill, `user_id = "unknown"` becomes a mega-key: every
  * window over `Window.partitionBy("user_id")` sends the whole key to ONE
  * task. AQE splits skewed JOINS automatically but cannot split a window
  * partition — that needs restructuring, done here with the classic
  * two-phase salt: partial aggregate on (key, salt), final aggregate on
  * (key), join the result back. Works for any algebraic aggregate
  * (count/sum/min/max); rank-style windows cannot be salted this way.
  */
object Skew {

  /** Per-user event count (reference A1: `q_count_over` semantics) computed
    * skew-safely: rows scatter over `saltBuckets` partial groups, the tiny
    * (users × salt) partial table collapses to per-user totals, and a
    * broadcast join attaches the total to every row. Equivalent to
    * `count(event_id).over(Window.partitionBy("user_id"))` — verified in
    * SkewSpec — but no single task ever holds a whole hot key.
    */
  def countOverSalted(
      df: DataFrame,
      key: String,
      countCol: String,
      out: String,
      saltBuckets: Int = 16): DataFrame = {
    // reserved working names + the output column must not collide with
    // caller data (same contract as TemporalJoins.asofJoin) — withColumn
    // would silently clobber it
    for (c <- Seq("_salt", "_sk_key", out))
      require(!df.columns.contains(c),
        s"countOverSalted reserves column name '$c'; input already has it")
    // salt derived from stable row content, NOT monotonically_increasing_id:
    // a stage retry recomputes the same salt for the same row, so partial
    // groups are deterministic under task retry. Hash EVERY column — a
    // two-column hash degenerates to one bucket when the hot key carries a
    // low-cardinality countCol. Only fully-identical rows still share a
    // bucket (the floor for any content-derived salt); a corpus that is
    // mostly copies of ONE row needs an exact-dedup pass before analytics.
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(saltBuckets)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(count(col(countCol)).as("_partial"))
    val totals = partial.groupBy(key).agg(sum("_partial").as(out))
    // null-SAFE join key: Window.partitionBy groups NULL keys together, so
    // the equivalence to the window formulation must hold for them too (a
    // plain equi-join would leave NULL-key rows unmatched at count 0)
    salted.drop("_salt")
      .join(broadcast(totals.withColumnRenamed(key, "_sk_key")),
        col(key) <=> col("_sk_key"), "left")
      .drop("_sk_key")
      .withColumn(out, coalesce(col(out), lit(0L)))
  }

  /** Decide between the window and salted formulations from a cheap
    * key-histogram sample. At 100 TB the histogram itself must not scan
    * everything — sample a fraction and extrapolate.
    */
  def pickCountStrategy(
      df: DataFrame, key: String, skewThreshold: Double = 0.2,
      sampleFraction: Double = 0.01): String = {
    val sample = df.sample(sampleFraction).groupBy(key).count()
    val Array(total, top) = sample
      .agg(sum("count"), max("count")).collect()(0)
      .toSeq.map(v => Option(v).fold(0L)(_.asInstanceOf[Long])).toArray
    if (total > 0 && top.toDouble / total >= skewThreshold) "salted" else "window"
  }
}
