package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis: how many entities perform step 1,
  * then step 2 STRICTLY AFTER their first step 1, then step 3 after that
  * — all within a window anchored at the first step-1 instant. The
  * security reading is kill-chain progression (recon → exploit →
  * exfil per host); the product reading is conversion.
  *
  * Scale shape: one filtered min-aggregate per step, each joined to the
  * previous stage's one-row-per-entity frame on the entity key — k
  * equi-joins of shrinking frames, no window over the raw stream, no
  * per-entity event collection. The stage frames shrink monotonically,
  * so the dominant cost is the k filtered scans (mergeable into one when
  * the source is columnar — the step filter pushes down).
  */
object Funnel {

  /** Per-entity stage times: one row per entity that completed ALL
    * steps, with `t1..tk` µs columns. Ties do not advance a funnel:
    * each step must be strictly later than the previous step's instant.
    */
  def stageTimes(
      df: DataFrame, entity: String, typeCol: String, tsUs: String,
      steps: Seq[String], withinUs: Long): Seq[DataFrame] = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(withinUs > 0, s"withinUs must be positive, got $withinUs")
    val base = df.select(col(entity).as("e"), col(typeCol).as("t"),
      col(tsUs).as("tu")).where(col("e").isNotNull)
    // every stage frame is consumed at least twice (by the next stage's
    // join AND by the caller — conversion counts each), so pin each one:
    // without the checkpoint, stage k's action re-derives stages 1..k-1
    // and the k-step funnel scans the source O(k²) times
    val first = base.where(col("t") === steps.head)
      .groupBy("e").agg(min(col("tu")).as("t1"))
      .localCheckpoint(true)
    steps.zipWithIndex.drop(1).foldLeft(Seq(first)) { case (acc, (step, i)) =>
      val prev = acc.last
      val cur = base.where(col("t") === step)
        .join(prev, Seq("e"))
        .where(col("tu") > col(s"t$i") && col("tu") <= col("t1") + withinUs)
        .groupBy((Seq("e", "t1") ++ (2 to i).map(j => s"t$j")).map(col): _*)
        .agg(min(col("tu")).as(s"t${i + 1}"))
        .localCheckpoint(true)
      acc :+ cur
    }
  }

  /** Funnel census: one row per step — (step_idx, step, n_entities,
    * conv_q) where conv_q = 10⁶ · n_step div n_first (exact integer
    * ratio; 0 when the funnel never starts).
    */
  def conversion(
      df: DataFrame, entity: String, typeCol: String, tsUs: String,
      steps: Seq[String], withinUs: Long): DataFrame = {
    val stages = stageTimes(df, entity, typeCol, tsUs, steps, withinUs)
    val counts = stages.map(_.count())
    val n1 = counts.head
    val rows = steps.zip(counts).zipWithIndex.map { case ((step, n), i) =>
      (i + 1, step, n, if (n1 == 0) 0L else 1000000L * n / n1)
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("step_idx", "step", "n_entities", "conv_q")
      .orderBy("step_idx")
  }
}
