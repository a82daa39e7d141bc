package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively, composed from built-ins
  * per the §7.3 preference order (no custom SparkPlan needed — both reduce
  * to one partitioned sort or one equi-join, which is also their optimal
  * distributed shape).
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, attach the LATEST right row
    * with `rightTime <= leftTime` for the same key — the canonical
    * "feature value as of event time" join in training pipelines.
    *
    * Implementation: union both sides tagged, ONE per-key sort by
    * (time, side) — right rows sort before left rows at equal times, so
    * equal timestamps match (inclusive as-of) — then forward-fill the
    * right columns with `last(_, ignoreNulls)` over the running frame and
    * keep the left rows. ONE shuffle total; the naive formulation
    * (inequality join + row_number) shuffles both sides AND materializes
    * every candidate pair.
    *
    * Right value columns are emitted with their own names; they must not
    * collide with left column names (rename beforehand).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String): DataFrame = {
    val rightVals = right.columns.filter(c => c != key && c != rightTime).toSeq
    val leftCols = left.columns.toSeq

    val taggedLeft = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(Seq(col(key), col("_t"), col("_side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        rightVals.map(c => lit(null).as(c)): _*)
    val taggedRight = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col("_t"), col("_side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)) ++
        rightVals.map(col): _*)

    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1).drop("_t", "_side")
  }

  /** Inner range join: left rows with a point `leftTime` against right
    * rows with an interval [`rightStart`, `rightEnd`] (inclusive), equal
    * `key`. The naive theta-join is a per-key cross product; this bins
    * time into `binWidth`-sized buckets, explodes each right interval to
    * the bins it covers, and equi-joins on (key, bin) — candidate pairs
    * are only same-bin pairs, then the exact predicate filters. Each left
    * row lives in exactly one bin, so no post-join dedup is needed.
    * Pick binWidth near the typical interval length.
    */
  def rangeJoinBinned(
      left: DataFrame, leftTime: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      key: String, binWidth: Long): DataFrame = {
    val lb = left.withColumn("_bin", (col(leftTime) / binWidth).cast("long"))
    val rb = right.withColumn("_bin",
      explode(sequence((col(rightStart) / binWidth).cast("long"),
        (col(rightEnd) / binWidth).cast("long"))))
    lb.join(rb, Seq(key, "_bin"))
      .filter(col(leftTime) >= col(rightStart) && col(leftTime) <= col(rightEnd))
      .drop("_bin")
  }
}
