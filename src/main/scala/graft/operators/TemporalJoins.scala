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
    // Reserved working columns — refuse collisions rather than silently
    // overwrite caller data.
    val (t, side, payload) = ("_graft_asof_t", "_graft_asof_side", "_graft_asof_payload")
    require(!(left.columns ++ right.columns).exists(Set(t, side, payload)),
      s"asofJoin reserves columns $t/$side/$payload")
    // Refuse left/right value-name collisions up front — the output would
    // otherwise carry two same-named columns and fail far from the cause.
    val collisions = rightVals.toSet intersect leftCols.toSet
    require(collisions.isEmpty,
      s"asofJoin: right value columns collide with left columns: " +
        s"${collisions.mkString(", ")} — rename before joining")

    // The right row's values travel as ONE struct: the struct itself is
    // non-null for every right row even when its fields are null, so the
    // forward fill (a) never skips a matched row whose value is genuinely
    // NULL and (b) never stitches fields from different right rows.
    val payloadType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filter(f => rightVals.contains(f.name)))

    val taggedLeft = left
      .withColumn(t, col(leftTime))
      .withColumn(side, lit(1))
      .withColumn(payload, lit(null).cast(payloadType))
      .select(Seq(col(key), col(t), col(side), col(payload)) ++
        leftCols.filterNot(_ == key).map(col): _*)
    val taggedRight = right
      .withColumn(t, col(rightTime))
      .withColumn(side, lit(0))
      .withColumn(payload, struct(rightVals.map(col): _*))
      .select(Seq(col(key), col(t), col(side), col(payload)) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(
          left.schema(c).dataType).as(c)): _*)

    // The payload struct itself is the final order key: several right rows
    // sharing (key, time) would otherwise be resolved by partition
    // accident. Struct ordering is field-wise and deterministic — the
    // largest value tuple wins, consistently across runs. Left rows' NULL
    // payloads are inert (all equal within their (t, side=1) group).
    val w = Window.partitionBy(key).orderBy(col(t), col(side), col(payload))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select(leftCols.map(col) ++
        rightVals.map(c => col(s"$payload.$c").as(c)): _*)
  }

  /** Inner range join: left rows with a point `leftTime` against right
    * rows with an interval [`rightStart`, `rightEnd`] (inclusive), equal
    * `key`. The naive theta-join is a per-key cross product; this bins
    * time into `binWidth`-sized buckets, explodes each right interval to
    * the bins it covers, and equi-joins on (key, bin) — candidate pairs
    * are only same-bin pairs, then the exact predicate filters. Each left
    * row lives in exactly one bin, so no post-join dedup is needed.
    * Pick binWidth near the typical interval length. For KEYLESS global
    * ranges (IP allocations against the whole address space) use
    * [[graft.ext.Network.binnedRangeJoin]], the power-of-two-bin sibling.
    */
  def rangeJoinBinned(
      left: DataFrame, leftTime: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      key: String, binWidth: Long): DataFrame = {
    val bin = "_graft_range_bin"
    require(binWidth > 0, s"rangeJoinBinned: binWidth must be positive, got $binWidth")
    require(!(left.columns ++ right.columns).contains(bin),
      s"rangeJoinBinned reserves column $bin")
    // INTEGER division (`div`): `/` on longs is double division in Spark
    // and silently mis-bins values beyond 2^53 — epoch NANOSECONDS
    // (~1.7e18, this repo's event clock) would lose matches at bin
    // boundaries. Truncating division is monotone, which is all the
    // binning needs.
    def binOf(c: String): Column =
      expr(s"CAST(`$c` AS BIGINT) div $binWidth")
    val lb = left.withColumn(bin, binOf(leftTime))
    val rb = right.withColumn(bin,
      explode(sequence(binOf(rightStart), binOf(rightEnd))))
    lb.join(rb, Seq(key, bin))
      .filter(col(leftTime) >= col(rightStart) && col(leftTime) <= col(rightEnd))
      .drop(bin)
  }
}
