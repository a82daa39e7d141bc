package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BoundReference, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bridge

/** Whole-operator Catalyst extension for the backward as-of join — the §7.3
  * preference-order tier (c): a custom `LogicalPlan` node, planned by a
  * custom `SparkStrategy` into a custom `SparkPlan`, registered either via
  * `SparkSessionExtensions` ([[graft.functions.GraftExtensions]]) or
  * post-hoc on a live session ([[AsOfJoin.ensureRegistered]]).
  *
  * Semantics: for every left row, attach the LATEST right row with
  * `rightTime <= leftTime` (inclusive) for the same key; several right
  * rows tied on (key, time) resolve to the largest payload tuple. NULL
  * keys/times never match — standard SQL equi-join semantics, the same
  * thing DuckDB's ASOF JOIN (the oracle) does. Documented divergence from
  * the composed form ([[graft.operators.TemporalJoins.asofJoin]]): that
  * window formulation GROUPS NULL keys like any window partition, so on
  * data with NULL join keys the two return different rows (on NULL-free
  * keys/times they are identical — asserted in AsOfJoinExecSpec).
  *
  * Physical shape: `requiredChildDistribution` clusters both sides on the
  * key and `requiredChildOrdering` sorts each partition by (key, time) —
  * EnsureRequirements inserts exactly one exchange + one sort per side —
  * then `doExecute` merges the two sorted streams per partition with O(1)
  * state (the one candidate right row), never buffering a key group. That
  * is the optimal distributed shape at 100 TB: no union-side-tag column, no
  * window frame, no payload struct materialization, and the right side
  * streams through without per-key memory.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; all other nodes fall
  * through to the built-in strategies.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload) =>
      AsOfJoinExec(lk, rk, lt, rt, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join. Children are clustered on the key and sorted by
  * (key, time) — plus the payload columns on the right, so ties at equal
  * (key, time) deterministically resolve to the LARGEST payload tuple, the
  * same winner the window form's struct-max picks. Non-ORDERABLE payload
  * columns (maps) are excluded from that tie-break sort: ties then fall to
  * the remaining payload columns, and if ALL payload columns are
  * unorderable the winner among exact (key, time) duplicates is
  * partition-arrival order (the window form refuses such schemas outright
  * — sorting a struct with a map field is an analysis error).
  */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      payload.filter(a => RowOrdering.isOrderable(a.dataType))
        .map(a => SortOrder(a, Ascending)))

  // one output row per left row, in the left child's (key, time) order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    // payload positions in the right child's row, resolved driver-side
    val payloadIdx = payload.map { p =>
      val i = rOut.indexWhere(_.exprId == p.exprId)
      require(i >= 0, s"payload column $p not found in right child output")
      i
    }

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val kOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tOrd = TypeUtils.getInterpretedOrdering(timeType)
      val lExtract = UnsafeProjection.create(Seq(leftKey, leftTime), lOut)
      val rExtract = UnsafeProjection.create(Seq(rightKey, rightTime), rOut)
      // Explicit BoundReferences: payload slots are nullable(true) no
      // matter what the right child declares, because the no-match case
      // feeds an all-null row — binding by exprId would inherit the child's
      // nullability and skip the null check in codegen.
      val resultProj = UnsafeProjection.create(
        lOut.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable) } ++
        payloadIdx.zip(payload).map { case (i, p) =>
          BoundReference(lOut.size + i, p.dataType, nullable = true) })
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // Head of the right stream (child-owned, reused buffers — valid
        // only until the next rIter.next()), and the current candidate:
        // the latest right row at-or-before the left cursor, COPIED
        // because it outlives the stream head.
        private var rHead: InternalRow = _
        private var rHeadKT: InternalRow = _
        private var cand: InternalRow = _
        private var candKT: InternalRow = _
        advanceRight()

        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            val kt = rExtract(r)
            // right rows with NULL key or time can never be as-of matches
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) { rHead = r; rHeadKT = kt }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkt = lExtract(l)
          val out =
            if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
              // NULL key/time on the left: emit the row, no match possible
              resultProj(joined(l, nullRight))
            } else {
              val lk = lkt.get(0, keyType)
              val lt = lkt.get(1, timeType)
              var advancing = rHead != null
              while (advancing) {
                val c = kOrd.compare(rHeadKT.get(0, keyType), lk)
                if (c < 0 || (c == 0 &&
                    tOrd.compare(rHeadKT.get(1, timeType), lt) <= 0)) {
                  cand = rHead.copy()
                  candKT = rHeadKT.copy()
                  advanceRight()
                  advancing = rHead != null
                } else advancing = false
              }
              val matched = cand != null &&
                kOrd.compare(candKT.get(0, keyType), lk) == 0
              resultProj(joined(l, if (matched) cand else nullRight))
            }
          numOutputRows += 1
          out
        }
      }
    }
  }
}

object AsOfJoin {

  /** Idempotently add [[AsOfJoinStrategy]] to a live session (the path for
    * sessions built without `withExtensions`, e.g. the driver's). Checks
    * the PLANNER's full strategy list, not just `experimental` — a session
    * built with GraftExtensions already carries the strategy via the
    * extension injection, and appending it again would plan every node
    * twice.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.sessionState.planner.strategies.contains(AsOfJoinStrategy) &&
        !spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Backward as-of join through the custom operator — same contract as
    * [[graft.operators.TemporalJoins.asofJoin]]: right value columns are
    * attached under their own names and must not collide with left names.
    */
  def asofJoinExec(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)

    val lPlan = left.queryExecution.analyzed
    // Self-join safety: children sharing attribute exprIds (both sides
    // derived from the same scan) would make the node's output ambiguous —
    // re-alias the right side to mint fresh exprIds.
    val rAliased =
      if (lPlan.outputSet.intersect(right.queryExecution.analyzed.outputSet).isEmpty) right
      else right.select(right.columns.map(c => col(c).as(c)): _*)
    val rPlan = rAliased.queryExecution.analyzed

    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"asofJoinExec: no column '$name' on the $side side " +
          s"(have: ${plan.output.map(_.name).mkString(", ")})"))
    val lk = attr(lPlan, key, "left")
    val lt = attr(lPlan, leftTime, "left")
    val rk = attr(rPlan, key, "right")
    val rt = attr(rPlan, rightTime, "right")
    require(RowOrdering.isOrderable(lk.dataType) && RowOrdering.isOrderable(lt.dataType),
      s"asofJoinExec: key/time types must be orderable, got ${lk.dataType}/${lt.dataType}")

    val payload = rPlan.output.filterNot(a => a.exprId == rk.exprId || a.exprId == rt.exprId)
    val collisions = payload.map(_.name).toSet intersect lPlan.output.map(_.name).toSet
    require(collisions.isEmpty,
      s"asofJoinExec: right value columns collide with left columns: " +
        s"${collisions.mkString(", ")} — rename before joining")

    Bridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt, payload))
  }
}
