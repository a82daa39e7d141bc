package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave — one routine shared by the interpreted
  * eval and the generated code.
  */
object ZOrderImpl {

  /** Spread the low 16 bits of v to the even bit positions of a 32-bit
    * value (the standard mask-shift Morton dilation).
    */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 32-bit Morton code: bit i of `a` lands at position 2i, bit i of `b`
    * at position 2i+1 (low 16 bits of each input).
    */
  def interleave16(a: Long, b: Long): Long =
    spread16(a) | (spread16(b) << 1)
}

/** Z-order (Morton) clustering key over two dimensions, as a native
  * codegen'd expression. Sorting data by this key before writing gives
  * every output file a tight min/max box in BOTH dimensions, so scans
  * filtering on either column (or a box on both) can skip files —
  * single-column sort clusters one dimension and scatters the other.
  * This is the data-layout story behind Delta/Iceberg OPTIMIZE ZORDER,
  * reduced to its expression core; at 100 TB the key costs a few bit ops
  * per row and the payoff is pruning at the scan.
  */
case class ZOrder16(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder16"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderImpl.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderImpl.interleave16($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderFunctions {

  /** Column-level 2-D Z-order key (low 16 bits per dimension). */
  def zorder16(a: Column, b: Column): Column =
    Bridge.column(ZOrder16(
      Bridge.expression(a.cast("long")), Bridge.expression(b.cast("long"))))
}
