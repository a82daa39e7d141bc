package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared implementation for [[WinnowFingerprints]] — one static entry
  * point so the interpreted eval and the generated code run the IDENTICAL
  * routine (the codegen emits a single call, keeping the expression inside
  * whole-stage codegen without duplicating the algorithm as Java text).
  */
object WinnowImpl {

  /** Winnowed k-gram fingerprints of one document (Schleimer, Wilkerson,
    * Aiken, SIGMOD 2003): hash every character `k`-gram (bit-identical to
    * `xxhash64(substr(text, pos+1, k))` — SQL substring semantics, seed
    * 42), slide a window of `w` consecutive gram hashes keeping each
    * window's minimum (monotone-deque, O(n) total), return the DISTINCT
    * minima. Documents shorter than `k + w - 1` characters have no full
    * window and return an empty array.
    */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val numGrams = text.numChars() - k + 1
    if (numGrams - w + 1 <= 0) return new GenericArrayData(Array.empty[Long])
    val hashes = new Array[Long](numGrams)
    var p = 0
    while (p < numGrams) {
      val g = text.substringSQL(p + 1, k)
      hashes(p) = XXH64.hashUnsafeBytes(
        g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
      p += 1
    }
    val deque = new Array[Int](numGrams)
    var head = 0
    var tail = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < numGrams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = hashes(deque(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native winnowing: the whole fingerprint pipeline (gram hashing, sliding
  * minimum, dedup) as ONE per-row expression over the text column —
  * `array<long>` out, no explode of every gram position, no per-document
  * window sort, NO shuffle. The composed form
  * ([[graft.ext.TextAnalysis.winnowFingerprints]]) is kept as the
  * cross-checking reference; both emit identical fingerprint sets.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be positive, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowImpl.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowImpl.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFunctions {

  /** Column-level winnowed fingerprints backed by the native expression. */
  def winnow_fingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w))
}
