package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-point character-class Shannon entropy — the DGA/gibberish
  * signal (algorithmically generated domains and padded spam have
  * near-uniform character distributions; natural text doesn't), and a
  * cheap corpus-quality feature.
  *
  * Determinism contract: characters are Unicode code points of the
  * first `maxChars` of the string, folded into 28 classes by pure ASCII
  * arithmetic (a–z/A–Z → 0–25, 0–9 → 26, everything else → 27 — no
  * locale-sensitive lower-casing crosses an engine boundary), and the
  * entropy is computed entirely in integers against a FROZEN table
  * L(k) = floor(log2(k)·2^20):
  *
  *   ent_q = (n·L(n) − Σ_k c_k·L(c_k)) div n      (≈ bits · 2^20)
  *
  * The oracle embeds the same table as literal VALUES
  * ([[CharEntropyImpl.log2qSqlValues]]), so no transcendental is ever
  * evaluated by two engines. One pass per row, zero shuffles, inside
  * whole-stage codegen — at 100 TB this is a pure map over the scan.
  */
object CharEntropyImpl {

  /** Largest prefix length the frozen table supports. */
  val MaxTable: Int = 4096

  /** L(k) = floor(log2(k)·2^20), k = 1..MaxTable (index 0 unused). */
  lazy val log2q: Array[Long] = {
    val a = new Array[Long](MaxTable + 1)
    var k = 1
    while (k <= MaxTable) {
      a(k) = math.floor(math.log(k.toDouble) / math.log(2.0) * 1048576.0).toLong
      k += 1
    }
    a
  }

  /** The frozen table as SQL VALUES rows `(k, l)` for 1..maxK — embed in
    * oracles so both engines read the identical constants.
    */
  def log2qSqlValues(maxK: Int): String = {
    require(maxK <= MaxTable, s"maxK $maxK exceeds frozen table $MaxTable")
    (1 to maxK).map(k => s"(${k}, ${log2q(k)})").mkString(", ")
  }

  def entropyQ(text: UTF8String, maxChars: Int): Long = {
    val s = text.toString
    val counts = new Array[Int](28)
    var n = 0
    var i = 0
    while (i < s.length && n < maxChars) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val k =
        if (cp >= 'a' && cp <= 'z') cp - 'a'
        else if (cp >= 'A' && cp <= 'Z') cp - 'A'
        else if (cp >= '0' && cp <= '9') 26
        else 27
      counts(k) += 1
      n += 1
    }
    if (n == 0) return 0L
    var sum = 0L
    var j = 0
    while (j < 28) {
      val c = counts(j)
      if (c > 0) sum += c.toLong * log2q(c)
      j += 1
    }
    (n.toLong * log2q(n) - sum) / n
  }
}

/** `char_entropy_q(text)`: fixed-point class entropy of the first
  * `maxChars` code points (see [[CharEntropyImpl]]). NULL in, NULL out;
  * empty in, 0 out.
  */
case class CharEntropyQ(child: Expression, maxChars: Int) extends UnaryExpression {
  require(maxChars >= 1 && maxChars <= CharEntropyImpl.MaxTable,
    s"maxChars must be in [1, ${CharEntropyImpl.MaxTable}], got $maxChars")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "char_entropy_q"

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
    CharEntropyImpl.entropyQ(input.asInstanceOf[UTF8String], maxChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyImpl.entropyQ($c, $maxChars);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyFunctions {

  /** Column-level fixed-point character-class entropy. */
  def char_entropy_q(text: Column, maxChars: Int): Column =
    Bridge.column(CharEntropyQ(Bridge.expression(text), maxChars))
}
