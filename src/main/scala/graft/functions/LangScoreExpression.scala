package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass char-n-gram Naive Bayes gram sums (optimization r20).
  *
  * [[graft.ext.LangId.score]] scored documents by exploding every char
  * n-gram (an interpreted `transform(sequence(...))` lambda), hashing
  * each gram (md5 → bucket) as a per-gram Catalyst projection, broadcast-
  * joining the `dims`-row model, and shuffling the per-gram rows into a
  * per-document aggregate — ~len(text) rows through an exchange per
  * document. This expression computes the identical per-language gram
  * sums in one codegen'd call per row: slide the n-char window over the
  * canonical text's UTF-8 bytes (code-point boundaries, exactly
  * `substring`'s semantics), md5 each gram, bucket = first 4 digest
  * bytes & 0x7FFFFFFF mod dims (exactly [[graft.ext.QualityClassifier]]
  * `bucketOf`), and accumulate each language's quantized log-prob.
  * Long sums are order-independent, so the result is bit-identical to
  * the explode+join+aggregate composition (pinned by LangIdSpec's
  * native-vs-composed test). Scoring becomes a pure map over the scan —
  * zero shuffles, the 100 TB shape.
  *
  * Returns NULL when the text is NULL or shorter than n chars (no gram
  * evidence — callers drop those rows, matching the join+groupBy form
  * which emitted no row).
  */
object LangScoreImpl {

  private val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** lpq: per-language quantized log-prob tables, each of length dims. */
  def gramSums(
      text: UTF8String, n: Int, dims: Int,
      lpq: Array[Array[Long]]): GenericArrayData = {
    val bytes = text.getBytes
    // code-point start offsets (UTF-8 continuation bytes are 10xxxxxx)
    var chars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) chars += 1
      i += 1
    }
    if (chars < n) return null
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(chars) = bytes.length
    val sums = new Array[Long](lpq.length)
    val md = mdLocal.get()
    var g = 0
    val nGrams = chars - n + 1
    while (g < nGrams) {
      md.reset()
      md.update(bytes, starts(g), starts(g + n) - starts(g))
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val b = ((h & 0x7fffffffL) % dims).toInt
      var l = 0
      while (l < lpq.length) { sums(l) += lpq(l)(b); l += 1 }
      g += 1
    }
    new GenericArrayData(sums)
  }
}

/** `lang_gram_sums_q(canonText)`: per-language quantized NB gram sums
  * (see [[LangScoreImpl]]). NULL text or fewer than n chars → NULL.
  */
case class LangGramSumsQ(
    child: Expression, n: Int, dims: Int, lpq: Array[Array[Long]])
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  require(dims >= 2, s"dims must be >= 2, got $dims")
  require(lpq.nonEmpty && lpq.forall(_.length == dims),
    "lpq must be nonempty with dims columns per language")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lang_gram_sums_q"
  // the model table must not bloat plan strings / pattern bits
  override def toString: String =
    s"lang_gram_sums_q($child, n=$n, dims=$dims, langs=${lpq.length})"

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
    LangScoreImpl.gramSums(input.asInstanceOf[UTF8String], n, dims, lpq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lpqRef = ctx.addReferenceObj("lpq", lpq, "long[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.LangScoreImpl.gramSums($c, $n, $dims, $lpqRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangScoreFunctions {

  def lang_gram_sums_q(
      canonText: Column, n: Int, dims: Int, lpq: Array[Array[Long]]): Column =
    Bridge.column(LangGramSumsQ(Bridge.expression(canonText), n, dims, lpq))
}
