package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 60-bit SimHash over word tokens (optimization r20).
  *
  * [[graft.ext.Dedup.simhashTable]] computed the fingerprint by
  * exploding every document's distinct tokens, hashing each as a
  * projection, and shuffling (id, hash) rows into a 60-conditional-sum
  * aggregate — one exchange of ~tokens-per-doc rows per document. This
  * expression computes the identical fingerprint in one codegen'd call
  * per row, making the signature stage a pure map over the scan (the
  * 100 TB shape; the banding/clustering stages downstream are
  * unchanged).
  *
  * Bit-equivalence contract (pinned by SimhashNativeSpec):
  *  - tokens = split(trim(text), "\\s+") — Spark `trim` strips ASCII
  *    space (0x20) ONLY (NOT Java String.trim's <= 0x20 range), and the
  *    split is the Java regex engine with limit −1 (leading empty token
  *    kept when the text starts with non-space whitespace);
  *  - distinct tokens each vote once: h = first 15 md5 hex chars as a
  *    60-bit value (= first 8 digest bytes big-endian >>> 4), bit i of
  *    the fingerprint is set when Σ ±1 votes on (h >> i) & 1 is > 0.
  */
object SimhashImpl {

  val Bits = 60

  private val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def simhash60(text: UTF8String): Long = {
    // UTF8String.trim strips 0x20 only — exactly Spark's trim()
    val toks = text.trim().toString.split("\\s+", -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](Bits)
    val md = mdLocal.get()
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      if (seen.add(t)) {
        md.reset()
        md.update(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val d = md.digest()
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        h = h >>> 4 // first 15 hex chars = 60 bits
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      ti += 1
    }
    var sim = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }
}

/** `simhash60(text)`: the one-pass 60-bit SimHash (see [[SimhashImpl]]).
  * NULL in, NULL out.
  */
case class Simhash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

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
    SimhashImpl.simhash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashImpl.simhash60($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashFunctions {

  def simhash60(text: Column): Column =
    Bridge.column(Simhash60(Bridge.expression(text)))
}
