package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared implementation for [[DupNgramFrac]] — one routine for the
  * interpreted eval and the generated code.
  */
object TextMetricsImpl {

  /** Fraction of word n-grams that are repeat occurrences, or null when
    * fewer than n tokens. Tokenization replicates the Column form
    * `split(trim(text), "\s+")` EXACTLY: UTF8String.trim removes ASCII
    * spaces only (not \t/\n — a leading tab yields a leading empty token,
    * same as Spark's split), and the Java split keeps trailing empty
    * strings (Spark's split limit is -1).
    */
  def dupNgramFrac(text: UTF8String, n: Int): java.lang.Double = {
    val toks = text.trim().toString.split("\\s+", -1)
    val cnt = toks.length - (n - 1)
    if (cnt <= 0) return null
    val seen = new java.util.HashSet[String]()
    var distinct = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (seen.add(sb.toString)) distinct += 1
      i += 1
    }
    java.lang.Double.valueOf((cnt - distinct).toDouble / cnt)
  }
}

/** Native duplicate-n-gram fraction: the HOF formulation
  * ([[graft.ext.TextAnalysis.dupNgramFrac]]) evaluates an interpreted
  * lambda per gram (n `element_at` calls each); this expression runs the
  * whole per-document computation (tokenize once, roll a StringBuilder
  * over the token array, count distinct in a hash set) in one call that
  * stays inside whole-stage codegen. The HOF form remains the
  * cross-checking reference; both emit identical fractions.
  */
case class DupNgramFrac(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dup_ngram_frac"

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
    TextMetricsImpl.dupNgramFrac(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
        java.lang.Double $r = graft.functions.TextMetricsImpl.dupNgramFrac($c, $n);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r.doubleValue();
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextMetricsFunctions {

  /** Column-level duplicate-n-gram fraction backed by the native expression. */
  def dup_ngram_frac(text: Column, n: Int): Column =
    Bridge.column(DupNgramFrac(Bridge.expression(text), n))
}
