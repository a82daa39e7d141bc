package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matching — the watchlist/IOC screen: count
  * every occurrence of every pattern in one pass over the text,
  * O(len + matches) per row regardless of how many THOUSANDS of patterns
  * the watchlist carries. The regex-alternation screen
  * ([[graft.ext.TextAnalysis]]'s blocklist) is the right tool for tens
  * of terms; an indicator feed of 10⁴–10⁶ literals needs the automaton —
  * alternation compiles a pattern whose size (and backtracking surface)
  * grows with the feed.
  *
  * Semantics: case-sensitive LITERAL matching; each pattern is counted
  * independently at every position it occurs (overlaps included, both
  * self-overlaps and cross-pattern overlaps — "she" contributes to
  * "she" AND "he"). Duplicate patterns in the list are collapsed.
  *
  * The automaton builds ONCE per (executor, pattern-list) from a small
  * static cache — the expression ships only the pattern array;
  * goto/fail/output tables are reconstructed lazily where they run.
  */
object MultiMatchImpl {

  final class Automaton(patterns: Array[String]) {
    // nodes as growable parallel arrays; transitions in per-node hash maps
    private val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
    private val outCount = scala.collection.mutable.ArrayBuffer(0)
    private val fail = scala.collection.mutable.ArrayBuffer(0)

    patterns.distinct.foreach { p =>
      require(p.nonEmpty, "multi_match_count: empty pattern")
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        s = if (next(s).containsKey(c)) next(s).get(c)
        else {
          next += new java.util.HashMap[Char, Int]()
          outCount += 0
          fail += 0
          next(s).put(c, next.size - 1)
          next.size - 1
        }
        i += 1
      }
      outCount(s) += 1
    }

    // BFS fail links; outCount accumulates along fail chains so a single
    // node lookup yields the number of patterns ending at this position
    locally {
      val queue = new java.util.ArrayDeque[Int]()
      next(0).forEach { (_, s) => fail(s) = 0; queue.add(s) }
      while (!queue.isEmpty) {
        val s = queue.poll()
        outCount(s) += outCount(fail(s))
        next(s).forEach { (c, t) =>
          var f = fail(s)
          while (f != 0 && !next(f).containsKey(c)) f = fail(f)
          fail(t) = if (next(f).containsKey(c) && next(f).get(c) != t)
            next(f).get(c) else 0
          queue.add(t)
        }
      }
    }

    def countMatches(text: String): Long = {
      var s = 0
      var total = 0L
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !next(s).containsKey(c)) s = fail(s)
        if (next(s).containsKey(c)) s = next(s).get(c)
        total += outCount(s)
        i += 1
      }
      total
    }
  }

  // per-JVM automaton cache keyed by the pattern list — expressions ship
  // only the patterns; executors build the tables once
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Automaton]()

  def automaton(patterns: Seq[String]): Automaton =
    cache.computeIfAbsent(patterns, p => new Automaton(p.toArray))

  def countMatches(text: UTF8String, patterns: Seq[String]): Long =
    automaton(patterns).countMatches(text.toString)

  /** Codegen entry point: the automaton was resolved once into a mutable
    * field of the generated class; typed as Object because Janino cannot
    * name a Scala object's inner class.
    */
  def count(resolved: AnyRef, text: UTF8String): Long =
    resolved.asInstanceOf[Automaton].countMatches(text.toString)
}

/** `multi_match_count(text)`: total occurrences of all watchlist
  * patterns (see [[MultiMatchImpl]]). NULL in, NULL out.
  */
case class MultiMatchCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "multi_match_count needs at least one pattern")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "multi_match_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  @transient private lazy val automaton = MultiMatchImpl.automaton(patterns)

  override def nullSafeEval(input: Any): Any =
    automaton.countMatches(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship only the (serializable) pattern list through the reference
    // array; the automaton is resolved ONCE per generated-class instance
    // into a mutable field — a per-row cache lookup would hash the whole
    // pattern list (O(|patterns|)) on every input row
    val patsRef = ctx.addReferenceObj("mmPatterns", patterns,
      "scala.collection.immutable.Seq")
    val atm = ctx.addMutableState("Object", "mmAutomaton")
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($atm == null) {
            $atm = graft.functions.MultiMatchImpl.automaton(
              (scala.collection.immutable.Seq) $patsRef);
          }
          ${ev.value} = graft.functions.MultiMatchImpl.count($atm, $c);""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiMatchFunctions {

  /** Column-level watchlist match count backed by the native automaton. */
  def multi_match_count(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiMatchCount(Bridge.expression(text), patterns))
}
