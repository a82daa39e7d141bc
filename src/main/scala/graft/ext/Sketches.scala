package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Streaming-sketch aggregators for 100 TB profiling jobs, built on the
  * public `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §7.3's sanctioned
  * custom-aggregation path).
  *
  * SpaceSaving (Metwally et al., "Efficient computation of frequent and
  * top-k elements in data streams", ICDT 2005): maintains at most k
  * counters; a new element evicts the minimum counter and inherits its
  * count as over-estimation error. Guarantees: every true heavy hitter
  * with frequency > N/k is retained, and reported counts overestimate by
  * at most the evicted minimum (the `error` field). With k >= distinct
  * values the counts are EXACT — which makes the operator
  * oracle-checkable against a plain GROUP BY on low-cardinality columns
  * while staying O(k) memory on high-cardinality ones (where exact
  * groupBy-count would shuffle the full key set).
  */
object Sketches {

  case class HeavyHitter(value: String, count: Long, error: Long)

  /** Mutable SpaceSaving summary: value -> (count, error). */
  type SsBuffer = mutable.HashMap[String, (Long, Long)]

  class SpaceSaving(k: Int) extends Aggregator[String, SsBuffer, Seq[HeavyHitter]] {

    override def zero: SsBuffer = mutable.HashMap.empty

    private def insert(b: SsBuffer, v: String, w: Long, err: Long): SsBuffer = {
      b.get(v) match {
        case Some((c, e)) => b(v) = (c + w, e + err)
        case None if b.size < k => b(v) = (w, err)
        case None =>
          // evict the minimum counter; the newcomer inherits its count as
          // over-estimation error
          val (mv, (mc, _)) = b.minBy { case (value, (c, _)) => (c, value) }
          b.remove(mv)
          b(v) = (mc + w, mc + err)
      }
      b
    }

    override def reduce(b: SsBuffer, v: String): SsBuffer =
      if (v == null) b else insert(b, v, 1L, 0L)

    override def merge(a: SsBuffer, b: SsBuffer): SsBuffer =
      b.foldLeft(a) { case (acc, (v, (c, e))) => insert(acc, v, c, e) }

    override def finish(b: SsBuffer): Seq[HeavyHitter] =
      b.toSeq
        .map { case (v, (c, e)) => HeavyHitter(v, c, e) }
        .sortBy(h => (-h.count, h.value))

    override def bufferEncoder: Encoder[SsBuffer] = Encoders.kryo[SsBuffer]
    override def outputEncoder: Encoder[Seq[HeavyHitter]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HeavyHitter]]()
  }

  /** Untyped (DataFrame) form: `df.agg(spaceSaving(8)(col("event_type")))`. */
  def spaceSaving(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new SpaceSaving(k), Encoders.STRING)
}
