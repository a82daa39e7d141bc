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

  /** The `depth` bucket draws of a count–min sketch as an ARRAY: row `j`
    * reads the j-th disjoint 8-hex-char (32-bit) window of ONE salted
    * md5 digest, mod `width` — one hash per input row instead of one per
    * sketch row (measured 120M md5 calls at the 50× corpus with the
    * per-row variant; disjoint windows of a mixed digest are independent
    * draws in the Kirsch–Mitzenmacher sense). Beyond 4 rows a second
    * digest is keyed with the window-group index. md5-hex keeps every
    * draw bit-replayable in any engine (`('0x'||hex)::BIGINT` in DuckDB
    * ↔ `conv(hex,16,10)` here).
    */
  private[graft] def cmsBuckets(key: Column, depth: Int, width: Int, salt: String): Column = {
    val digests = (0 to (depth - 1) / 4).map { g =>
      val keyed = if (g == 0) concat(key.cast("string"), lit(salt))
        else concat(key.cast("string"), lit(salt), lit(g.toString))
      md5(keyed)
    }
    array((0 until depth).map { j =>
      conv(substring(digests(j / 4), (j % 4) * 8 + 1, 8), 16, 10)
        .cast("long") % width
    }: _*)
  }

  /** Count–min sketch (Cormode & Muthukrishnan, "An improved data stream
    * summary: the count-min sketch and its applications", J. Algorithms
    * 2005) built RELATIONALLY: the sketch is just a `depth × width`
    * counter table, and incrementing cell (j, h_j(key)) for every row is
    * a groupBy-count on (j, bucket) — map-side partial aggregation does
    * the heavy counting, and the exchange carries at most `depth · width`
    * groups per map task regardless of corpus size. That is the whole
    * 100 TB story: frequency estimation over an unbounded key space with
    * a CONSTANT-size shuffle and a constant-size result.
    *
    * Returns the sketch as rows (j, bucket, c). NULL keys are excluded
    * (they have no well-defined hash).
    */
  def countMinSketch(
      df: DataFrame, key: Column, width: Int, depth: Int,
      salt: String = "graft:cms"): DataFrame = {
    require(width >= 1 && depth >= 1, s"width/depth must be >= 1")
    df.where(key.isNotNull)
      .select(posexplode(cmsBuckets(key, depth, width, salt)).as(Seq("j", "bucket")))
      .groupBy("j", "bucket")
      .agg(count(lit(1)).as("c"))
  }

  /** Point-estimate lookup against a [[countMinSketch]]: for each row of
    * `keys`, min over the `depth` cells the key hashes to — the classic
    * CMS upper bound (never under-estimates; over-estimates only when
    * every row collides). The sketch side is depth·width rows, so it
    * BROADCASTS; the keys side streams through with one bounded-key
    * re-aggregation. Keys absent from the sketch estimate 0.
    */
  def countMinLookup(
      sketch: DataFrame, keys: DataFrame, key: Column, width: Int, depth: Int,
      salt: String = "graft:cms"): DataFrame = {
    val cols = keys.columns
    require(!cols.exists(Set("_cms_j", "_cms_b").contains),
      "keys must not already contain reserved columns _cms_j/_cms_b")
    keys
      .select(col("*"),
        posexplode(cmsBuckets(key, depth, width, salt)).as(Seq("_cms_j", "_cms_b")))
      .join(org.apache.spark.sql.functions.broadcast(sketch),
        col("_cms_j") === col("j") && col("_cms_b") === col("bucket"), "left")
      .groupBy(cols.map(col).toIndexedSeq: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("n_est"))
  }
}
