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

  /** The `k` bit positions of a Bloom filter for `key`: disjoint 8-hex
    * windows of ONE salted md5 digest, each mod `mBits` — the same
    * Kirsch–Mitzenmacher single-digest idiom as [[cmsBuckets]] (to which
    * this delegates), so every draw replays in any engine.
    */
  private[graft] def bloomPositions(
      key: Column, k: Int, mBits: Int, salt: String): Column =
    cmsBuckets(key, k, mBits, salt)

  /** Build a Bloom filter RELATIONALLY (Bloom, "Space/time trade-offs in
    * hash coding with allowable errors", CACM 1970): the filter is a
    * table of (word_idx, word) rows, each `word` a 32-bit mask packed in
    * a BIGINT, produced by ONE groupBy-`bit_or` over the k bit positions
    * of every key. Map-side partial aggregation ORs bits before the
    * exchange, so the shuffle carries at most `mBits/32` groups per map
    * task regardless of corpus size — the same constant-size-shuffle
    * story as [[countMinSketch]], but for MEMBERSHIP instead of
    * frequency.
    *
    * This is the 100 TB dedup-screen primitive (the Dolma/trillion-token
    * pattern): the finished filter is ≤ mBits/32 rows — small enough to
    * BROADCAST — so screening an ingest batch against a corpus of any
    * size never shuffles the corpus again (see [[bloomScreen]] /
    * [[Dedup.bloomDedup]]). Absent words are simply missing rows (all
    * zero bits). NULL keys are excluded (no well-defined hash).
    */
  def bloomIndex(
      df: DataFrame, key: Column, mBits: Int, k: Int,
      salt: String = "graft:bloom"): DataFrame = {
    require(mBits >= 32 && mBits % 32 == 0, "mBits must be a positive multiple of 32")
    require(k >= 1 && k <= 16, "k must be in [1, 16]")
    df.where(key.isNotNull)
      .select(explode(bloomPositions(key, k, mBits, salt)).as("_p"))
      .groupBy((col("_p") / 32).cast("long").as("word_idx"))
      .agg(bit_or(call_function("shiftleft", lit(1L), (col("_p") % 32).cast("int")))
        .as("word"))
  }

  /** Membership screen against a [[bloomIndex]]: for each row of `batch`,
    * `outCol` is true iff ALL k bits for the key are set — the classic
    * Bloom contract (no false negatives; false positives at the
    * configured rate). The filter side is ≤ mBits/32 rows and is
    * broadcast, so the batch streams through with one bounded-key
    * re-aggregation and NO shuffle of either input at any corpus size.
    *
    * `mBits`/`k`/`salt` MUST match the index's build parameters — a
    * mismatch silently screens against the wrong bits (the
    * corpusDupStream lesson), so callers that persist the filter should
    * persist the parameters beside it.
    */
  def bloomScreen(
      index: DataFrame, batch: DataFrame, key: Column, mBits: Int, k: Int,
      salt: String = "graft:bloom", outCol: String = "maybe_seen"): DataFrame = {
    val cols = batch.columns
    require(!cols.exists(Set("_bf_p", "_bf_w", "_bf_b", outCol).contains),
      s"batch must not already contain reserved columns _bf_p/_bf_w/_bf_b/$outCol")
    batch
      .select(col("*"), explode(bloomPositions(key, k, mBits, salt)).as("_bf_p"))
      .select(col("*"), (col("_bf_p") / 32).cast("long").as("_bf_w"),
        (col("_bf_p") % 32).cast("int").as("_bf_b"))
      .join(org.apache.spark.sql.functions.broadcast(index),
        col("_bf_w") === col("word_idx"), "left")
      .groupBy(cols.map(col).toIndexedSeq: _*)
      .agg(min(
        call_function("shiftright", coalesce(col("word"), lit(0L)), col("_bf_b"))
          .bitwiseAND(lit(1L))).as("_bf_all"))
      .withColumn(outCol, col("_bf_all") === 1L)
      .drop("_bf_all")
  }

  /** Pack a [[bloomIndex]] into ONE row holding the whole bitset as an
    * `Array[Long]` of `mBits/32` words (absent words filled with 0) —
    * ≤ 1 MiB at the default 2²² bits, so it broadcasts as a 1-row frame.
    * The map/transform fill runs once on that single row; per-batch-row
    * work in [[bloomScreenPacked]] is codegen'd `element_at`.
    */
  def bloomPack(index: DataFrame, mBits: Int): DataFrame = {
    require(mBits >= 32 && mBits % 32 == 0 && mBits <= (1 << 27),
      "mBits must be a positive multiple of 32, at most 2^27 (16 MiB packed)")
    val nWords = mBits / 32
    index
      .agg(map_from_entries(collect_list(struct(col("word_idx"), col("word"))))
        .as("_bf_m"))
      .select(transform(
        sequence(lit(0L), lit(nWords - 1L)),
        i => coalesce(try_element_at(col("_bf_m"), i), lit(0L))).as("bits"))
  }

  /** Membership screen against a [[bloomPack]]ed filter with ZERO
    * shuffles: the 1-row bitset broadcasts (a 1-row nested-loop join is
    * a plan no-op), and each batch row tests its k bits with codegen'd
    * `element_at`/shift arithmetic — no explode, no re-aggregation, no
    * exchange of the batch. This is the form an ingest-time 100 TB
    * screen actually runs: the filter rides the broadcast, the batch
    * never leaves its scan partitions.
    *
    * Same contract as [[bloomScreen]] (parameters must match the build;
    * NULL keys screen NULL), same result — BloomSpec pins the
    * equivalence.
    */
  def bloomScreenPacked(
      packed: DataFrame, batch: DataFrame, key: Column, mBits: Int, k: Int,
      salt: String = "graft:bloom", outCol: String = "maybe_seen"): DataFrame = {
    require(!batch.columns.exists(Set("_bf_pos", "bits", outCol).contains),
      s"batch must not already contain reserved columns _bf_pos/bits/$outCol")
    val checks = (0 until k).map { j =>
      val p = element_at(col("_bf_pos"), j + 1)
      call_function("shiftright",
        element_at(col("bits"), ((p / 32).cast("long") + 1L).cast("int")),
        (p % 32).cast("int")).bitwiseAND(lit(1L)) === 1L
    }
    batch
      .withColumn("_bf_pos", bloomPositions(key, k, mBits, salt))
      .crossJoin(org.apache.spark.sql.functions.broadcast(packed))
      .withColumn(outCol, checks.reduce(_ && _))
      .drop("_bf_pos", "bits")
  }

  // --------------------------------------------------------------------
  // KMV (k-minimum-values) distinct / set-overlap sketches
  // --------------------------------------------------------------------

  /** Hash universe of the KMV sketch: 48-bit values from the first 12
    * md5 hex chars (2^48 keeps every estimator product — (k−1)·U — inside
    * BIGINT for any practical k, where the 60-bit convention would
    * overflow at k=64). Sketches are fully deterministic and therefore
    * oracle-replayable, unlike an HLL register blob.
    */
  val KmvUniverse: Long = 1L << 48

  private[graft] def kmvHash(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 12), 16, 10)
      .cast("long")

  /** Bounded-state KMV aggregator: keeps the k smallest DISTINCT hashes
    * seen, in O(k) memory, with ORDER-INSENSITIVE reduce/merge (a set
    * union capped at k) — the property that lets the same sketch run as
    * a streaming stateful aggregate (any arrival order, any partial
    * grouping of micro-batches yields the identical k-min set) and as a
    * treeAggregate-style batch partial. Output: ascending k-mins.
    */
  final class KmvAgg(k: Int)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(k >= 2, s"KmvAgg needs k >= 2, got $k")
    // buffer: ascending sorted array of <= k distinct hashes (an Array
    // round-trips every encoder faithfully; kryo'd TreeSet came back as
    // a HashSet and broke the deserializer)
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val idx = java.util.Arrays.binarySearch(b, h)
      if (idx >= 0) b // already present
      else {
        val ins = -idx - 1
        if (b.length >= k && ins >= k) b // not among the k smallest
        else {
          val keep = math.min(b.length + 1, k)
          val out = new Array[Long](keep)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, keep - ins - 1)
          out
        }
      }
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted dedup merge, capped at k
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** [[KmvAgg]] as a column aggregate. */
  def kmvMins(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KmvAgg(k))

  /** Distinct estimate columns from a [[kmvMins]] array: (n_sk, est) —
    * the same exact-integer estimator as [[kmvDistinct]].
    */
  def kmvEstFromMins(mins: Column, k: Int): (Column, Column) = {
    val nSk = size(mins).cast("long")
    val kth = try_element_at(mins, lit(k))
    (nSk, when(nSk < k, nSk)
      .otherwise(call_function("div",
        lit((k - 1).toLong * KmvUniverse), kth)))
  }

  /** Per-group KMV sketch: the k smallest DISTINCT 48-bit key hashes of
    * each group, as (g, h, rn). The rank filter compiles to a
    * WindowGroupLimit pushdown, so each shuffle partition forwards at
    * most k rows per group — the sketch costs one shuffle of O(groups·k)
    * rows no matter how many raw keys feed it; estimating
    * count-distinct or pairwise overlap across 10^5 cohorts at 100 TB
    * never materializes a (cohort, key) distinct table downstream.
    * Trade-off vs HLL (Bar-Yossef et al. 2002 / Beyer et al., SIGMOD
    * 2007): k·8 bytes per group instead of 2^p registers, but mergeable
    * by a plain min-union AND exactly replayable — the property the
    * correctness gate needs.
    */
  def kmvSketch(
      df: DataFrame, groupCol: String, key: Column, k: Int,
      salt: String = "graft:kmv"): DataFrame = {
    require(k >= 2, s"kmvSketch needs k >= 2, got $k")
    val uh = df.where(key.isNotNull)
      .select(col(groupCol).as("g"), kmvHash(key, salt).as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("h")
    uh.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** Distinct-count estimate per group from a [[kmvSketch]]: exact when
    * the group has fewer than k distinct hashes (the sketch IS the set),
    * else the classic (k−1)·U / h_(k) estimator — all integer division,
    * bit-identical across engines.
    */
  def kmvDistinct(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy("g")
      .agg(count(lit(1)).as("n_sk"),
        max(when(col("rn") === k, col("h"))).as("kth"))
      .withColumn("est",
        when(col("n_sk") < k, col("n_sk"))
          .otherwise(expr(s"(${(k - 1).toLong * KmvUniverse}L div kth)")))
      .select("g", "n_sk", "est")

  /** Trailing-window distinct estimates from per-period sketches — the
    * MERGEABILITY payoff: build one KMV sketch per period (day) ONCE,
    * then answer any trailing `windowPeriods`-window by unioning sketch
    * rows and re-taking the k smallest. Only sketch rows move (≤ k per
    * period per window — each period's sketch fans out to the
    * `windowPeriods` windows it serves via one explode), the raw keys
    * are never re-shuffled; at 100 TB this is the difference between a
    * dashboard query and a recount of the corpus.
    *
    * `sketch` is a [[kmvSketch]] whose group column `g` is an integer
    * period (epoch day); output: (g, n_sk, est) per window END period,
    * windows covering [g − windowPeriods + 1, g] and reported only for
    * end periods present in the data.
    */
  def kmvWindowDistinct(
      sketch: DataFrame, k: Int, windowPeriods: Int): DataFrame = {
    require(windowPeriods >= 1, s"windowPeriods must be >= 1, got $windowPeriods")
    val sk = sketch.localCheckpoint(true) // fan-out + end-period filter
    val ends = sk.select(col("g")).distinct()
    val contrib = sk.withColumn("_end",
        explode(sequence(col("g"), col("g") + (windowPeriods - 1))))
      .join(ends.withColumnRenamed("g", "_end"), Seq("_end"))
      .select(col("_end").as("g"), col("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("h")
    kmvDistinct(
      contrib.withColumn("rn", row_number().over(w)).where(col("rn") <= k), k)
  }

  /** Pairwise set-overlap estimates for every group pair (g1 < g2) of a
    * [[kmvSketch]]: jaccard_q (10⁶-scaled), union and intersection
    * estimates. Uses the KMV merge theorem — the k smallest of A ∪ B are
    * a subset of sketch(A) ∪ sketch(B) — so only sketch rows (≤ k per
    * group) ever join; the raw keys are long gone. The group-pair frame
    * is quadratic in groups by nature, so the operator fails fast above
    * `maxGroups` instead of silently planning a giant self-join.
    */
  def kmvPairStats(sketch: DataFrame, k: Int, maxGroups: Int = 4096): DataFrame = {
    val sk = sketch.localCheckpoint(true) // four consumers below
    val groups = sk.select("g").distinct()
    val n = groups.count()
    require(n <= maxGroups,
      s"kmvPairStats: $n groups exceeds maxGroups=$maxGroups — the pair frame is quadratic")
    val pairs = groups.select(col("g").as("g1"))
      .join(groups.select(col("g").as("g2")), col("g1") < col("g2"))
    val ua = pairs.join(sk.withColumnRenamed("g", "g1").drop("rn"), Seq("g1"))
    val ub = pairs.join(sk.withColumnRenamed("g", "g2").drop("rn"), Seq("g2"))
      .select(ua.columns.map(col).toSeq: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g1", "g2").orderBy("h")
    val ranked = ua.unionAll(ub).distinct()
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
    ranked
      .join(sk.select(col("g").as("g1"), col("h"), lit(1).as("ina")),
        Seq("g1", "h"), "left")
      .join(sk.select(col("g").as("g2"), col("h"), lit(1).as("inb")),
        Seq("g2", "h"), "left")
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("k_eff"),
        max(when(col("rn") === k, col("h"))).as("kth"),
        sum(when(col("ina") === 1 && col("inb") === 1, 1L).otherwise(0L)).as("m"))
      .withColumn("union_est",
        when(col("k_eff") < k, col("k_eff"))
          .otherwise(expr(s"(${(k - 1).toLong * KmvUniverse}L div kth)")))
      .withColumn("jaccard_q", expr("(1000000 * m) div k_eff"))
      .withColumn("inter_est", expr("(jaccard_q * union_est) div 1000000"))
      .select("g1", "g2", "k_eff", "m", "union_est", "jaccard_q", "inter_est")
  }
}
