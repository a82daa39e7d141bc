package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Network enrichment: IPv4 arithmetic and longest-prefix-match (LPM) CIDR
  * classification — the threat-intel lookup a security event pipeline runs
  * on every row (reference domain: src/normalization.py's source_ip
  * handling stops at trimming; real deployments enrich each address
  * against a CIDR feed).
  *
  * Scale design: a threat/CIDR feed is small by nature (10^4..10^6 rows,
  * a few MB) while the event stream is the 100 TB side, so LPM must never
  * shuffle events. Two shapes:
  *
  *  - [[lpmEnrich]] — the feed folds into a literal array of (lo, hi,
  *    prefix, label) structs; per-row higher-order `filter` + `aggregate`
  *    pick the longest matching prefix. ZERO exchanges: pure map-side
  *    evaluation, the event side streams through untouched.
  *  - [[lpmJoin]] — the feed as a DataFrame: broadcast range join
  *    (`ip BETWEEN lo AND hi`), then per-event argmax via
  *    `max_by(struct, prefix)`. The broadcast join multiplies each event
  *    row by its matches IN PLACE (same partition), so the partial
  *    aggregate collapses them map-side and the one exchange carries ~1
  *    row per matched event, not per match.
  *
  * All address math is 32-bit unsigned carried in LONG columns — exact
  * integer arithmetic, bit-identical across engines (the oracle replays
  * the same masks in SQL).
  */
object Network {

  /** Deterministic synthetic IPv4 (32-bit value in a LONG) drawn from the
    * first 8 md5 hex chars of a salted key. The testdata carries no
    * address column, so enrichment queries derive one reproducibly — the
    * same per-operator-salt convention as CorpusSampling's split/upsample
    * draws; the DuckDB oracle replays the identical derivation with
    * `('0x' || substr(md5(key || salt), 1, 8))::BIGINT`.
    */
  def ipFromKey(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long")

  /** Dotted-quad rendering of an address LONG. */
  def ipDotted(ip: Column): Column =
    concat_ws(".",
      shiftright(ip, 24).bitwiseAND(lit(255L)),
      shiftright(ip, 16).bitwiseAND(lit(255L)),
      shiftright(ip, 8).bitwiseAND(lit(255L)),
      ip.bitwiseAND(lit(255L)))

  /** Prefix length of a CIDR string column ("a.b.c.d/p" → p). */
  def cidrPrefix(cidr: Column): Column =
    split(cidr, "/").getItem(1).cast("int")

  /** Block size 2^(32-p) as a LONG. `pow` is exact here: powers of two up
    * to 2^32 are representable doubles.
    */
  private def blockSize(prefix: Column): Column =
    pow(lit(2.0), lit(32) - prefix).cast("long")

  /** Unmasked base address of a CIDR string column. */
  private def cidrRaw(cidr: Column): Column = {
    val o = split(split(cidr, "/").getItem(0), "\\.")
    o.getItem(0).cast("long") * 16777216L + o.getItem(1).cast("long") * 65536L +
      o.getItem(2).cast("long") * 256L + o.getItem(3).cast("long")
  }

  /** First address of the CIDR block (base masked to the prefix). */
  def cidrLo(cidr: Column): Column = {
    val raw = cidrRaw(cidr)
    raw - raw % blockSize(cidrPrefix(cidr))
  }

  /** Last address of the CIDR block. */
  def cidrHi(cidr: Column): Column =
    cidrLo(cidr) + blockSize(cidrPrefix(cidr)) - 1L

  private val entryType =
    "struct<lo:bigint,hi:bigint,prefix:int,cidr:string,label:string>"

  /** One feed entry parsed at plan-build time (plain JVM arithmetic — the
    * feed is a compile-time literal, so nothing about it belongs in the
    * per-row path).
    */
  private final case class ParsedCidr(
      cidr: String, label: String, prefix: Int, lo: Long, hi: Long)

  private def parseCidr(cidr: String, label: String): ParsedCidr = {
    // validate the split shape and numeric parses FIRST so every
    // malformed feed entry fails with the descriptive message, not a
    // MatchError / NumberFormatException at plan-build time
    val parts = cidr.split("/")
    require(parts.length == 2, s"malformed CIDR: $cidr")
    val o = parts(0).split("\\.").flatMap(s => s.toLongOption)
    val p = parts(1).toIntOption.getOrElse(-1)
    require(o.length == 4 && parts(0).split("\\.").length == 4 &&
      o.forall(x => x >= 0 && x <= 255) &&
      p >= 0 && p <= 32, s"malformed CIDR: $cidr")
    val raw = o(0) * 16777216L + o(1) * 65536L + o(2) * 256L + o(3)
    val block = 1L << (32 - p)
    val lo = raw - raw % block
    ParsedCidr(cidr, label, p, lo, lo + block - 1)
  }

  /** Longest-prefix-match enrichment against a literal CIDR feed. Adds a
    * `_lpm` struct column (lo, hi, prefix, cidr, label) — NULL when no
    * CIDR contains the address. The feed parses in Scala at plan-build
    * time and compiles to a `when`-chain ordered by prefix DESC (blocks
    * of equal prefix are disjoint, so the first hit IS the longest
    * match) — a flat CaseWhen of long comparisons that stays inside
    * whole-stage codegen. The higher-order-function formulation
    * (`filter` + `aggregate` over a literal array) was measured 20×
    * slower at 10× scale: array lambdas are CodegenFallback, so every
    * row paid interpreted eval and a closure allocation. Zero exchanges
    * either way; for feeds too large for a linear chain use [[lpmJoin]].
    */
  def lpmEnrich(df: DataFrame, ip: Column, cidrs: Seq[(String, String)]): DataFrame = {
    require(cidrs.nonEmpty, "lpmEnrich: empty CIDR feed")
    val parsed = cidrs.map { case (c, l) => parseCidr(c, l) }
      .sortBy(e => (-e.prefix, e.lo))
    val best = parsed.foldRight(lit(null).cast(entryType)) { (e, acc) =>
      when(ip.between(lit(e.lo), lit(e.hi)),
        struct(lit(e.lo).as("lo"), lit(e.hi).as("hi"),
          lit(e.prefix).as("prefix"), lit(e.cidr).as("cidr"),
          lit(e.label).as("label"))).otherwise(acc)
    }
    df.withColumn("_lpm", best)
  }

  /** Point-in-interval join at shuffle scale — the shape for when BOTH
    * sides are too big to broadcast (billions of flow records against
    * hundreds of millions of allocation/geolocation ranges). The KEYLESS
    * sibling of [[graft.operators.TemporalJoins.rangeJoinBinned]]: that
    * one requires an equi-key (per-entity time intervals) and bins an
    * arbitrary-width clock; this one serves feeds with NO shared key —
    * global address/keyspace ranges — and bins by power-of-two shifts.
    * A naive `pt BETWEEN lo AND hi` join with no equi-key degenerates
    * to a broadcast-nested-loop (or worse, a cartesian) the moment the
    * range side outgrows the broadcast threshold; this operator
    * restores an equi-key by quantizing the keyspace into
    * 2^binBits-wide bins:
    *
    *  - each interval explodes to the bins it overlaps
    *    (`sequence(lo >> b, hi >> b)` — width/2^b + 1 rows, O(1) when
    *    binBits is chosen near log2(typical width));
    *  - each point carries its single bin (`pt >> b`);
    *  - a plain hash/sort-merge EQUI-join on the bin co-locates every
    *    candidate pair, and the exact `BETWEEN` runs as a cheap
    *    post-filter inside the joined partition.
    *
    * A point lives in exactly one bin, so no match can be produced twice
    * — no dedup pass is needed. Skew (a bin overlapped by many intervals
    * or dense in points) is ordinary equi-join skew: AQE's skew-join
    * split applies, unlike the BNLJ it replaces. Both input frames must
    * not already carry a `_bin` column.
    */
  def binnedRangeJoin(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binBits: Int): DataFrame = {
    require(binBits > 0 && binBits < 63, s"binBits out of range: $binBits")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "binnedRangeJoin: inputs must not carry a _bin column")
    val ivs = intervals.withColumn(
      "_bin", explode(sequence(shiftright(col(loCol), binBits),
        shiftright(col(hiCol), binBits))))
    points.withColumn("_bin", shiftright(col(ptCol), binBits))
      .join(ivs, Seq("_bin"))
      .where(col(ptCol).between(col(loCol), col(hiCol)))
      .drop("_bin")
  }

  /** Longest-prefix-match as a broadcast range join — the shape for feeds
    * too large to fold into the plan but still broadcast-size. `cidrTable`
    * needs (cidr, label) string columns. Output: one row per matched
    * event, `keyCol` + ip + (cidr, label, prefix) of the longest matching
    * prefix. Ties are impossible for a well-formed feed (two blocks of
    * equal prefix length are disjoint).
    */
  def lpmJoin(df: DataFrame, keyCol: String, ip: Column, cidrTable: DataFrame): DataFrame = {
    val feed = cidrTable.select(
      col("cidr"), col("label"), cidrPrefix(col("cidr")).as("prefix"),
      cidrLo(col("cidr")).as("lo"), cidrHi(col("cidr")).as("hi"))
    val withIp = df.select(col(keyCol), ip.as("_ip"))
    withIp.join(broadcast(feed), col("_ip").between(col("lo"), col("hi")))
      .groupBy(keyCol)
      .agg(
        first(col("_ip")).as("_ip"),
        max_by(struct(col("cidr"), col("label"), col("prefix")), col("prefix")).as("_m"))
      .select(col(keyCol), col("_ip"), col("_m.cidr"), col("_m.label"), col("_m.prefix"))
  }
}
