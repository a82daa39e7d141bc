package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log template mining — the SOC log-reduction primitive (the masking
  * half of Drain-style template extraction, He et al. 2017, done as a
  * deterministic one-pass normalization instead of a mutable parse
  * tree): variable fields (UUIDs, IPs, long hex runs, numbers) are
  * masked to typed placeholders, so the millions of raw messages
  * collapse to the handful of format strings that produced them. The
  * census over templates is the triage surface ("what is this system
  * saying, and how often"); a template whose first sighting is recent
  * is the classic novel-pattern alert.
  *
  * Scale shape: masking is a chain of codegen'd `regexp_replace`
  * projections — map-side, zero shuffles. The census is ONE hash
  * aggregate whose key domain is the TEMPLATE set (format strings in
  * the emitting software, typically 10²–10⁴), so the aggregate output
  * is tiny no matter how many trillions of raw lines stream through;
  * partial aggregation absorbs almost everything map-side.
  *
  * Masking order is a correctness contract, spec-pinned:
  * UUID before HEX (a UUID's 8-char groups are valid hex runs), IP
  * before NUM (an IPv4's octets are digit runs), HEX before NUM (a
  * hex run can be all-digits).
  *
  * Case policy (advice r14): hex runs and UUIDs match CASE-INSENSITIVELY
  * ([0-9a-fA-F]) — real logs carry uppercase Windows GUIDs, MACs, and
  * hex dumps, and an unmasked variable field makes template cardinality
  * grow with the VALUES, breaking the "state bounded by format-string
  * count" guarantee the census and the never-expiring
  * novel-template-stream state rely on. Pure-alpha hex-range words of
  * length ≥ 8 ("deadbeef"-like English is rare; "accede", "efface" are
  * shorter) are the accepted false-positive trade, same as Drain's.
  */
object LogTemplates {

  private val UuidRe =
    "\\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\b"
  private val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val HexRe = "\\b[0-9a-fA-F]{8,}\\b"
  private val NumRe = "\\d+"

  /** The masked template of a raw message — pure column expression. */
  def templateOf(msg: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(msg, UuidRe, "<UUID>"),
          IpRe, "<IP>"),
        HexRe, "<HEX>"),
      NumRe, "<NUM>")

  /** Template census: one row per template with its event count, first
    * and last sighting (µs), and the lexicographically-smallest example
    * message (deterministic representative).
    *
    * @param tsUs epoch-µs LONG column name
    */
  def mine(df: DataFrame, msgCol: String, tsUs: String): DataFrame =
    df.where(col(msgCol).isNotNull)
      .select(templateOf(col(msgCol)).as("template"),
        col(msgCol).as("_msg"), col(tsUs).as("_tu"))
      .groupBy("template")
      .agg(count(lit(1)).as("n_events"),
        min(col("_tu")).as("first_us"),
        max(col("_tu")).as("last_us"),
        min(col("_msg")).as("example"))

  /** Novel templates: those FIRST seen inside the trailing
    * `1/lastFracInv` of the observed time range — "a log line shape
    * this system never produced before just appeared". The range
    * bounds come from one global aggregate (broadcast scalar join);
    * the cutoff is exact integer arithmetic, so the flag is
    * engine-replayable.
    */
  def novelTemplates(
      df: DataFrame, msgCol: String, tsUs: String,
      lastFracInv: Int = 5): DataFrame = {
    require(lastFracInv >= 2, s"lastFracInv must be >= 2, got $lastFracInv")
    val bounds = df.where(col(msgCol).isNotNull)
      .agg(min(col(tsUs)).as("_lo"), max(col(tsUs)).as("_hi"))
    mine(df, msgCol, tsUs)
      .crossJoin(broadcast(bounds))
      .withColumn("_cutoff",
        col("_hi") - expr(s"(_hi - _lo) div $lastFracInv"))
      .where(col("first_us") > col("_cutoff"))
      .select("template", "n_events", "first_us", "last_us", "example")
  }
}
