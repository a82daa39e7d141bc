package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-level corpus operators.
  *
  * Web-crawled training corpora key almost everything on URLs: exact-URL
  * dedup across crawl snapshots, per-registered-domain quality rollups,
  * domain allow/deny policies. The same page routinely appears under
  * dozens of spellings — scheme/host case, default ports, tracking
  * parameters, parameter order, trailing slashes — so a deterministic
  * canonical form is the prerequisite for every URL-keyed operation.
  * (The reference pipeline normalizes its `source_ip`/`event_type`
  * columns the same way before keying on them — src/pipeline.py:40-52 —
  * this extends that normalize-before-key discipline to URLs.)
  *
  * The four URL functions are native codegen'd Catalyst expressions
  * ([[graft.functions.UrlImpl]]) — no UDFs, one generated static call per
  * row regardless of composition depth, and exactly replayable in ANSI
  * SQL for the oracle gate. Canonicalization is per-row and
  * embarrassingly parallel: at 100 TB it fuses into the scan with zero
  * shuffle; only the keyed aggregations after it shuffle.
  *
  * The canonical form (documented contract, applied in this order):
  *   1. drop the fragment (`#…`);
  *   2. lowercase the scheme;
  *   3. split the authority at the first `/` OR `?` (RFC 3986 §3.2 —
  *      `scheme://host?q` has a query and no path); lowercase the
  *      host; drop the port iff it is the scheme default (`http:80`,
  *      `https:443`);
  *   4. strip tracking parameters (`utm_*` + [[UrlOps.TrackingParams]]),
  *      sort the survivors bytewise, and drop the `?` when none survive;
  *   5. strip trailing slashes from the path (`/docs/` ≡ `/docs`, and the
  *      bare root `/` ≡ empty).
  * Percent-decoding is deliberately OUT of scope: decoding unreserved
  * escapes is charset- and context-sensitive (a `%2F` in a path segment
  * is NOT a slash) and a wrong decode merges distinct URLs — the one
  * failure mode a dedup key must never have.
  */
object UrlOps {

  /** Query parameters stripped by [[canonicalizeUrl]] (exact names; the
    * `utm_` prefix family is stripped wholesale in addition).
    */
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "ref", "igshid")

  /** Two-level public suffixes (registries where the registered domain
    * is three labels, not two), loaded from the bundled
    * `graft/public_suffix_snapshot.txt` snapshot — ~500 ICANN-section
    * entries covering the common ccTLD second-level registries (advice
    * r10: the former 10-entry inline subset mis-grouped real-world hosts
    * on any other registry, e.g. `com.mx`, `co.nz`). A deployment swaps
    * the data file for a full, current publicsuffix.org list with no
    * code change; the set still compiles into the scan as a single
    * `InSet` membership probe (bounded, codegen'd — never a join).
    * Wildcard/exception PSL rules are out of scope for the bundled
    * heuristic; hosts under those registries fall back to the two-label
    * rule. The generated oracles embed the SAME sequence, so the data
    * file cannot desynchronize the gate.
    */
  val MultiLevelTlds: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.txt")
    require(in != null, "bundled public-suffix snapshot missing from classpath")
    try {
      val entries = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
      require(entries.nonEmpty && entries.distinct.size == entries.size,
        "public-suffix snapshot must be non-empty with unique entries")
      require(entries.forall(e => e.count(_ == '.') == 1 &&
        e == e.toLowerCase(java.util.Locale.ROOT)),
        "snapshot entries must be lowercase two-level suffixes")
      entries
    } finally in.close()
  }

  /** Lowercased host (authority minus port) of a `scheme://…` URL.
    *
    * Backed by the native [[graft.functions.UrlHostExpr]] expression (as
    * are [[canonicalizeUrl]], [[urlPath]], [[registeredDomain]]). The
    * original `Column`-composition form referenced its input ~12× across
    * nested stages; because `Column`s are immutable trees, each reference
    * embeds a COPY of the input subtree, so composing the chain over a
    * derived-URL expression inside one collapsed projection generated a
    * ~16,500-line `processNext()` that janino refused to compile — Spark
    * silently fell back to interpreted execution on the highest-volume
    * crawl-curation path. The native expressions generate ONE static call
    * each, so the chain stays whole-stage-codegen'd at any composition
    * depth (gated: the test session runs with
    * `spark.sql.codegen.fallback=false`, turning any future fallback into
    * a hard failure).
    */
  def urlHost(url: Column): Column = graft.functions.UrlFunctions.url_host(url)

  /** The canonical form of `url` per the object contract. Input must be
    * absolute (`scheme://…`); anything else passes through unchanged
    * (canonicalizing garbage into a plausible URL would silently merge
    * junk rows into real dedup classes). Native expression — see
    * [[urlHost]] and [[graft.functions.UrlImpl.canonical]].
    */
  def canonicalizeUrl(url: Column): Column =
    graft.functions.UrlFunctions.canonicalize_url(url)

  /** Registered (pay-level) domain of a lowercase host: the last two
    * labels, or three when the two-label suffix is a second-level
    * registry in [[MultiLevelTlds]]. Single-label hosts (`localhost`)
    * pass through. Native expression — see
    * [[graft.functions.UrlImpl.registeredDomain]].
    */
  def registeredDomain(host: Column): Column =
    graft.functions.UrlFunctions.registered_domain(host)

  /** Exact-URL dedup after canonicalization: one row per canonical URL
    * with the smallest `id` as the keeper and the class size. The
    * canonical key is computed in the scan stage; the single shuffle is
    * the groupBy on it (hash-partitioned, map-side combined).
    */
  def urlDedup(df: DataFrame, id: String, urlCol: String): DataFrame =
    df.select(canonicalizeUrl(col(urlCol)).as("canonical_url"), col(id))
      .groupBy("canonical_url")
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** One URL-policy rule: decision for URLs on `domain` whose canonical
    * path starts with `pathPrefix` ('' matches the whole domain). The
    * LONGEST matching prefix wins (the robots.txt discipline), so a
    * narrow allow can carve an exception out of a broad deny.
    */
  final case class UrlRule(domain: String, pathPrefix: String, allow: Boolean)

  /** Canonical path (after [[canonicalizeUrl]]'s trailing-slash trim) of
    * an absolute URL — '' for the bare root. Native expression — see
    * [[graft.functions.UrlImpl.path]].
    */
  def urlPath(url: Column): Column = graft.functions.UrlFunctions.url_path(url)

  /** Apply a robots-style allow/deny rule set: adds `allowed` (longest
    * matching rule's decision; `defaultAllow` when nothing matches) and
    * `matched_rule` (its "domain|prefix" key, NULL when none). Rules are
    * a bounded policy table, so they compile to ONE literal when-chain
    * ordered by prefix length — codegen'd, zero-shuffle, zero-join: the
    * policy rides the scan at 100 TB exactly like the threat-feed
    * longest-prefix matcher ([[Network]]'s design, applied to URL space).
    */
  def applyUrlPolicy(
      df: DataFrame, urlCol: String, rules: Seq[UrlRule],
      defaultAllow: Boolean = true): DataFrame =
    applyUrlPolicyOn(df, registeredDomain(urlHost(col(urlCol))),
      urlPath(col(urlCol)), rules, defaultAllow)

  /** [[applyUrlPolicy]] over PRECOMPUTED domain/path columns — the form
    * compositions use so URL parsing happens once per row, not once per
    * stage ([[CorpusPipeline.curateCrawl]]).
    */
  def applyUrlPolicyOn(
      df: DataFrame, dom: Column, path: Column, rules: Seq[UrlRule],
      defaultAllow: Boolean = true): DataFrame = {
    require(rules.nonEmpty, "applyUrlPolicy needs at least one rule")
    require(rules.map(r => (r.domain, r.pathPrefix)).distinct.size == rules.size,
      "duplicate (domain, prefix) rule keys")
    // longest prefix first; ties broken by rule key for determinism
    val ordered = rules.sortBy(r => (-r.pathPrefix.length, r.domain, r.pathPrefix))
    val hit = ordered.map { r =>
      val m = dom === r.domain &&
        (if (r.pathPrefix.isEmpty) lit(true)
         else substring(path, 1, r.pathPrefix.length) === r.pathPrefix)
      (m, r)
    }
    val decision = hit.foldRight(lit(defaultAllow)) { case ((m, r), els) =>
      when(m, lit(r.allow)).otherwise(els)
    }
    val matched = hit.foldRight(lit(null).cast("string")) { case ((m, r), els) =>
      when(m, lit(s"${r.domain}|${r.pathPrefix}")).otherwise(els)
    }
    df.withColumn("allowed", decision).withColumn("matched_rule", matched)
  }

  /** Per-domain crawl budget: keep at most `budget` documents per
    * registered domain, best-first by `scoreCol` (ties broken by `id` so
    * the cut is deterministic). The rank window compiles to Spark's
    * WindowGroupLimit — per-partition top-k pushed BEFORE the shuffle,
    * so the exchange carries at most `budget` rows per domain per map
    * partition, not the whole corpus — the standard budget-enforcement
    * shape for domain-skewed crawls.
    */
  def domainBudget(
      df: DataFrame, id: String, urlCol: String, scoreCol: String,
      budget: Int): DataFrame =
    domainBudgetOn(df, id, registeredDomain(urlHost(col(urlCol))),
      scoreCol, budget)

  /** [[domainBudget]] over a PRECOMPUTED domain column — the
    * parse-once composition form.
    */
  def domainBudgetOn(
      df: DataFrame, id: String, dom: Column, scoreCol: String,
      budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(dom)
      .orderBy(col(scoreCol).desc, col(id))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= budget)
      .drop("_rk")
  }

  /** [[domainBudget]] with PER-DOMAIN budgets from a `(domain, budget)`
    * frame — the authority-weighted crawl policy (e.g. budgets derived
    * from [[GraphRank.pageRank]]: vouched-for domains earn deeper
    * crawls). Domains absent from the table get `defaultBudget`; an
    * EMPTY budgets frame (or one whose budget column is all NULL)
    * degrades to a uniform `defaultBudget` cap rather than crashing
    * (advice r12). Duplicate domain rows in `budgets` are collapsed to
    * their MAX budget before the broadcast join — a duplicated
    * dimension row must not duplicate admitted documents.
    *
    * Scale shape: the rank window still uses a CONSTANT cap — the MAX
    * budget in the table (one bounded scalar action over the ≤#domains
    * frame) — so Spark's WindowGroupLimit pushdown keeps pruning
    * per-partition before the domain exchange; the variable per-domain
    * cut is then a broadcast join + filter on the survivors (≤ maxBudget
    * rows per domain). A naive `rank <= budget_col` window alone would
    * lose the pushdown and shuffle whole domains.
    */
  def domainBudgetWeighted(
      df: DataFrame, id: String, urlCol: String, scoreCol: String,
      budgets: DataFrame, defaultBudget: Int = 1): DataFrame = {
    require(defaultBudget >= 0,
      s"defaultBudget must be >= 0, got $defaultBudget")
    val b = budgets.select(col("domain").as("_bdom"),
      col("budget").cast("long").as("_budget"))
      .where(col("_budget").isNotNull)
      .groupBy("_bdom").agg(max("_budget").as("_budget"))
    // bounded scalar action over the budget table (a domain dimension);
    // max over an empty/all-NULL table is NULL → uniform defaultBudget
    val maxBudget = math.max(defaultBudget.toLong,
      Option(b.agg(max("_budget")).collect()(0).get(0))
        .fold(defaultBudget.toLong)(_.asInstanceOf[Long]))
    require(maxBudget >= 1, "all budgets are 0 — nothing can be admitted")
    val dom = registeredDomain(urlHost(col(urlCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_dom"))
      .orderBy(col(scoreCol).desc, col(id))
    df.withColumn("_dom", dom)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxBudget) // constant cap: WindowGroupLimit
      .join(broadcast(b), col("_dom") === col("_bdom"), "left")
      .filter(col("_rk") <= coalesce(col("_budget"), lit(defaultBudget.toLong)))
      .drop("_dom", "_rk", "_bdom", "_budget")
  }

  /** Per-registered-domain corpus rollup: document count, distinct
    * canonical URLs, and total characters — the shape domain-level
    * quality policies (crawl budgets, spam domain cuts) consume. One
    * shuffle on the domain key; the URL→domain mapping rides the scan.
    */
  def domainRollup(df: DataFrame, urlCol: String, charsCol: String): DataFrame =
    df.select(
        registeredDomain(urlHost(col(urlCol))).as("domain"),
        canonicalizeUrl(col(urlCol)).as("_curl"),
        col(charsCol).as("_chars"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("_curl")).as("n_urls"),
        sum(col("_chars")).as("total_chars"))
  /** Parse a robots.txt body into the [[UrlRule]] set for one
    * user-agent — the missing front half of [[applyUrlPolicy]] (which
    * already implements REP's longest-prefix-wins precedence): fetch a
    * domain's robots.txt once, parse it here, apply the rules to every
    * crawled URL of that domain map-side. Driver-side string parsing on
    * a BOUNDED policy input (robots bodies are kilobytes), like the
    * threat-feed loaders.
    *
    * Implements the RFC 9309 core:
    *  - `field: value` lines, case-insensitive field names, `#`
    *    comments stripped, blank-line tolerant;
    *  - groups = consecutive `User-agent` lines followed by rules; a
    *    group applies when the UA line's PRODUCT TOKEN (the value up to
    *    the first `/` or whitespace, per RFC 9309 §2.2.1 — so
    *    `User-agent: graftbot/1.0` matches `graftbot`) equals
    *    `userAgent` case-insensitively, or is `*`;
    *  - the MOST SPECIFIC agent wins: when any exact-agent group
    *    exists, `*` groups are ignored entirely;
    *  - `Allow`/`Disallow` values are path prefixes; an empty
    *    `Disallow` means "allow all" (no rule emitted);
    *  - duplicate (prefix) rules collapse with ALLOW winning the tie
    *    (RFC 9309 §2.2.2's least-restrictive tiebreak).
    * Documented simplification — ASYMMETRIC by decision polarity so the
    * approximation never errs toward crawling a disallowed tree:
    * `Disallow` values are truncated at the first `*` (and `$`
    * stripped) and matched as plain prefixes, which only BROADENS the
    * deny; `Allow` values containing `*` or anchored with `$` are
    * DROPPED entirely, because the same truncation would broaden the
    * allow (e.g. `Disallow: /` + `Allow: /$` — allow the homepage
    * only — must not collapse into an allow-all prefix `/`). A dropped
    * allow errs toward not crawling, never the reverse.
    */
  def parseRobots(
      robotsTxt: String, domain: String,
      userAgent: String = "*"): Seq[UrlRule] = {
    require(domain.nonEmpty, "parseRobots needs the rules' domain")
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    final case class Group(agents: Vector[String], rules: Vector[(String, Boolean)])
    val lines = robotsTxt.split("\\r?\\n").iterator
      .map(l => (if (l.indexOf('#') >= 0) l.substring(0, l.indexOf('#')) else l).trim)
      .filter(_.nonEmpty)
      .flatMap { l =>
        val i = l.indexOf(':')
        if (i <= 0) None
        else Some((l.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT),
          l.substring(i + 1).trim))
      }.toVector
    // group splitting: a user-agent line AFTER any rule line starts a
    // new group; consecutive user-agent lines share one group
    val groups = lines.foldLeft(Vector.empty[Group]) {
      case (gs, ("user-agent", v)) =>
        val agent = v.toLowerCase(java.util.Locale.ROOT)
        gs.lastOption match {
          case Some(g) if g.rules.isEmpty =>
            gs.init :+ g.copy(agents = g.agents :+ agent)
          case _ => gs :+ Group(Vector(agent), Vector.empty)
        }
      case (gs, (field, v)) if field == "allow" || field == "disallow" =>
        gs.lastOption match {
          case Some(g) =>
            val allow = field == "allow"
            val rule =
              if (v.isEmpty) {
                if (allow) Some(("", true)) else None // empty Disallow = allow-all
              } else if (allow && (v.contains('*') || v.endsWith("$"))) {
                None // truncating an Allow would broaden crawling: drop it
              } else {
                Some((v.takeWhile(_ != '*').stripSuffix("$"), allow))
              }
            rule.fold(gs)(r => gs.init :+ g.copy(rules = g.rules :+ r))
          case None => gs // rules before any user-agent line: ignored
        }
      case (gs, _) => gs // crawl-delay / sitemap / unknown fields
    }
    // RFC 9309 §2.2.1: match on the UA line's product token, so
    // "User-agent: graftbot/1.0" still selects the graftbot group
    def token(agent: String): String = agent.split("[/\\s]", 2)(0)
    val exact = groups.filter(_.agents.exists(a => a != "*" && token(a) == ua))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
      .groupBy(_._1)
      .map { case (prefix, rs) => UrlRule(domain, prefix, rs.exists(_._2)) }
      .toSeq
      .sortBy(r => (r.pathPrefix, r.allow))
  }

}
