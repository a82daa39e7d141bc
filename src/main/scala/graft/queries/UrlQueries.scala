package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{GraphRank, UrlOps}
import QueryDef.table

/** URL canonicalization / domain-rollup queries ([[graft.ext.UrlOps]]).
  *
  * The documents testdata carries no URL column, so each query first
  * DERIVES a deterministic synthetic URL per document — messy on purpose
  * (mixed-case schemes and hosts, default and explicit ports, tracking
  * parameters, unsorted parameters, trailing slashes, fragments) — with
  * the identical derivation written in both dialects, then gates the
  * library's canonical form / registered domain / dedup / rollup against
  * the DuckDB replay of the same contract. Everything is exact string
  * manipulation: the hash gate is bit-exact by construction.
  */
object UrlQueries {

  private def docs(s: SparkSession, d: String) = table(s, d, "documents")

  /** Deterministic messy URL per document — Spark side. MUST stay
    * character-identical to [[deriveUrlSql]].
    */
  private[graft] def deriveUrl: Column = {
    val id = col("doc_id")
    val idStr = id.cast("string")
    val h2 = substring(md5(idStr), 1, 2)
    val tld = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("io"), lit("com.au")),
      (id % 5).cast("int") + 1)
    val hostBase = when(id % 7 === 3, col("source"))
      .otherwise(concat(col("source"), lit("-"), h2))
    val hostCased = when(id % 2 === 0, upper(hostBase)).otherwise(hostBase)
    val host = concat(lit("www."), hostCased, lit("."), tld)
    val scheme = element_at(
      array(lit("HTTP"), lit("https"), lit("HTTPS")), (id % 3).cast("int") + 1)
    val port = element_at(
      array(lit(":443"), lit(":8080"), lit(":80"), lit("")), (id % 4).cast("int") + 1)
    val path = when(id % 7 === 3, lit("/landing/"))
      .otherwise(concat(lit("/docs/"), idStr))
    val qs = when(id % 7 === 3, concat(lit("?utm_campaign=c"), idStr))
      .when(id % 7 === 0, lit("?b=2&utm_source=feed&a=1"))
      .when(id % 7 === 1, concat(lit("?fbclid=f"), h2, lit("&id="), idStr))
      .otherwise(lit(""))
    val frag = when(id % 5 === 0, lit("#sec")).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, qs, frag)
  }

  /** The same derivation as a DuckDB SQL expression over `doc_id`/`source`. */
  private[queries] val deriveUrlSql: String =
    """(CASE (doc_id % 3) WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' ELSE 'HTTPS' END
      || '://' || 'www.'
      || (CASE WHEN doc_id % 2 = 0
            THEN upper(CASE WHEN doc_id % 7 = 3 THEN source
                       ELSE source || '-' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) END)
            ELSE CASE WHEN doc_id % 7 = 3 THEN source
                 ELSE source || '-' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) END END)
      || '.' || (CASE (doc_id % 5) WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                 WHEN 2 THEN 'co.uk' WHEN 3 THEN 'io' ELSE 'com.au' END)
      || (CASE (doc_id % 4) WHEN 0 THEN ':443' WHEN 1 THEN ':8080'
          WHEN 2 THEN ':80' ELSE '' END)
      || (CASE WHEN doc_id % 7 = 3 THEN '/landing/'
          ELSE '/docs/' || CAST(doc_id AS VARCHAR) END)
      || (CASE WHEN doc_id % 7 = 3 THEN '?utm_campaign=c' || CAST(doc_id AS VARCHAR)
          WHEN doc_id % 7 = 0 THEN '?b=2&utm_source=feed&a=1'
          WHEN doc_id % 7 = 1
            THEN '?fbclid=f' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                 || '&id=' || CAST(doc_id AS VARCHAR)
          ELSE '' END)
      || (CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END))"""

  /** The [[UrlOps.canonicalizeUrl]] + [[UrlOps.registeredDomain]] contract
    * as a chain of DuckDB CTE stages. Expects an upstream CTE `u` exposing
    * a `url` column (plus any passthrough columns, propagated by `*`);
    * the final stage `s7` adds `canonical_url`, `host`, and `domain`.
    * Step-for-step replay of the documented contract: fragment drop,
    * scheme/authority/path-query split, default-port drop, tracking-param
    * filter + bytewise sort, trailing-slash trim, public-suffix labels.
    */
  private[queries] val canonCtes: String = {
    val tracking = UrlOps.TrackingParams.map(p => s"'$p'").mkString(", ")
    val ml = UrlOps.MultiLevelTlds.map(t => s"'$t'").mkString(", ")
    s"""s1 AS (SELECT *, split_part(url, '#', 1) AS nofrag FROM u),
       s2 AS (SELECT *, lower(split_part(nofrag, '://', 1)) AS scheme,
         CASE WHEN strpos(nofrag, '://') > 0
           THEN substr(nofrag, strpos(nofrag, '://') + 3) ELSE '' END AS rest
         FROM s1),
       s3 AS (SELECT *,
         split_part(split_part(rest, '/', 1), '?', 1) AS auth,
         substr(rest,
           length(split_part(split_part(rest, '/', 1), '?', 1)) + 1) AS pathq
         FROM s2),
       s4 AS (SELECT *, lower(split_part(auth, ':', 1)) AS host,
         CASE WHEN strpos(auth, ':') > 0
           THEN substr(auth, strpos(auth, ':') + 1) ELSE '' END AS port,
         rtrim(split_part(pathq, '?', 1), '/') AS path,
         CASE WHEN strpos(pathq, '?') > 0
           THEN substr(pathq, strpos(pathq, '?') + 1) ELSE '' END AS qs
         FROM s3),
       s5 AS (SELECT *, coalesce(array_to_string(list_sort(list_filter(
           string_split(qs, '&'),
           p -> NOT (split_part(p, '=', 1) IN ($tracking)
                     OR substr(split_part(p, '=', 1), 1, 4) = 'utm_'))),
           '&'), '') AS qs2
         FROM s4),
       s6 AS (SELECT *, scheme || '://' || host
           || (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                      OR (scheme = 'https' AND port = '443')
               THEN '' ELSE ':' || port END)
           || path
           || (CASE WHEN qs2 = '' THEN '' ELSE '?' || qs2 END) AS canonical_url,
         string_split(host, '.') AS ls
         FROM s5),
       s7 AS (SELECT *, CASE
           WHEN len(ls) <= 1 THEN host
           WHEN ls[-2] || '.' || ls[-1] IN ($ml) AND len(ls) >= 3
             THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
           ELSE ls[-2] || '.' || ls[-1] END AS domain
         FROM s6)"""
  }

  /** Per-document canonical URL + host + registered domain — gates the
    * full canonicalization contract string-exactly on every document.
    */
  val qUrlCanonical = QueryDef(
    "q_url_canonical",
    (s, d) => docs(s, d)
      .select(col("doc_id"), deriveUrl.as("url"))
      .select(col("doc_id"), col("url"),
        UrlOps.canonicalizeUrl(col("url")).as("canonical_url"),
        UrlOps.urlHost(col("url")).as("host"),
        UrlOps.registeredDomain(UrlOps.urlHost(col("url"))).as("domain"))
      .orderBy("doc_id"),
    Some(s"""WITH u AS (SELECT doc_id, $deriveUrlSql AS url FROM documents),
             $canonCtes
             SELECT doc_id, url, canonical_url, host, domain
             FROM s7 ORDER BY doc_id"""))

  /** Exact-URL dedup on the canonical key ([[UrlOps.urlDedup]]): URLs
    * differing only in case/ports/tracking params/slashes collapse to one
    * keeper. The `%7=3` derivation class makes real multi-document
    * classes whose members differ ONLY by stripped noise.
    */
  val qUrlDedup = QueryDef(
    "q_url_dedup",
    (s, d) => UrlOps.urlDedup(
        docs(s, d).select(col("doc_id"), deriveUrl.as("url")), "doc_id", "url")
      .orderBy("canonical_url"),
    Some(s"""WITH u AS (SELECT doc_id, $deriveUrlSql AS url FROM documents),
             $canonCtes
             SELECT canonical_url, min(doc_id) AS keep_id, count(*) AS n_dups
             FROM s7 GROUP BY canonical_url ORDER BY canonical_url"""))

  /** Registered-domain rollup ([[UrlOps.domainRollup]]): doc counts,
    * distinct canonical URLs, and total characters per pay-level domain —
    * the input to domain-level crawl/quality policy.
    */
  val qDomainRollup = QueryDef(
    "q_domain_rollup",
    (s, d) => UrlOps.domainRollup(
        docs(s, d).select(col("doc_id"), col("n_chars"), deriveUrl.as("url")),
        "url", "n_chars")
      .orderBy("domain"),
    Some(s"""WITH u AS (SELECT doc_id, n_chars, $deriveUrlSql AS url FROM documents),
             $canonCtes
             SELECT domain, count(*) AS n_docs,
               count(DISTINCT canonical_url) AS n_urls,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
             FROM s7 GROUP BY domain ORDER BY domain"""))

  /** The policy rule set exercised by `q_url_policy` — ONE definition
    * feeding both the operator call and the generated oracle CASE chain.
    * Covers: a deny carved by path prefix, the shorter whole-domain
    * allow it overrides, a whole-domain deny, and a path deny on a
    * hashed host — plus the default-allow fall-through for everything
    * else.
    */
  private[graft] val PolicyRules: Seq[UrlOps.UrlRule] = Seq(
    UrlOps.UrlRule("src3.io", "/landing", allow = false),
    UrlOps.UrlRule("src3.io", "", allow = true),
    UrlOps.UrlRule("src10.com", "", allow = false),
    UrlOps.UrlRule("src1-c4.org", "/docs", allow = false))

  /** Robots-style longest-prefix URL policy ([[UrlOps.applyUrlPolicy]]):
    * decision + matched rule per document, replayed as the identically
    * ordered CASE chain over the canonCtes domain/path.
    */
  /** The longest-prefix-first CASE arms of [[PolicyRules]] over the
    * canonCtes `domain`/`path` columns — shared by the policy and
    * composed-curation oracles.
    */
  private[queries] def policyArms(sel: UrlOps.UrlRule => String): String = {
    val ordered = PolicyRules.sortBy(r => (-r.pathPrefix.length, r.domain, r.pathPrefix))
    ordered.map { r =>
      val m =
        if (r.pathPrefix.isEmpty) s"domain = '${r.domain}'"
        else s"domain = '${r.domain}' AND substr(path, 1, ${r.pathPrefix.length})" +
          s" = '${r.pathPrefix}'"
      s"WHEN $m THEN ${sel(r)}"
    }.mkString("\n               ")
  }

  val qUrlPolicy = QueryDef(
    "q_url_policy",
    (s, d) => UrlOps.applyUrlPolicy(
        docs(s, d).select(col("doc_id"), deriveUrl.as("url")), "url", PolicyRules)
      .select("doc_id", "allowed", "matched_rule")
      .orderBy("doc_id"),
    Some(s"""WITH u AS (SELECT doc_id, $deriveUrlSql AS url FROM documents),
             $canonCtes
             SELECT doc_id,
               CASE ${policyArms(_.allow.toString)} ELSE true END AS allowed,
               CASE ${policyArms(r => s"'${r.domain}|${r.pathPrefix}'")}
                 ELSE NULL END AS matched_rule
             FROM s7 ORDER BY doc_id"""))

  /** Deny-by-default twin of q_url_policy (`defaultAllow = false` — the
    * allowlist-crawl posture: nothing is fetched unless a rule says so).
    * Same rule set and longest-prefix semantics; only the CASE
    * fall-through flips, so the two variants together pin BOTH default
    * branches of [[UrlOps.applyUrlPolicy]].
    */
  val qUrlPolicyDeny = QueryDef(
    "q_url_policy_deny",
    (s, d) => UrlOps.applyUrlPolicy(
        docs(s, d).select(col("doc_id"), deriveUrl.as("url")), "url",
        PolicyRules, defaultAllow = false)
      .select("doc_id", "allowed", "matched_rule")
      .orderBy("doc_id"),
    Some(s"""WITH u AS (SELECT doc_id, $deriveUrlSql AS url FROM documents),
             $canonCtes
             SELECT doc_id,
               CASE ${policyArms(_.allow.toString)} ELSE false END AS allowed,
               CASE ${policyArms(r => s"'${r.domain}|${r.pathPrefix}'")}
                 ELSE NULL END AS matched_rule
             FROM s7 ORDER BY doc_id"""))

  /** The composed crawl-curation pass
    * ([[graft.ext.CorpusPipeline.curateCrawl]]): policy → canonical
    * keep-min dedup → domain budget, one oracle chaining the three
    * stages' replays.
    */
  val qCrawlCurate = QueryDef(
    "q_crawl_curate",
    (s, d) => graft.ext.CorpusPipeline.curateCrawl(
        docs(s, d).select(col("doc_id"), col("n_chars"), deriveUrl.as("url")),
        "doc_id", "url", "n_chars", PolicyRules, budget = 2)
      .select("doc_id", "canonical_url", "domain", "n_chars")
      .orderBy("doc_id"),
    Some(s"""WITH u AS (SELECT doc_id, n_chars, $deriveUrlSql AS url FROM documents),
             $canonCtes,
             pol AS (SELECT * FROM s7
               WHERE CASE ${policyArms(_.allow.toString)} ELSE true END),
             ded AS (SELECT * FROM (
               SELECT *, row_number() OVER (
                 PARTITION BY canonical_url ORDER BY doc_id) AS _rk
               FROM pol) WHERE _rk = 1),
             bud AS (SELECT * FROM (
               SELECT *, row_number() OVER (
                 PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS _rk2
               FROM ded) WHERE _rk2 <= 2)
             SELECT doc_id, canonical_url, domain, n_chars
             FROM bud ORDER BY doc_id"""))

  /** Per-domain crawl budget ([[UrlOps.domainBudget]]): top-2 documents
    * per registered domain by n_chars (doc_id tiebreak) — the rank
    * window compiles to WindowGroupLimit (PlanSpec) so the exchange
    * never carries more than the budget per domain per map partition.
    */
  val qDomainBudget = QueryDef(
    "q_domain_budget",
    (s, d) => UrlOps.domainBudget(
        docs(s, d).select(col("doc_id"), col("n_chars"), deriveUrl.as("url")),
        "doc_id", "url", "n_chars", budget = 2)
      .select("doc_id", "n_chars")
      .orderBy("doc_id"),
    Some(s"""WITH u AS (SELECT doc_id, n_chars, $deriveUrlSql AS url FROM documents),
             $canonCtes
             SELECT doc_id, n_chars FROM (
               SELECT doc_id, n_chars, row_number() OVER (
                 PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rk
               FROM s7)
             WHERE rk <= 2 ORDER BY doc_id"""))

  /** Authority-weighted per-domain budgets
    * ([[UrlOps.domainBudgetWeighted]]): the budget TABLE derives from the
    * domain rollup — well-represented domains earn deeper crawls
    * (`1 + n_docs div 3`), everyone else the default 1 — and the rank
    * window keeps its CONSTANT max-budget cap so WindowGroupLimit still
    * prunes before the exchange (the variable cut is a broadcast filter
    * on the survivors).
    */
  val qDomainBudgetWeighted = QueryDef(
    "q_domain_budget_weighted",
    (s, d) => {
      val withUrl = docs(s, d)
        .select(col("doc_id"), col("n_chars"), deriveUrl.as("url"))
      val budgets = UrlOps.domainRollup(withUrl, "url", "n_chars")
        .select(col("domain"),
          expr("1L + n_docs div 3").as("budget"))
      UrlOps.domainBudgetWeighted(withUrl, "doc_id", "url", "n_chars",
          budgets, defaultBudget = 1)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    },
    Some(s"""WITH u AS (SELECT doc_id, n_chars, $deriveUrlSql AS url FROM documents),
             $canonCtes,
             bud AS (SELECT domain, 1 + count(*) // 3 AS budget
                     FROM s7 GROUP BY domain)
             SELECT doc_id, n_chars FROM (
               SELECT s7.doc_id, s7.n_chars, b.budget, row_number() OVER (
                 PARTITION BY s7.domain ORDER BY s7.n_chars DESC, s7.doc_id)
                   AS rk
               FROM s7 JOIN bud b USING (domain))
             WHERE rk <= budget ORDER BY doc_id"""))

  /** Fixed-point PageRank over the derived source link graph
    * ([[graft.ext.GraphRank.pageRank]]): each document contributes one
    * edge from its source to a deterministically-derived linked source
    * (`src{(doc_id·31 + 7) mod 20}` — mirrors the deriveUrl convention:
    * arithmetic on doc_id both engines replay). 10 iterations, damping
    * 0.85, ranks as exact scale-10¹² longs; the oracle unrolls the loop
    * as MATERIALIZED integer CTEs (the Lloyd/label-propagation
    * technique).
    */
  /** Unrolled integer-CTE replay of [[GraphRank.pageRank]] over the
    * derived source graph; `teleportTo` mirrors the operator's
    * personalization (None = uniform teleport).
    */
  private def pagerankOracle(
      iters: Int, teleportTo: Option[Seq[String]]): String = {
    val scale = GraphRank.RankScale
    val (teleExpr, r0Expr) = teleportTo match {
      case None =>
        ("(2 * 150 * " + scale + " + 1000 * (SELECT n FROM nn))" +
           " // (2 * 1000 * (SELECT n FROM nn))",
         s"(2 * $scale + (SELECT n FROM nn)) // (2 * (SELECT n FROM nn))")
      case Some(ts) =>
        val set = ts.distinct.map(t => s"'$t'").mkString(", ")
        val k = ts.distinct.size
        (s"CASE WHEN node IN ($set) THEN (2 * 150 * $scale + 1000 * $k)" +
           s" // (2 * 1000 * $k) ELSE 0 END",
         s"CASE WHEN node IN ($set) THEN (2 * $scale + $k) // (2 * $k)" +
           " ELSE 0 END")
    }
    val extraNodes = teleportTo.fold("") { ts =>
      ts.distinct.map(t => s" UNION ALL SELECT '$t' AS node").mkString
    }
    val steps = (1 to iters).map { i =>
      val p = i - 1
      s"""c$i AS (SELECT e.dst AS node,
           CAST(sum((r.r * 2 + d.deg) // (d.deg * 2)) AS BIGINT) AS cin
         FROM edges e
         JOIN r$p r ON e.src = r.node
         JOIN deg d ON e.src = d.src
         GROUP BY 1),
       r$i AS MATERIALIZED (SELECT n.node,
           n.tele + (850 * COALESCE(c.cin, 0) * 2 + 1000) // 2000 AS r
         FROM nodes n LEFT JOIN c$i c USING (node))"""
    }.mkString(",\n         ")
    s"""WITH edges AS MATERIALIZED (
         SELECT DISTINCT source AS src,
           'src' || CAST((doc_id * 31 + 7) % 20 AS VARCHAR) AS dst
         FROM documents),
       nodes0 AS (
         SELECT DISTINCT node FROM (
           SELECT src AS node FROM edges
           UNION ALL SELECT dst AS node FROM edges$extraNodes)),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes0),
       nodes AS MATERIALIZED (SELECT node, $teleExpr AS tele FROM nodes0),
       deg AS MATERIALIZED (
         SELECT src, CAST(count(*) AS BIGINT) AS deg
         FROM edges GROUP BY 1),
       r0 AS MATERIALIZED (SELECT node, $r0Expr AS r FROM nodes),
       $steps
       SELECT node, CAST(r AS BIGINT) AS rank_q
       FROM r$iters ORDER BY node"""
  }

  private def derivedEdges(s: SparkSession, d: String) =
    docs(s, d).select(col("source").as("src"),
      concat(lit("src"), (col("doc_id") * 31 + 7) % 20).as("dst"))

  val qDomainPagerank = QueryDef(
    "q_domain_pagerank",
    (s, d) => GraphRank.pageRank(derivedEdges(s, d),
        "src", "dst", iters = 10, dampingPerMille = 850)
      .orderBy("node"),
    Some(pagerankOracle(10, None)))

  /** Topic-sensitive variant (Haveliwala): teleport mass concentrated on
    * the target sources — "authoritative as seen FROM src1/src3", the
    * authority prior that pairs with the DSIR target-domain selection.
    * The derived graph contains all 20 sources, so the membership CASE
    * in teleport and init is the branch under test; the
    * unreachable-node → 0 behavior is spec-pinned in GraphRankSpec.
    */
  val qDomainPagerankPpr = QueryDef(
    "q_domain_pagerank_ppr",
    (s, d) => GraphRank.pageRank(derivedEdges(s, d),
        "src", "dst", iters = 10, dampingPerMille = 850,
        teleportTo = Some(Seq("src1", "src3")))
      .orderBy("node"),
    Some(pagerankOracle(10, Some(Seq("src1", "src3")))))

  val all: Seq[QueryDef] =
    Seq(qUrlCanonical, qUrlDedup, qDomainRollup, qUrlPolicy, qUrlPolicyDeny,
      qDomainBudget, qDomainBudgetWeighted, qCrawlCurate, qDomainPagerank,
      qDomainPagerankPpr)
}
