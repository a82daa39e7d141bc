package graft

import org.apache.spark.sql.functions._

import graft.ext.UrlOps

/** Contract tests for [[graft.ext.UrlOps]]: canonicalization cases,
  * idempotence over the messy derived corpus, registered-domain labels,
  * and the dedup/rollup operator shapes.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalizeUrl(col("url"))).as[String].collect().toSeq

  test("canonicalize lowercases scheme+host and drops fragments") {
    assert(canon("HTTPS://WWW.Example.COM/A/b#frag") ==
      Seq("https://www.example.com/A/b"))
  }

  test("canonicalize drops default ports only") {
    assert(canon(
      "http://h.com:80/x", "https://h.com:443/x",
      "http://h.com:443/x", "https://h.com:8080/x") ==
      Seq("http://h.com/x", "https://h.com/x",
        "http://h.com:443/x", "https://h.com:8080/x"))
  }

  test("canonicalize strips tracking params, sorts survivors, drops bare ?") {
    assert(canon(
      "https://h.com/p?utm_source=a&b=2&a=1&fbclid=z",
      "https://h.com/p?utm_campaign=only",
      "https://h.com/p?z=1&y=2") ==
      Seq("https://h.com/p?a=1&b=2", "https://h.com/p", "https://h.com/p?y=2&z=1"))
  }

  test("canonicalize trims trailing slashes; root collapses to empty path") {
    assert(canon("https://h.com/docs/", "https://h.com/", "https://h.com") ==
      Seq("https://h.com/docs", "https://h.com", "https://h.com"))
  }

  test("query with no path: authority ends at '?' (RFC 3986)") {
    // found by the round-15 property suite: splitting the authority on
    // '/' alone leaked the query into the port compare and past the
    // tracking-param strip
    assert(canon(
      "HTTPS://Host.com?utm_source=x&a=1",
      "https://h.com:443?b=2&utm_campaign=c",
      "http://h.com:8080?z=1") ==
      Seq("https://host.com?a=1", "https://h.com?b=2",
        "http://h.com:8080?z=1"))
    val hostPath = Seq("https://H.com?x=1").toDF("url")
      .select(UrlOps.urlHost(col("url")), UrlOps.urlPath(col("url")))
      .as[(String, String)].head()
    assert(hostPath == ("h.com", ""))
  }

  test("non-absolute input passes through unchanged") {
    assert(canon("not a url", "relative/path?utm_source=x") ==
      Seq("not a url", "relative/path?utm_source=x"))
    // absoluteness is judged after the fragment strip (review r15):
    // a '#' BEFORE the '://' means the '://' is inside the fragment
    assert(canon("see notes#https://x.com") == Seq("see notes#https://x.com"))
  }

  test("canonicalize is idempotent over the messy derived corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val urls = docs.select(col("doc_id"), graft.queries.UrlQueries.deriveUrl.as("url"))
    val once = UrlOps.canonicalizeUrl(col("url"))
    val diff = urls.select(once.as("c1"))
      .select(col("c1"), UrlOps.canonicalizeUrl(col("c1")).as("c2"))
      .filter(col("c1") =!= col("c2")).count()
    assert(diff == 0L)
  }

  test("registeredDomain handles multi-level TLDs and short hosts") {
    val got = Seq("www.news.bbc.co.uk", "a.b.example.com", "example.com",
        "localhost", "site.com.au")
      .toDF("host").select(UrlOps.registeredDomain(col("host"))).as[String].collect().toSeq
    assert(got == Seq("bbc.co.uk", "example.com", "example.com",
      "localhost", "site.com.au"))
  }

  test("bundled public-suffix snapshot: loaded, well-formed, and applied") {
    val psl = UrlOps.MultiLevelTlds
    // the data file replaced the 10-entry inline subset (advice r10)
    assert(psl.size > 400, s"snapshot too small: ${psl.size}")
    assert(psl.distinct.size == psl.size)
    assert(psl.forall(e => e.count(_ == '.') == 1 && e == e.toLowerCase))
    // registries the old subset mis-grouped now resolve correctly
    val got = Seq("tienda.algo.com.mx", "shop.kiwi.co.nz", "x.y.gob.es",
        "news.site.co.za", "a.b.com.tr", "plain.example.org")
      .toDF("host").select(UrlOps.registeredDomain(col("host")))
      .as[String].collect().toSeq
    assert(got == Seq("algo.com.mx", "kiwi.co.nz", "y.gob.es",
      "site.co.za", "b.com.tr", "example.org"))
  }

  test("urlDedup collapses tracking/case/slash variants into one keeper") {
    val df = Seq(
      (1L, "HTTP://A.com/x/?utm_source=1"),
      (2L, "http://a.COM/x?utm_campaign=2"),
      (3L, "http://a.com/x"),
      (4L, "http://a.com/y")).toDF("doc_id", "url")
    val got = UrlOps.urlDedup(df, "doc_id", "url")
      .orderBy("canonical_url")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("http://a.com/x", 1L, 3L), ("http://a.com/y", 4L, 1L)))
  }

  test("applyUrlPolicy: longest prefix wins, default fills the gaps") {
    val rules = Seq(
      UrlOps.UrlRule("a.com", "/private", allow = false),
      UrlOps.UrlRule("a.com", "/private/ok", allow = true),
      UrlOps.UrlRule("b.com", "", allow = false))
    val df = Seq(
      (1L, "https://www.a.com/private/x"),
      (2L, "https://www.a.com/private/ok/y"),
      (3L, "https://www.a.com/public"),
      (4L, "https://sub.b.com/anything"),
      (5L, "https://c.com/whatever")).toDF("doc_id", "url")
    val got = UrlOps.applyUrlPolicy(df, "url", rules)
      .select("doc_id", "allowed", "matched_rule")
      .orderBy("doc_id").as[(Long, Boolean, String)].collect().toSeq
    assert(got == Seq(
      (1L, false, "a.com|/private"),
      (2L, true, "a.com|/private/ok"),
      (3L, true, null),
      (4L, false, "b.com|"),
      (5L, true, null)))
  }

  test("domainBudget keeps top-k per registered domain, deterministic ties") {
    val df = Seq(
      (1L, "https://x.a.com/1", 100L),
      (2L, "https://y.a.com/2", 300L),
      (3L, "https://z.a.com/3", 200L),
      (4L, "https://w.a.com/4", 200L), // ties with 3 — lower id wins
      (5L, "https://b.com/5", 10L)).toDF("doc_id", "url", "n_chars")
    val got = UrlOps.domainBudget(df, "doc_id", "url", "n_chars", budget = 2)
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L, 5L))
  }

  test("domainBudgetWeighted: empty/all-NULL/duplicate budget tables (advice r12)") {
    val df = Seq(
      (1L, "https://x.a.com/1", 100L),
      (2L, "https://y.a.com/2", 300L),
      (3L, "https://z.a.com/3", 200L),
      (4L, "https://b.com/4", 10L)).toDF("doc_id", "url", "n_chars")
    def ids(budgets: org.apache.spark.sql.DataFrame, default: Int): Seq[Long] =
      UrlOps.domainBudgetWeighted(df, "doc_id", "url", "n_chars", budgets, default)
        .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    // EMPTY budgets frame: uniform defaultBudget, not an NPE
    val empty = Seq.empty[(String, Long)].toDF("domain", "budget")
    assert(ids(empty, default = 1) == Seq(2L, 4L))
    // all-NULL budget column: same degraded contract
    val allNull = Seq(("a.com", null.asInstanceOf[java.lang.Long]))
      .toDF("domain", "budget")
    assert(ids(allNull, default = 1) == Seq(2L, 4L))
    // duplicate domain rows collapse to their MAX budget — a duplicated
    // dimension row must never duplicate admitted documents
    val dup = Seq(("a.com", 1L), ("a.com", 2L)).toDF("domain", "budget")
    val admitted = UrlOps.domainBudgetWeighted(
        df, "doc_id", "url", "n_chars", dup, defaultBudget = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(admitted.sorted == Seq(2L, 3L, 4L))
    assert(admitted.distinct.size == admitted.size)
  }

  test("domainRollup groups by registered domain with distinct canonical urls") {
    val df = Seq(
      (1L, "https://a.x.co.uk/p?utm_source=s", 10L),
      (2L, "https://b.x.co.uk/p", 20L),
      (3L, "https://A.x.CO.UK/p/", 30L),
      (4L, "https://other.com/q", 5L)).toDF("doc_id", "url", "n_chars")
    val got = UrlOps.domainRollup(df, "url", "n_chars")
      .orderBy("domain").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("other.com", 1L, 1L, 5L), ("x.co.uk", 3L, 2L, 60L)))
  }
  test("parseRobots: groups, comments, precedence, wildcard truncation") {
    val robots = """
      |# our crawl policy
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok   # carve-out
      |Disallow: /tmp*junk$
      |
      |User-agent: GraftBot
      |User-agent: OtherBot
      |Disallow: /graft-only
      |Allow:
      |
      |Sitemap: https://a.com/sitemap.xml
      |Crawl-delay: 10
      |""".stripMargin
    // wildcard-agent group for an unknown agent
    val star = UrlOps.parseRobots(robots, "a.com", "somebot")
    assert(star.toSet === Set(
      UrlOps.UrlRule("a.com", "/private", allow = false),
      UrlOps.UrlRule("a.com", "/private/ok", allow = true),
      UrlOps.UrlRule("a.com", "/tmp", allow = false))) // truncated at '*'
    // the exact-agent group SUPERSEDES '*' entirely (RFC 9309)
    val bot = UrlOps.parseRobots(robots, "a.com", "graftbot")
    assert(bot.toSet === Set(
      UrlOps.UrlRule("a.com", "/graft-only", allow = false),
      UrlOps.UrlRule("a.com", "", allow = true))) // empty Allow = root allow
    // parsed rules drive the existing policy engine end-to-end
    val df = Seq(
      (1L, "https://www.a.com/private/x"),
      (2L, "https://www.a.com/private/ok/y"),
      (3L, "https://www.a.com/public")).toDF("doc_id", "url")
    val got = UrlOps.applyUrlPolicy(df, "url", star)
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true))
    // duplicate prefixes collapse, allow winning the tie
    val dup = UrlOps.parseRobots(
      "User-agent: *\nDisallow: /p\nAllow: /p", "a.com")
    assert(dup === Seq(UrlOps.UrlRule("a.com", "/p", allow = true)))
    // ASYMMETRIC wildcard handling: 'Allow: /$' (homepage only) must NOT
    // truncate into an allow-all '/' that collapses over 'Disallow: /' —
    // the anchored allow is dropped and the site stays disallowed
    val anchored = UrlOps.parseRobots(
      "User-agent: *\nDisallow: /\nAllow: /$\nAllow: /pub*lic", "a.com")
    assert(anchored === Seq(UrlOps.UrlRule("a.com", "/", allow = false)))
    // Disallow wildcards still truncate (broadening the deny is safe)
    val denyStar = UrlOps.parseRobots(
      "User-agent: *\nDisallow: /a*b\nDisallow: /c$", "a.com")
    assert(denyStar.toSet === Set(
      UrlOps.UrlRule("a.com", "/a", allow = false),
      UrlOps.UrlRule("a.com", "/c", allow = false)))
    // UA lines match on the product token (RFC 9309 §2.2.1)
    val versioned = UrlOps.parseRobots(
      "User-agent: GraftBot/1.0\nDisallow: /v\n\nUser-agent: *\nDisallow: /w",
      "a.com", "graftbot")
    assert(versioned === Seq(UrlOps.UrlRule("a.com", "/v", allow = false)))
    // empty Disallow emits no rule; rule lines before any UA are ignored
    assert(UrlOps.parseRobots("Disallow: /x\nUser-agent: *\nDisallow:", "a.com")
      .isEmpty)
    intercept[IllegalArgumentException](UrlOps.parseRobots("", ""))
  }
}
