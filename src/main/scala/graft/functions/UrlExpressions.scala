package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One shared implementation for the URL expressions — interpreted eval
  * and generated code call the same static routines.
  *
  * Why native expressions instead of `Column` composition: `Column`s are
  * immutable trees, so composing the ~12-stage canonicalization over a
  * derived-URL expression embeds a COPY of the input subtree at every
  * reference. Fused into one projection (Catalyst collapses adjacent
  * projects) that multiplied a synthesized-URL tree ~30× and produced a
  * ~16,500-line generated `processNext()` that janino refuses to compile
  * — Spark silently fell back to INTERPRETED execution, a several-fold
  * scan slowdown exactly on the highest-volume crawl-curation path. Each
  * expression here generates ONE static call regardless of what feeds it,
  * so the whole chain stays inside whole-stage codegen at any composition
  * depth. Semantics are unchanged from the documented [[graft.ext.UrlOps]]
  * contract (same DuckDB oracle replay; `lower` matches Spark's
  * `UTF8String.toLowerCase`, parameter sort is bytewise UTF-8 order like
  * `array_sort`).
  */
object UrlImpl {

  private lazy val trackingSet: Set[String] = graft.ext.UrlOps.TrackingParams.toSet
  private lazy val multiLevelSet: Set[String] = graft.ext.UrlOps.MultiLevelTlds.toSet

  /** `s` up to (excluding) the first `d`, or all of `s` when absent —
    * `substring_index(s, d, 1)` semantics.
    */
  private def before(s: String, d: String): String = {
    val i = s.indexOf(d)
    if (i < 0) s else s.substring(0, i)
  }

  /** `s` strictly after the first `d`, or '' when absent. */
  private def after(s: String, d: String): String = {
    val i = s.indexOf(d)
    if (i < 0) "" else s.substring(i + d.length)
  }

  /** Spark `lower()` parity: ASCII fast path, `String.toLowerCase` for
    * non-ASCII (exactly `UTF8String.toLowerCase`'s slow path).
    */
  private def lowerLikeSpark(s: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) {
      if (s.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (!ascii) UTF8String.fromString(s).toLowerCase.toString
    else {
      var j = 0
      var needs = false
      while (!needs && j < s.length) {
        val c = s.charAt(j)
        if (c >= 'A' && c <= 'Z') needs = true
        j += 1
      }
      if (!needs) s
      else {
        val a = s.toCharArray
        var k = 0
        while (k < a.length) {
          val c = a(k)
          if (c >= 'A' && c <= 'Z') a(k) = (c + 32).toChar
          k += 1
        }
        new String(a)
      }
    }
  }

  private def rtrimSlash(s: String): String = {
    var e = s.length
    while (e > 0 && s.charAt(e - 1) == '/') e -= 1
    if (e == s.length) s else s.substring(0, e)
  }

  /** The authority of `rest` (= everything after `scheme://`): ends at
    * the first `/` OR `?` (RFC 3986 §3.2) — splitting on `/` alone
    * misparses `scheme://host?q` (no path), leaking the query string
    * into the port compare and past the tracking-param strip (found by
    * the round-15 property suite; the original Column implementation
    * had the same defect).
    */
  private def authorityOf(rest: String): String = {
    var i = 0
    while (i < rest.length && rest.charAt(i) != '/' && rest.charAt(i) != '?')
      i += 1
    rest.substring(0, i)
  }

  /** Bytewise UTF-8 order — `array_sort`'s string ordering. */
  private val utf8Order: java.util.Comparator[String] =
    (a: String, b: String) =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** The canonical form per the [[graft.ext.UrlOps]] contract: fragment
    * drop, lowercase scheme/host, default-port drop, tracking-param strip
    * + bytewise sort, trailing-slash trim. Non-absolute input (no `://`)
    * passes through unchanged.
    */
  def canonical(u: UTF8String): UTF8String = {
    val url = u.toString
    val noFrag = before(url, "#")
    // absoluteness is judged AFTER the fragment strip: "see notes#x://y"
    // is not an absolute URL, and rewriting garbage into a plausible URL
    // would merge junk rows into real dedup classes (review r15; the
    // original Column form tested the full string and mutated these)
    if (!noFrag.contains("://")) return u
    val scheme = lowerLikeSpark(before(noFrag, "://"))
    val rest = after(noFrag, "://")
    val auth = authorityOf(rest)
    // path+query: starts with '/', '?', or '' when the authority ends
    // the URL
    val pathq = rest.substring(auth.length)
    val host = lowerLikeSpark(before(auth, ":"))
    val port = after(auth, ":")
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443"))
    val path = rtrimSlash(before(pathq, "?"))
    val qs = after(pathq, "?")
    // '' splits to [''], whose param name '' is never tracking, and the
    // rejoin restores '' — the empty query string needs no special case.
    val kept = qs.split("&", -1).filter { p =>
      val name = before(p, "=")
      !(trackingSet.contains(name) || name.startsWith("utm_"))
    }
    java.util.Arrays.sort(kept, utf8Order)
    val sb = new java.lang.StringBuilder(url.length)
    sb.append(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    val qsCanon = kept.mkString("&")
    if (qsCanon.nonEmpty) sb.append('?').append(qsCanon)
    UTF8String.fromString(sb.toString)
  }

  /** Lowercased host (authority minus port) of a `scheme://…` URL. */
  def host(u: UTF8String): UTF8String = {
    val rest = after(before(u.toString, "#"), "://")
    UTF8String.fromString(lowerLikeSpark(before(authorityOf(rest), ":")))
  }

  /** Canonical path (trailing slashes trimmed) — '' for the bare root. */
  def path(u: UTF8String): UTF8String = {
    val rest = after(before(u.toString, "#"), "://")
    val pathq = rest.substring(authorityOf(rest).length)
    UTF8String.fromString(rtrimSlash(before(pathq, "?")))
  }

  /** Registered (pay-level) domain of a lowercase host: last two labels,
    * or three when the two-label suffix is a second-level registry.
    * Single-label hosts pass through.
    */
  def registeredDomain(h: UTF8String): UTF8String = {
    val host = h.toString
    val labels = host.split("\\.", -1)
    val n = labels.length
    if (n <= 1) return h
    val last2 = labels(n - 2) + "." + labels(n - 1)
    if (n >= 3 && multiLevelSet.contains(last2))
      UTF8String.fromString(labels(n - 3) + "." + last2)
    else UTF8String.fromString(last2)
  }
}

/** Base shape shared by the four string→string URL expressions. */
sealed abstract class UrlUnaryExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  /** Name of the [[UrlImpl]] routine this expression calls. */
  protected def implMethod: String

  override protected def nullSafeEval(input: Any): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlImpl.$implMethod($c)")
}

/** URL canonicalization as a native codegen'd expression. */
case class CanonicalizeUrl(child: Expression) extends UrlUnaryExpression {
  override def prettyName: String = "canonicalize_url"
  override protected def implMethod: String = "canonical"
  override protected def nullSafeEval(input: Any): Any =
    UrlImpl.canonical(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Lowercased URL host as a native codegen'd expression. */
case class UrlHostExpr(child: Expression) extends UrlUnaryExpression {
  override def prettyName: String = "url_host"
  override protected def implMethod: String = "host"
  override protected def nullSafeEval(input: Any): Any =
    UrlImpl.host(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Canonical URL path as a native codegen'd expression. */
case class UrlPathExpr(child: Expression) extends UrlUnaryExpression {
  override def prettyName: String = "url_path"
  override protected def implMethod: String = "path"
  override protected def nullSafeEval(input: Any): Any =
    UrlImpl.path(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registered-domain extraction as a native codegen'd expression. */
case class RegisteredDomainExpr(child: Expression) extends UrlUnaryExpression {
  override def prettyName: String = "registered_domain"
  override protected def implMethod: String = "registeredDomain"
  override protected def nullSafeEval(input: Any): Any =
    UrlImpl.registeredDomain(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlFunctions {

  def canonicalize_url(url: Column): Column =
    Bridge.column(CanonicalizeUrl(Bridge.expression(url)))

  def url_host(url: Column): Column =
    Bridge.column(UrlHostExpr(Bridge.expression(url)))

  def url_path(url: Column): Column =
    Bridge.column(UrlPathExpr(Bridge.expression(url)))

  def registered_domain(host: Column): Column =
    Bridge.column(RegisteredDomainExpr(Bridge.expression(host)))
}
