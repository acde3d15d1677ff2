package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the curation step that runs BEFORE any
  * URL-keyed dedup in a crawl pipeline: the same page arrives as
  * `HTTP://WWW.Site.com:80/a/?utm_source=feed&b=2&a=1#frag` and
  * `http://site.com/a?a=1&b=2`, and exact/host-level dedup only works
  * after both collapse to one canonical string. (North-star
  * training-data op, beyond the reference's surface — the key-normalize-
  * then-dedup shape is the same one [[graft.dedup.Dedup.exact]] keys on.)
  *
  * Rules (the common subset of the crawl-pipeline canonicalizers):
  *   - scheme and host lowercase (path case is PRESERVED — many servers
  *     are case-sensitive in the path);
  *   - a leading `www.` label is dropped;
  *   - default ports are dropped (`:80` for http, `:443` for https);
  *     any other explicit port is kept;
  *   - the fragment (`#…`) is dropped — it never reaches the server;
  *   - query parameters: tracking params (`utm_*`, `fbclid=…`,
  *     `gclid=…`) are dropped, the rest are SORTED by UTF8 bytes (param
  *     order is almost always irrelevant server-side and is the top
  *     source of spurious URL variants); an emptied query drops its `?`;
  *   - one trailing slash is stripped from a non-root path; an empty
  *     path becomes `/`.
  *
  * Scale shape: ONE custom expression, one pass over the string per row,
  * inside whole-stage codegen. The equivalent `functions._` composition
  * (substring_index/split/filter/array_sort chains) re-expands every
  * intermediate per reference — the tree grows past what codegen
  * accepts, the projection falls back to interpreted eval, and the
  * bench read 1.2 s where its text-query neighbors read 0.1 s
  * (genUnits: 0 — measured r12, the reason this is an Expression).
  * Expects absolute `http(s)://` URLs (a crawler's frontier is absolute
  * by construction).
  */
object UrlFunctions {

  /** Canonical form of an absolute http(s) URL (rules above). */
  def canonicalizeUrl(url: Column): Column =
    Bridge.column(UrlCanonicalize(Bridge.expression(url)))

  /** The registrable host of an already-canonical URL (for host-level
    * aggregation/blocking): the substring between `://` and the first
    * `/` — ports were already resolved by [[canonicalizeUrl]].
    */
  def canonicalHost(canonicalUrl: Column): Column =
    substring_index(substring_index(
      substring_index(canonicalUrl, "://", -1), "/", 1), ":", 1)
}

/** One-pass canonicalizer (see [[UrlFunctions]] for the rule set). Null
  * url → null. Lowercasing delegates to [[UTF8String.toLowerCase]] —
  * identical to `functions.lower` — and the param sort compares UTF8
  * BYTES, identical to `array_sort` on strings and to DuckDB's binary
  * VARCHAR collation, so the DuckDB oracle replays the sort exactly.
  */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    UrlCanonicalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UrlCanonicalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

object UrlCanonicalize {

  private def lower(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  def compute(url: UTF8String): UTF8String = {
    val s = url.toString
    // fragment off, query split — index arithmetic mirrors the
    // substring_index semantics the first (composable) implementation
    // had, so results are bit-identical to the r12 oracle
    val hashIdx = s.indexOf('#')
    val nofrag = if (hashIdx >= 0) s.substring(0, hashIdx) else s
    val qIdx = nofrag.indexOf('?')
    val base = if (qIdx >= 0) nofrag.substring(0, qIdx) else nofrag
    val query = if (qIdx >= 0) nofrag.substring(qIdx + 1) else ""
    val sepIdx = base.indexOf("://")
    val scheme = lower(if (sepIdx >= 0) base.substring(0, sepIdx) else base)
    val rest = if (sepIdx >= 0) base.substring(sepIdx + 3) else ""
    val slashIdx = rest.indexOf('/')
    val hostport = if (slashIdx >= 0) rest.substring(0, slashIdx) else rest
    val path0 = if (slashIdx >= 0) rest.substring(slashIdx) else ""
    val colonIdx = hostport.indexOf(':')
    val host0 = lower(if (colonIdx >= 0) hostport.substring(0, colonIdx) else hostport)
    val port = if (colonIdx >= 0) hostport.substring(colonIdx + 1) else ""
    val host = if (host0.startsWith("www.")) host0.substring(4) else host0
    val keepPort = port.nonEmpty &&
      !(scheme == "http" && port == "80") &&
      !(scheme == "https" && port == "443")
    // params: drop empties + tracking, sort by UTF8 bytes
    val kept = query.split("&", -1).filter(p =>
      p.nonEmpty && !p.startsWith("utm_") &&
        !p.startsWith("fbclid=") && !p.startsWith("gclid="))
      .map(UTF8String.fromString)
    java.util.Arrays.sort(kept, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val params = kept.mkString("&")
    val path =
      if (path0.isEmpty) "/"
      else if (path0 != "/" && path0.endsWith("/")) path0.substring(0, path0.length - 1)
      else path0
    val out = new java.lang.StringBuilder(s.length)
    out.append(scheme).append("://").append(host)
    if (keepPort) out.append(':').append(port)
    out.append(path)
    if (params.nonEmpty) out.append('?').append(params)
    UTF8String.fromString(out.toString)
  }
}
