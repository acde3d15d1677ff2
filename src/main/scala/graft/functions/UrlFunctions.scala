package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
  *     `gclid=…`) are dropped, the rest are SORTED (param order is
  *     almost always irrelevant server-side and is the top source of
  *     spurious URL variants); an emptied query drops its `?`;
  *   - one trailing slash is stripped from a non-root path; an empty
  *     path becomes `/`.
  *
  * Scale shape: a single codegen'd per-row projection built from
  * substring/array primitives — no UDF, no regex backtracking, nothing
  * crosses an exchange. Expects absolute `http(s)://` URLs (a crawler's
  * frontier is absolute by construction).
  */
object UrlFunctions {

  /** Canonical form of an absolute http(s) URL (rules above). */
  def canonicalizeUrl(url: Column): Column = {
    val nofrag = substring_index(url, "#", 1)
    val base = substring_index(nofrag, "?", 1)
    val query = when(length(nofrag) > length(base),
      nofrag.substr(length(base) + 2, length(nofrag))).otherwise(lit(""))
    val scheme = lower(substring_index(base, "://", 1))
    val rest = base.substr(length(substring_index(base, "://", 1)) + 4, length(base))
    val hostport = substring_index(rest, "/", 1)
    val path0 = rest.substr(length(hostport) + 1, length(rest))
    val hostRaw = lower(substring_index(hostport, ":", 1))
    val port = when(length(hostport) > length(substring_index(hostport, ":", 1)),
      hostport.substr(length(substring_index(hostport, ":", 1)) + 2, length(hostport)))
      .otherwise(lit(""))
    val host = when(hostRaw.startsWith("www."), hostRaw.substr(lit(5), length(hostRaw)))
      .otherwise(hostRaw)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val params = array_join(array_sort(filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !p.startsWith("fbclid=") && !p.startsWith("gclid="))), "&")
    val path = when(path0 === "", lit("/"))
      .when(path0 =!= "/" && path0.endsWith("/"),
        path0.substr(lit(1), length(path0) - 1))
      .otherwise(path0)
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(params =!= "", concat(lit("?"), params)).otherwise(lit("")))
  }

  /** The registrable host of an already-canonical URL (for host-level
    * aggregation/blocking): the substring between `://` and the first
    * `/` — ports were already resolved by [[canonicalizeUrl]].
    */
  def canonicalHost(canonicalUrl: Column): Column =
    substring_index(substring_index(
      substring_index(canonicalUrl, "://", -1), "/", 1), ":", 1)
}
