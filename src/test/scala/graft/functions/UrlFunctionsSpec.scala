package graft.functions

import org.apache.spark.sql.functions._

class UrlFunctionsSpec extends graft.SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlFunctions.canonicalizeUrl(col("u"))).as[String].collect().toSeq

  test("the scaladoc pair collapses to one canonical string") {
    assert(canon(
      "HTTP://WWW.Site.com:80/a/?utm_source=feed&b=2&a=1#frag",
      "http://site.com/a?a=1&b=2") === Seq(
      "http://site.com/a?a=1&b=2",
      "http://site.com/a?a=1&b=2"))
  }

  test("default ports drop per scheme; explicit non-default ports survive") {
    assert(canon(
      "http://h.io:80/x", "https://h.io:443/x",
      "https://h.io:80/x", "http://h.io:8080/x") === Seq(
      "http://h.io/x", "https://h.io/x",
      "https://h.io:80/x", "http://h.io:8080/x"))
  }

  test("tracking params drop, the rest sort, an emptied query drops its '?'") {
    assert(canon(
      "http://h.io/p?z=1&utm_campaign=x&a=2&fbclid=abc&gclid=9",
      "http://h.io/p?utm_source=feed",
      "http://h.io/p?",
      "http://h.io/p?b=1&&a=2") === Seq(
      "http://h.io/p?a=2&z=1",
      "http://h.io/p",
      "http://h.io/p",
      "http://h.io/p?a=2&b=1"))
  }

  test("path: case preserved, one trailing slash stripped, empty path becomes root") {
    assert(canon(
      "http://h.io/CaseSensitive/Path",
      "http://h.io/a/",
      "http://h.io/",
      "http://h.io",
      "http://h.io#frag") === Seq(
      "http://h.io/CaseSensitive/Path",
      "http://h.io/a",
      "http://h.io/",
      "http://h.io/",
      "http://h.io/"))
  }

  test("only a LEADING www. label drops; hosts containing www elsewhere survive") {
    assert(canon(
      "https://WWW.Example.COM/x",
      "https://awww.example.com/x",
      "https://www.www2.example.com/x") === Seq(
      "https://example.com/x",
      "https://awww.example.com/x",
      "https://www2.example.com/x"))
  }

  test("canonicalization is idempotent on every generator shape") {
    val urls = Seq(
      "HTTP://WWW.Site.com:80/a/?utm_source=feed&b=2&a=1#frag",
      "https://h.io:8443/A/B?z=9&a=1", "http://h.io", "https://h.io/p#top")
    val once = canon(urls: _*)
    assert(canon(once: _*) === once)
  }

  test("canonicalHost extracts the registrable host after canonicalization") {
    val hosts = Seq("https://WWW.Example.COM:8443/x?b=1", "http://a.b.c.io/")
      .toDF("u")
      .select(UrlFunctions.canonicalHost(UrlFunctions.canonicalizeUrl(col("u"))))
      .as[String].collect().toSeq
    assert(hosts === Seq("example.com", "a.b.c.io"))
  }
}
