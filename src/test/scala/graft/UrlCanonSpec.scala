package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** URL canonicalization + URL-keyed dedup (`dedup_url`): every
  * normalization rule individually, their composition, and the
  * non-rules (path case and real query params must SURVIVE). */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(Text.canonicalizeUrl(col("u")).as("c"))
      .as[String].head()

  test("each rule: case, www, default port, utm, slash, fragment") {
    assert(canon("HTTPS://EXAMPLE.COM/A") == "https://example.com/A")
    assert(canon("https://www.example.com/a") == "https://example.com/a")
    assert(canon("https://example.com:443/a") == "https://example.com/a")
    assert(canon("http://example.com:80/a") == "http://example.com/a")
    // a NON-default port survives
    assert(canon("https://example.com:8443/a") == "https://example.com:8443/a")
    assert(canon("https://example.com/a?utm_source=x") == "https://example.com/a")
    assert(canon("https://example.com/a/") == "https://example.com/a")
    assert(canon("https://example.com/a#sec-2") == "https://example.com/a")
  }

  test("utm removal keeps real params and repairs separators") {
    assert(canon("https://e.com/p?utm_source=x&q=1") == "https://e.com/p?q=1")
    assert(canon("https://e.com/p?q=1&utm_medium=y") == "https://e.com/p?q=1")
    assert(canon("https://e.com/p?utm_a=1&utm_b=2") == "https://e.com/p")
    assert(canon("https://e.com/p?a=1&utm_x=2&b=3") == "https://e.com/p?a=1&b=3")
  }

  test("utm matching is separator-anchored: non-utm params survive intact") {
    // 'xutm_a' merely CONTAINS 'utm_' — an unanchored pattern would strip
    // its tail and collapse distinct pages
    assert(canon("https://e.com/p?xutm_a=1") == "https://e.com/p?xutm_a=1")
    assert(canon("https://e.com/p?xutm_a=1&q=2") == "https://e.com/p?xutm_a=1&q=2")
    // multi-word utm param names are stripped too
    assert(canon("https://e.com/p?utm_source_platform=web&q=1") ==
      "https://e.com/p?q=1")
  }

  test("literal '&' in a query-less path and slashes in query values survive") {
    // '&' is a legal RFC 3986 path sub-delim — the separator repair must
    // not invent a '?' where no query ever existed
    assert(canon("https://e.com/a&b") == "https://e.com/a&b")
    assert(canon("https://e.com/a&b?utm_x=1&c=2") == "https://e.com/a&b?c=2")
    // the trailing-slash rule is PATH-scoped: a '/' ending a query value
    // is content, not structure
    assert(canon("https://e.com/p?r=/x/") == "https://e.com/p?r=/x/")
    assert(canon("https://e.com/p?") == "https://e.com/p")
  }

  test("path case is preserved; composition of all rules at once") {
    assert(canon("https://e.com/CaseSensitive/Path") ==
      "https://e.com/CaseSensitive/Path")
    assert(canon("HTTPS://WWW.E.com:443/Page/9/?utm_s=1#top") ==
      "https://e.com/Page/9")
  }

  test("urlDedup keeps the smallest doc_id per canonical URL") {
    val docs = Seq(
      (1L, "https://a.com/x"),
      (2L, "HTTPS://A.com/x/"),
      (3L, "https://www.a.com/x?utm_q=1"),
      (4L, "https://a.com/y")
    ).toDF("doc_id", "url")
    val out = Text.urlDedup(docs).orderBy("canonical_url")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "https://a.com/x", 3L),
      (4L, "https://a.com/y", 1L)))
  }
}
