package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): Option[String] =
    Seq(u).toDF("url").select(Urls.canonicalizeUrl(col("url")).as("c"))
      .as[Option[String]].head()

  private def dom(u: String): Option[String] =
    Seq(u).toDF("url")
      .select(Urls.registrableDomain(Urls.canonicalizeUrl(col("url"))).as("d"))
      .as[Option[String]].head()

  test("canonicalizeUrl: hand-traced — case/port/www/slash/fragment " +
      "normalization, tracking strip, param sort, invalid gate") {
    assert(canon("HTTPS://WWW.Src0.Example.COM:443/Docs/3/?utm_source=feed&b=2&a=1#frag")
      .contains("https://src0.example.com/Docs/3?a=1&b=2"))
    // path case preserved (RFC 3986), scheme/host lowercased
    assert(canon("HTTP://Example.com:80/Path/")
      .contains("http://example.com/Path"))
    // root collapses to the bare authority; empty query dropped
    assert(canon("https://example.com/?utm_campaign=x&gclid=abc")
      .contains("https://example.com"))
    // :8080 is NOT a default port; non-http(s) schemes keep ports
    assert(canon("https://example.com:8080/a")
      .contains("https://example.com:8080/a"))
    // fbclid/ref/mc_* stripped, surviving params sorted
    assert(canon("https://e.com/p?z=1&ref=tw&fbclid=f&mc_cid=1&mc_eid=2&a=9")
      .contains("https://e.com/p?a=9&z=1"))
    // the absolute-URL gate: refuse, don't guess
    assert(canon("not a url").isEmpty)
    assert(canon("/relative/path?a=1").isEmpty)
    // idempotence: canonicalizing a canonical URL is a no-op
    val c1 = canon("HTTPS://WWW.E.com/A/?b=2&a=1&utm_x=1").get
    assert(canon(c1).contains(c1))
  }

  test("registrableDomain: eTLD+1 cut with the two-level suffix list") {
    assert(dom("https://a.b.co.uk/x").contains("b.co.uk"))
    assert(dom("https://sub.deep.example.com/x").contains("example.com"))
    assert(dom("https://example.com").contains("example.com"))
    assert(dom("https://localhost/x").contains("localhost"))
    assert(dom("nope").isEmpty)
  }

  test("domainRollup: variant URLs collapse per canonical; dup counts and " +
      "micro shares hand-traced; invalid URLs roll up under NULL domain") {
    val urls = Seq(
      // 3 docs, 2 canonical urls on example.com (the first two collapse)
      "https://WWW.example.com/a/?utm_source=x",
      "https://example.com/a",
      "https://example.com/b",
      // 1 doc on sub.other.org -> other.org
      "http://sub.other.org:80/c?z=1&a=2",
      // invalid
      "garbage").toDF("url")
    val out = Urls.domainRollup(urls, "url")
      .as[(Option[String], Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (Some("example.com"), 3L, 2L, 1L, 600000L),
      (Some("other.org"), 1L, 1L, 0L, 200000L),
      (None, 1L, 1L, 0L, 200000L)))
  }
}
