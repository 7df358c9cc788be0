package graft

import org.apache.spark.sql.functions._

import graft.functions.Web

/** URL canonicalization + registered-domain unit battery — hand-picked
  * edges beyond what the deterministic webCorpus generation exercises
  * (the corpus path is oracle-gated via web_url_canonical /
  * web_domain_concentration).
  */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Web.canonicalUrl(col("u"))).as[String].collect().toSeq

  test("canonicalUrl: case, default ports, fragments, tracking params") {
    assert(canon(
      // scheme+host lowercase; path case preserved
      "HTTPS://Example.COM/Path/A",
      // default ports strip per scheme; non-default survives
      "https://a.com:443/x", "http://a.com:80/x", "http://a.com:8080/x",
      "https://a.com:80/x", // 80 is NOT https' default — kept
      // fragment always dropped; empty path becomes /
      "http://a.com#frag", "http://a.com/p#frag",
      // tracking params go, survivors keep their order, ? drops if empty
      "http://a.com/p?utm_source=x&id=1&fbclid=y&q=Z",
      "http://a.com/p?gclid=1&utm_medium=email",
      "http://a.com/p?UTM_CAMPAIGN=up&Ref=rss&id=2"
    ) === Seq(
      "https://example.com/Path/A",
      "https://a.com/x", "http://a.com/x", "http://a.com:8080/x",
      "https://a.com:80/x",
      "http://a.com/", "http://a.com/p",
      "http://a.com/p?id=1&q=Z",
      "http://a.com/p",
      "http://a.com/p?id=2"))
  }

  test("registeredDomain: www strip, eTLD+1, two-label public suffixes") {
    val got = Seq(
      "www.news.example.com", "a.b.c.example.org", "example.com",
      "sub.example.co.uk", "example.co.uk", "deep.sub.shop.com.au",
      "localhost", "www.example.com")
      .toDF("h").select(Web.registeredDomain(col("h"))).as[String]
      .collect().toSeq
    assert(got === Seq(
      "example.com", "example.org", "example.com",
      "example.co.uk", "example.co.uk", "shop.com.au",
      "localhost", "example.com"))
  }

  test("cleanQuery: null query stays null; all-tracking query empties") {
    val rows = Seq("http://a.com/p", "http://a.com/p?utm_a=1&utm_b=2")
      .toDF("u").select(Web.cleanQuery(col("u"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getString(0) === "")
  }
}
