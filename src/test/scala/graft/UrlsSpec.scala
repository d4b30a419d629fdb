package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Urls

class UrlsSpec extends AnyFunSuite with SparkFixture {

  private def canon(url: String): (String, String, Boolean, Boolean) = {
    import spark.implicits._
    val r = Urls.canonicalize(Seq(url).toDF("url"), "url").collect().head
    (r.getAs[String]("host"), r.getAs[String]("canonical_url"),
      r.getAs[Boolean]("had_tracking"), r.getAs[Boolean]("had_fragment"))
  }

  test("case, www, default port, fragment, trailing slash all normalize") {
    assert(canon("HTTPS://WWW.Example.COM/a/b/?x=1#frag") ===
      (("example.com", "https://example.com/a/b?x=1", false, true)))
    assert(canon("http://example.com:80/a") ===
      (("example.com", "http://example.com/a", false, false)))
    assert(canon("https://example.com:443") ===
      (("example.com", "https://example.com", false, false)))
  }

  test("tracking params drop, survivors sort, bare ? disappears") {
    assert(canon("https://s.org/p?utm_source=rss&b=2&a=1&fbclid=z") ===
      (("s.org", "https://s.org/p?a=1&b=2", true, false)))
    assert(canon("https://s.org/p?utm_campaign=x") ===
      (("s.org", "https://s.org/p", true, false)))
    assert(canon("https://s.org/p?") ===
      (("s.org", "https://s.org/p", false, false)))
    // ref= is tracking; a 'reference=' param is NOT (prefix must be exact)
    assert(canon("https://s.org/p?reference=a&ref=b") ===
      (("s.org", "https://s.org/p?reference=a", true, false)))
  }

  test("identical pages collide after canonicalization; junk yields nulls") {
    import spark.implicits._
    val urls = Seq(
      "https://www.site.net/art/7?utm_medium=a",
      "HTTPS://Site.net/art/7/",
      "https://site.net:443/art/7#x",
      "not a url at all").toDF("url")
    val out = Urls.canonicalize(urls, "url")
    assert(out.where(col("canonical_url") === "https://site.net/art/7").count() === 3)
    val junk = out.where(col("canonical_url").isNull).collect()
    assert(junk.length === 1 && junk.head.getAs[String]("host") == null)
  }
}
