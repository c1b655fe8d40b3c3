package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String = {
    val r = Seq(url).toDF("u")
      .select(Urls.canonicalize(col("u")).as("c")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("canonicalize collapses every frontier mess to one string") {
    val target = "https://jobs.example.com/postings/item1?a=1&b=2"
    assert(canon("https://jobs.example.com/postings/item1?a=1&b=2") == target)
    assert(canon("HTTPS://Jobs.Example.COM/postings/item1?a=1&b=2") == target)
    assert(canon("https://jobs.example.com:443/postings/item1?a=1&b=2") == target)
    assert(canon("https://jobs.example.com/postings/item1?b=2&a=1") == target)
    assert(canon("https://jobs.example.com/postings/item1?a=1&b=2#sec") == target)
    assert(canon("https://jobs.example.com/postings/item1" +
      "?utm_source=feed&a=1&gclid=x&b=2&fbclid=y&msclkid=z") == target)
    // valueless tracking params are dropped like their '=' forms —
    // but a non-tracking valueless param survives
    assert(canon("https://jobs.example.com/postings/item1" +
      "?fbclid&a=1&utm_source&b=2") == target)
    assert(canon("https://jobs.example.com/postings/item1?a=1&b=2&flag") ==
      target + "&flag")
  }

  test("non-default ports, empty paths, empty queries survive") {
    assert(canon("http://h.io:8080/x?k=v") == "http://h.io:8080/x?k=v")
    assert(canon("http://h.io:80/x") == "http://h.io/x")
    assert(canon("https://h.io") == "https://h.io/")
    assert(canon("https://h.io?a=1") == "https://h.io/?a=1")
    assert(canon("https://h.io/x?utm_source=f") == "https://h.io/x")
  }

  test("unparseable URLs yield null, never an error") {
    assert(canon("not a url") == null)
    assert(canon("") == null)
  }

  test("part extractors") {
    val r = Seq("HTTPS://Jobs.Example.com:443/a/b?q=spark&page=2#f").toDF("u")
      .select(
        Urls.protocol(col("u")), Urls.host(col("u")), Urls.path(col("u")),
        Urls.port(col("u")), Urls.query(col("u")),
        Urls.param(col("u"), "q")).head()
    assert(r.getString(0) == "https")
    assert(r.getString(1) == "jobs.example.com")
    assert(r.getString(2) == "/a/b")
    assert(r.getString(3) == "443")
    assert(r.getString(4) == "q=spark&page=2")
    assert(r.getString(5) == "spark")
  }
}
