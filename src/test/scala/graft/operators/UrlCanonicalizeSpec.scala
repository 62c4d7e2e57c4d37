package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlCanonicalizeSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlCanonicalize.canonicalUrl($"url").as("c"))
      .as[String].collect().toSeq

  test("case, default ports, fragments, utm params, param order and " +
      "trailing slashes all collapse; meaningful differences survive") {
    // every raw form of the same logical URL → one canonical string
    val same = canon(
      "HTTPS://Example.COM:443/a/b/?utm_source=x&z=2&a=1#frag",
      "https://example.com/a/b?a=1&z=2",
      "https://EXAMPLE.com:443/a/b///?z=2&utm_medium=m&a=1",
      "https://example.com/a/b/?a=1&utm_campaign=c&z=2#other")
    assert(same.distinct == Seq("https://example.com/a/b?a=1&z=2"))

    assert(canon("HTTP://Host.Net:80/x")
      == Seq("http://host.net/x"))
    // non-default port survives; http vs https stay distinct
    assert(canon("https://example.com:8443/a")
      == Seq("https://example.com:8443/a"))
    assert(canon("http://example.com/a", "https://example.com/a")
      .distinct.size == 2)
    // path case is significant; different params are different URLs
    assert(canon("https://example.com/A", "https://example.com/a")
      .distinct.size == 2)
    assert(canon("https://example.com/a?b=1", "https://example.com/a?b=2")
      .distinct.size == 2)
    // all-tracking query collapses to no query at all
    assert(canon("https://example.com/a?utm_source=x&utm_medium=y")
      == Seq("https://example.com/a"))
  }

  test("unparseable inputs pass through unchanged — malformed URLs " +
      "must never collapse onto one shared canonical key") {
    val malformed = Seq("/relative/path?a=1", "not a url at all",
      "example.com/missing-scheme", "", "://x")
    // each survives verbatim: they dedup only against byte-identical
    // copies of themselves (the safe exact-dedup behavior), never
    // against OTHER malformed strings
    assert(canon(malformed: _*) == malformed)
    assert(canon(malformed: _*).distinct.size == malformed.size)
  }
}
