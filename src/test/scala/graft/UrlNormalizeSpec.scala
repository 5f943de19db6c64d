package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Golden vectors for RFC 3986 §6.2.2 normalization — each the exact
  * transformation a crawl frontier needs before the URL-seen test.
  */
class UrlNormalizeSpec extends AnyFunSuite {

  private def norm(u: String): String =
    graft.functions.UrlNormalize.normalize(UTF8String.fromString(u)).toString

  test("scheme and host lowercase; userinfo stays verbatim") {
    assert(norm("HTTPS://WWW.Example.COM/Path") === "https://www.example.com/Path")
    assert(norm("http://UsEr:Pw@HOST.com/") === "http://UsEr:Pw@host.com/")
  }

  test("default ports drop; non-default and unknown-scheme ports stay") {
    assert(norm("http://a.com:80/x") === "http://a.com/x")
    assert(norm("https://a.com:443/x") === "https://a.com/x")
    assert(norm("ftp://a.com:21/x") === "ftp://a.com/x")
    assert(norm("http://a.com:8080/x") === "http://a.com:8080/x")
    assert(norm("gopher://a.com:70/x") === "gopher://a.com:70/x")
    assert(norm("http://a.com:/x") === "http://a.com/x") // empty port drops
  }

  test("percent: unreserved decodes, retained triplets uppercase, malformed passes") {
    assert(norm("http://a.com/%7euser/%41%2fx") === "http://a.com/~user/A%2Fx")
    assert(norm("http://a.com/a%zz%2") === "http://a.com/a%zz%2")
    assert(norm("http://a.com/ok?q=%6a&r=%2f") === "http://a.com/ok?q=j&r=%2F")
  }

  test("dot segments removed, %2E participates, .. clamps at root") {
    assert(norm("http://a.com/a/./b/../c") === "http://a.com/a/c")
    assert(norm("http://a.com/a/%2E%2E/b") === "http://a.com/b")
    assert(norm("http://a.com/../../x") === "http://a.com/x")
    assert(norm("http://a.com/a/b/..") === "http://a.com/a/")
  }

  test("empty path with authority becomes '/'; fragment strips") {
    assert(norm("http://a.com") === "http://a.com/")
    assert(norm("http://a.com?q=1") === "http://a.com/?q=1")
    assert(norm("http://a.com/x#frag") === "http://a.com/x")
    assert(norm("http://a.com#only") === "http://a.com/")
  }

  test("IPv6 bracket hosts: port split after ']', host lowercased whole") {
    assert(norm("http://[2001:DB8::1]:80/x") === "http://[2001:db8::1]/x")
    assert(norm("http://[2001:DB8::1]:8080/x") === "http://[2001:db8::1]:8080/x")
  }

  test("non-URL input passes through unchanged") {
    assert(norm("no scheme here") === "no scheme here")
    assert(norm("/relative/path") === "/relative/path")
    assert(norm("1:2 odds") === "1:2 odds") // scheme must start with a letter
  }

  test("scheme-only and no-authority forms survive") {
    assert(norm("mailto:A@B.com") === "mailto:A@B.com") // no authority: path untouched beyond pct
    assert(norm("MAILTO:x%41") === "mailto:xA")
  }

  test("null-safe SQL registration as url_normalize") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = Seq("HTTP://A.com:80/%7ex", null).toDF("u")
      .selectExpr("url_normalize(u) AS n").collect()
    assert(r(0).getString(0) === "http://a.com/~x")
    assert(r(1).isNullAt(0))
  }
}
