package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Golden vectors for `url_resolve` — RFC 3986 §5.4's OWN normal and
  * abnormal reference-resolution examples (the spec publishes the
  * expected output for each), plus the WHATWG href-cleanup rules and
  * the NULL envelope. Direct function tests, no Spark session.
  */
class UrlResolveSpec extends AnyFunSuite {

  private val base = "http://a/b/c/d;p?q"

  private def res(b: String, r: String): String = {
    val out = graft.functions.UrlResolve.resolve(
      UTF8String.fromString(b), UTF8String.fromString(r))
    if (out == null) null else out.toString
  }

  test("RFC 3986 §5.4.1 normal examples") {
    val cases = Seq(
      "g:h" -> "g:h",
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s",
      "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    for ((ref, want) <- cases)
      assert(res(base, ref) === want, s"ref=<$ref>")
  }

  test("RFC 3986 §5.4.2 abnormal examples (strict parser)") {
    val cases = Seq(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g#s/./x",
      "g#s/../x" -> "http://a/b/c/g#s/../x",
      // strict parser: a same-scheme relative-looking ref keeps its
      // scheme (RFC: "for strict parsers" → http:g)
      "http:g" -> "http:g")
    for ((ref, want) <- cases)
      assert(res(base, ref) === want, s"ref=<$ref>")
  }

  test("WHATWG href cleanup: ends trimmed, interior tab/newline removed") {
    assert(res(base, "  g  ") === "http://a/b/c/g")
    assert(res(base, "g/\n\th\r") === "http://a/b/c/g/h")
  }

  test("authority-relative ref keeps base scheme; empty base path merge") {
    assert(res("https://h", "x") === "https://h/x")
    assert(res("https://h?q=1", "y") === "https://h/y")
    assert(res("https://h/p", "//other/z?a") === "https://other/z?a")
  }

  test("a colon in the first path segment is not a scheme") {
    assert(res(base, "./a:b") === "http://a/b/c/a:b")
    assert(res(base, "x?y=a:b") === "http://a/b/c/x?y=a:b")
  }

  test("base without a valid scheme resolves to NULL") {
    assert(res("not a url", "g") === null)
    assert(res("/relative/base", "g") === null)
    assert(res("", "g") === null)
  }
}
