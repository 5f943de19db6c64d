package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** functions.PublicSuffix longest-match semantics — the mis-fold
  * regression VERDICT r7 called out: r7's single `co.uk` literal folded
  * `example.com.au` to `com.au`, silently merging every .com.au site
  * into one "domain". Every listed two-label suffix must register at
  * the third label; unlisted TLDs at the second.
  */
class PublicSuffixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fold(hosts: String*): Seq[String] =
    hosts.toDF("host")
      .select(functions.PublicSuffix.registrableDomain(col("host")))
      .collect().map(_.getString(0)).toSeq

  test("two-label public suffixes register at the third label") {
    assert(fold(
      "www.example.co.uk", "example.com.au", "a.b.example.org.uk",
      "shop.example.co.jp", "example.com.br") ===
      Seq("example.co.uk", "example.com.au", "example.org.uk",
        "example.co.jp", "example.com.br"))
  }

  test("unlisted TLDs register at the second label (default *.tld rule)") {
    assert(fold(
      "example.com", "deep.sub.example.org", "example.io", "www.example.de") ===
      Seq("example.com", "example.org", "example.io", "example.de"))
  }

  test("r7 mis-fold regression: com.au hosts no longer merge into one domain") {
    assert(fold("siteA.com.au", "siteB.com.au") ===
      Seq("sitea.com.au", "siteb.com.au"))
  }

  test("degenerate hosts: a bare suffix folds to itself; null stays null") {
    assert(fold("co.uk", "localhost") === Seq("co.uk", "localhost"))
    val out = Seq[Option[String]](None).toDF("host")
      .select(functions.PublicSuffix.registrableDomain(col("host")))
      .collect()
    assert(out(0).isNullAt(0))
  }

  test("wildcard rules: every child of *.ck / *.kawasaki.jp is a public suffix") {
    // foo.ck IS a public suffix (folds to itself); one more label
    // registers; deeper hosts fold back to base+2 labels
    assert(fold("foo.ck", "a.foo.ck", "b.a.foo.ck") ===
      Seq("foo.ck", "a.foo.ck", "a.foo.ck"))
    assert(fold("kawasaki.jp", "a.kawasaki.jp", "b.a.kawasaki.jp",
      "c.b.a.kawasaki.jp") ===
      Seq("kawasaki.jp", "a.kawasaki.jp", "b.a.kawasaki.jp",
        "b.a.kawasaki.jp"))
  }

  test("exception rules prevail: !www.ck and !city.kawasaki.jp register themselves") {
    assert(fold("www.ck", "foo.www.ck", "b.foo.www.ck") ===
      Seq("www.ck", "www.ck", "www.ck"))
    assert(fold("city.kawasaki.jp", "x.city.kawasaki.jp",
      "y.x.city.kawasaki.jp") ===
      Seq("city.kawasaki.jp", "city.kawasaki.jp", "city.kawasaki.jp"))
  }

  test("matching is case-insensitive; output is canonical lowercase (r8 advice)") {
    assert(fold("Example.CO.UK", "WWW.EXAMPLE.COM", "A.Foo.CK", "FOO.WWW.CK") ===
      Seq("example.co.uk", "example.com", "a.foo.ck", "www.ck"))
  }

  test("broadcast-join form matches the inline form on every rule kind") {
    val hosts = Seq(
      "www.example.co.uk", "example.com.au", "a.b.example.org.uk",
      "example.com", "deep.sub.example.org", "www.example.de",
      "foo.ck", "a.foo.ck", "b.a.foo.ck",
      "kawasaki.jp", "a.kawasaki.jp", "b.a.kawasaki.jp", "c.b.a.kawasaki.jp",
      "www.ck", "foo.www.ck", "b.foo.www.ck",
      "city.kawasaki.jp", "x.city.kawasaki.jp",
      "Example.CO.UK", "A.Foo.CK",
      "co.uk", "localhost",
      // duplicate hosts must fold independently
      "example.com", "foo.ck")
    val df = hosts.toDF("host")
    val rules = functions.PublicSuffix.subsetRules.toDF("rule")
    val joined = functions.PublicSuffix
      .registrableDomainJoin(df, "host", rules, "rd")
      .select(col("host"), col("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val inline = df
      .select(col("host"),
        functions.PublicSuffix.registrableDomain(col("host")).as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(joined === inline)
    // and the join output row count is the input row count (no fan-out)
    assert(functions.PublicSuffix
      .registrableDomainJoin(df, "host", rules, "rd").count() === hosts.size)
  }
}
