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
      Seq("siteA.com.au", "siteB.com.au"))
  }

  test("degenerate hosts: a bare suffix folds to itself; null stays null") {
    assert(fold("co.uk", "localhost") === Seq("co.uk", "localhost"))
    val out = Seq[Option[String]](None).toDF("host")
      .select(functions.PublicSuffix.registrableDomain(col("host")))
      .collect()
    assert(out(0).isNullAt(0))
  }
}
