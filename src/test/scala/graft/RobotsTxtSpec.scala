package graft

import org.scalatest.funsuite.AnyFunSuite

/** RobotsTxt.parseRules / effectiveRules over hand-written robots.txt
  * bodies — each test pins one RFC 9309 syntax rule.
  */
class RobotsTxtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rules(content: String): Set[(String, Boolean, String)] =
    graft.operators.RobotsTxt
      .parseRules(Seq(("d.com", content)).toDF("domain", "content"))
      .collect()
      .map(r => (r.getString(1), r.getBoolean(2), r.getString(3)))
      .toSet

  test("one group, comments and blank lines stripped, case-insensitive fields") {
    val c = """# intro comment
              |User-agent: *
              |DISALLOW: /a  # trailing comment
              |allow: /a/b
              |
              |Sitemap: https://d.com/map.xml""".stripMargin
    assert(rules(c) === Set(("*", false, "/a"), ("*", true, "/a/b")))
  }

  test("consecutive User-agent lines share one group's rules") {
    val c = """User-agent: botA
              |User-agent: botB
              |Disallow: /x""".stripMargin
    assert(rules(c) === Set(("bota", false, "/x"), ("botb", false, "/x")))
  }

  test("a User-agent line after rules starts a NEW group") {
    val c = """User-agent: botA
              |Disallow: /x
              |User-agent: botB
              |Disallow: /y""".stripMargin
    assert(rules(c) === Set(("bota", false, "/x"), ("botb", false, "/y")))
  }

  test("empty Disallow means nothing-disallowed and is dropped") {
    val c = """User-agent: *
              |Disallow:
              |Allow: /ok""".stripMargin
    assert(rules(c) === Set(("*", true, "/ok")))
  }

  test("rules before any User-agent line belong to no group and drop") {
    val c = """Disallow: /orphan
              |User-agent: *
              |Disallow: /x""".stripMargin
    assert(rules(c) === Set(("*", false, "/x")))
  }

  test("unknown directives are ignored, not rules") {
    val c = """User-agent: *
              |Crawl-delay: 10
              |Disallow: /x""".stripMargin
    assert(rules(c) === Set(("*", false, "/x")))
  }

  test("effectiveRules: named group governs when present, else *; never both") {
    val c = """User-agent: *
              |Disallow: /all
              |User-agent: graftbot
              |Disallow: /bot""".stripMargin
    val parsed = graft.operators.RobotsTxt
      .parseRules(Seq(("d.com", c), ("e.com", "User-agent: *\nDisallow: /star"))
        .toDF("domain", "content"))
    val eff = graft.operators.RobotsTxt.effectiveRules(parsed, "GraftBot")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSet
    assert(eff === Set(("d.com", false, "/bot"), ("e.com", false, "/star")))
  }

  test("Crawl-delay: group structure, last-wins, lenient drop, star fallback, default") {
    val c = """User-agent: fastbot
              |Crawl-delay: 1
              |
              |User-agent: graftbot
              |Crawl-delay: fast
              |Disallow: /x
              |
              |User-agent: *
              |Crawl-delay: 9
              |Crawl-delay: 4""".stripMargin
    val files = Seq(
      ("a.com", c),
      ("b.com", "User-agent: graftbot\nCrawl-delay: 2.5\n\nUser-agent: *\nCrawl-delay: 7"),
      ("c.com", "User-agent: other\nCrawl-delay: 3")).toDF("domain", "content")
    val eff = graft.operators.RobotsTxt.effectiveDelay(
        graft.operators.RobotsTxt.parseDelays(files), "GraftBot", default = 5.0)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    // a.com: graftbot delay is non-numeric -> drops -> star last-wins 4
    assert(eff("a.com") === 4.0)
    // b.com: own group wins over star
    assert(eff("b.com") === 2.5)
    // c.com: neither graftbot nor * declares -> default
    assert(eff("c.com") === 5.0)
  }
}
