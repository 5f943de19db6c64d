package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Registrable-domain folding against a committed public-suffix subset
  * (VERDICT r7 item 5 — replaces e37's single `co.uk` literal).
  *
  * The table is a curated subset of the Mozilla Public Suffix List
  * (publicsuffix.org, public data): the multi-label suffixes a crawl
  * actually hits plus the rule shape needed for longest-match. Folding is
  * SCAN-LOCAL: the subset is bounded at plan time, so it inlines as a
  * literal array and the match is `array_contains` over the host's last
  * two labels — zero joins, zero exchanges, the plan shape PlanSpec pins
  * for e37 (one scan + one small-key aggregate). With the FULL ~9k-rule
  * PSL the same longest-match runs as a broadcast join against a suffix
  * table (tiny build side, scan-local probe) — the literal form is the
  * bounded-subset optimization of that plan, not a different algorithm.
  *
  * Longest-match rule (PSL semantics, subset scope): if the host's last
  * TWO labels form a listed suffix, the registrable domain is the last
  * THREE labels; otherwise it is the last TWO ("*.tld" default rule).
  * Wildcard (`*.ck`) and exception (`!www.ck`) rules are out of subset
  * scope — documented, not silently mis-folded.
  */
object PublicSuffix {

  /** Two-label public suffixes (subset of publicsuffix.org). A host
    * ending in any of these registers at the third label.
    */
  val twoLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "co.in", "net.in", "org.in",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "org.mx", "com.ar", "com.tr", "com.tw",
    "co.nz", "org.nz", "com.sg", "co.za", "org.za",
    "com.hk", "com.my", "co.th", "co.id", "com.vn")

  /** Fold a host column to its registrable domain (eTLD+1). NULL-safe:
    * a NULL host yields NULL. A host that IS a listed suffix (2 labels,
    * e.g. "co.uk") folds to itself — concat_ws skips the missing label.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    // try_element_at: a host with fewer labels than the index yields NULL
    // (ANSI element_at throws); concat_ws then skips it — so "localhost"
    // folds to itself and a bare "co.uk" host folds to "co.uk". The NULL
    // host case is explicit because concat_ws never returns NULL itself.
    val suffix2 = concat_ws(".",
      try_element_at(labels, lit(-2)), try_element_at(labels, lit(-1)))
    when(host.isNull, lit(null).cast("string"))
      .when(array_contains(typedlit(twoLabelSuffixes), suffix2),
        concat_ws(".", try_element_at(labels, lit(-3)),
          try_element_at(labels, lit(-2)), try_element_at(labels, lit(-1))))
      .otherwise(suffix2)
  }
}
