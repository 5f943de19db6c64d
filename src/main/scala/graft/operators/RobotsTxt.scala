package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt FILE parsing (RFC 9309 §2.2 syntax) — the stage e46
  * assumes away: e46 consumes an already-structured (domain, prefix,
  * allow) rules table, but a crawl pipeline holds raw robots.txt BODIES
  * fetched per domain and must parse the group structure out of them:
  *
  *  - lines are `field: value`; `#` starts a comment (stripped to EOL);
  *    blank lines ignored; field names case-insensitive;
  *  - consecutive `User-agent` lines form ONE start-of-group head — the
  *    group's rules apply to every agent named in the head; a
  *    `User-agent` line after rules STARTS A NEW group;
  *  - `Allow`/`Disallow` lines attach to the current group; an
  *    EMPTY-VALUE `Disallow:` means "nothing disallowed" and is DROPPED
  *    (keeping it as a zero-length prefix would wrongly match every
  *    path at the lowest precedence — the RFC's explicit carve-out);
  *  - unknown directives (`Crawl-delay`, `Sitemap`, ...) are ignored;
  *  - rules before any `User-agent` line belong to no group and drop.
  *
  * All column algebra: per-file line explode, a lag+running-sum window
  * PARTITIONED BY DOMAIN (state bounded by one robots.txt body — the
  * RFC caps parseable size at 500 KiB; same bound class as e40's
  * per-doc reassembly), then a ua×rules equi-join per group. A robots
  * corpus is dimension-scale (one small file per domain), so the whole
  * parse is a broadcast-sized side computation at 100 TB.
  */
object RobotsTxt {

  /** @param files (domain, content) — one robots.txt body per domain
    * @return (domain, ua, allow, prefix): one row per (agent in group
    *         head) × (rule in group); ua lowercased
    */
  def parseRules(files: DataFrame): DataFrame = {
    val lines = files
      .select(col("domain"), posexplode(split(col("content"), "\n")))
      .select(col("domain"), col("pos"),
        trim(regexp_replace(col("col"), "#.*$", "")).as("ln"))
      .filter(col("ln") =!= "")
    val classified = lines.select(col("domain"), col("pos"),
        when(lower(col("ln")).startsWith("user-agent:"), "ua")
          .when(lower(col("ln")).startsWith("allow:"), "allow")
          .when(lower(col("ln")).startsWith("disallow:"), "disallow")
          .otherwise("other").as("kind"),
        trim(expr("substring(ln, instr(ln, ':') + 1)")).as("value"))
      .filter(col("kind") =!= "other")
    val w = Window.partitionBy(col("domain")).orderBy(col("pos"))
    val grouped = classified
      .withColumn("newg", (col("kind") === "ua" &&
        coalesce(lag(col("kind"), 1).over(w), lit("")) =!= "ua").cast("int"))
      .withColumn("g", sum(col("newg")).over(w))
      .filter(col("g") >= 1) // rules before any User-agent line drop
    val uas = grouped.filter(col("kind") === "ua")
      .select(col("domain"), col("g"), lower(col("value")).as("ua"))
    val rules = grouped
      .filter(col("kind") =!= "ua" && col("value") =!= "")
      .select(col("domain"), col("g"),
        (col("kind") === "allow").as("allow"), col("value").as("prefix"))
    uas.join(rules, Seq("domain", "g")).drop("g")
  }

  /** RFC 9309 group selection for one product token: the group naming
    * `agent` governs when present, else the `*` group; rules from
    * non-applicable groups do not apply AT ALL (they are not a
    * fallback).
    *
    * @return (domain, allow, prefix) — the effective rule set for agent
    */
  def effectiveRules(rules: DataFrame, agent: String): DataFrame = {
    val hasAgent = rules.filter(col("ua") === agent.toLowerCase)
      .select(col("domain")).distinct()
      .withColumn("has_agent", lit(true))
    rules.join(hasAgent, Seq("domain"), "left")
      .filter(when(coalesce(col("has_agent"), lit(false)),
          col("ua") === agent.toLowerCase)
        .otherwise(col("ua") === "*"))
      .select(col("domain"), col("allow"), col("prefix"))
  }

  /** `Crawl-delay` per group (the de-facto politeness extension next to
    * `Sitemap` — not in RFC 9309, honored by most crawlers): same
    * group structure as [[parseRules]], one (domain, ua, delay_s) row
    * per agent in each group that declares a delay. Non-numeric values
    * drop (the lenient-parse rule); if a group repeats the directive
    * the LAST one wins (later lines override, the per-field convention
    * parsers apply).
    */
  def parseDelays(files: DataFrame): DataFrame = {
    val lines = files
      .select(col("domain"), posexplode(split(col("content"), "\n")))
      .select(col("domain"), col("pos"),
        trim(regexp_replace(col("col"), "#.*$", "")).as("ln"))
      .filter(col("ln") =!= "")
    val classified = lines.select(col("domain"), col("pos"),
        when(lower(col("ln")).startsWith("user-agent:"), "ua")
          .when(lower(col("ln")).startsWith("crawl-delay:"), "delay")
          .when(lower(col("ln")).startsWith("allow:") ||
            lower(col("ln")).startsWith("disallow:"), "rule")
          .otherwise("other").as("kind"),
        trim(expr("substring(ln, instr(ln, ':') + 1)")).as("value"))
      .filter(col("kind") =!= "other")
    val w = Window.partitionBy(col("domain")).orderBy(col("pos"))
    val grouped = classified
      .withColumn("newg", (col("kind") === "ua" &&
        coalesce(lag(col("kind"), 1).over(w), lit("")) =!= "ua").cast("int"))
      .withColumn("g", sum(col("newg")).over(w))
      .filter(col("g") >= 1)
    val uas = grouped.filter(col("kind") === "ua")
      .select(col("domain"), col("g"), lower(col("value")).as("ua"))
    val delays = grouped.filter(col("kind") === "delay")
      .withColumn("delay_s", expr("try_cast(value AS DOUBLE)"))
      .filter(col("delay_s").isNotNull) // lenient: non-numeric drops
      .groupBy(col("domain"), col("g"))
      .agg(expr("max_by(delay_s, pos)").as("delay_s")) // last wins
    uas.join(delays, Seq("domain", "g")).drop("g")
  }

  /** Group selection for the delay (the [[effectiveRules]] rule): the
    * agent's own group when it declares a delay, else the `*` group's,
    * else `default`.
    *
    * The domain universe is `domains` when given (one `domain` column —
    * pass the frontier's hosts so a domain whose robots.txt declares no
    * Crawl-delay in ANY group still receives the default); when absent
    * it falls back to the domains present in `delays`, which by
    * construction only covers domains that declared at least one delay
    * directive somewhere.
    *
    * @return (domain, delay_s) for every domain in the universe —
    *         join this to the frontier's host column
    */
  def effectiveDelay(delays: DataFrame, agent: String,
      default: Double, domains: Option[DataFrame] = None): DataFrame = {
    val own = delays.filter(col("ua") === agent.toLowerCase)
      .select(col("domain"), col("delay_s").as("own_delay"))
    val star = delays.filter(col("ua") === "*")
      .select(col("domain"), col("delay_s").as("star_delay"))
    domains.getOrElse(delays.select(col("domain"))).distinct()
      .join(own, Seq("domain"), "left")
      .join(star, Seq("domain"), "left")
      .select(col("domain"),
        coalesce(col("own_delay"), col("star_delay"), lit(default))
          .as("delay_s"))
  }
}
