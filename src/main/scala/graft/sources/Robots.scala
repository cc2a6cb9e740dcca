package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt (Robots Exclusion Protocol, RFC 9309) — the crawl-politeness
  * gate every ingest pipeline applies between frontier and fetch. Pure-JVM
  * parser and matcher, plus the Spark decision operator.
  *
  * Semantics per the RFC: records group User-agent lines with their
  * Allow/Disallow rules; a crawler obeys the group whose agent token
  * matches it (falling back to `*`), multiple groups for the same agent
  * merge; the rule with the LONGEST pattern wins, Allow winning
  * length ties; no matching rule means allowed. Patterns support the
  * RFC's `*` (any chars) and `$` (end anchor) wildcards; empty-value
  * Disallow allows everything (the classic convention). `Crawl-delay`
  * (the de-facto extension) is captured per group; unknown fields
  * (Sitemap, extensions) and `#` comments are skipped.
  */
object Robots {

  final case class Group(agents: Seq[String], allows: Seq[String],
                         disallows: Seq[String],
                         crawlDelay: Option[Int] = None)

  /** Parse the record groups of one robots.txt. */
  def parse(txt: String): Seq[Group] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = List.empty[String]
    var allows = List.empty[String]
    var disallows = List.empty[String]
    var delay: Option[Int] = None
    var inAgents = false // consecutive User-agent lines share one group
    def flush(): Unit = {
      if (agents.nonEmpty) out += Group(agents.reverse, allows.reverse,
        disallows.reverse, delay)
      agents = Nil; allows = Nil; disallows = Nil; delay = None
    }
    txt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) flush()
            agents ::= value.toLowerCase
            inAgents = true
          case "allow" => allows ::= value; inAgents = false
          case "disallow" => disallows ::= value; inAgents = false
          case "crawl-delay" =>
            // de-facto extension most crawlers honor; malformed → ignored
            delay = scala.util.Try(value.trim.toInt).toOption.filter(_ >= 0)
              .orElse(delay)
            inAgents = false
          // Sitemap / unknown extensions are NOT group members per RFC
          // 9309 §2.2.2 — they must not split a User-agent line block
          // ("User-agent: a / Sitemap: x / User-agent: b" is ONE group
          // naming both agents), so they leave inAgents untouched
          case _ => ()
        }
      }
    }
    flush()
    out.toSeq
  }

  /** The crawler's product token: the UA string up to the first `/` or
    * whitespace, lowercased — "GraftBot/1.0 (+info)" → "graftbot". */
  private def productToken(ua: String): String =
    ua.takeWhile(c => c != '/' && !c.isWhitespace).toLowerCase

  /** A group token matches when it is a case-insensitive PREFIX of the
    * crawler's product token (RFC 9309 matching as implemented by the
    * major crawlers) — NOT a substring of the full UA, which would let an
    * incidental token like "bot" hijack "graftbot/1.0". */
  private def agentMatches(token: String, product: String): Boolean =
    token != "*" && product.startsWith(token)

  /** The groups `ua` must obey: all groups carrying the most-specific
    * (longest) matching agent token, else all `*` groups. ONE chooser
    * shared by rules and crawl-delay so the delay always comes from the
    * same group whose rules are being enforced. */
  private def chosenGroups(groups: Seq[Group], ua: String): Seq[Group] = {
    val p = productToken(ua)
    val matching = groups.filter(_.agents.exists(agentMatches(_, p)))
    if (matching.nonEmpty) {
      val best = matching.flatMap(_.agents.filter(agentMatches(_, p)))
        .maxBy(_.length)
      matching.filter(_.agents.contains(best))
    } else groups.filter(_.agents.contains("*"))
  }

  /** The merged rule set a crawler named `ua` must obey. */
  def rulesFor(groups: Seq[Group], ua: String): (Seq[String], Seq[String]) = {
    val chosen = chosenGroups(groups, ua)
    (chosen.flatMap(_.allows), chosen.flatMap(_.disallows))
  }

  /** The Crawl-delay (seconds) of exactly the group whose rules `ua`
    * obeys, if that group declares one. */
  def crawlDelay(groups: Seq[Group], ua: String): Option[Int] =
    chosenGroups(groups, ua).flatMap(_.crawlDelay).headOption

  /** `Sitemap:` directives of a robots.txt — per RFC 9309 §2.3 these are
    * non-group lines (they apply regardless of user-agent), which is why
    * `parse` skips them; the crawl-discovery stage reads them here. The
    * column form is a codegen'd multi-line regexp — document order
    * preserved, no UDF. */
  def sitemapUrlsCol(robotsTxt: Column): Column =
    regexp_extract_all(robotsTxt,
      lit("(?im)^[ \\t]*sitemap:[ \\t]*(\\S+)"), lit(1))

  /** Driver-side twin of `sitemapUrlsCol` for parsed-policy callers. */
  def sitemapUrls(txt: String): Seq[String] =
    txt.linesIterator.map(_.trim)
      .filter(_.toLowerCase.startsWith("sitemap:"))
      .map(_.substring("sitemap:".length).trim).filter(_.nonEmpty).toSeq

  // wildcard patterns compiled once per executor (robots rule sets are
  // tiny and shared across billions of urls — recompiling per row was
  // the decision hot path's dominant cost)
  private val rxCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  /** Does `pattern` match `path` under RFC wildcards? Returns the
    * pattern's length (its specificity) when it matches. Empty patterns
    * match nothing (empty Disallow = allow all). Wildcard-free patterns
    * (the overwhelmingly common case) take a plain prefix test — no
    * regex at all. */
  def matchLen(pattern: String, path: String): Option[Int] = {
    if (pattern.isEmpty) return None
    if (pattern.indexOf('*') < 0 && pattern.indexOf('$') < 0)
      return if (path.startsWith(pattern)) Some(pattern.length) else None
    val anchored = pattern.endsWith("$")
    val rx = rxCache.computeIfAbsent(pattern, { _ =>
      val body = if (anchored) pattern.dropRight(1) else pattern
      java.util.regex.Pattern.compile(
        body.split("\\*", -1).map(java.util.regex.Pattern.quote)
          .mkString(".*"))
    })
    val m = rx.matcher(path)
    val ok = if (anchored) m.matches() else m.lookingAt()
    if (ok) Some(pattern.length) else None
  }

  /** Longest-match decision: (allowed, winning rule or ""). */
  def decide(allows: Seq[String], disallows: Seq[String],
             path: String): (Boolean, String) = {
    val a = allows.flatMap(p => matchLen(p, path).map(l => (l, p)))
      .sortBy(x => (-x._1, x._2)).headOption
    val d = disallows.flatMap(p => matchLen(p, path).map(l => (l, p)))
      .sortBy(x => (-x._1, x._2)).headOption
    (a, d) match {
      case (None, None) => (true, "")
      case (Some((_, p)), None) => (true, p)
      case (None, Some((_, p))) => (false, p)
      case (Some((la, pa)), Some((ld, pd))) =>
        if (la >= ld) (true, pa) else (false, pd) // Allow wins ties
    }
  }

  /** Decision table for a url set against per-domain robots files.
    * `robots`: (domain, robots_txt) — one small row per domain, parsed
    * once per row and BROADCAST to the url side; the decision itself is
    * a narrow per-url match. At crawl scale the url table is the 100 TB
    * side and never shuffles. A domain with NO robots row is ALLOWED
    * (the RFC default for a missing robots.txt) — the join is a left
    * join, never a silent drop. */
  def decisions(urls: DataFrame, urlIdCol: String, domainCol: String,
                pathCol: String, robots: DataFrame, ua: String): DataFrame = {
    val parseUdf = udf((txt: String) => {
      val (a, d) = rulesFor(parse(txt), ua); (a, d)
    })
    val rules = robots.select(col("domain").as("__rdom"),
      parseUdf(col("robots_txt")).as("r"))
    val decideUdf = udf((a: Seq[String], d: Seq[String], path: String) => {
      val (ok, rule) = decide(a, d, path); (ok, rule)
    })
    val empty = array().cast("array<string>")
    urls.join(broadcast(rules), col(domainCol) === col("__rdom"), "left")
      .select(col(urlIdCol), col(domainCol),
        decideUdf(coalesce(col("r._1"), empty), coalesce(col("r._2"), empty),
          col(pathCol)).as("dec"))
      .select(col(urlIdCol), col(domainCol),
        col("dec._1").cast("int").as("allowed"),
        col("dec._2").as("matched_rule"))
  }

  /** Politeness-bounded fetch schedule for the allowed frontier: within
    * each domain, urls fetch in (`priorityCol` DESC, id) order, one per
    * Crawl-delay window — fetch_seq is the per-domain slot, fetch_at_s
    * its start offset. Domains without a declared delay use
    * `defaultDelayS`.
    *
    * Scale: one window whose partition key (domain) is its exchange key;
    * the per-domain robots join broadcasts. A mega-domain's schedule IS
    * inherently sequential (politeness), so one task per domain is the
    * true dependency structure, not a skew accident — and the schedule
    * rows are (id, domain, ints), never page content. */
  def frontierSchedule(urls: DataFrame, urlIdCol: String, domainCol: String,
                       pathCol: String, priorityCol: String,
                       robots: DataFrame, ua: String,
                       defaultDelayS: Int = 1): DataFrame = {
    val delayUdf = udf((txt: String) =>
      crawlDelay(parse(txt), ua).getOrElse(defaultDelayS))
    val delays = robots.select(col("domain").as("__rdom"),
      delayUdf(col("robots_txt")).as("delay_s"))
    val allowed = decisions(urls, urlIdCol, domainCol, pathCol, robots, ua)
      .where(col("allowed") === 1)
      .select(col(urlIdCol), col(domainCol))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(domainCol)
      .orderBy(col(priorityCol).desc, col(urlIdCol))
    allowed
      .join(urls.select(col(urlIdCol), col(priorityCol)), Seq(urlIdCol))
      .join(broadcast(delays), col(domainCol) === col("__rdom"), "left")
      .withColumn("fetch_seq", row_number().over(w))
      .select(col(urlIdCol), col(domainCol), col("fetch_seq"),
        ((col("fetch_seq") - 1).cast("long") *
          coalesce(col("delay_s"), lit(defaultDelayS))).as("fetch_at_s"))
  }
}
