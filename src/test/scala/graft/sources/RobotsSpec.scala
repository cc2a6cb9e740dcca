package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class RobotsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("robots-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val txt =
    """# policy
      |User-agent: evilbot
      |Disallow: /
      |
      |User-agent: goodbot
      |User-agent: otherbot
      |Disallow: /shared
      |
      |User-agent: *
      |Crawl-delay: 10
      |Disallow: /p
      |Allow: /p/ok
      |Sitemap: https://x/sitemap.xml
      |
      |User-agent: *
      |Disallow: /extra
      |""".stripMargin

  test("group selection: named match, consecutive agents, * merge, fallback") {
    val groups = Robots.parse(txt)
    assert(groups.length === 4)
    // evilbot: everything blocked
    val (_, evilD) = Robots.rulesFor(groups, "EvilBot/2.0")
    assert(evilD === Seq("/"))
    assert(Robots.decide(Nil, evilD, "/anything")._1 === false)
    // goodbot and otherbot share one group (consecutive User-agent lines)
    val (_, goodD) = Robots.rulesFor(groups, "otherbot")
    assert(goodD === Seq("/shared"))
    // unknown crawler: BOTH * groups merge
    val (starA, starD) = Robots.rulesFor(groups, "graftbot/1.0")
    assert(starA === Seq("/p/ok") && starD.toSet === Set("/p", "/extra"))
  }

  test("longest match wins; Allow wins length ties; no match allows") {
    val a = Seq("/p/ok")
    val d = Seq("/p", "/extra")
    assert(Robots.decide(a, d, "/p/1") === ((false, "/p")))
    assert(Robots.decide(a, d, "/p/ok/deep") === ((true, "/p/ok")))
    assert(Robots.decide(a, d, "/elsewhere") === ((true, "")))
    // equal lengths: Allow wins
    assert(Robots.decide(Seq("/dir"), Seq("/dir"), "/dir/x")._1 === true)
    // empty Disallow value matches nothing (allow-all convention)
    assert(Robots.decide(Nil, Seq(""), "/any") === ((true, "")))
  }

  test("RFC wildcards: * spans segments, $ anchors the end") {
    assert(Robots.matchLen("/*.pdf$", "/docs/file.pdf") === Some(7))
    assert(Robots.matchLen("/*.pdf$", "/docs/file.pdf?x") === None)
    assert(Robots.matchLen("/a/*/c", "/a/b/c") === Some(6))
    assert(Robots.matchLen("/a/*/c", "/a/x/y/cde") === Some(6)) // prefix, not anchored
    assert(Robots.matchLen("/exact$", "/exact") === Some(7))
    assert(Robots.matchLen("/exact$", "/exactly") === None)
  }

  test("crawl-delay: captured per group, specific group overrides *") {
    val groups = Robots.parse(txt)
    assert(Robots.crawlDelay(groups, "graftbot") === Some(10))
    assert(Robots.crawlDelay(groups, "goodbot") === None) // its group has none
    val bad = Robots.parse("User-agent: *\nCrawl-delay: oops\nDisallow: /x\n")
    assert(Robots.crawlDelay(bad, "any") === None) // malformed ignored
  }

  test("frontierSchedule: allowed-only, priority order, delay windows") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      (1L, "a.org", "/one", 50L), (2L, "a.org", "/two", 90L),
      (3L, "a.org", "/p/blocked", 99L), (4L, "b.org", "/solo", 10L))
      .toDF("id", "domain", "path", "prio")
    val robots = Seq(
      ("a.org", "User-agent: *\nCrawl-delay: 7\nDisallow: /p\n"),
      ("b.org", "User-agent: *\nDisallow:\n")) // no delay → default 1
      .toDF("domain", "robots_txt")
    val out = Robots.frontierSchedule(urls, "id", "domain", "path", "prio",
        robots, "graftbot")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    // a.org: id 2 (prio 90) first at t=0, id 1 second at t=7; id 3 blocked
    assert(out.toSeq === Seq((1L, 2, 7L), (2L, 1, 0L), (4L, 1, 0L)))
  }

  test("decisions operator: broadcast join, correct rows") {
    val s = spark
    import s.implicits._
    val urls = Seq((1L, "a.org", "/p/1"), (2L, "a.org", "/p/ok"),
      (3L, "a.org", "/fine"), (4L, "b.org", "/p/1"))
      .toDF("id", "domain", "path")
    val robots = Seq(
      ("a.org", "User-agent: *\nDisallow: /p\nAllow: /p/ok\n"),
      ("b.org", "User-agent: *\nDisallow:\n")) // empty = allow all
      .toDF("domain", "robots_txt")
    val out = Robots.decisions(urls, "id", "domain", "path", robots, "graftbot")
    val rows = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
    assert(rows.toSeq === Seq(
      (1L, 0, "/p"), (2L, 1, "/p/ok"), (3L, 1, ""), (4L, 1, "")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rules must broadcast:\n$plan")
  }

  test("Sitemap/unknown lines between User-agent lines do not split the " +
       "agent block (RFC 9309 grouping)") {
    val t = "User-agent: alpha\nSitemap: https://x/s.xml\n" +
      "Unknown-ext: v\nUser-agent: beta\nDisallow: /y\n"
    val gs = Robots.parse(t)
    assert(gs.length == 1, s"non-group lines split the block: $gs")
    assert(gs.head.agents.toSet == Set("alpha", "beta"))
    assert(gs.head.disallows == Seq("/y"))
    // alpha obeys the shared group's rules, not an empty rule set
    assert(Robots.rulesFor(gs, "alpha/1.0") == (Seq(), Seq("/y")))
    // an Allow/Disallow DOES end the agent run: a later User-agent starts
    // a fresh group
    val t2 = "User-agent: a\nDisallow: /p\nUser-agent: b\nDisallow: /q\n"
    assert(Robots.parse(t2).length == 2)
  }

  test("sitemap directives: non-group lines, both forms, order kept") {
    assert(Robots.sitemapUrls(txt) === Seq("https://x/sitemap.xml"))
    val multi = "Sitemap: https://a/1.xml\nUser-agent: *\nDisallow: /\n" +
      "  sitemap:https://a/2.xml\nSiteMap: \n"
    assert(Robots.sitemapUrls(multi) ===
      Seq("https://a/1.xml", "https://a/2.xml"))
    val s = spark
    import s.implicits._
    val col0 = Seq(multi).toDF("t")
      .select(org.apache.spark.sql.functions.explode(
        Robots.sitemapUrlsCol(org.apache.spark.sql.functions.col("t"))))
      .collect().map(_.getString(0))
    assert(col0.toSeq === Seq("https://a/1.xml", "https://a/2.xml"))
  }
}
