package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** robots.txt parsing + RFC 9309 matching (sources.Robots —
  * oracle-gated end-to-end by q145). Hand-derived expectations over
  * the grouping, precedence, and pattern pathologies a real crawl
  * corpus contains.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rulesOf(txt: String) =
    Robots.parseRules(Seq(("h.org", txt)).toDF("host", "txt"), "host", "txt")

  private def verdicts(txt: String, agent: String, paths: String*) = {
    val urls = paths.zipWithIndex.map { case (p, i) => (i.toLong, "h.org", p) }
      .toDF("id", "host", "path")
    Robots.isAllowed(urls, "host", "path", rulesOf(txt), agent)
      .orderBy(col("id")).collect().map(r => r.getAs[String]("path") -> r.getAs[Boolean]("allowed")).toMap
  }

  test("grouping: consecutive UA lines share rules; rules before any group are ignored") {
    val txt =
      """Disallow: /orphan
        |User-agent: alpha
        |User-agent: beta
        |Disallow: /x
        |
        |User-agent: gamma
        |Disallow: /y
        |""".stripMargin
    val got = rulesOf(txt).collect()
      .map(r => (r.getAs[String]("agent"), r.getAs[String]("pattern"))).toSet
    // /orphan attaches to no group and drops; alpha AND beta both own /x
    assert(got === Set(("alpha", "/x"), ("beta", "/x"), ("gamma", "/y")))
  }

  test("comments, blank lines, directive case, and unknown directives are all tolerated") {
    val txt =
      """# preamble comment
        |USER-AGENT: Bot  # trailing comment
        |Crawl-delay: 10
        |DISALLOW: /a
        |Sitemap: https://h.org/map.xml
        |allow: /a/b
        |""".stripMargin
    val got = rulesOf(txt).collect()
      .map(r => (r.getAs[String]("agent"), r.getAs[Boolean]("allow"),
        r.getAs[String]("pattern"))).toSet
    assert(got === Set(("bot", false, "/a"), ("bot", true, "/a/b")))
  }

  test("empty Disallow means no restriction: the rule drops, everything stays allowed") {
    val txt = "User-agent: *\nDisallow:\n"
    assert(rulesOf(txt).count() === 0L)
    assert(verdicts(txt, "anybot", "/anything") === Map("/anything" -> true))
  }

  test("precedence: longest pattern wins, Allow wins a length tie, no match allows") {
    val txt =
      """User-agent: *
        |Disallow: /shop
        |Allow: /shop/sale
        |Disallow: /tie
        |Allow: /tie!
        |""".stripMargin
    // NB /tie! vs /tie: unequal lengths; build a true tie instead
    val tie = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    assert(verdicts(txt, "any", "/shop/x", "/shop/sale/y", "/elsewhere") ===
      Map("/shop/x" -> false, "/shop/sale/y" -> true, "/elsewhere" -> true))
    assert(verdicts(tie, "any", "/dir/z") === Map("/dir/z" -> true))
  }

  test("wildcard * and end-anchor $ match per the RFC; regex metachars in paths stay literal") {
    val txt =
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /a*b
        |Disallow: /lit.x
        |""".stripMargin
    assert(verdicts(txt, "any",
      "/doc.pdf", "/doc.pdf/page", "/axxb", "/ab", "/a/deep/b", "/lit.x", "/litzx") ===
      Map("/doc.pdf" -> false, "/doc.pdf/page" -> true,
        "/axxb" -> false, "/ab" -> false, "/a/deep/b" -> false,
        "/lit.x" -> false, "/litzx" -> true)) // '.' is literal, not regex-any
  }

  test("agent selection: exact token (case-insensitive) beats *, star only when no token group") {
    val txt =
      """User-agent: GraftBot
        |Disallow: /private
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(verdicts(txt, "graftbot", "/public", "/private/x") ===
      Map("/public" -> true, "/private/x" -> false))
    assert(verdicts(txt, "otherbot", "/public") === Map("/public" -> false))
  }

  test("hosts with no robots rules at all stay allowed (left join null path)") {
    val urls = Seq((0L, "bare.org", "/x")).toDF("id", "host", "path")
    val none = Robots.parseRules(
      Seq.empty[(String, String)].toDF("host", "txt"), "host", "txt")
    val got = Robots.isAllowed(urls, "host", "path", none, "any").collect()
    assert(got.length === 1 && got(0).getAs[Boolean]("allowed"))
  }

  test("corpus side stays map-only: rules broadcast, no shuffle or window over URLs") {
    val urls = Seq((0L, "h.org", "/a"), (1L, "h.org", "/b")).toDF("id", "host", "path")
    val plan = Robots.isAllowed(urls, "host", "path",
        rulesOf("User-agent: *\nDisallow: /a\n"), "any")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    // the URL side must not sort-merge, hash-exchange, or window
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  private def delaysOf(txt: String) =
    Robots.crawlDelays(Seq(("h.org", txt)).toDF("host", "txt"), "host", "txt")
      .collect().map(r =>
        (r.getAs[String]("agent"), r.getAs[Long]("delay_ms"))).toSet

  test("crawl-delay: decimal seconds convert by string arithmetic — 0.7 is 700 ms, never 699") {
    val got = delaysOf(
      """User-agent: a
        |Crawl-delay: 0.7
        |User-agent: b
        |Crawl-delay: 1.5
        |User-agent: c
        |Crawl-delay: 10
        |User-agent: d
        |Crawl-delay: 2.1234
        |""".stripMargin)
    // fraction right-pads/truncates to ms: .7 -> 700, .1234 -> 123
    assert(got === Set(("a", 700L), ("b", 1500L), ("c", 10000L), ("d", 2123L)))
  }

  test("crawl-delay: malformed values drop; several delays for one agent keep the max") {
    val got = delaysOf(
      """User-agent: a
        |Crawl-delay: soon
        |Crawl-delay: 3
        |Crawl-delay: 1
        |User-agent: b
        |Crawl-delay: -4
        |""".stripMargin)
    assert(got === Set(("a", 3000L)))
  }

  test("crawl-delay: a delay line between UA lines ends the first group's UA accumulation") {
    val got = delaysOf(
      """User-agent: a
        |Crawl-delay: 1
        |User-agent: b
        |Crawl-delay: 2
        |""".stripMargin)
    // b's UA line follows a non-UA directive, so it starts a NEW group:
    // a gets 1 s, b gets 2 s — they do NOT share a group
    assert(got === Set(("a", 1000L), ("b", 2000L)))
  }

  test("delayFor: exact agent group beats *, * only when no exact group, else no row") {
    val robots = Seq(
      ("ex.org", "User-agent: GraftBot\nCrawl-delay: 1\n\nUser-agent: *\nCrawl-delay: 9\n"),
      ("star.org", "User-agent: *\nCrawl-delay: 2\n"),
      ("none.org", "User-agent: other\nCrawl-delay: 5\n")
    ).toDF("host", "txt")
    val got = Robots.delayFor(Robots.crawlDelays(robots, "host", "txt"), "graftbot")
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Long]("delay_ms"))).toSet
    assert(got === Set(("ex.org", 1000L), ("star.org", 2000L)))
  }

  test("sitemapRefs: group-independent, URL colons survive, case folds, duplicates collapse") {
    val txt =
      """Sitemap: https://h.org/pre.xml
        |User-agent: a
        |Disallow: /x
        |SITEMAP: https://h.org/mid.xml
        |Sitemap:   https://h.org/pre.xml
        |Sitemap:
        |# Sitemap: https://h.org/commented.xml
        |""".stripMargin
    val got = Robots.sitemapRefs(
        Seq(("h.org", txt)).toDF("host", "txt"), "host", "txt")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // pre-group AND in-group refs both surface; the duplicate (extra
    // whitespace) collapses; blank value and commented line drop
    assert(got === Set(
      ("h.org", "https://h.org/pre.xml"), ("h.org", "https://h.org/mid.xml")))
  }

  test("crawl-delay lines leave the allow/disallow rule set untouched") {
    val txt = "User-agent: a\nCrawl-delay: 1\nDisallow: /x\nAllow: /x/y\n"
    val got = rulesOf(txt).collect()
      .map(r => (r.getAs[String]("agent"), r.getAs[Boolean]("allow"),
        r.getAs[String]("pattern"))).toSet
    assert(got === Set(("a", false, "/x"), ("a", true, "/x/y")))
  }

  test("recrawlSchedule: change ppm per observation pair, gap skip, new/hot/cold classes") {
    // A: present v1-3, one change (a,a,b)  -> 1/2 = 500000 -> hot
    // B: present v1 and v3 ONLY, unchanged -> gap skips, 0/1 -> cold
    // C: one observation                   -> new, ppm 0
    // D: two observations, changed         -> 1000000 -> hot
    val snaps = Seq(
      ("A", 1L, "a"), ("A", 2L, "a"), ("A", 3L, "b"),
      ("B", 1L, "a"), ("B", 3L, "a"),
      ("C", 2L, "x"),
      ("D", 1L, "a"), ("D", 2L, "b"))
      .toDF("id", "v", "t")
    val got = graft.sources.Robots.recrawlSchedule(snaps, "id", "v", "t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got === Map(
      "A" -> (3L, 1L, 500000L, "hot"),
      "B" -> (2L, 0L, 0L, "cold"),
      "C" -> (1L, 0L, 0L, "new"),
      "D" -> (2L, 1L, 1000000L, "hot")))
    intercept[IllegalArgumentException] {
      graft.sources.Robots.recrawlSchedule(snaps, "id", "v", "t", hotPpm = 0L)
    }
  }
}
